from latte_tpu.serve.aot import (  # noqa: F401
    AOT_SUFFIX,
    export_sampler,
    load_sampler,
    save_sampler,
)
