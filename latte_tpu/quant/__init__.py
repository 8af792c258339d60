from latte_tpu.quant.int8 import (  # noqa: F401
    int8_matmul,
    int8_matmul_ste,
    quantize_params,
    quantize_weight,
)
