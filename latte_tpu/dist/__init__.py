from latte_tpu.dist.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    shard_batch,
    replicate,
)
from latte_tpu.dist.ring import (  # noqa: F401
    ring_attention,
    ring_attention_sharded,
)
from latte_tpu.dist.pipeline import (  # noqa: F401
    gpipe,
    pipelined_latte_forward,
)
