from latte_tpu.dist.mesh import (  # noqa: F401
    MeshConfig,
    make_mesh,
    shard_batch,
    replicate,
)
