"""latte_tpu — a TPU-native (JAX/Flax/Pallas/pjit) video latent-diffusion framework.

Re-designed from scratch with the capabilities of Vchitect/Latte
(latent diffusion transformers for video generation, arXiv 2401.03048),
but architected for TPU: functional diffusion core, Flax DiT models with
scanned transformer stacks, Pallas flash-attention kernels, and
`jax.sharding.Mesh`-based data/tensor parallelism.
"""

__version__ = "0.1.0"

from latte_tpu.core.diffusion import GaussianDiffusion, create_diffusion  # noqa: F401
