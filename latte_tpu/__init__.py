"""latte_tpu — a TPU-native (JAX/Flax/Pallas/pjit) video latent-diffusion framework.

Re-designed from scratch with the capabilities of Vchitect/Latte
(latent diffusion transformers for video generation, arXiv 2401.03048),
but architected for TPU: functional diffusion core, Flax DiT models with
scanned transformer stacks, Pallas flash-attention kernels, and
`jax.sharding.Mesh`-based data/tensor parallelism.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("LATTE_TPU_PLATFORM"):
    # Force the JAX platform through jax.config BEFORE backend init: some
    # images install a sitecustomize that registers an ambient accelerator
    # backend and overrides the JAX_PLATFORMS env var at interpreter start,
    # so the env var alone cannot pin CLI subprocesses to CPU (needed for
    # hermetic smoke runs of scripts/real_eval.sh and friends — see
    # tests/test_real_eval_script.py). Same mechanism as the multi-chip
    # dryrun child in __graft_entry__.py.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["LATTE_TPU_PLATFORM"])

from latte_tpu.core.diffusion import GaussianDiffusion, create_diffusion  # noqa: F401
