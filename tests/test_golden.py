"""Golden-latent regression anchors.

BASELINE.md's north star requires fp32-tolerance latent reproducibility at
fixed seeds. Cross-framework goldens need the reference's python deps
(timm) which this image lacks, so these goldens pin OUR numerics: any
refactor that changes model or sampler output beyond fp32 noise fails
here. Engine-level parity vs the reference is covered separately in
test_diffusion_core.py. Regenerate with:
``python tests/test_golden.py --regen`` (and justify the change).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "latte_s_ddim5.npz")


def compute_golden():
    from latte_tpu.core.diffusion import create_diffusion
    from latte_tpu.core.samplers import ddim_sample_loop
    from latte_tpu.models import Latte

    model = Latte(
        input_size=8,
        patch_size=2,
        hidden_size=64,
        depth=4,
        num_heads=4,
        num_frames=4,
        attention_mode="xla",
    )
    x0 = jnp.zeros((1, 4, 4, 8, 8))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((1,), jnp.int32))
    # perturb from adaLN-zero so outputs are non-trivial
    keys = iter(jax.random.split(jax.random.PRNGKey(1), 10_000))
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(next(keys), a.shape, jnp.float32),
        variables["params"],
    )

    fwd = model.apply(
        {"params": params},
        jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 8, 8)),
        jnp.array([7]),
    )

    diffusion = create_diffusion("ddim5", diffusion_steps=100)
    z = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 8, 8))
    latents = ddim_sample_loop(
        diffusion, lambda x, t: model.apply({"params": params}, x, t), z
    )
    return np.asarray(fwd), np.asarray(latents)


class TestGolden:
    def test_forward_and_trajectory_match_golden(self):
        fwd, latents = compute_golden()
        assert os.path.exists(GOLDEN), "golden file missing — run --regen"
        ref = np.load(GOLDEN)
        np.testing.assert_allclose(fwd, ref["fwd"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(latents, ref["latents"], rtol=1e-4, atol=1e-5)


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        fwd, latents = compute_golden()
        os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
        np.savez(GOLDEN, fwd=fwd, latents=latents)
        print(f"wrote {GOLDEN}: fwd {fwd.shape}, latents {latents.shape}")
