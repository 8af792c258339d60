"""Record cross-framework goldens from the REFERENCE torch model.

Runs the reference Latte (`/root/reference/models/latte.py`, executed on
torch-CPU through `latte_tpu.tools.reference_oracle`) and the reference
diffusion engine on fixed seeded weights/inputs, and writes the resulting
forward output and DDIM trajectory — together with the exact Flax params and
inputs used — to ``tests/golden/ref_latte_tiny.npz``.

``tests/test_golden.py`` then replays OUR model + engine against these
reference-generated arrays, so the committed golden pins cross-framework
parity (BASELINE.md north star) without needing /root/reference mounted.

Usage: python scripts/make_reference_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp
import numpy as np
from flax.traverse_util import flatten_dict

GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "tests", "golden", "ref_latte_tiny.npz"
)

# tiny class-conditional config: exercises patchify, sincos tables, adaLN
# blocks, temporal-embed gating, label embedding and the final layer
CFG = dict(
    input_size=8,
    patch_size=2,
    in_channels=4,
    hidden_size=64,
    depth=4,
    num_heads=4,
    num_frames=4,
    extras=2,
    num_classes=10,
)


def make_params():
    from latte_tpu.models import Latte

    model = Latte(attention_mode="xla", **CFG)
    x0 = jnp.zeros((1, CFG["num_frames"], 4, 8, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x0, jnp.zeros((1,), jnp.int32), y=jnp.array([0])
    )
    # perturb away from adaLN-zero so block outputs are non-trivial
    keys = iter(jax.random.split(jax.random.PRNGKey(1), 10_000))
    return jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(next(keys), a.shape, jnp.float32),
        variables["params"],
    )


def main():
    import torch

    from latte_tpu.tools.reference_oracle import REFERENCE, build_reference_latte

    params = make_params()
    tmodel = build_reference_latte(
        params, num_heads=CFG["num_heads"], attention_mode="math", **{
            k: v for k, v in CFG.items() if k != "num_heads"
        }
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4, 4, 8, 8)).astype(np.float32)
    t = np.array([3, 47])
    y = np.array([1, 7])
    with torch.no_grad():
        fwd = tmodel(torch.from_numpy(x), torch.from_numpy(t), y=torch.from_numpy(y)).numpy()

    # reference engine DDIM-10 (of 100 steps) trajectory
    sys.path.insert(0, REFERENCE)
    import diffusion as ref_diffusion_mod

    sys.path.remove(REFERENCE)
    d = ref_diffusion_mod.create_diffusion("ddim10", diffusion_steps=100)
    xT = rng.standard_normal((2, 4, 4, 8, 8)).astype(np.float32)
    cur = torch.from_numpy(xT.copy())
    ty = torch.from_numpy(y)
    with torch.no_grad():
        wrapped = d._wrap_model(lambda xx, tt, **kw: tmodel(xx, tt, **kw))
        for i in reversed(range(d.num_timesteps)):
            ts = torch.tensor([i] * 2)
            cur = d.ddim_sample(wrapped, cur, ts, model_kwargs={"y": ty})["sample"]
    latents = cur.numpy()

    out = {
        "x": x, "t": t, "y": y, "fwd": fwd, "xT": xT, "latents": latents,
    }
    for path, leaf in flatten_dict(params, sep="/").items():
        out[f"param/{path}"] = np.asarray(leaf)
    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    np.savez_compressed(GOLDEN, **out)
    size = os.path.getsize(GOLDEN)
    print(f"wrote {os.path.abspath(GOLDEN)} ({size/1e6:.2f} MB): "
          f"fwd {fwd.shape}, latents {latents.shape}")


if __name__ == "__main__":
    main()
