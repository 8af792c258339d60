"""End-to-end smoke test for ``scripts/real_eval.sh``.

The script is the one-command real-artifact runbook (reference acceptance
workflow `/root/reference/docs/datasets_evaluation.md:46-53`: sample 2048
videos, extract frames, run FVD against the real dataset). The literal
published checkpoints / detector torchscripts cannot be fetched in this
zero-egress image, so the smoke drives the EXACT same command path with
stand-in files shaped like the real ones: an orbax checkpoint, a frame-folder
"real" dataset, the seeded tiny VAE, and the stand-in detector — asserting
every stage (sample -> mp4s -> frames -> metric JSONL) actually ran.
"""

import json
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the sampler config overrides that shrink the run to smoke scale; the
# checkpoint below is initialized from the SAME config so shapes must match
SMOKE_OVERRIDES = {
    "model": "Latte-S/2",
    "image_size": 64,
    "num_frames": 16,  # fvd2048_16f consumes 16-frame clips
    "extras": 1,
    "learn_sigma": True,
    "attention_mode": "xla",
    "sample_method": "ddim",
    "num_sampling_steps": "ddim3",
    "cfg_scale": 1.0,
    "seed": 0,
    "per_proc_batch_size": 1,
    "use_fp16": False,
    "vae": "tiny",  # seeded random tiny VAE -> 16x16 pixel videos
}


def _make_checkpoint(path: str) -> None:
    import orbax.checkpoint as ocp

    from latte_tpu.models.registry import get_models

    class Args:
        pass

    for k, v in SMOKE_OVERRIDES.items():
        setattr(Args, k, v)
    model = get_models(Args)
    x = jnp.zeros((1, 16, 4, 8, 8))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, x, t)["params"]
    ocp.PyTreeCheckpointer().save(
        os.path.abspath(path), {"params": jax.device_get(params)}
    )


def _make_real_frames(root: str, n_videos: int = 4, n_frames: int = 16) -> None:
    """A frame-folder dataset shaped like an extracted real dataset
    (per-video subdirectory of numbered .jpg frames, eval/dataset.py)."""
    import cv2

    rng = np.random.default_rng(0)
    for v in range(n_videos):
        d = os.path.join(root, f"vid{v:03d}")
        os.makedirs(d)
        for f in range(n_frames):
            img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
            assert cv2.imwrite(os.path.join(d, f"{f:06d}.jpg"), img)


@pytest.mark.slow
def test_real_eval_script_end_to_end(tmp_path):
    ckpt = tmp_path / "ckpt"
    real = tmp_path / "real"
    out = tmp_path / "out"
    _make_checkpoint(str(ckpt))
    real.mkdir()
    _make_real_frames(str(real))

    env = dict(os.environ)
    # hermetic: pin the CLI subprocesses to the 8-virtual-device CPU
    # platform (sitecustomize overrides JAX_PLATFORMS — latte_tpu honors
    # LATTE_TPU_PLATFORM through jax.config instead)
    env["LATTE_TPU_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["LATTE_TPU_METRIC_ARGS"] = "--max_real 4 --max_fake 8"
    env.pop("LATTE_TPU_DETECTORS", None)  # exercise the stand-in fallback
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    cmd = [
        "bash",
        "scripts/real_eval.sh",
        "ffs",
        str(ckpt),
        str(real),
        str(out),
        "fvd2048_16f",
        "8",
    ] + [f"{k}={v}" for k, v in SMOKE_OVERRIDES.items()]
    proc = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=1500
    )
    tail = (proc.stdout + "\n" + proc.stderr)[-4000:]
    assert proc.returncode == 0, tail

    # stage 1: 8 decoded mp4s with the reference's interleaved naming
    vids = sorted(os.listdir(out / "videos"))
    assert vids == [f"{i:04d}.mp4" for i in range(8)], vids

    # stage 2: one frame folder per video, 16 jpg frames each
    fake_frames = out / "fake_frames"
    dirs = sorted(os.listdir(fake_frames))
    assert len(dirs) == 8, dirs
    frames = os.listdir(fake_frames / dirs[0])
    assert len(frames) == 16, frames

    # real side was already frame folders: must be consumed as-is
    assert not (out / "real_frames").exists()

    # stage 3: metric report JSONL with a finite FVD from the stand-in
    report_dir = out / "metrics"
    jsonls = [f for f in os.listdir(report_dir) if f.endswith(".jsonl")]
    assert jsonls, os.listdir(report_dir)
    rows = [
        json.loads(line)
        for f in jsonls
        for line in open(report_dir / f)
        if line.strip()
    ]
    fvd_rows = [r for r in rows if "fvd2048_16f" in json.dumps(r)]
    assert fvd_rows, rows
    blob = json.dumps(fvd_rows[-1])
    assert "nan" not in blob.lower(), blob
    # the stand-in warning must have fired (protocol-only numbers)
    assert "stand-in" in proc.stderr or "standin" in tail, tail
