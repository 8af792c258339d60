"""Multi-host launch path: a REAL 2-process `jax.distributed` integration
test of the train CLI (VERDICT r3 item 8).

The reference launches multi-node training via SLURM + torchrun
(`/root/reference/slurm_scripts/ffs.slurm:16`, `utils.py:216-249`). Our
equivalent is `latte_tpu.dist.mesh.initialize_distributed` +
`scripts/launch_multihost.sh`; until now it had never been executed with
process_count > 1 anywhere in the suite. Here two OS processes (each
contributing 2 virtual CPU devices -> a 4-device dp mesh) rendezvous over a
local coordinator and run real train steps through `train.main`:

- `initialize_distributed` wiring from the config keys
- per-process batch loading (host_batch = global/process_count) assembled
  by `shard_batch`'s `make_array_from_process_local_data` path
- rank-0-only experiment dir creation + the non-zero rank's dir join
- rank-0-only logging; collective orbax checkpoint save
- bit-identical final loss across processes
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

DRIVER = r"""
import json, os, sys
xf = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xf:
    os.environ["XLA_FLAGS"] = (xf + " --xla_force_host_platform_device_count=2").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

pid = int(sys.argv[1]); port = sys.argv[2]; results = sys.argv[3]

from latte_tpu.config import Config
import latte_tpu.train.train as train_mod

cfg = Config({
    "coordinator_address": f"127.0.0.1:{port}",
    "num_processes": 2,
    "process_id": pid,
    "results_dir": results,
    "model": "Latte-S/2",
    # shrink below S: two concurrent S-size compiles on one CPU stagger the
    # processes' first collective past Gloo's 30s connect timeout
    "model_overrides": {"hidden_size": 32, "depth": 2, "num_heads": 2},
    "image_size": 32,
    "latent_size": 8,
    "num_frames": 2,
    "extras": 1,
    "attention_mode": "xla",
    "local_batch_size": 1,      # x dp=4 -> global 4, 2 rows per process
    "max_train_steps": 2,
    "log_every": 1,
    "ckpt_every": 2,
    "async_checkpoint": False,
    "global_seed": 0,
})
out = train_mod.main(cfg)
assert jax.process_count() == 2, jax.process_count()
# device count = 2 processes x whatever host_platform_device_count the
# ambient XLA_FLAGS carries (2 standalone, 8 under the pytest conftest)
assert jax.device_count() == 2 * jax.local_device_count(), (
    jax.device_count(), jax.local_device_count())
print("RESULT " + json.dumps({
    "pid": pid,
    "loss": out["loss"],
    "experiment_dir": out["experiment_dir"],
    "final_step": out["final_step"],
}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train(tmp_path):
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    results = tmp_path / "results"
    port = _free_port()

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # driver forces cpu via jax.config
    env["PYTHONPATH"] = (
        "/root/repo" + os.pathsep + env.get("PYTHONPATH", "")
    )

    procs = [
        subprocess.Popen(
            [sys.executable, str(driver), str(i), str(port), str(results)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-4000:]}"

    results_by_pid = {}
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert line, out[-2000:]
        r = json.loads(line[-1][len("RESULT "):])
        results_by_pid[r["pid"]] = r

    # identical global computation on both processes
    assert set(results_by_pid) == {0, 1}
    l0, l1 = results_by_pid[0]["loss"], results_by_pid[1]["loss"]
    assert np.isfinite(l0) and l0 == l1, (l0, l1)
    assert results_by_pid[0]["experiment_dir"] == results_by_pid[1]["experiment_dir"]

    exp = results_by_pid[0]["experiment_dir"]
    # exactly one experiment dir: rank 0 created it, rank 1 joined it
    assert len(os.listdir(results)) == 1
    # rank-0-only log; the checkpoint save is collective and must exist
    assert os.path.exists(os.path.join(exp, "log.txt"))
    log = open(os.path.join(exp, "log.txt")).read()
    assert "step 2: loss=" in log
    ckpts = os.listdir(os.path.join(exp, "checkpoints"))
    assert ckpts, "no checkpoint written"


def test_loader_index_sharding_disjoint_and_complete(tmp_path):
    """DistributedSampler-style splitting: 2 shards cover the dataset with
    no overlap and interleaved indices (`latte_tpu/data/loader.py`)."""
    from latte_tpu.data.loader import DataLoader

    class Toy:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return {"video": np.full((2, 3, 8, 8), i, np.float32), "idx": i}

    seen = {}
    for shard in (0, 1):
        loader = DataLoader(
            Toy(), batch_size=2, num_workers=0, seed=0,
            shard_id=shard, num_shards=2, pixel_uint8=False,
        )
        it = iter(loader)
        ids = []
        for _ in range(2):  # 2 batches x 2 rows = 4 rows of this shard's 5
            b = next(it)
            ids.extend(int(v) for v in np.asarray(b["idx"]).ravel())
        seen[shard] = ids
    assert not (set(seen[0]) & set(seen[1])), seen
    # same-seed epoch order is shared, shards interleave it
    assert len(seen[0]) == len(seen[1]) == 4
