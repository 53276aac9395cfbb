"""Two-process jax.distributed test for the multi-host helpers.

Round-2 only exercised parallel/multihost.py single-process; here TWO real
processes connect through ``jax.distributed.initialize`` on CPU (2 forced
local devices each -> a 4-device global mesh), each contributes its LOCAL
half of a global batch via ``global_batch_from_local``, and a jitted
mesh-sharded reduction must see the full global data on both hosts.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]

WORKER = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon first

port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]

from audio_training_tpu.parallel.multihost import (
    global_batch_from_local,
    initialize_distributed,
    process_shard,
)

ok = initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert ok, "expected a multi-process runtime"
assert jax.process_count() == 2
assert len(jax.devices()) == 4  # 2 local x 2 processes

import jax.numpy as jnp
import numpy as np
from audio_training_tpu.parallel import make_mesh

mesh = make_mesh(num_data=4)
# global batch 8: host 0 holds rows 0..3, host 1 rows 4..7
local = np.arange(4 * 3, dtype=np.float32).reshape(4, 3) + 12 * pid
garr = global_batch_from_local(mesh, local)
assert garr.shape == (8, 3)

@jax.jit
def total(x):
    return x.sum()

value = float(total(garr))
expected = float(np.arange(12).sum() + (np.arange(12) + 12).sum())

shard0 = process_shard(list(range(10)), 0, 2)
shard1 = process_shard(list(range(10)), 1, 2)
assert sorted(shard0 + shard1) == list(range(10))
assert not set(shard0) & set(shard1)

with open(out_path, "w") as f:
    json.dump({"pid": pid, "value": value, "expected": expected}, f)
"""


def _spawn_workers(tmp_path, port):
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"out{pid}.json"
        out.unlink(missing_ok=True)
        outs.append(out)
        env = {
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "HOME": "/root",
            "PYTHONPATH": f"{REPO}",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "JAX_PLATFORMS": "cpu",
        }
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER, str(port), str(pid), str(out)],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        ))
    errors = []
    for p in procs:
        try:
            _, stderr = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            return None, ["worker timed out"]
        if p.returncode != 0:
            errors.append(stderr.decode()[-2000:])
    if errors:
        return None, errors
    return [json.loads(o.read_text()) for o in outs], []


@pytest.mark.slow
def test_two_process_distributed_mesh(tmp_path):
    # the port can be sniped between discovery and the coordinator's bind —
    # retry once on a fresh port rather than flake
    errors = []
    for _attempt in range(2):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        results, errors = _spawn_workers(tmp_path, port)
        if results is not None:
            break
    else:
        pytest.fail("distributed workers failed twice: "
                    + " | ".join(errors))
    for r in results:
        # every host computed the sum over the FULL global batch
        assert r["value"] == r["expected"], r
