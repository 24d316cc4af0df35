"""Real multi-process collectives: 2 `jax.distributed` processes x 4
virtual CPU devices run the sharded window pipeline and the distributed
Schur PGO over one 8-device global mesh (SURVEY.md §2.4/§5 — the
cross-host/DCN path a single-process mesh cannot prove).

The worker lives in mp_worker.py; this launcher spawns both ranks,
streams their output, and asserts each printed MP_OK.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh():
    worker = Path(__file__).parent / "mp_worker.py"
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env["JAX_PLATFORMS"] = "cpu"
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(rank), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=repo)
        for rank in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)  # ~120 s observed; 2x headroom
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n"
                    + "\n---\n".join(outs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert "MP_OK" in out, f"rank {rank} no MP_OK:\n{out}"
