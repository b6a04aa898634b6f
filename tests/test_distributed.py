"""Two-process ``jax.distributed`` test on localhost CPU.

The closest testable proxy for the multi-host scaling path (SURVEY.md §4:
real multi-chip hardware is unavailable here): two OS processes, four
virtual CPU devices each, one process-spanning 8-device ``time`` mesh.
Exercises ``parallel.mesh.init_distributed``, global-array assembly from
process-local slices, and the RX chain's halo exchange across the process
boundary — asserting bit agreement with the float64 reference in both
processes (see distributed_worker.py).
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

_WORKER = Path(__file__).parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_rx_chain():
    # bounded by the workers' communicate(timeout=240) below
    port = _free_port()
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    # the worker is a fresh interpreter whose sys.path has only the script
    # dir — make the package importable even when it isn't pip-installed
    repo_root = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (repo_root, env.get("PYTHONPATH")) if p
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "verified OK" in out, f"process {i} output:\n{out}"
