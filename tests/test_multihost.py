"""Real multi-process (multi-host) integration test.

Spawns two Python processes that form a 2-process jax.distributed cluster
(2 virtual CPU devices each → a 4-device data mesh spanning both), runs a
short Trainer fit through the process-local global-batch assembly path
(make_array_from_process_local_data), multi-host sample grids, image
summaries and evaluate(). This is the closest a single machine gets to a TPU
pod's multi-host topology (SURVEY.md §5.8).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.skipif((os.cpu_count() or 1) < 4,
                    reason="two concurrent JAX processes compiling on <4 "
                           "cores cannot meet Gloo's 30s collective "
                           "rendezvous; run on a multi-core host")
def test_two_process_training(tmp_path):
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))
    procs = [
        subprocess.Popen([sys.executable, worker, str(port), str(i), str(tmp_path)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{i} failed:\n{out[-3000:]}"
    combined = "\n".join(outs)
    assert "MH-RESULT n_batches=5" in combined, combined[-2000:]
    assert "proc0 done" in combined and "proc1 done" in combined
