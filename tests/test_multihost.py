"""Multi-host (2-process) distributed execution — the GSP instance
all_to_all crossing a real process boundary over the CPU collective
backend (VERDICT r2 #4: exercise jax.distributed with >1 process).

Each worker (scripts/multihost_worker.py) joins the group, builds the
global mesh over both processes' devices, runs the Gaussian-sharded
render, and checks its addressable row bands against a locally-computed
replicated reference."""
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize("dp", [1, 2])
def test_two_process_gsp_render_exact(dp):
    """dp=2 additionally spans the dp grad-psum across the two processes
    (2x4 devices → a (2, 4) ('dp','gs') mesh with one process per two
    dp-row halves)."""
    port = _free_port()
    env = dict(os.environ)
    env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(ROOT, "scripts",
                                          "multihost_worker.py"),
             "--coordinator", f"localhost:{port}",
             "--nproc", "2", "--pid", str(pid), "--train",
             "--dp", str(dp)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=ROOT)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    import re
    losses = []
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK pid={pid} procs=2" in out, out
        m = re.search(rf"MULTIHOST_TRAIN_OK pid={pid} loss=([0-9.einf+-]+)",
                      out)
        assert m, out
        losses.append(float(m.group(1)))
    # the replicated loss must be identical on both processes
    assert losses[0] == losses[1], losses
