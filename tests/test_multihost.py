"""2-process multi-host path: jax.distributed.initialize + cross-process
host_local_batch + one DP train step over a mesh whose data axis spans the
processes (VERDICT r4 #4 — these are exactly the calls that break in
practice and had zero coverage). Runs two fresh python processes on
localhost; CPU collectives ride Gloo."""
import os
import re
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
             str(pid), str(port)],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    # Both processes must compute the SAME loss and end with identical
    # replicated params (the psum makes them equal by construction).
    vals = []
    for out in outs:
        m = re.search(r"MHOK pid=\d+ loss=([\d.eE+-]+) possum=([\d.eE+-]+)",
                      out)
        assert m, f"missing MHOK line:\n{out[-4000:]}"
        vals.append((float(m.group(1)), float(m.group(2))))
    assert vals[0] == vals[1], vals
