"""2-process multi-host integration test (gloo CPU collectives).

Spawns two real processes, each with 2 virtual CPU devices, connected via
jax.distributed over localhost — the CPU rehearsal of a 2-host TPU job
(SURVEY.md §5 'distributed communication backend').  Both processes must
compute the identical global loss from host-sharded data.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNNER = os.path.join(REPO, "tests", "multihost_runner.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_train_step():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)

    procs = [
        subprocess.Popen(
            [sys.executable, RUNNER, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"proc failed:\nstdout={out}\nstderr={err}"
        outs.append(out)

    losses, coords = [], []
    for out in outs:
        loss = [l for l in out.splitlines() if l.startswith("MULTIHOST_LOSS=")]
        coord = [l for l in out.splitlines() if l.startswith("MULTIHOST_COORD=")]
        assert loss and coord, out
        losses.append(float(loss[0].split("=")[1]))
        coords.append(int(coord[0].split("=")[1]))
    # identical global loss on every process; exactly one coordinator
    assert abs(losses[0] - losses[1]) < 1e-6, losses
    assert sorted(coords) == [0, 1], coords
