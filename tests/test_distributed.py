"""Multi-host (2-process) execution over the jax.distributed runtime.

SURVEY §5's DCN story, verified without multi-host hardware: two OS
processes, each with 4 virtual CPU devices, join one jax.distributed
world (coordinator on localhost) and run the walker-sharded engine over
the 8-device GLOBAL mesh.  Each process asserts its local state shards
are bitwise-identical to the single-device run — the same contract the
single-process dryrun proves, now across a real process boundary with
real cross-process collectives.

The dry run is split into independently-runnable PATHS (run / ensemble /
record / plane / grid, parallel/distributed.py _DRY_PATHS) so a failure
triages to one subsystem; each test here spins its own 2-process world
for exactly one path.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_world(path: str):
    """Spawn a 2x4-device world running ONE dry-run path; returns the
    per-process outputs (asserting success)."""
    port = _free_port()
    env = dict(os.environ)
    # children pick their own platform/flags; scrub this process's
    # CPU-mesh settings so they don't collide
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, "-m",
             "mri_nanoparticle_simulation_tpu.parallel.distributed",
             "--num-processes", "2", "--process-id", str(i),
             "--coordinator", f"localhost:{port}",
             "--devices-per-process", "4", "--path", path],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"process {i} failed (path={path}):\n{out[-3000:]}"
        assert "multihost dryrun OK" in out
        assert "global devices: 8" in out
    return outs


@pytest.mark.slow
@pytest.mark.parametrize("path", ["run", "ensemble", "record", "plane",
                                  "grid"])
def test_two_process_path(path):
    """Each dry-run path across a real 2-process world: run (walker
    shards bitwise), ensemble (trial partition + pod layout), record
    (decomposition gather), plane (on-device folds + echo), grid
    (paired launch-scalar surface)."""
    outs = _run_world(path)
    assert f"paths [{path}]" in outs[0]
