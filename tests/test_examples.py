"""The examples/ scripts stay runnable.

Each example is a user-facing artifact; a bit-rotted example is worse
than none (the reference's two test drivers rotted exactly this way,
SURVEY §4).  The two fastest scripts run end-to-end in subprocesses
(forced to CPU); all four are at least compiled.
"""

import os
import pathlib
import subprocess
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def _run(name, timeout=540):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(EXAMPLES.parent) + os.pathsep + \
        env.get("PYTHONPATH", "")
    # a fresh cwd so example outputs (CSVs, PNGs, stores) never land in
    # the repo
    return subprocess.run([sys.executable, "-u", str(EXAMPLES / name)],
                          capture_output=True, text=True, env=env,
                          cwd=os.environ.get("TMPDIR", "/tmp"),
                          timeout=timeout)


def test_all_examples_compile():
    import py_compile
    scripts = sorted(EXAMPLES.glob("*.py"))
    assert len(scripts) >= 5
    for s in scripts:
        py_compile.compile(str(s), doraise=True)


def test_quickstart_runs(tmp_path):
    env_tmp = os.environ.get("TMPDIR")
    os.environ["TMPDIR"] = str(tmp_path)
    try:
        r = _run("01_quickstart.py")
    finally:
        if env_tmp is None:
            os.environ.pop("TMPDIR", None)
        else:
            os.environ["TMPDIR"] = env_tmp
    assert r.returncode == 0, r.stdout + r.stderr
    assert "T2 =" in r.stdout
    assert (tmp_path / "quickstart.csv").exists()


def test_inverse_spectra_example_runs(tmp_path):
    env_tmp = os.environ.get("TMPDIR")
    os.environ["TMPDIR"] = str(tmp_path)
    try:
        r = _run("05_inverse_and_spectra.py")
    finally:
        if env_tmp is None:
            os.environ.pop("TMPDIR", None)
        else:
            os.environ["TMPDIR"] = env_tmp
    assert r.returncode == 0, r.stdout + r.stderr
    assert "inverse + spectrum example OK" in r.stdout


def test_sharding_example_runs(tmp_path):
    env_tmp = os.environ.get("TMPDIR")
    os.environ["TMPDIR"] = str(tmp_path)
    try:
        r = _run("04_sharding_and_ensembles.py")
    finally:
        if env_tmp is None:
            os.environ.pop("TMPDIR", None)
        else:
            os.environ["TMPDIR"] = env_tmp
    assert r.returncode == 0, r.stdout + r.stderr
    assert "bitwise-equal to 1 device: True" in r.stdout
    assert "matches the trial-parallel curves: True" in r.stdout
