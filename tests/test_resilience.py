"""Failure detection / elastic recovery (engine/resilience.py).

The contract under test: a run that dies mid-flight — injected faults or
hung drains — and recovers through checkpoints produces a CSV
*bitwise-identical* to an uninterrupted run (counter-based RNG makes the
resumed sequence exactly the one the crash interrupted).  The reference
had no recovery at all: HANDLE_ERROR aborted and the PBS walltime was
the only watchdog (SURVEY §5).
"""

import time

import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu.engine import resilience
from mri_nanoparticle_simulation_tpu.engine.sim import SimulationRunner
from mri_nanoparticle_simulation_tpu.io import writer as writer_mod


def tiny_params(**kw):
    # 2000 steps at sprint_steps=200 -> 10 sprints, pfreq=100 windows
    base = dict(sprint_steps=200)
    base.update(kw)
    return P.small_test_params(**base)


def make_factory(p):
    def make_runner():
        return SimulationRunner(p, scene_seed=3, seed=4, engine="scan")
    return make_runner


def read_lines(path):
    with open(path) as f:
        return f.readlines()


class TestWatchdog:
    def test_passes_result_through(self):
        assert resilience.watchdog_call(lambda: 41 + 1, 5.0) == 42

    def test_times_out(self):
        with pytest.raises(resilience.WatchdogTimeout, match="deadline"):
            resilience.watchdog_call(lambda: time.sleep(2.0), 0.1)

    def test_propagates_exceptions(self):
        def boom():
            raise ValueError("inner")
        with pytest.raises(ValueError, match="inner"):
            resilience.watchdog_call(boom, 5.0)


class TestFaultInjector:
    def test_fires_then_clears(self):
        inj = resilience.FaultInjector({2: 1})
        inj(0)
        inj(1)
        with pytest.raises(RuntimeError, match="sprint 2"):
            inj(2)
        inj(2)  # budget spent: the transient fault does not recur
        assert inj.faults_fired == 1


class TestTruncateRows:
    def test_trims_overhang(self, tmp_path):
        path = str(tmp_path / "t.csv")
        with open(path, "w") as f:
            f.writelines(f"{i},{i}\n" for i in range(10))
        assert writer_mod.truncate_rows(path, 7) == 3
        assert len(read_lines(path)) == 7

    def test_noop_when_short_or_missing(self, tmp_path):
        path = str(tmp_path / "t.csv")
        assert writer_mod.truncate_rows(path, 5) == 0
        with open(path, "w") as f:
            f.write("a\nb\n")
        assert writer_mod.truncate_rows(path, 5) == 0
        assert len(read_lines(path)) == 2


class TestElasticRecovery:
    def test_recovered_csv_bitwise_equals_uninterrupted(self, tmp_path):
        p = tiny_params()
        base_csv = str(tmp_path / "base.csv")
        SimulationRunner(p, scene_seed=3, seed=4, engine="scan").run(
            csv_path=base_csv, progress=False)

        rec_csv = str(tmp_path / "rec.csv")
        inj = resilience.FaultInjector({3: 1, 7: 1})
        _, cos, _, stats = resilience.run_resilient(
            make_factory(p), csv_path=rec_csv,
            checkpoint_path=str(tmp_path / "ck.npz"),
            checkpoint_every_sprints=2, drain_depth=1,
            max_retries=3, fault_hook=inj, progress=False)
        assert inj.faults_fired == 2
        assert stats["recovery_attempts"] == 2
        assert read_lines(rec_csv) == read_lines(base_csv)
        # the re-read curve matches the file
        t, c = writer_mod.read_t2_csv(rec_csv)
        np.testing.assert_array_equal(cos, c)

    def test_csv_overhang_past_checkpoint_is_not_duplicated(self, tmp_path):
        # drain_depth=1 flushes every sprint but checkpoints only every
        # 4: the fault at sprint 6 leaves 6 sprints of rows on disk with
        # a checkpoint at sprint 4 — the 2-sprint overhang must be
        # re-produced, not appended twice
        p = tiny_params()
        base_csv = str(tmp_path / "base.csv")
        SimulationRunner(p, scene_seed=3, seed=4, engine="scan").run(
            csv_path=base_csv, progress=False)

        rec_csv = str(tmp_path / "rec.csv")
        _, _, _, stats = resilience.run_resilient(
            make_factory(p), csv_path=rec_csv,
            checkpoint_path=str(tmp_path / "ck.npz"),
            checkpoint_every_sprints=4, drain_depth=1,
            max_retries=1, fault_hook=resilience.FaultInjector({6: 1}),
            progress=False)
        assert stats["recovery_attempts"] == 1
        lines = read_lines(rec_csv)
        assert lines == read_lines(base_csv)
        times = np.array([float(l.split(",")[0]) for l in lines])
        assert np.all(np.diff(times) > 0)   # no duplicated windows

    def test_first_attempt_resume_returns_full_curve(self, tmp_path):
        """Process-death shape: run_resilient called FRESH with a
        checkpoint already on disk (attempt 1 resumes, no in-process
        failure ever happens).  The returned arrays must still cover
        the whole run, not just the resumed tail."""
        p = tiny_params()
        base_csv = str(tmp_path / "base.csv")
        SimulationRunner(p, scene_seed=3, seed=4, engine="scan").run(
            csv_path=base_csv, progress=False)

        rec_csv = str(tmp_path / "rec.csv")
        ck = str(tmp_path / "ck.npz")
        resilience.run_resilient(
            make_factory(p), csv_path=rec_csv, checkpoint_path=ck,
            checkpoint_every_sprints=1, drain_depth=1, max_retries=1,
            progress=False, max_steps=p.t // 2)      # "process dies" here
        times, cos, _, stats = resilience.run_resilient(
            make_factory(p), csv_path=rec_csv, checkpoint_path=ck,
            checkpoint_every_sprints=1, drain_depth=1, max_retries=1,
            progress=False)
        assert stats["recovery_attempts"] == 0
        assert read_lines(rec_csv) == read_lines(base_csv)
        t_base, c_base = writer_mod.read_t2_csv(base_csv)
        np.testing.assert_array_equal(times, t_base)   # FULL axis
        np.testing.assert_array_equal(cos, c_base)

    def test_failure_before_any_checkpoint_restarts_clean(self, tmp_path):
        p = tiny_params()
        base_csv = str(tmp_path / "base.csv")
        SimulationRunner(p, scene_seed=3, seed=4, engine="scan").run(
            csv_path=base_csv, progress=False)

        rec_csv = str(tmp_path / "rec.csv")
        _, _, _, stats = resilience.run_resilient(
            make_factory(p), csv_path=rec_csv,
            checkpoint_path=str(tmp_path / "ck.npz"),
            checkpoint_every_sprints=2, drain_depth=1,
            max_retries=1, fault_hook=resilience.FaultInjector({0: 1}),
            progress=False)
        assert stats["recovery_attempts"] == 1
        assert read_lines(rec_csv) == read_lines(base_csv)

    def test_gives_up_after_retries_without_progress(self, tmp_path):
        p = tiny_params()
        calls = []

        def counting_factory():
            calls.append(1)
            return SimulationRunner(p, scene_seed=3, seed=4,
                                    engine="scan")

        with pytest.raises(RuntimeError, match="injected fault"):
            resilience.run_resilient(
                counting_factory, csv_path=str(tmp_path / "r.csv"),
                checkpoint_path=str(tmp_path / "ck.npz"),
                checkpoint_every_sprints=1, max_retries=2,
                fault_hook=resilience.FaultInjector({0: 99}),
                progress=False)
        # initial attempt + max_retries retries, then give up
        assert len(calls) == 3

    def test_progress_refills_retry_budget(self, tmp_path):
        # three transient faults with progress between them survive a
        # max_retries=1 budget because each recovery advanced the
        # checkpoint — the budget bounds consecutive stuck failures,
        # not total faults over a long run
        p = tiny_params()
        _, _, _, stats = resilience.run_resilient(
            make_factory(p), csv_path=str(tmp_path / "r.csv"),
            checkpoint_path=str(tmp_path / "ck.npz"),
            checkpoint_every_sprints=1, drain_depth=1, max_retries=1,
            fault_hook=resilience.FaultInjector({2: 1, 4: 1, 6: 1}),
            progress=False)
        assert stats["recovery_attempts"] == 3
        assert stats["steps"] == p.t

    def test_requires_checkpointing(self):
        with pytest.raises(ValueError, match="csv_path"):
            resilience.run_resilient(lambda: None, None,
                                     checkpoint_path="x")
        with pytest.raises(ValueError, match="checkpoint_path"):
            resilience.run_resilient(lambda: None, "out.csv",
                                     max_retries=1)
        with pytest.raises(ValueError, match="checkpoint_every"):
            resilience.run_resilient(lambda: None, "out.csv",
                                     checkpoint_path="x",
                                     checkpoint_every_sprints=0)

    def test_torn_checkpoint_restarts_clean(self, tmp_path):
        """A corrupt checkpoint file (pre-atomic-rename crash, disk
        damage) is skipped with a warning: the attempt restarts from
        scratch instead of wedging recovery forever."""
        p = tiny_params()
        base_csv = str(tmp_path / "base.csv")
        SimulationRunner(p, scene_seed=3, seed=4, engine="scan").run(
            csv_path=base_csv, progress=False)

        ck = str(tmp_path / "ck.npz")
        with open(ck, "wb") as f:
            f.write(b"PK\x03\x04 definitely not a checkpoint")
        rec_csv = str(tmp_path / "rec.csv")
        _, _, _, stats = resilience.run_resilient(
            make_factory(p), csv_path=rec_csv, checkpoint_path=ck,
            checkpoint_every_sprints=2, drain_depth=1, max_retries=0,
            progress=False)
        assert stats["recovery_attempts"] == 0
        assert read_lines(rec_csv) == read_lines(base_csv)
        # the run overwrote the torn file with a real checkpoint
        import numpy as _np
        assert int(_np.load(ck)["step"]) == p.t

    def test_failure_during_rebuild_consumes_budget(self, tmp_path):
        """Failures while constructing the fresh runner (recompile
        against a sick runtime) sit inside the recovery boundary."""
        p = tiny_params()
        state = {"built": 0}

        def flaky_factory():
            state["built"] += 1
            if state["built"] == 2:     # second build (first retry) dies
                raise RuntimeError("runtime still recovering")
            return SimulationRunner(p, scene_seed=3, seed=4,
                                    engine="scan")

        _, _, _, stats = resilience.run_resilient(
            flaky_factory, csv_path=str(tmp_path / "r.csv"),
            checkpoint_path=str(tmp_path / "ck.npz"),
            checkpoint_every_sprints=2, drain_depth=1, max_retries=2,
            fault_hook=resilience.FaultInjector({3: 1}),
            progress=False)
        assert state["built"] == 3
        assert stats["recovery_attempts"] == 2
        assert stats["steps"] == p.t

    def test_recovered_sin_is_nan_without_quadrature(self, tmp_path):
        """quadrature=False CSVs carry no sum-sin; after a recovery the
        returned sin must be loudly absent (NaN), never silent zeros."""
        p = tiny_params()
        _, _, sin, stats = resilience.run_resilient(
            make_factory(p), csv_path=str(tmp_path / "r.csv"),
            checkpoint_path=str(tmp_path / "ck.npz"),
            checkpoint_every_sprints=2, drain_depth=1, max_retries=1,
            fault_hook=resilience.FaultInjector({5: 1}),
            progress=False)
        assert stats["recovery_attempts"] == 1
        assert np.all(np.isnan(sin))

    def test_quadrature_sin_survives_recovery(self, tmp_path):
        p = tiny_params()
        base_csv = str(tmp_path / "base.csv")
        SimulationRunner(p, scene_seed=3, seed=4, engine="scan").run(
            csv_path=base_csv, quadrature=True, progress=False)
        rec_csv = str(tmp_path / "rec.csv")
        _, _, sin, stats = resilience.run_resilient(
            make_factory(p), csv_path=rec_csv, quadrature=True,
            checkpoint_path=str(tmp_path / "ck.npz"),
            checkpoint_every_sprints=2, drain_depth=1, max_retries=1,
            fault_hook=resilience.FaultInjector({5: 1}),
            progress=False)
        assert stats["recovery_attempts"] == 1
        assert read_lines(rec_csv) == read_lines(base_csv)
        assert np.all(np.isfinite(sin))

    def test_config_errors_are_fatal_not_retried(self, tmp_path):
        """A params-fingerprint mismatch (ValueError) must not burn the
        retry budget pretending to be a transient fault."""
        p = tiny_params()
        ck = str(tmp_path / "ck.npz")
        # write a checkpoint under DIFFERENT params
        other = tiny_params(num_water=128)
        SimulationRunner(other, scene_seed=3, seed=4, engine="scan").run(
            checkpoint_path=ck, progress=False)
        calls = []

        def factory():
            calls.append(1)
            return SimulationRunner(p, scene_seed=3, seed=4,
                                    engine="scan")

        with pytest.raises(ValueError, match="different parameters"):
            resilience.run_resilient(
                factory, csv_path=str(tmp_path / "r.csv"),
                checkpoint_path=ck, checkpoint_every_sprints=1,
                max_retries=5, progress=False)
        assert len(calls) == 1          # no retry loop on config errors

    def test_hung_drain_detected_and_recovered(self, tmp_path):
        # first attempt's runner hangs on its first drain; the watchdog
        # turns the hang into a failure and the rebuilt runner finishes
        p = tiny_params()
        base_csv = str(tmp_path / "base.csv")
        SimulationRunner(p, scene_seed=3, seed=4, engine="scan").run(
            csv_path=base_csv, progress=False)

        built = []

        def factory():
            r = SimulationRunner(p, scene_seed=3, seed=4, engine="scan")
            if not built:
                orig = r._fetch_pending
                r._fetch_pending = \
                    lambda pending: (time.sleep(3.0), orig(pending))[1]
            built.append(r)
            return r

        rec_csv = str(tmp_path / "rec.csv")
        _, _, _, stats = resilience.run_resilient(
            factory, csv_path=rec_csv,
            checkpoint_path=str(tmp_path / "ck.npz"),
            checkpoint_every_sprints=2, drain_depth=1, max_retries=1,
            drain_timeout_s=0.5, progress=False)
        assert stats["recovery_attempts"] == 1
        assert len(built) == 2
        assert read_lines(rec_csv) == read_lines(base_csv)


class TestCliValidation:
    def test_max_retries_requires_checkpoint(self):
        from mri_nanoparticle_simulation_tpu.engine import sim
        with pytest.raises(SystemExit):
            sim.main(["--max-retries", "2", "--num-water", "64"])

    def test_cli_resume_trims_overhang(self, tmp_path):
        """Manual --resume after a crash must trim rows written past the
        checkpoint before appending (same contract as run_resilient)."""
        from mri_nanoparticle_simulation_tpu.engine import sim
        csv = str(tmp_path / "t2.csv")
        ck = str(tmp_path / "ck.npz")
        args = ["--num-water", "64", "--num-cells", "8",
                "--totaltime", "0.002", "--taucp", "0.001",
                "--sprint-steps", "1000", "--chunk-steps", "100",
                "--engine", "scan", "--out", csv]
        assert sim.main(args + ["--checkpoint", ck,
                                "--checkpoint-every", "1"]) == 0
        lines = read_lines(csv)
        assert len(lines) == 2          # 2000 steps / pfreq 1000
        with open(csv, "a") as f:       # fake a crash-overhang row
            f.write("9.9,123\n")
        assert sim.main(args + ["--resume", ck]) == 0
        assert read_lines(csv) == lines # overhang trimmed, nothing dup'd

    def test_resume_requires_out(self):
        """--resume without --out would write the resumed rows to a NEW
        timestamped file and leave the original CSV's overhang."""
        from mri_nanoparticle_simulation_tpu.engine import sim
        with pytest.raises(SystemExit):
            sim.main(["--resume", "ck.npz", "--num-water", "64"])

    def test_max_retries_requires_out(self):
        from mri_nanoparticle_simulation_tpu.engine import sim
        with pytest.raises(SystemExit):
            sim.main(["--max-retries", "2", "--checkpoint", "c.npz",
                      "--checkpoint-every", "1", "--num-water", "64"])


class TestAtomicCheckpoint:
    def test_no_temp_leftovers_and_roundtrip(self, tmp_path):
        from mri_nanoparticle_simulation_tpu.io import checkpoint as ck
        from mri_nanoparticle_simulation_tpu.engine.reference_engine \
            import WalkerState
        import jax.numpy as jnp
        p = tiny_params()
        st = WalkerState(pos=jnp.zeros((4, 3)), in_cell=jnp.zeros(4, bool),
                         phase=jnp.zeros(4), phase_comp=jnp.zeros(4),
                         step=jnp.uint32(7), escapes=jnp.int32(0),
                         coverage=jnp.int32(0))
        path = str(tmp_path / "c.npz")
        ck.save_checkpoint(path, st, p, 1, 2, engine="scan",
                           rng_impl="threefry")
        st2, seed, ss = ck.load_checkpoint(path, p, engine="scan",
                                           rng_impl="threefry")
        assert int(np.asarray(st2.step)) == 7 and (seed, ss) == (1, 2)
        import os
        leftovers = [f for f in os.listdir(tmp_path)
                     if f.endswith(".tmp")]
        assert leftovers == []
