"""Disk-backed decomposition records (io/record.py) and the durable
resumable run on top (decompose.run_decomposition_durable).

Contracts pinned here:
* the store's commit discipline (rows land before meta; truncation drops
  the overhang) and its consumer-protocol equivalence with the in-RAM
  record,
* the durable run is bitwise-identical to run_decomposition for BOTH
  engines,
* a crash + re-run resumes from the checkpoint, trims the record
  overhang, and still ends bitwise-identical to an uninterrupted run —
  the record analogue of tests/test_resilience.py,
* every record consumer (record_params / reconstruct_record /
  bootstrap_t2_record / inverse.fit_from_record / the CLIs) accepts the
  store directory wherever it accepts a --dump-record .npz.
"""

import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu.engine import decompose as dec
from mri_nanoparticle_simulation_tpu.engine.resilience import FaultInjector
from mri_nanoparticle_simulation_tpu.io import record as record_mod
from mri_nanoparticle_simulation_tpu.params import small_test_params
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox


@pytest.fixture(scope="module")
def setup():
    # 6 sprints x 5 windows: enough sprint boundaries for mid-run
    # faults, checkpoints and record overhangs.  The moment is boosted
    # (as in test_sim_io's decomposition tests) so curves visibly
    # dephase within the short run and scale fits are well-conditioned.
    p = small_test_params(num_water=64, mmoment=3.5e-13,
                          avoid_intracellular_throw=False,
                          sprint_steps=500, totaltime=0.003)
    return p, BacteriaBox(p, seed=3).populate()


class TestRecordStore:
    def test_create_append_read(self, tmp_path):
        d = str(tmp_path / "rec")
        st = record_mod.RecordStore.create(d, 6, 8, {"tau": 1e-6,
                                                     "pfreq": 100})
        assert st.rows == 0 and not st.complete
        a = np.arange(24, dtype=np.float32).reshape(3, 8)
        st.append(a, 2 * a)
        st.append(a + 100, a - 100)
        assert st.rows == 6
        st.finalize({"stats": {"escapes": 0}})
        rd = record_mod.RecordStore.open(d)
        assert rd.complete and rd.meta["stats"] == {"escapes": 0}
        A, B = rd.arrays()
        np.testing.assert_array_equal(A[:3], a)
        np.testing.assert_array_equal(B[3:], a - 100)
        assert rd.times_ms().shape == (6,)

    def test_commit_discipline_and_truncate(self, tmp_path):
        d = str(tmp_path / "rec")
        st = record_mod.RecordStore.create(d, 10, 4)
        blk = np.ones((5, 4), np.float32)
        st.append(blk, blk)
        # torn write simulation: data in the memmap but meta not yet
        # rewritten is invisible to a fresh reader
        mm = np.load(str(tmp_path / "rec" / "A.npy"), mmap_mode="r+")
        mm[5:10] = 7.0
        mm.flush()
        rd = record_mod.RecordStore.open(d)
        assert rd.rows == 5
        A, _ = rd.arrays()
        assert A.shape == (5, 4)
        # overhang trim
        st2 = record_mod.RecordStore.open(d, writable=True)
        assert st2.truncate(0) == 5
        assert record_mod.RecordStore.open(d).rows == 0

    def test_error_paths(self, tmp_path):
        d = str(tmp_path / "rec")
        st = record_mod.RecordStore.create(d, 4, 4)
        with pytest.raises(FileExistsError):
            record_mod.RecordStore.create(d, 4, 4)
        with pytest.raises(ValueError, match="expected"):
            st.append(np.zeros((2, 3), np.float32),
                      np.zeros((2, 3), np.float32))
        st.append(np.zeros((3, 4), np.float32), np.zeros((3, 4),
                                                         np.float32))
        with pytest.raises(ValueError, match="overflow"):
            st.append(np.zeros((2, 4), np.float32),
                      np.zeros((2, 4), np.float32))
        with pytest.raises(ValueError, match="finalize"):
            st.finalize()
        ro = record_mod.RecordStore.open(d)
        with pytest.raises(ValueError, match="read-only"):
            ro.append(np.zeros((1, 4), np.float32),
                      np.zeros((1, 4), np.float32))
        with pytest.raises(FileNotFoundError):
            record_mod.RecordStore.open(str(tmp_path / "nope"))

    def test_consumer_protocol_matches_batch(self, setup, tmp_path):
        """run_decomposition(consumer=store) commits exactly the batch
        record — the store IS a StreamingPlane-shaped consumer."""
        p, sc = setup
        batch = dec.run_decomposition(sc, p, seed=5, engine="scan")
        st = record_mod.RecordStore.create(
            str(tmp_path / "rec"), p.t // p.pfreq, 64)
        dec.run_decomposition(sc, p, seed=5, engine="scan", consumer=st)
        st.finalize()
        A, B = st.arrays()
        np.testing.assert_array_equal(A, batch.A)
        np.testing.assert_array_equal(B, batch.B)


class TestDurableRun:
    @pytest.mark.parametrize("engine", ["scan", "pallas"])
    def test_matches_plain_run(self, setup, tmp_path, engine):
        p, sc = setup
        plain = dec.run_decomposition(sc, p, seed=5, engine=engine,
                                      interpret=(engine == "pallas"))
        res = dec.run_decomposition_durable(
            sc, p, str(tmp_path / "rec"), seed=5, engine=engine,
            interpret=(engine == "pallas"),
            checkpoint_path=str(tmp_path / "ck.npz"))
        np.testing.assert_array_equal(np.asarray(res.A), plain.A)
        np.testing.assert_array_equal(np.asarray(res.B), plain.B)
        assert res.stats == plain.stats
        np.testing.assert_allclose(res.times_ms, plain.times_ms)

    def test_complete_rerun_is_idempotent(self, setup, tmp_path):
        p, sc = setup
        d = str(tmp_path / "rec")
        r1 = dec.run_decomposition_durable(sc, p, d, seed=5,
                                           engine="scan")
        r2 = dec.run_decomposition_durable(sc, p, d, seed=5,
                                           engine="scan")
        np.testing.assert_array_equal(np.asarray(r1.A),
                                      np.asarray(r2.A))
        assert r2.stats == r1.stats

    def test_crash_resume_bitwise(self, setup, tmp_path):
        """Fault before sprint 4 with checkpoints every 2 sprints: the
        1-deep pipeline has committed sprints 0-2 but the last
        checkpoint covers only sprints 0-1 (saved alongside sprint 1's
        rows), leaving ONE committed sprint of record overhang; the
        re-run must trim it and end bitwise-identical to an
        uninterrupted run."""
        p, sc = setup
        plain = dec.run_decomposition(sc, p, seed=5, engine="scan")
        d = str(tmp_path / "rec")
        ck = str(tmp_path / "ck.npz")
        hook = FaultInjector({4: 1})
        with pytest.raises(RuntimeError, match="injected fault"):
            dec.run_decomposition_durable(
                sc, p, d, seed=5, engine="scan", checkpoint_path=ck,
                checkpoint_every_sprints=2, fault_hook=hook)
        assert hook.faults_fired == 1
        st = record_mod.RecordStore.open(d)
        assert not st.complete
        wps = p.sprint_steps // p.pfreq
        assert st.rows == 3 * wps          # sprints 0-2 committed
        with np.load(ck) as z:
            # checkpoint state is post-sprint-1 (saved with sprint 1's
            # rows, the last due boundary before the fault)
            assert int(z["step"]) == 2 * p.sprint_steps
        # resume: one sprint of overhang trimmed, rest replayed
        res = dec.run_decomposition_durable(
            sc, p, d, seed=5, engine="scan", checkpoint_path=ck,
            checkpoint_every_sprints=2)
        assert record_mod.RecordStore.open(d).complete
        np.testing.assert_array_equal(np.asarray(res.A), plain.A)
        np.testing.assert_array_equal(np.asarray(res.B), plain.B)
        assert res.stats == plain.stats

    def test_crash_resume_sharded_mesh(self, setup, tmp_path):
        """Durable record + checkpoint under WALKER SHARDING: fault a
        4-shard run mid-flight, then resume WITHOUT the mesh — global
        Threefry lanes make the partition physically invisible, so the
        resumed record must be bitwise-identical to an uninterrupted
        single-device run (the driver dryrun's record case)."""
        import jax
        from mri_nanoparticle_simulation_tpu.parallel import sharding as sh
        p, sc = setup
        mesh = sh.make_walker_mesh(jax.devices()[:4])
        plain = dec.run_decomposition(sc, p, seed=5, engine="scan")
        d = str(tmp_path / "rec_sh")
        ck = str(tmp_path / "ck_sh.npz")
        hook = FaultInjector({4: 1})
        with pytest.raises(RuntimeError, match="injected fault"):
            dec.run_decomposition_durable(
                sc, p, d, seed=5, engine="scan", checkpoint_path=ck,
                checkpoint_every_sprints=2, fault_hook=hook, mesh=mesh)
        assert not record_mod.RecordStore.open(d).complete
        res = dec.run_decomposition_durable(
            sc, p, d, seed=5, engine="scan", checkpoint_path=ck,
            checkpoint_every_sprints=2)     # resume WITHOUT the mesh
        assert record_mod.RecordStore.open(d).complete
        np.testing.assert_array_equal(np.asarray(res.A), plain.A)
        np.testing.assert_array_equal(np.asarray(res.B), plain.B)
        assert res.stats == plain.stats

    def test_sharded_pallas_durable_matches_plain(self, setup, tmp_path):
        """The production kernel's sharded record planes through the
        durable store: per-shard padding stripped shard-by-shard
        (_unpack_wins_sharded), result == the unsharded durable run."""
        import jax
        from mri_nanoparticle_simulation_tpu.parallel import sharding as sh
        p, sc = setup
        mesh = sh.make_walker_mesh(jax.devices()[:4])
        res = dec.run_decomposition_durable(
            sc, p, str(tmp_path / "rp_sh"), seed=5, engine="pallas",
            interpret=True, mesh=mesh, max_steps=2 * p.sprint_steps)
        plain = dec.run_decomposition(
            sc, p, seed=5, engine="pallas", interpret=True,
            max_steps=2 * p.sprint_steps)
        np.testing.assert_array_equal(np.asarray(res.A), plain.A)
        np.testing.assert_array_equal(np.asarray(res.B), plain.B)

    def test_restart_without_checkpoint(self, setup, tmp_path):
        """No checkpoint: a partial store restarts from scratch (rows
        truncated to 0) and still completes correctly."""
        p, sc = setup
        plain = dec.run_decomposition(sc, p, seed=5, engine="scan")
        d = str(tmp_path / "rec")
        hook = FaultInjector({2: 1})
        with pytest.raises(RuntimeError):
            dec.run_decomposition_durable(sc, p, d, seed=5,
                                          engine="scan", fault_hook=hook)
        res = dec.run_decomposition_durable(sc, p, d, seed=5,
                                            engine="scan")
        np.testing.assert_array_equal(np.asarray(res.A), plain.A)

    def test_identity_mismatch_refused(self, setup, tmp_path):
        p, sc = setup
        d = str(tmp_path / "rec")
        hook = FaultInjector({2: 1})
        with pytest.raises(RuntimeError):
            dec.run_decomposition_durable(sc, p, d, seed=5,
                                          engine="scan", fault_hook=hook)
        with pytest.raises(ValueError, match="seed"):
            dec.run_decomposition_durable(sc, p, d, seed=6,
                                          engine="scan")
        with pytest.raises(ValueError, match="engine"):
            dec.run_decomposition_durable(sc, p, d, seed=5,
                                          engine="pallas",
                                          interpret=True)

    def test_checkpoint_ahead_of_store_refused(self, setup, tmp_path):
        """A checkpoint pointing past the store's committed rows means
        the store was replaced/truncated — refuse loudly."""
        p, sc = setup
        d = str(tmp_path / "rec")
        ck = str(tmp_path / "ck.npz")
        dec.run_decomposition_durable(sc, p, d, seed=5, engine="scan",
                                      checkpoint_path=ck)
        st = record_mod.RecordStore.open(d, writable=True)
        st.truncate(2)
        with pytest.raises(ValueError, match="AHEAD"):
            dec.run_decomposition_durable(sc, p, d, seed=5,
                                          engine="scan",
                                          checkpoint_path=ck)


class TestRecordConsumers:
    @pytest.fixture(scope="class")
    def both_records(self, setup, tmp_path_factory):
        """The SAME record saved both ways: .npz (dump-record form) and
        a store directory."""
        p, sc = setup
        root = tmp_path_factory.mktemp("records")
        d = str(root / "store")
        res = dec.run_decomposition_durable(sc, p, d, seed=5,
                                            engine="scan")
        npz = str(root / "basis.npz")
        from mri_nanoparticle_simulation_tpu.io.checkpoint import \
            params_fingerprint
        np.savez_compressed(npz, times_ms=res.times_ms,
                            A=np.asarray(res.A), B=np.asarray(res.B),
                            params_fp=params_fingerprint(p),
                            mmoment=p.mmoment, seed=5, taucp=p.taucp,
                            tau=p.tau, pfreq=p.pfreq)
        return p, res, d, npz

    def test_open_record_equivalence(self, both_records):
        p, res, d, npz = both_records
        a1, b1, m1 = dec.open_record(d)
        a2, b2, m2 = dec.open_record(npz)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
        for k in ("taucp", "tau", "pfreq", "mmoment"):
            assert m1[k] == m2[k]
        np.testing.assert_allclose(m1["times_ms"], m2["times_ms"])

    def test_record_params_from_dir(self, both_records):
        p, res, d, npz = both_records
        rp1 = dec.record_params(d)
        rp2 = dec.record_params(npz)
        assert rp1.tcp == rp2.tcp == p.tcp
        assert rp1.pfreq == p.pfreq

    def test_reconstruct_record_from_dir(self, both_records):
        p, res, d, npz = both_records
        c1 = dec.reconstruct_record(d, [0.5, 2.0], taucps=[p.taucp])
        c2 = dec.reconstruct_record(npz, [0.5, 2.0], taucps=[p.taucp])
        np.testing.assert_array_equal(c1, c2)

    def test_bootstrap_from_dir(self, both_records):
        p, res, d, npz = both_records
        b1 = dec.bootstrap_t2_record(d, n_boot=16, seed=1)
        b2 = dec.bootstrap_t2_record(npz, n_boot=16, seed=1)
        assert b1.fit.t2_ms == b2.fit.t2_ms
        np.testing.assert_array_equal(b1.t2_samples, b2.t2_samples)
        # and the fit CLI accepts the directory in place of the npz
        from mri_nanoparticle_simulation_tpu import analysis
        assert analysis.main(["--record", d, "--bootstrap", "16"]) == 0

    def test_incomplete_store_refused(self, setup, tmp_path):
        p, sc = setup
        d = str(tmp_path / "rec")
        hook = FaultInjector({2: 1})
        with pytest.raises(RuntimeError):
            dec.run_decomposition_durable(sc, p, d, seed=5,
                                          engine="scan", fault_hook=hook)
        with pytest.raises(ValueError, match="incomplete"):
            dec.open_record(d)

    def test_fit_from_record_dir(self, both_records, tmp_path):
        """inverse.fit_from_record accepts the store directory: write a
        target CSV at a known scale from the record itself, recover it."""
        from mri_nanoparticle_simulation_tpu import inverse
        p, res, d, npz = both_records
        true = 1.5
        curve = np.mean(np.cos(true * np.asarray(res.A)
                               + np.asarray(res.B)), axis=1) * 64
        csv = str(tmp_path / "target.csv")
        with open(csv, "w") as f:
            for t, v in zip(res.times_ms, curve):
                f.write(f"{float(t)!r},{float(v)!r}\n")
        fit = inverse.fit_from_record(d, csv)
        assert abs(fit.scale - true) / true < 0.01


class TestCli:
    def test_record_dir_roundtrip(self, tmp_path):
        """--record-dir writes the same CSVs as --dump-record, the store
        feeds mri-t2-fit, and a second invocation (complete store)
        short-circuits to the same CSVs."""
        from mri_nanoparticle_simulation_tpu.engine import sim
        base = ["--num-water", "32", "--num-cells", "8",
                "--totaltime", "0.002", "--sprint-steps", "1000",
                "--chunk-steps", "100", "--near-k", "6",
                "--taucp", "0.001", "--hash-dim", "8",
                "--mmoment", "3.5e-13", "--engine", "scan",
                "--rng", "threefry", "--scene-seed", "3", "--seed", "5",
                "--moment-scales", "1,2"]
        out1 = str(tmp_path / "dump.csv")
        npz = str(tmp_path / "basis.npz")
        assert sim.main(base + ["--out", out1,
                                "--dump-record", npz]) == 0
        out2 = str(tmp_path / "dur.csv")
        d = str(tmp_path / "store")
        ck = str(tmp_path / "ck.npz")
        assert sim.main(base + ["--out", out2, "--record-dir", d,
                                "--checkpoint", ck,
                                "--checkpoint-every", "1"]) == 0
        for s in ("1", "2"):
            with open(str(tmp_path / f"dump_mscale={s}.csv")) as f1, \
                    open(str(tmp_path / f"dur_mscale={s}.csv")) as f2:
                assert f1.read() == f2.read()
        # the complete store short-circuits: same CSVs again
        out3 = str(tmp_path / "dur2.csv")
        assert sim.main(base + ["--out", out3, "--record-dir", d,
                                "--checkpoint", ck,
                                "--checkpoint-every", "1"]) == 0
        with open(str(tmp_path / "dur_mscale=2.csv")) as f1, \
                open(str(tmp_path / "dur2_mscale=2.csv")) as f2:
            assert f1.read() == f2.read()

    def test_record_dir_arg_validation(self, tmp_path):
        from mri_nanoparticle_simulation_tpu.engine import sim
        d = str(tmp_path / "store")
        with pytest.raises(SystemExit):
            sim.main(["--record-dir", d])       # needs decomp mode
        with pytest.raises(SystemExit):
            sim.main(["--moment-scales", "1", "--record-dir", d,
                      "--dump-record", str(tmp_path / "x.npz")])
        with pytest.raises(SystemExit):
            sim.main(["--moment-scales", "1", "--record-dir", d,
                      "--stream-plane"])
        with pytest.raises(SystemExit):
            sim.main(["--moment-scales", "1", "--record-dir", d,
                      "--checkpoint-every", "2"])   # needs --checkpoint


class TestStreamingDurable:
    """Durable --stream-plane runs: walker + plane state in ONE atomic
    snapshot, resume bitwise (decompose.run_streaming_durable)."""

    def _plane(self, p, scales=(0.5, 1.0), taucps=None, echoes=()):
        return dec.StreamingPlane(p, p.t // p.pfreq, list(scales),
                                  taucps, quadrature=True,
                                  echo_pairs=echoes)

    def test_matches_consumer_run(self, setup, tmp_path):
        p, sc = setup
        ref = self._plane(p, echoes=[(1.0, p.taucp)])
        dec.run_decomposition(sc, p, seed=5, engine="scan", consumer=ref)
        plane = self._plane(p, echoes=[(1.0, p.taucp)])
        stats = dec.run_streaming_durable(
            sc, p, plane, str(tmp_path / "snap.npz"), seed=5,
            engine="scan")
        np.testing.assert_array_equal(plane.result(), ref.result())
        te1, m1 = plane.echo_matrix()
        te2, m2 = ref.echo_matrix()
        np.testing.assert_array_equal(m1, m2)
        assert stats["steps"] == p.t

    def test_crash_resume_bitwise(self, setup, tmp_path):
        p, sc = setup
        ref = self._plane(p, echoes=[(1.0, p.taucp)])
        dec.run_decomposition(sc, p, seed=5, engine="scan", consumer=ref)
        snap = str(tmp_path / "snap.npz")
        plane = self._plane(p, echoes=[(1.0, p.taucp)])
        hook = FaultInjector({4: 1})
        with pytest.raises(RuntimeError, match="injected fault"):
            dec.run_streaming_durable(sc, p, plane, snap, seed=5,
                                      engine="scan",
                                      snapshot_every_sprints=2,
                                      fault_hook=hook)
        # resume needs a FRESH plane (the crashed one's in-RAM state is
        # presumed lost with the process)
        plane2 = self._plane(p, echoes=[(1.0, p.taucp)])
        dec.run_streaming_durable(sc, p, plane2, snap, seed=5,
                                  engine="scan",
                                  snapshot_every_sprints=2)
        np.testing.assert_array_equal(plane2.result(), ref.result())
        np.testing.assert_array_equal(plane2.echo_matrix()[1],
                                      ref.echo_matrix()[1])

    def test_config_mismatch_refused(self, setup, tmp_path):
        p, sc = setup
        snap = str(tmp_path / "snap.npz")
        plane = self._plane(p)
        hook = FaultInjector({3: 1})
        with pytest.raises(RuntimeError):
            dec.run_streaming_durable(sc, p, plane, snap, seed=5,
                                      engine="scan", fault_hook=hook)
        other = self._plane(p, scales=(0.5, 2.0))   # different config
        with pytest.raises(ValueError, match="configuration"):
            dec.run_streaming_durable(sc, p, other, snap, seed=5,
                                      engine="scan")
        stale = self._plane(p)
        stale.update(np.zeros((1, 64), np.float32),
                     np.zeros((1, 64), np.float32))
        import os as _os
        _os.unlink(snap)
        with pytest.raises(ValueError, match="fresh"):
            dec.run_streaming_durable(sc, p, stale,
                                      str(tmp_path / "none.npz"),
                                      seed=5, engine="scan")

    def test_complete_rerun_noop(self, setup, tmp_path):
        p, sc = setup
        snap = str(tmp_path / "snap.npz")
        plane = self._plane(p)
        dec.run_streaming_durable(sc, p, plane, snap, seed=5,
                                  engine="scan")
        plane2 = self._plane(p)
        stats = dec.run_streaming_durable(sc, p, plane2, snap, seed=5,
                                          engine="scan")
        np.testing.assert_array_equal(plane2.result(), plane.result())
        assert stats["steps"] == p.t

    def test_cli_stream_checkpoint(self, tmp_path):
        """--stream-plane --checkpoint: CSVs match the plain
        --stream-plane run, and a re-run (complete snapshot) reproduces
        them without simulating."""
        from mri_nanoparticle_simulation_tpu.engine import sim
        base = ["--num-water", "32", "--num-cells", "8",
                "--totaltime", "0.002", "--sprint-steps", "1000",
                "--chunk-steps", "100", "--near-k", "6",
                "--taucp", "0.001", "--hash-dim", "8",
                "--mmoment", "3.5e-13", "--engine", "scan",
                "--rng", "threefry", "--scene-seed", "3", "--seed", "5",
                "--moment-scales", "1,2", "--stream-plane"]
        assert sim.main(base + ["--out", str(tmp_path / "a.csv")]) == 0
        ck = str(tmp_path / "snap.npz")
        assert sim.main(base + ["--out", str(tmp_path / "b.csv"),
                                "--checkpoint", ck,
                                "--checkpoint-every", "1"]) == 0
        assert sim.main(base + ["--out", str(tmp_path / "c.csv"),
                                "--checkpoint", ck]) == 0
        for s in ("1", "2"):
            a = open(str(tmp_path / f"a_mscale={s}.csv")).read()
            b = open(str(tmp_path / f"b_mscale={s}.csv")).read()
            c = open(str(tmp_path / f"c_mscale={s}.csv")).read()
            assert a == b == c
