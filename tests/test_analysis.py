"""T2 extraction (analysis.py): synthetic recovery, echo sampling, CLI,
and a fit of an actual simulated decay."""

import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import analysis as an
from mri_nanoparticle_simulation_tpu import params as P


class TestFitSynthetic:
    def test_recovers_known_t2(self):
        t = np.arange(1, 40001) * 1e-3          # the reference cadence
        m = 4032.0 * np.exp(-t / 12.5)
        f = an.fit_t2(t, m)
        assert abs(f.t2_ms - 12.5) < 1e-6
        assert abs(f.amplitude - 4032.0) < 1e-3
        assert f.r_squared > 0.999999

    def test_recovers_under_noise(self):
        rng = np.random.default_rng(7)
        t = np.arange(1, 40001) * 1e-3
        m = 4032.0 * np.exp(-t / 8.0) + rng.normal(0, 20.0, t.shape)
        f = an.fit_t2(t, m)
        assert abs(f.t2_ms - 8.0) / 8.0 < 0.01   # <1% under 0.5% noise
        assert f.n_used < len(t)                 # noise tail excluded

    def test_rejects_non_decaying(self):
        t = np.arange(1, 101) * 1e-3
        with pytest.raises(ValueError, match="decay"):
            an.fit_t2(t, np.full_like(t, 5.0) + t)

    def test_rejects_all_noise(self):
        t = np.arange(1, 101) * 1e-3
        m = np.full_like(t, 100.0)
        m[2:] = -1.0                             # below floor
        with pytest.raises(ValueError, match="noise floor"):
            an.fit_t2(t, m)


class TestEchoSampling:
    def test_boundary_echo_survives_float_ratio(self):
        """An echo landing exactly on the run end must not be dropped by
        the binary ratio falling ulps short of the integer (2*0.0001 !=
        0.0002 in binary; caught live by the driver dryrun)."""
        te = an.echo_times(0.0001, 0.0002)
        np.testing.assert_allclose(te, [0.0002])

    def test_echo_times(self):
        np.testing.assert_allclose(an.echo_times(5.5, 40.0),
                                   [11.0, 22.0, 33.0])

    def test_nonpositive_taucp_rejected(self):
        """taucp=0 used to ZeroDivisionError with a bare traceback;
        negative taucp produced a misleading empty-fit error."""
        for bad in (0.0, -1.0):
            with pytest.raises(ValueError, match="taucp must be > 0"):
                an.echo_times(bad, 40.0)

    def test_cli_rejects_nonpositive_taucp(self):
        with pytest.raises(SystemExit):
            an.main(["whatever.csv", "--taucp", "0"])

    def test_picks_nearest_rows(self):
        t = np.arange(1, 40001) * 1e-3
        m = np.exp(-t / 10.0)
        te, me = an.sample_at_echoes(t, m, 5.5)
        assert len(te) == 3
        np.testing.assert_allclose(te, [11.0, 22.0, 33.0], atol=1e-3)
        f = an.fit_t2(te, me)
        assert abs(f.t2_ms - 10.0) < 1e-3


class TestCsvAndCli:
    def _write(self, path, t2=6.0):
        t = np.arange(1, 4001) * 1e-3
        m = 512.0 * np.exp(-t / t2)
        with open(path, "w") as f:
            for ti, mi in zip(t, m):
                f.write(f"{ti:.17g},{mi:.17g}\n")
        return str(path)

    def test_fit_csv(self, tmp_path):
        p = self._write(tmp_path / "c.csv")
        f = an.fit_t2_csv(p)
        assert abs(f.t2_ms - 6.0) < 1e-6

    def test_cli(self, tmp_path, capsys):
        p = self._write(tmp_path / "c.csv")
        assert an.main([p, "--taucp", "0.5"]) == 0
        out = capsys.readouterr().out
        assert "T2 = 6" in out

    def test_fit_simulated_curve(self, tmp_path):
        """End-to-end: simulate a small decaying system and fit it.
        With few walkers the curve is noisy; assert a finite positive
        T2 on a same-order scale rather than a tight value."""
        from mri_nanoparticle_simulation_tpu.engine.sim import \
            SimulationRunner
        pm = P.small_test_params(
            num_water=256, totaltime=0.004, sprint_steps=1000,
            taucp=0.0005, mmoment=1e-12)     # strong moment -> fast decay
        r = SimulationRunner(pm, scene_seed=1, seed=2, engine="scan")
        csv = str(tmp_path / "sim.csv")
        r.run(csv_path=csv, progress=False)
        # fit the echo envelope: between echoes the signal refocuses, so
        # the raw rows oscillate; the envelope is the decaying quantity
        f = an.fit_t2_csv(csv, taucp_ms=pm.taucp, floor=0.0)
        assert np.isfinite(f.t2_ms) and f.t2_ms > 0
        assert f.t2_ms < 10 * pm.totaltime   # decays on the sim scale


@pytest.fixture(scope="module")
def decay_record():
    """One small decaying decomposition run shared by the dispersion and
    bootstrap tests (deterministic: counter RNG + fixed seeds)."""
    from mri_nanoparticle_simulation_tpu.engine import decompose as dec
    from mri_nanoparticle_simulation_tpu.scene import BacteriaBox
    pm = P.small_test_params(num_water=256, num_cells=12,
                             totaltime=0.02, sprint_steps=2000,
                             taucp=0.001, mmoment=2e-14,
                             avoid_intracellular_throw=False)
    sc = BacteriaBox(pm, seed=3).populate()
    return pm, dec.run_decomposition(sc, pm, seed=5, engine="scan")


class TestCpmgDispersion:
    def test_r2_increases_with_echo_spacing(self, decay_record):
        """The CPMG dispersion curve from ONE decomposition run: longer
        echo spacings refocus less diffusion dephasing, so fitted R2
        rises with taucp (motional narrowing).  Deterministic (counter
        RNG + fixed seeds); measured 0.21 -> 0.81 -> 1.37 /ms."""
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        pm, r = decay_record
        taucps = [0.0005, 0.001, 0.002]
        plane = dec.curves_at_plane(r.A, r.B, [1.0], taucps, pm)
        r2s = []
        for ti, t in enumerate(taucps):
            te, me = an.sample_at_echoes(r.times_ms,
                                         plane[0, ti] * pm.num_water, t)
            fit = an.fit_t2(te, me)
            assert fit.t2_ms > 0
            r2s.append(1.0 / fit.t2_ms)
        assert r2s[0] < r2s[1] < r2s[2]
        # the dispersion is a real effect, not fit jitter: ~4x then ~1.7x
        assert r2s[1] > 2 * r2s[0]


class TestFitStderr:
    def test_stderr_calibration_iid_noise(self):
        """Under the model the analytic stderr is valid for (iid row
        noise), the reported 1-sigma must match the empirical scatter of
        the fitted T2 across independent noise realizations."""
        rng = np.random.default_rng(11)
        t = np.arange(1, 4001) * 1e-2
        t2s, ses = [], []
        for _ in range(40):
            m = 1.0 * np.exp(-t / 8.0) + rng.normal(0, 0.005, t.shape)
            f = an.fit_t2(t, m)
            t2s.append(f.t2_ms)
            ses.append(f.t2_stderr_ms)
        emp = np.std(t2s, ddof=1)
        rep = np.mean(ses)
        assert 0.6 < rep / emp < 1.6
        assert np.isfinite(f.amplitude_stderr) and f.amplitude_stderr > 0

    def test_stderr_tiny_on_noiseless_curve(self):
        t = np.arange(1, 4001) * 1e-3
        f = an.fit_t2(t, 512.0 * np.exp(-t / 6.0))
        assert f.t2_stderr_ms < 1e-6 * f.t2_ms

    def test_cli_requires_input(self):
        with pytest.raises(SystemExit):
            an.main([])


class TestBootstrap:
    """Walker-bootstrap T2 error bars from one decomposition record
    (decompose.bootstrap_t2): the Monte-Carlo uncertainty the reference
    could only estimate by N full reruns."""

    def test_ci_brackets_fit_and_is_deterministic(self, decay_record):
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        pm, r = decay_record
        b = dec.bootstrap_t2(r.A, r.B, pm, n_boot=64, seed=1)
        assert b.t2_lo_ms < b.t2_hi_ms
        assert b.t2_stderr_ms > 0
        assert b.n_ok == 64
        # the resample distribution sits on the point estimate
        med = float(np.median(b.t2_samples))
        assert abs(b.fit.t2_ms - med) < 4 * b.t2_stderr_ms
        assert b.t2_lo_ms < med < b.t2_hi_ms
        # deterministic: same seed, same resamples
        b2 = dec.bootstrap_t2(r.A, r.B, pm, n_boot=64, seed=1)
        np.testing.assert_array_equal(b.t2_samples, b2.t2_samples)
        b3 = dec.bootstrap_t2(r.A, r.B, pm, n_boot=64, seed=2)
        assert not np.array_equal(b.t2_samples, b3.t2_samples)

    def test_bootstrap_sees_walker_scatter(self, decay_record):
        """Resampling walkers must produce genuine spread: the bootstrap
        sigma is on the scale of the Monte-Carlo noise, far above the
        (time-correlated, understating) per-row fit stderr floor of a
        noiseless curve."""
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        pm, r = decay_record
        b = dec.bootstrap_t2(r.A, r.B, pm, n_boot=48, seed=3)
        assert b.t2_stderr_ms > 1e-4 * b.fit.t2_ms

    def test_blocking_invariant(self, decay_record):
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        pm, r = decay_record
        te_a, ca = dec.echo_cos_matrix(r.A, r.B, pm, walker_block=7)
        te_b, cb = dec.echo_cos_matrix(r.A, r.B, pm, walker_block=4096)
        np.testing.assert_array_equal(te_a, te_b)
        np.testing.assert_allclose(ca, cb, rtol=0, atol=1e-12)

    def test_record_roundtrip_and_cli(self, decay_record, tmp_path, capsys):
        """bootstrap_t2_record + the mri-t2-fit --record CLI surface,
        against an npz with the --dump-record schema."""
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        pm, r = decay_record
        path = str(tmp_path / "rec.npz")
        np.savez_compressed(path, times_ms=r.times_ms, A=r.A, B=r.B,
                            taucp=pm.taucp, tau=pm.tau, pfreq=pm.pfreq)
        b_file = dec.bootstrap_t2_record(path, n_boot=32, seed=1)
        b_mem = dec.bootstrap_t2(r.A, r.B, pm, n_boot=32, seed=1)
        np.testing.assert_allclose(b_file.t2_samples, b_mem.t2_samples,
                                   rtol=1e-12)
        assert an.main(["--record", path, "--bootstrap", "16"]) == 0
        out = capsys.readouterr().out
        assert "CI" in out and "sigma" in out

    def test_rejects_bad_knobs(self, decay_record):
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        pm, r = decay_record
        with pytest.raises(ValueError, match="ci"):
            dec.bootstrap_t2(r.A, r.B, pm, n_boot=8, ci=1.5)
        with pytest.raises(ValueError, match="n_boot"):
            dec.bootstrap_t2(r.A, r.B, pm, n_boot=1)
        # an echo spacing with no echo inside the record
        with pytest.raises(ValueError, match="no spin echo"):
            dec.bootstrap_t2(r.A, r.B, pm, taucp=pm.totaltime)


class TestStreamingBootstrap:
    def test_streamed_echoes_match_record_bootstrap(self, decay_record):
        """StreamingPlane's in-stream echo capture + bootstrap_from_echoes
        must reproduce the record-based bootstrap_t2 — Monte-Carlo error
        bars with no materialized record."""
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        pm, r = decay_record
        n = r.A.shape[0]
        sp = dec.StreamingPlane(pm, n, [1.0],
                                echo_pairs=[(1.0, pm.taucp)])
        for lo in range(0, n, 7):
            sp.update(r.A[lo:lo + 7], r.B[lo:lo + 7])
        te_s, mat_s = sp.echo_matrix()
        te_r, mat_r = dec.echo_cos_matrix(r.A, r.B, pm)
        np.testing.assert_array_equal(te_s, te_r)
        np.testing.assert_allclose(mat_s, mat_r, rtol=0, atol=1e-12)
        b_s = dec.bootstrap_from_echoes(te_s, mat_s, n_boot=32, seed=1)
        b_r = dec.bootstrap_t2(r.A, r.B, pm, n_boot=32, seed=1)
        np.testing.assert_allclose(b_s.t2_samples, b_r.t2_samples,
                                   rtol=1e-9)
        assert b_s.n_ok == b_r.n_ok


class TestEchoFileBootstrap:
    """The --dump-echoes / mri-t2-fit --echoes artifact: on-device
    spin-echo captures saved as one small npz, bootstrapped offline —
    Monte-Carlo T2 error bars with no decomposition record anywhere."""

    @pytest.fixture()
    def echoes_npz(self, tmp_path):
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        rng = np.random.default_rng(7)
        te = np.arange(1, 21) * 0.5          # 20 echoes over 10 ms
        caps = []
        for scale, t2 in ((1.0, 8.0), (2.0, 4.0)):
            # per-walker echo cos: the shared envelope + walker scatter
            cos = (np.exp(-te / t2)[:, None]
                   + rng.normal(0, 0.05, (te.size, 256)))
            caps.append(dec.EchoCapture(scale=scale, taucp_ms=0.25,
                                        times_ms=te, cos=cos))
        path = str(tmp_path / "echoes.npz")
        dec.save_echoes(path, caps, seed=3)
        return path, caps

    def test_roundtrip(self, echoes_npz):
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        path, caps = echoes_npz
        back = dec.load_echoes(path)
        assert len(back) == 2
        for b, c in zip(back, caps):
            assert (b.scale, b.taucp_ms) == (c.scale, c.taucp_ms)
            np.testing.assert_array_equal(b.times_ms, c.times_ms)
            # cos stored f32 (lossless for on-device captures; this
            # synthetic f64 fixture rounds)
            np.testing.assert_allclose(b.cos, c.cos, atol=1e-6)

    def test_cli_bootstraps_every_pair(self, echoes_npz, tmp_path, capsys):
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        path, _ = echoes_npz
        table = str(tmp_path / "t.csv")
        assert an.main(["--echoes", path, "--bootstrap", "32",
                        "--seed", "1", "--out-table", table]) == 0
        out = capsys.readouterr().out
        assert out.count("CI") == 2
        lines = open(table).read().strip().splitlines()
        assert lines[0] == ("mscale,taucp_ms,r2_per_ms,t2_ms,t2_lo_ms,"
                            "t2_hi_ms,t2_stderr_ms,n_ok")
        assert len(lines) == 3
        # the CLI is exactly bootstrap_from_echoes on the loaded capture
        e = dec.load_echoes(path)[0]
        b = dec.bootstrap_from_echoes(e.times_ms, e.cos, n_boot=32, seed=1)
        row0 = lines[1].split(",")
        assert float(row0[0]) == 1.0
        np.testing.assert_allclose(float(row0[3]), b.fit.t2_ms, rtol=1e-12)
        np.testing.assert_allclose(float(row0[4]), b.t2_lo_ms, rtol=1e-12)
        # the recovered T2s separate the two grid points correctly
        assert float(lines[1].split(",")[3]) > float(lines[2].split(",")[3])

    def test_cli_guards(self, tmp_path):
        with pytest.raises(SystemExit):
            an.main(["--echoes", "x.npz", "--bootstrap", "1"])
        # a non-echo npz is refused with the schema message
        bad = str(tmp_path / "bad.npz")
        np.savez(bad, A=np.zeros((2, 2)))
        with pytest.raises(ValueError, match="echo-capture"):
            an.main(["--echoes", bad])

    def test_unfittable_pair_gets_nan_row(self, tmp_path, capsys):
        """A capture with a single echo cannot fit; the CLI reports it
        and the table carries the nan sentinel row."""
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        path = str(tmp_path / "one.npz")
        dec.save_echoes(path, [dec.EchoCapture(
            scale=1.0, taucp_ms=1.0, times_ms=np.array([2.0]),
            cos=np.full((1, 16), 0.5))])
        table = str(tmp_path / "t.csv")
        assert an.main(["--echoes", path, "--bootstrap", "8",
                        "--out-table", table]) == 0
        assert "unfittable" in capsys.readouterr().out
        row = open(table).read().strip().splitlines()[1].split(",")
        assert row[-1] == "0" and row[3] == "nan"


class TestBootstrapDispersion:
    """The CPMG dispersion table WITH confidence intervals from one
    record (decompose.bootstrap_dispersion / mri-t2-fit --taucp-grid)."""

    def test_dispersion_with_cis(self, decay_record):
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        pm, r = decay_record
        taucps = [0.0005, 0.001, 0.002, pm.totaltime]
        rows = dec.bootstrap_dispersion(r.A, r.B, pm, taucps, n_boot=32,
                                        seed=1)
        assert [row["taucp_ms"] for row in rows] == taucps
        fit_rows = rows[:3]
        # motional narrowing: R2 rises with echo spacing (the same
        # physics TestCpmgDispersion pins on point estimates)
        r2s = [row["r2_per_ms"] for row in fit_rows]
        assert r2s[0] < r2s[1] < r2s[2]
        for row in fit_rows:
            assert row["t2_lo_ms"] < row["t2_hi_ms"]
            # the resample CI sits on the point estimate's scale
            assert row["t2_lo_ms"] - 4 * row["t2_stderr_ms"] < \
                row["t2_ms"] < row["t2_hi_ms"] + 4 * row["t2_stderr_ms"]
            assert row["t2_stderr_ms"] > 0 and row["n_ok"] == 32
        # no echo fits inside the record at taucp = totaltime: nan row
        assert rows[3]["n_ok"] == 0 and np.isnan(rows[3]["t2_ms"])

    def test_cli_table(self, decay_record, tmp_path, capsys):
        from mri_nanoparticle_simulation_tpu import plotting
        pm, r = decay_record
        rec = str(tmp_path / "rec.npz")
        np.savez_compressed(rec, A=r.A, B=r.B, taucp=pm.taucp,
                            tau=pm.tau, pfreq=pm.pfreq)
        table = str(tmp_path / "disp.csv")
        rc = an.main(["--record", rec, "--taucp-grid", "0.0005,0.001",
                      "--bootstrap", "16", "--out-table", table])
        assert rc == 0
        out = capsys.readouterr().out
        assert out.count("CI") == 2
        lines = open(table).read().strip().splitlines()
        assert lines[0] == ("taucp_ms,r2_per_ms,t2_ms,t2_lo_ms,t2_hi_ms,"
                            "t2_stderr_ms,n_ok")
        assert len(lines) == 3
        # the table plots with error bars (CI columns are fit columns,
        # not knob axes)
        png = str(tmp_path / "d.png")
        plotting.plot_dispersion(table, png, ycol="t2_ms")
        import os
        assert os.path.getsize(png) > 10_000

    def test_cli_guards(self, tmp_path):
        with pytest.raises(SystemExit):
            an.main(["--taucp-grid", "1,2"])        # needs --record
        with pytest.raises(SystemExit):
            an.main(["--record", "x.npz", "--taucp-grid", "1,2",
                     "--bootstrap", "1"])
        with pytest.raises(SystemExit):
            an.main(["x.csv", "--out-table", str(tmp_path / "t.csv")])


class TestMagnitudeFit:
    """|M| = sqrt(cos^2 + sin^2) fitting from quadrature CSVs: robust
    to a global off-resonance phase rotation that makes the in-phase
    component oscillate."""

    def _write_quad(self, path, t2=6.0, omega=2.0):
        t = np.arange(1, 4001) * 1e-3
        mag = 512.0 * np.exp(-t / t2)
        with open(path, "w") as f:
            for ti, mi in zip(t, mag):
                f.write(f"{ti:.17g},{mi * np.cos(omega * ti):.17g},"
                        f"{mi * np.sin(omega * ti):.17g}\n")
        return str(path)

    def test_magnitude_recovers_under_rotation(self, tmp_path):
        p = self._write_quad(tmp_path / "q.csv", t2=6.0, omega=2.0)
        f = an.fit_t2_csv(p, magnitude=True)
        assert abs(f.t2_ms - 6.0) < 1e-6
        # the in-phase component alone oscillates through zero: either
        # the fit fails or lands far from the truth
        try:
            f_cos = an.fit_t2_csv(p)
            assert abs(f_cos.t2_ms - 6.0) > 0.5
        except ValueError:
            pass

    def test_magnitude_needs_quadrature_column(self, tmp_path):
        t = np.arange(1, 101) * 1e-3
        path = str(tmp_path / "c.csv")
        with open(path, "w") as f:
            for ti in t:
                f.write(f"{ti:.17g},{np.exp(-ti):.17g}\n")
        with pytest.raises(ValueError, match="quadrature"):
            an.fit_t2_csv(path, magnitude=True)

    def test_cli(self, tmp_path, capsys):
        p = self._write_quad(tmp_path / "q.csv")
        assert an.main([p, "--magnitude"]) == 0
        assert "T2 = 6" in capsys.readouterr().out
        with pytest.raises(SystemExit):
            an.main(["--magnitude", "--record", "x.npz"])


class TestT2Spectrum:
    """Multi-exponential T2 spectra by regularized NNLS
    (fit_t2_spectrum) — the multi-compartment generalization of the
    mono-exponential fit."""

    @staticmethod
    def _biexp(t2a=3.0, t2b=25.0, fa=0.4, n=400, noise=0.0, seed=0):
        t = np.linspace(0.05, 60.0, n)
        y = fa * np.exp(-t / t2a) + (1 - fa) * np.exp(-t / t2b)
        if noise:
            y = y + np.random.default_rng(seed).normal(0, noise, n)
        return t, y

    def test_nnls_matches_scipy(self):
        """The dependency-free Lawson-Hanson agrees with scipy's on
        random problems (including rank-deficient exponential designs)."""
        scipy_opt = pytest.importorskip("scipy.optimize")
        rng = np.random.default_rng(1)
        for trial in range(6):
            m, n = 30, 12
            A = np.abs(rng.normal(size=(m, n))) if trial % 2 else \
                np.exp(-np.linspace(0, 5, m)[:, None]
                       * rng.uniform(0.2, 5, n)[None, :])
            b = rng.normal(size=m)
            ours = an._nnls(A, b)
            ref, _ = scipy_opt.nnls(A, b)
            assert np.all(ours >= 0)
            # same objective value (solutions may differ on flat
            # directions of degenerate designs)
            np.testing.assert_allclose(
                np.linalg.norm(A @ ours - b),
                np.linalg.norm(A @ ref - b), rtol=1e-6, atol=1e-9)

    def test_recovers_two_components(self):
        t, y = self._biexp(noise=1e-4)
        sp = an.fit_t2_spectrum(t, y, n_t2=96)
        assert len(sp.peaks) == 2
        (t2a, fa), (t2b, fb) = sorted(sp.peaks)
        assert abs(t2a - 3.0) / 3.0 < 0.25
        assert abs(t2b - 25.0) / 25.0 < 0.25
        assert abs(fa - 0.4) < 0.1
        assert abs(fb - 0.6) < 0.1
        assert sp.r_squared > 0.999
        # the mono-exponential fit averages the compartments away —
        # it lands between the two true T2s, resolving neither
        mono = an.fit_t2(t, y)
        assert 4.0 < mono.t2_ms < 24.0

    def test_mono_exponential_single_peak(self):
        t = np.linspace(0.05, 40.0, 300)
        y = 2.0 * np.exp(-t / 8.0)
        sp = an.fit_t2_spectrum(t, y)
        assert len(sp.peaks) == 1
        t2, amp = sp.peaks[0]
        assert abs(t2 - 8.0) / 8.0 < 0.1
        assert abs(amp - 2.0) < 0.2

    def test_chi2_target_honored(self):
        """With noise, the auto lambda lands the misfit at the
        Whittall-MacKay 1.02 x chi2_min target."""
        t, y = self._biexp(noise=2e-3)
        sp = an.fit_t2_spectrum(t, y, n_t2=64)
        assert sp.lambda_reg > 0
        assert 1.0 < sp.chi2_ratio < 1.05

    def test_explicit_lambda(self):
        t, y = self._biexp(noise=1e-3)
        sp = an.fit_t2_spectrum(t, y, lambda_reg=0.5)
        assert sp.lambda_reg == 0.5

    def test_validation(self):
        with pytest.raises(ValueError, match="8 finite samples"):
            an.fit_t2_spectrum([1, 2, 3], [1, 0.5, 0.2])
        # non-finite rows must not sneak under the sample floor (or
        # crash): 20 rows, 5 finite
        t = np.linspace(0.1, 10, 20)
        y = np.full(20, np.nan)
        y[:5] = np.exp(-t[:5])
        with pytest.raises(ValueError, match="8 finite samples"):
            an.fit_t2_spectrum(t, y)
        with pytest.raises(ValueError, match="8 finite samples"):
            an.fit_t2_spectrum(t, np.full(20, np.nan))
        t = np.linspace(0.1, 10, 50)
        with pytest.raises(ValueError, match="n_t2"):
            an.fit_t2_spectrum(t, np.exp(-t), n_t2=4)
        with pytest.raises(ValueError, match="t2_min"):
            an.fit_t2_spectrum(t, np.exp(-t), t2_min_ms=5, t2_max_ms=1)

    def test_cli_spectrum(self, tmp_path, capsys):
        t, y = self._biexp(noise=1e-4)
        p = str(tmp_path / "bi.csv")
        np.savetxt(p, np.c_[t, 64 * y], delimiter=",")
        table = str(tmp_path / "spec.csv")
        assert an.main([p, "--spectrum", "--out-table", table]) == 0
        out = capsys.readouterr().out
        assert "2 component(s)" in out
        rows = np.loadtxt(table, delimiter=",", skiprows=1)
        assert rows.shape == (64, 2)
        assert np.all(rows[:, 1] >= 0)

    def test_cli_spectrum_rejects_record(self):
        with pytest.raises(SystemExit):
            an.main(["--spectrum", "--record", "x.npz"])

    def test_edge_clipping_flagged(self):
        """A T2 beyond the grid top piles weight on the last grid point;
        the result must say so (the position is a bound, not an
        estimate) — and an in-range fit must not."""
        t = np.linspace(0.05, 2.0, 100)   # window << T2 = 50 ms
        y = np.exp(-t / 50.0)
        sp = an.fit_t2_spectrum(t, y)     # default grid tops at 6 ms
        assert sp.edge_clipped
        t2, y2 = np.linspace(0.05, 60.0, 300), None
        sp2 = an.fit_t2_spectrum(t2, np.exp(-t2 / 8.0))
        assert not sp2.edge_clipped
