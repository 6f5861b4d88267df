"""Inverse relaxometry: moment recovery by gradient descent through the
simulator (inverse.py) — the forward-only reference architecture's
sensitivity studies (README.md:13, recompile-per-value) turned into a
single jitted optimization."""

import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import inverse as inv
from mri_nanoparticle_simulation_tpu.params import small_test_params
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox


def _setup(num_water=128, mmoment=2e-14, scene_seed=1):
    p = small_test_params(num_water=num_water, mmoment=mmoment)
    return p, BacteriaBox(p, seed=scene_seed).populate()


class TestMomentRecovery:
    def test_same_seed_recovery(self):
        """With the fit sharing the target's simulation seed the loss
        minimum is exactly the true scale; Adam must land within 2%."""
        p, sc = _setup()
        target = np.asarray(inv.make_curve_fn(p, sc, seed=2)(1.4))
        fit = inv.fit_moment_scale(target, p, sc, seed=2, iters=80)
        assert abs(fit.scale - 1.4) / 1.4 < 0.02
        assert fit.loss < 1e-6
        assert fit.mmoment == pytest.approx(fit.scale * p.mmoment)
        assert fit.loss_history.shape == (80,)
        # the optimization actually descended
        assert fit.loss < fit.loss_history[0] * 1e-2

    def test_cross_seed_recovery(self):
        """Against an INDEPENDENTLY generated target (different RNG
        seed — the 'measured data' shape) the minimum sits within the
        Monte-Carlo noise floor; at 256 walkers that is a few percent."""
        p, sc = _setup(num_water=256)
        target = np.asarray(inv.make_curve_fn(p, sc, seed=9)(1.4))
        fit = inv.fit_moment_scale(target, p, sc, seed=2, iters=80)
        assert abs(fit.scale - 1.4) / 1.4 < 0.05

    def test_target_shape_validated(self):
        p, sc = _setup(num_water=64)
        with pytest.raises(ValueError, match="one value per output"):
            inv.fit_moment_scale(np.zeros(3), p, sc)

    def test_curve_fn_rejects_ragged_sprints(self):
        p, sc = _setup(num_water=64)
        with pytest.raises(ValueError, match="multiple of sprint_steps"):
            inv.make_curve_fn(p.replace(sprint_steps=1500), sc)

    def test_cli_demo(self, capsys):
        assert inv.main(["--num-water", "64", "--iters", "60"]) == 0
        out = capsys.readouterr().out
        assert "recovered scale" in out


class TestDecomposedRecovery:
    """Closed-form fit against a phase-decomposition record — the
    production-scale inverse path (no backward pass through the
    simulator; see engine/decompose.py)."""

    def test_recovers_scale_from_record(self):
        from mri_nanoparticle_simulation_tpu.engine.decompose import \
            run_decomposition
        p, sc = _setup()
        # the target comes from the independent AD-curve path; the fit
        # consumes only the (A, B) record of the SAME seed
        target = np.asarray(inv.make_curve_fn(p, sc, seed=2)(1.4))
        rec = run_decomposition(sc, p, seed=2, engine="scan")
        fit = inv.fit_moment_scale_decomposed(target, rec.A, rec.B,
                                              mmoment=p.mmoment, iters=200)
        assert abs(fit.scale - 1.4) / 1.4 < 0.01
        assert fit.mmoment == pytest.approx(fit.scale * p.mmoment)

    def test_target_shape_validated(self):
        with pytest.raises(ValueError, match="one value per window"):
            inv.fit_moment_scale_decomposed(
                np.zeros(3), np.zeros((5, 8)), np.zeros((5, 8)))

    def test_cli_decompose_method(self, capsys):
        assert inv.main(["--num-water", "64", "--iters", "150",
                         "--method", "decompose"]) == 0
        out = capsys.readouterr().out
        assert "recovered scale" in out


class TestRecordFit:
    """The measured-data workflow: mri-t2-sim --dump-record produces the
    basis once; inverse.fit_from_record fits observed CSVs offline."""

    def test_fit_saved_record_against_written_csv(self, tmp_path):
        from mri_nanoparticle_simulation_tpu.engine import sim
        out = str(tmp_path / "ms.csv")
        rec = str(tmp_path / "rec.npz")
        rc = sim.main(["--num-water", "32", "--num-cells", "8",
                       "--totaltime", "0.002", "--sprint-steps", "1000",
                       "--chunk-steps", "100", "--near-k", "6",
                       "--taucp", "0.001", "--hash-dim", "8",
                       "--mmoment", "3.5e-13", "--engine", "scan",
                       "--rng", "threefry",
                       "--moment-scales", "1,2.5",
                       "--dump-record", rec, "--out", out])
        assert rc == 0
        # the mscale=2.5 CSV is 'the measurement'; the record is the basis
        fit = inv.fit_from_record(rec,
                                  str(tmp_path / "ms_mscale=2.5.csv"))
        assert abs(fit.scale - 2.5) / 2.5 < 0.01
        assert fit.mmoment == pytest.approx(fit.scale * 3.5e-13)
        # and through the CLI
        assert inv.main(["--record", rec, "--target",
                         str(tmp_path / "ms_mscale=2.5.csv")]) == 0

    def test_mismatched_target_rejected(self, tmp_path):
        """A target on the wrong time grid or wrong walker count must
        fail loudly, not fit to a confident wrong scale."""
        rec = str(tmp_path / "r.npz")
        np.savez_compressed(rec, times_ms=np.array([0.001, 0.002]),
                            A=np.zeros((2, 32)), B=np.zeros((2, 32)),
                            mmoment=3.5e-13)
        shifted = tmp_path / "shifted.csv"
        np.savetxt(shifted, np.c_[[0.0005, 0.0015], [32.0, 32.0]],
                   delimiter=",")
        with pytest.raises(ValueError, match="time axis"):
            inv.fit_from_record(rec, str(shifted))
        wrong_w = tmp_path / "wrongw.csv"
        np.savetxt(wrong_w, np.c_[[0.001, 0.002], [4032.0, 4032.0]],
                   delimiter=",")
        with pytest.raises(ValueError, match="walker count"):
            inv.fit_from_record(rec, str(wrong_w))

    def test_record_and_target_go_together(self, tmp_path):
        with pytest.raises(SystemExit):
            inv.main(["--record", str(tmp_path / "r.npz")])
        with pytest.raises(SystemExit):
            inv.main(["--record", str(tmp_path / "r.npz"),
                      "--target", str(tmp_path / "t.csv"),
                      "--axis", "D"])


class TestDiffusionRecovery:
    """ADC recovery: gradient descent in the diffusion coefficient —
    the parameter that BENDS trajectories (no decomposition shortcut
    exists), i.e. the genuine differentiate-through-the-simulator axis.
    The reference bakes D into compile-time stdevs (parameters.h:120)."""

    def test_same_seed_recovery(self):
        """Hidden d_scale=0.6 (inside the certified bracket (0, 1]:
        the travel bound is sized for the static params' stdevs)."""
        p, sc = _setup(num_water=128, mmoment=5e-14)
        target = np.asarray(inv.make_diffusion_curve_fn(p, sc, seed=2)(0.6))
        fit = inv.fit_diffusion_scale(target, p, sc, seed=2, iters=80)
        assert abs(fit.scale - 0.6) / 0.6 < 0.05
        assert fit.loss < fit.loss_history[0] * 1e-2
        assert np.isnan(fit.mmoment)  # not a moment fit

    def test_identity_curve_matches_forward_run(self):
        """curve(1.0) must equal the plain forward simulation."""
        from mri_nanoparticle_simulation_tpu.engine import \
            reference_engine as re
        p, sc = _setup(num_water=64)
        c = np.asarray(inv.make_diffusion_curve_fn(p, sc, seed=3)(1.0))
        _, cos_d, _, _ = re.run_simulation(sc, p, seed=3)
        np.testing.assert_allclose(c, cos_d / 64, atol=1e-5)

    def test_target_shape_validated(self):
        p, sc = _setup(num_water=64)
        with pytest.raises(ValueError, match="one value per output"):
            inv.fit_diffusion_scale(np.zeros(5), p, sc)


class TestDiffusionRecoveryCRN:
    """Derivative-free ADC recovery on the production path: golden-
    section over the d_scale launch scalar with common random numbers —
    the fit that runs at the Pallas kernel's full rate (AD does not
    reach through Pallas; it doesn't need to)."""

    def test_crn_recovery_scan_engine(self):
        """Hidden d_scale=0.6; same seed -> the CRN loss is exactly zero
        at the truth, and ~20 bracket evaluations resolve it to <1%."""
        p, sc = _setup(num_water=128, mmoment=5e-14)
        target = np.asarray(inv.make_engine_curve_fn(
            p, sc, seed=2, engine="scan")(0.6))
        fit = inv.fit_diffusion_scale_crn(
            target, p, sc, seed=2, bracket=(0.2, 1.0), iters=20,
            engine="scan")
        assert abs(fit.scale - 0.6) / 0.6 < 0.01
        assert fit.loss < 1e-7   # golden section lands ~1e-4 off the
        # exact-zero point; the MSE there is quadratic in the offset
        assert fit.scale_history.shape == (20,)
        assert np.all(fit.scale_history >= 0.2 - 1e-9)
        assert np.all(fit.scale_history <= 1.0 + 1e-9)
        assert np.isnan(fit.mmoment)

    def test_crn_pallas_engine(self):
        """The production kernel path (interpret mode on CPU): the
        launch-scalar curve matches the scan engine's, and a short
        search narrows toward the hidden scale."""
        p, sc = _setup(num_water=64, mmoment=5e-14)
        target = np.asarray(inv.make_engine_curve_fn(
            p, sc, seed=2, engine="scan")(0.25))
        c_pallas = np.asarray(inv.make_engine_curve_fn(
            p, sc, seed=2, engine="pallas", interpret=True)(0.25))
        np.testing.assert_allclose(c_pallas, target, atol=1e-4)
        fit = inv.fit_diffusion_scale_crn(
            target, p, sc, seed=2, bracket=(0.1, 1.0), iters=8,
            engine="pallas", interpret=True)
        assert abs(fit.scale - 0.25) / 0.25 < 0.25

    def test_bracket_validated(self):
        p, sc = _setup(num_water=64)
        n = p.t // p.pfreq
        with pytest.raises(ValueError, match="bracket"):
            inv.fit_diffusion_scale_crn(np.zeros(n), p, sc,
                                        bracket=(1.0, 0.5))
        with pytest.raises(ValueError, match="one value per output"):
            inv.fit_diffusion_scale_crn(np.zeros(3), p, sc)

    def test_cli_d_axis_crn(self, capsys):
        assert inv.main(["--num-water", "64", "--axis", "D",
                         "--method", "crn", "--true-scale", "0.6",
                         "--iters", "20"]) == 0
        out = capsys.readouterr().out
        assert "hidden D scale" in out

    def test_cli_d_axis_crn_low_truth(self, capsys):
        """A hidden scale below the old fixed 0.05 bracket floor: the
        bracket must widen to straddle it (converging to the bracket
        edge and reporting ~0.05 was the failure mode)."""
        assert inv.main(["--num-water", "64", "--axis", "D",
                         "--method", "crn", "--true-scale", "0.03",
                         "--iters", "22"]) == 0

    def test_cli_d_axis_ad(self, capsys):
        assert inv.main(["--num-water", "64", "--axis", "D",
                         "--true-scale", "0.6", "--iters", "60"]) == 0
        assert "recovered scale" in capsys.readouterr().out

    def test_cli_rejects_bad_combinations(self):
        with pytest.raises(SystemExit):
            inv.main(["--axis", "D", "--method", "decompose"])
        with pytest.raises(SystemExit):
            inv.main(["--axis", "moment", "--method", "crn"])
        with pytest.raises(SystemExit):
            inv.main(["--axis", "D", "--true-scale", "1.5"])


class TestCellRadiusRecoveryCRN:
    """Cell-size recovery on a fixed scene: the cell_r launch scalar as
    an inverse axis (residency, field mask and kick gating all move with
    the radius; trajectories bend, so — like D — the fit is a CRN
    bracket search, not AD)."""

    @staticmethod
    def _cover(p, sc, hi=1.0):
        """Size near_k for the bracket top so the coverage certificate
        holds at every probed radius (monotone reach in cell_r)."""
        from mri_nanoparticle_simulation_tpu.fields import expansion
        worst = expansion.validate_near_k(sc.mnps[:, :3],
                                          p.replace(cell_r=hi))
        return p if worst <= p.near_k else p.replace(near_k=worst)

    def test_same_seed_recovery(self):
        """Hidden radius 0.7 um: ~20 bracketed evaluations resolve it to
        <1% (CRN loss exactly zero at the truth)."""
        p, sc = _setup(num_water=128, mmoment=5e-14)
        p = self._cover(p, sc)
        target = np.asarray(inv.make_engine_curve_fn(
            p, sc, seed=2, engine="scan")(cell_r=0.7))
        fit = inv.fit_cell_radius_crn(target, p, sc, seed=2,
                                      bracket=(0.4, 1.0), iters=20,
                                      engine="scan")
        assert abs(fit.scale - 0.7) / 0.7 < 0.01
        assert fit.loss < 1e-7
        assert np.all(fit.scale_history >= 0.4 - 1e-9)
        assert np.all(fit.scale_history <= 1.0 + 1e-9)
        assert np.isnan(fit.mmoment)

    def test_default_radius_is_identity(self):
        """curve(cell_r=params.cell_r) equals the no-override curve —
        the launch scalar bakes to the same program."""
        p, sc = _setup(num_water=64, mmoment=5e-14)
        c = inv.make_engine_curve_fn(p, sc, seed=2, engine="scan")
        np.testing.assert_array_equal(c(1.0), c(cell_r=p.cell_r))

    def test_bracket_coverage_enforced(self):
        """A bracket top whose reach overflows the configured near list
        must raise BEFORE any kernel runs (silent misclassification of
        residency was the failure mode the certificate exists for)."""
        p = small_test_params(num_water=64, num_cells=48)
        sc = BacteriaBox(p, seed=1).populate()
        n = p.t // p.pfreq
        from mri_nanoparticle_simulation_tpu.fields import expansion
        worst = expansion.validate_near_k(sc.mnps[:, :3],
                                          p.replace(cell_r=2.5))
        assert worst > p.near_k, \
            "fixture scene must overflow the near list at cell_r=2.5"
        with pytest.raises(ValueError, match="near_k"):
            inv.fit_cell_radius_crn(np.zeros(n), p, sc,
                                    bracket=(0.4, 2.5))

    def test_bracket_and_shape_validated(self):
        p, sc = _setup(num_water=64)
        with pytest.raises(ValueError, match="bracket"):
            inv.fit_cell_radius_crn(np.zeros(1), p, sc,
                                    bracket=(1.0, 0.5))

    def test_cli_cell_r_axis(self, capsys):
        assert inv.main(["--num-water", "64", "--axis", "cell_r",
                         "--method", "crn", "--true-scale", "0.7",
                         "--iters", "20"]) == 0
        assert "recovered scale" in capsys.readouterr().out


class TestJointRecoveryCRN:
    """Joint (moment, diffusion) recovery — the measured-data problem
    where neither is known.  Nelder-Mead on (log s, log d) with common
    random numbers; every evaluation rides ONE compiled program (moment
    through the traced mnp_M array, D through the launch scalar)."""

    def test_same_seed_recovery(self):
        p, sc = _setup(num_water=128, mmoment=5e-14)
        target = np.asarray(inv.make_engine_curve_fn(
            p, sc, seed=2, engine="scan")(0.5, m_scale=1.6))
        fit = inv.fit_joint_crn(target, p, sc, seed=2,
                                m_bracket=(0.25, 4.0),
                                d_bracket=(0.1, 1.0), max_evals=80,
                                engine="scan")
        assert abs(fit.m_scale - 1.6) / 1.6 < 0.02
        assert abs(fit.d_scale - 0.5) / 0.5 < 0.02
        assert fit.mmoment == pytest.approx(fit.m_scale * p.mmoment)
        assert fit.loss < 1e-6
        # probes never left the brackets (inf outside, not simulated)
        assert np.all(fit.m_history >= 0.25 - 1e-9)
        assert np.all(fit.m_history <= 4.0 + 1e-9)
        assert np.all(fit.d_history >= 0.1 - 1e-9)
        assert np.all(fit.d_history <= 1.0 + 1e-9)

    def test_m_scale_matches_scaled_moment_params(self):
        """curve(m_scale=s) equals a fresh curve on a scene whose mnp_M
        is scaled by hand — the traced-array moment axis is exact."""
        import dataclasses
        p, sc = _setup(num_water=64, mmoment=5e-14)
        c = inv.make_engine_curve_fn(p, sc, seed=2, engine="scan")
        mn = sc.mnps.copy()
        mn[:, 4] *= 2.0
        c2 = inv.make_engine_curve_fn(p, dataclasses.replace(sc, mnps=mn),
                                      seed=2, engine="scan")
        np.testing.assert_allclose(c(1.0, m_scale=2.0), c2(1.0),
                                   rtol=0, atol=1e-6)

    def test_brackets_and_shape_validated(self):
        p, sc = _setup(num_water=64)
        n = p.t // p.pfreq
        with pytest.raises(ValueError, match="m_bracket"):
            inv.fit_joint_crn(np.zeros(n), p, sc, m_bracket=(2.0, 1.0))
        with pytest.raises(ValueError, match="d_bracket"):
            inv.fit_joint_crn(np.zeros(n), p, sc, d_bracket=(0, 1.0))
        with pytest.raises(ValueError, match="one value per output"):
            inv.fit_joint_crn(np.zeros(3), p, sc)

    def test_cli_joint_axis(self, capsys):
        assert inv.main(["--num-water", "64", "--axis", "joint",
                         "--method", "crn", "--true-scale", "1.5",
                         "--iters", "70"]) == 0
        assert "recovered (moment, D) scales" in capsys.readouterr().out

    def test_cli_rejects_non_crn_methods(self):
        with pytest.raises(SystemExit):
            inv.main(["--axis", "joint", "--method", "ad"])
        with pytest.raises(SystemExit):
            inv.main(["--axis", "cell_r", "--method", "decompose"])
