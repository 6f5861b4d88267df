"""Background field gradient (params.b0_gradient): diffusion-weighting
physics beyond the reference's zero-gradient world.

The gradient adds gx*x + gy*y + gz*z Tesla to every phase kick at the
recorded position.  It must not bend trajectories, must ride the
moment-independent B column in decomposition runs, and — the physics
anchor — a CPMG train over free diffusion in a constant gradient must
reproduce the classical Carr-Purcell attenuation
R2 = gamma^2 G^2 D_eff taucp^2 / 3 (Carr & Purcell 1954), with
D_eff = pi*D/6 the per-axis diffusivity of the engine's step kinematics
(stdev = sqrt(pi*D*tau), direction = normalized cube vector with
E[u_z^2] = 1/3).
"""

import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu import rng
from mri_nanoparticle_simulation_tpu import analysis as an
from mri_nanoparticle_simulation_tpu.engine import pallas_engine as pe
from mri_nanoparticle_simulation_tpu.engine import reference_engine as re
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox

import jax.numpy as jnp


def _run(p, sc, seed=2, engine="scan", decompose=False):
    from mri_nanoparticle_simulation_tpu.engine.decompose import \
        run_decomposition
    if decompose:
        return run_decomposition(sc, p, seed=seed, engine=engine)
    if engine == "scan":
        return re.run_simulation(sc, p, seed=seed)
    # pallas in interpret mode (CPU)
    sprint = pe.make_sprint_fn(p, sc.waters.shape[0], jnp.float32,
                               interpret=True)
    st = pe.to_planes(re.init_state(sc.waters, p, jnp.float32), p)
    k = rng.key_from_seed(seed)
    key = jnp.asarray([np.uint32(k[0]), np.uint32(k[1])])
    mnp_pos = jnp.asarray(sc.mnps[:, :3], jnp.float32)
    mnp_M = jnp.asarray(sc.mnps[:, 4], jnp.float32)
    outs = []
    for _ in range(p.t // p.sprint_steps):
        st, wins = sprint(mnp_pos, mnp_M, key, st, 0)
        outs.append(np.asarray(wins))
    wins = np.concatenate(outs)
    return None, wins[:, 0], wins[:, 1], pe.from_planes(
        st, sc.waters.shape[0])


class TestGradientBasics:
    def test_validation(self):
        with pytest.raises(ValueError, match="b0_gradient"):
            P.small_test_params(b0_gradient=(1.0, 2.0)).validate()
        with pytest.raises(ValueError, match="b0_gradient"):
            P.small_test_params(b0_gradient=(0.0, float("nan"), 0.0))
        p = P.small_test_params(b0_gradient=(0.0, 0.0, 1e-5))
        assert p.use_gradient
        assert not P.small_test_params().use_gradient

    def test_trajectories_unbent(self):
        """The gradient changes PHASE only: positions (and residency)
        are bitwise-identical with and without it, on both engines."""
        p0 = P.small_test_params(num_water=32, totaltime=0.0005,
                                 sprint_steps=500)
        pg = p0.replace(b0_gradient=(0.0, 0.0, 2e-4))
        sc = BacteriaBox(p0, seed=3).populate()
        for engine in ("scan", "pallas"):
            _, _, _, st0 = _run(p0, sc, engine=engine)
            _, _, _, stg = _run(pg, sc, engine=engine)
            np.testing.assert_array_equal(np.asarray(st0.pos),
                                          np.asarray(stg.pos))
            assert not np.array_equal(np.asarray(st0.phase),
                                      np.asarray(stg.phase))

    def test_engines_agree_with_gradient(self):
        p = P.small_test_params(num_water=32, totaltime=0.0005,
                                sprint_steps=500,
                                b0_gradient=(1e-4, 0.0, 2e-4))
        sc = BacteriaBox(p, seed=3).populate()
        _, cos_s, sin_s, _ = _run(p, sc, engine="scan")
        _, cos_p, sin_p, _ = _run(p, sc, engine="pallas")
        np.testing.assert_allclose(np.asarray(cos_s), cos_p, atol=2e-4)
        np.testing.assert_allclose(np.asarray(sin_s), sin_p, atol=2e-4)

    def test_cli_smoke_and_parse(self, tmp_path):
        from mri_nanoparticle_simulation_tpu.engine import sim
        out = str(tmp_path / "g.csv")
        rc = sim.main(["--num-water", "16", "--num-cells", "4",
                       "--totaltime", "0.002", "--sprint-steps", "1000",
                       "--chunk-steps", "100", "--near-k", "3",
                       "--taucp", "0.001", "--hash-dim", "8",
                       "--engine", "scan", "--quadrature",
                       "--gradient", "0,0,2e-4", "--out", out])
        assert rc == 0
        with pytest.raises(SystemExit):
            sim.main(["--gradient", "1,2", "--out", out])
        with pytest.raises(SystemExit):
            sim.main(["--gradient", "a,b,c", "--out", out])


class TestGradientDecomposition:
    def test_gradient_rides_B_column(self):
        """The gradient phase is moment-independent: the decomposition's
        A column must be bitwise-unchanged by the gradient (trajectories
        are identical and A holds only the dipole part); B carries it;
        and the s=1 reconstruction equals the direct gradient run."""
        p0 = P.small_test_params(num_water=32, totaltime=0.0005,
                                 sprint_steps=500, mmoment=2e-14)
        pg = p0.replace(b0_gradient=(0.0, 1e-4, 2e-4))
        sc = BacteriaBox(p0, seed=3).populate()
        r0 = _run(p0, sc, decompose=True)
        rg = _run(pg, sc, decompose=True)
        np.testing.assert_array_equal(r0.A, rg.A)
        assert not np.array_equal(r0.B, rg.B)
        _, cos_direct, _, _ = _run(pg, sc, engine="scan")
        rec = np.sum(np.cos(rg.A + rg.B), axis=1)
        np.testing.assert_allclose(rec, np.asarray(cos_direct), atol=1e-3)


class TestCarrPurcellAnalytic:
    def test_cpmg_attenuation_matches_closed_form(self):
        """Free diffusion in a constant gradient under a CPMG train:
        the fitted decay rate must match Carr-Purcell's
        R2 = gamma^2 G^2 D_eff taucp^2 / 3 — an ANALYTIC anchor for the
        gradient term, the diffusion kinematics, the CP flip schedule
        and the phase accumulation at once (the reference has no
        closed-form validation anywhere)."""
        D = 1.0
        p = P.small_test_params(
            num_water=512, num_cells=4, totaltime=0.02,
            sprint_steps=2000, taucp=0.002, mmoment=0.0,
            phase_k=0.0,            # no chemical-shift kick
            D_cell=D, D_extra=D,    # uniform diffusivity
        )
        r2_target = 100.0                        # 1/ms -> decays to e^-2
        gz = an.design_gradient_for_r2(p, r2_target, D=D)
        p = p.replace(b0_gradient=(0.0, 0.0, gz)).validate()
        # design and closed form are exact inverses
        assert an.carr_purcell_r2(p, D=D) == pytest.approx(r2_target)
        sc = BacteriaBox(p, seed=5).populate()
        _, cos, _, st = _run(p, sc, seed=7, engine="scan")
        assert int(np.asarray(st.escapes)) == 0
        times = np.arange(1, len(cos) + 1) * p.pfreq * p.tau
        te, me = an.sample_at_echoes(times, np.asarray(cos), p.taucp)
        assert len(te) == 5
        fit = an.fit_t2(te, me / p.num_water, floor=0.0)
        r2_fit = 1.0 / fit.t2_ms
        # 512 walkers / 5 echoes: Monte-Carlo scatter ~ a few percent
        assert abs(r2_fit - r2_target) / r2_target < 0.10, \
            f"fitted R2 {r2_fit:.2f} vs Carr-Purcell {r2_target:.2f}"


class TestDwiAdcRecovery:
    def test_crn_fit_recovers_adc_from_dwi_curve(self):
        """The clinical DWI workflow end to end: a gradient-weighted
        CPMG acquisition encodes the diffusion coefficient in its decay
        (R2 proportional to D_eff), and the CRN d_scale fit recovers the
        hidden ADC from that curve alone — no dipoles involved."""
        from mri_nanoparticle_simulation_tpu import inverse as inv
        p = P.small_test_params(
            num_water=128, num_cells=4, totaltime=0.01,
            sprint_steps=1000, taucp=0.001, mmoment=0.0, phase_k=0.0,
            D_cell=1.0, D_extra=1.0)
        gz = an.design_gradient_for_r2(p, 200.0, D=1.0)
        p = p.replace(b0_gradient=(0.0, 0.0, gz)).validate()
        sc = BacteriaBox(p, seed=5).populate()
        target = np.asarray(inv.make_engine_curve_fn(
            p, sc, seed=7, engine="scan")(0.55))
        fit = inv.fit_diffusion_scale_crn(
            target, p, sc, seed=7, bracket=(0.2, 1.0), iters=18,
            engine="scan")
        assert abs(fit.scale - 0.55) / 0.55 < 0.02
        assert fit.loss < 1e-6


class TestGradientSweep:
    def test_gz_sweep_b_value_series(self, tmp_path):
        """--sweep Gz: the DWI b-value series — R2 must grow
        quadratically in the gradient (Carr-Purcell), and the CLI
        writes one CSV per value."""
        from mri_nanoparticle_simulation_tpu.parallel import ensemble
        p = P.small_test_params(
            num_water=128, num_cells=4, totaltime=0.01,
            sprint_steps=1000, taucp=0.001, mmoment=0.0, phase_k=0.0,
            D_cell=1.0, D_extra=1.0)
        g1 = an.design_gradient_for_r2(p, 100.0, D=1.0)
        times, curves = ensemble.run_parameter_sweep(
            p, "Gz", [0.0, g1, 2.0 * g1], n_trials_each=1, paired=True)
        r2 = []
        for i, g in enumerate((0.0, g1, 2.0 * g1)):
            te, me = an.sample_at_echoes(times, curves[i, 0], p.taucp)
            if g == 0.0:
                # no gradient, no moment: nothing decays
                np.testing.assert_allclose(me, p.num_water, atol=1e-3)
                continue
            fit = an.fit_t2(te, me / p.num_water, floor=0.0)
            r2.append(1.0 / fit.t2_ms)
        # quadratic in G: 2x gradient -> 4x rate (within MC scatter)
        assert abs(r2[0] - 100.0) / 100.0 < 0.15
        assert abs(r2[1] / r2[0] - 4.0) < 0.6

    def test_cli_gz_sweep_smoke(self, tmp_path):
        from mri_nanoparticle_simulation_tpu.engine import sim
        out = str(tmp_path / "b.csv")
        rc = sim.main(["--num-water", "16", "--num-cells", "4",
                       "--totaltime", "0.002", "--sprint-steps", "1000",
                       "--chunk-steps", "100", "--near-k", "3",
                       "--taucp", "0.001", "--hash-dim", "8",
                       "--engine", "scan",
                       "--sweep", "Gz", "--sweep-values", "0,2e-4",
                       "--out", out])
        assert rc == 0
        import os
        assert os.path.exists(str(tmp_path / "b_Gz=0.csv"))
        assert os.path.exists(str(tmp_path / "b_Gz=0.0002.csv"))


class TestGradientPlaneCompose:
    def test_on_device_plane_carries_gradient_in_B(self):
        """run_plane_on_device with a gradient: the closed-form
        (moment x taucp) reconstruction must match direct runs at each
        scale — i.e. the gradient phase stays fixed while the dipole
        part scales (it rides the B column of the record planes)."""
        from mri_nanoparticle_simulation_tpu.engine import decompose as dec
        p = P.small_test_params(num_water=32, totaltime=0.001,
                                sprint_steps=500, mmoment=2e-14,
                                b0_gradient=(0.0, 0.0, 2e-4))
        sc = BacteriaBox(p, seed=3).populate()
        _, curves, stats, _ = dec.run_plane_on_device(
            sc, p, scales=[1.0, 2.0], taucps=None, seed=2,
            engine="scan")
        import dataclasses
        for i, s in enumerate((1.0, 2.0)):
            mn = sc.mnps.copy()
            mn[:, 4] *= s          # the moment lives in the scene table
            sc_s = dataclasses.replace(sc, mnps=mn)
            _, cos_direct, _, _ = re.run_simulation(sc_s, p, seed=2)
            np.testing.assert_allclose(
                curves[i, 0, :, 0] * p.num_water,
                np.asarray(cos_direct), atol=2e-3)
