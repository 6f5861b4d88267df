"""Pallas engine cross-validation against the scan engine.

Run in interpreter mode on CPU with the shared Threefry streams: the two
engines consume identical random numbers and execute the same arithmetic,
so trajectories agree to within compiler-level FMA/association differences
(a few ULPs over thousands of steps) — the strongest practical equivalence
for a rewritten kernel.  The real-TPU
equivalents are exercised by bench.py and the tpu-marked test."""

import jax.numpy as jnp
import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu.engine import pallas_engine as pe
from mri_nanoparticle_simulation_tpu.engine import reference_engine as re
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox


def both(p, seed_scene=3, seed=1):
    sc = BacteriaBox(p, seed=seed_scene).populate()
    r = re.run_simulation(sc, p, seed=seed, dtype=jnp.float32)
    q = pe.run_simulation(sc, p, seed=seed, dtype=jnp.float32,
                          interpret=True)
    return r, q


class TestEngineEquivalence:
    def test_chunk_equals_pfreq(self):
        p = P.small_test_params(chunk_steps=100, print_interval=0.0001,
                                num_water=64, totaltime=0.001,
                                sprint_steps=500)
        (_, c1, s1, st1), (_, c2, s2, st2) = both(p)
        np.testing.assert_allclose(np.asarray(st1.pos),
                                   np.asarray(st2.pos), atol=5e-6)
        np.testing.assert_allclose(c1, c2, atol=1e-3)

    def test_chunk_spans_windows(self):
        """chunk = 2 x pfreq: the production regime (chunk-major scan vs
        multi-window kernel)."""
        p = P.small_test_params(chunk_steps=200, print_interval=0.0001,
                                num_water=64, totaltime=0.0008,
                                sprint_steps=400)
        (_, c1, s1, st1), (_, c2, s2, st2) = both(p)
        np.testing.assert_allclose(np.asarray(st1.pos),
                                   np.asarray(st2.pos), atol=5e-6)
        np.testing.assert_allclose(c1, c2, atol=1e-3)
        assert int(st1.step) == int(st2.step) == p.t

    def test_with_reflection(self):
        p = P.small_test_params(chunk_steps=100, print_interval=0.0001,
                                num_water=32, totaltime=0.0004,
                                sprint_steps=400, water_start_bound=7.9,
                                avoid_intracellular_throw=False,
                                ).with_permeability()
        (_, c1, _, st1), (_, c2, _, st2) = both(p)
        np.testing.assert_allclose(np.asarray(st1.pos),
                                   np.asarray(st2.pos), atol=5e-6)
        np.testing.assert_allclose(c1, c2, atol=1e-3)

    def test_intended_kick(self):
        p = P.small_test_params(chunk_steps=100, print_interval=0.0001,
                                num_water=32, totaltime=0.0004,
                                sprint_steps=400, water_start_bound=7.9,
                                avoid_intracellular_throw=False,
                                kick_mode=P.KICK_INTENDED)
        (_, c1, _, st1), (_, c2, _, st2) = both(p)
        np.testing.assert_array_equal(np.asarray(st1.pos),
                                      np.asarray(st2.pos))
        np.testing.assert_allclose(c1, c2, atol=1e-3)

    def test_nonmultiple_walker_padding(self):
        """num_water not a multiple of 128: dummy lanes must not leak into
        the magnetization."""
        p = P.small_test_params(chunk_steps=100, print_interval=0.0001,
                                num_water=50, totaltime=0.0002,
                                sprint_steps=200)
        (_, c1, _, st1), (_, c2, _, st2) = both(p)
        np.testing.assert_allclose(np.asarray(st1.pos),
                                   np.asarray(st2.pos), atol=5e-6)
        np.testing.assert_allclose(c1, c2, atol=1e-3)
        assert abs(c2[0]) <= 50.0 + 1e-6


class TestPlaneRoundtrip:
    def test_to_from_planes(self):
        p = P.small_test_params(num_water=50)
        sc = BacteriaBox(p, seed=1).populate()
        st = re.init_state(sc.waters, p)
        ps = pe.to_planes(st, p)
        st2 = pe.from_planes(ps, 50)
        np.testing.assert_array_equal(np.asarray(st.pos),
                                      np.asarray(st2.pos))
        np.testing.assert_array_equal(np.asarray(st.in_cell),
                                      np.asarray(st2.in_cell))


@pytest.mark.tpu
class TestOnHardware:
    def test_compiled_kernel_matches_scan(self):
        """Mosaic-compiled kernel vs scan engine on the real chip."""
        p = P.small_test_params(chunk_steps=100, print_interval=0.0001,
                                num_water=64, totaltime=0.0005,
                                sprint_steps=500)
        sc = BacteriaBox(p, seed=3).populate()
        _, c1, _, st1 = re.run_simulation(sc, p, seed=1, dtype=jnp.float32)
        _, c2, _, st2 = pe.run_simulation(sc, p, seed=1, dtype=jnp.float32,
                                          interpret=False)
        np.testing.assert_allclose(np.asarray(st1.pos),
                                   np.asarray(st2.pos), atol=1e-4)
        np.testing.assert_allclose(c1, c2, atol=0.05)

    def test_hardware_rng_curve_matches_threefry(self):
        """The 87x headline path (hardware PRNG + polynomial Box-Muller)
        against the Threefry validation path on the real chip: the two
        T2 curves are independent samples of the same ensemble, so they
        must agree within the walker-sampling noise.  The full-length
        version of this comparison is dossier arm C (ACCURACY.md)."""
        p = P.Params(num_water=4032, totaltime=0.04, chunk_steps=4000,
                     near_k=5, sprint_steps=20000).validate()
        sc = BacteriaBox(p, seed=42).populate()
        _, c_hw, _, st_hw = pe.run_simulation(
            sc, p, seed=7, rng_impl=pe.RNG_HARDWARE)
        _, c_tf, _, _ = pe.run_simulation(
            sc, p, seed=7, rng_impl=pe.RNG_THREEFRY)
        d = (np.asarray(c_hw) - np.asarray(c_tf)) / p.num_water
        # difference of two independent W-walker means of cos phi:
        # sigma <= sqrt(2/W); allow 5 sigma on the max window
        assert np.abs(d).max() < 5.0 * np.sqrt(2.0 / p.num_water)
        assert int(st_hw.escapes) == 0

    def test_fused_recand_on_hardware(self, monkeypatch):
        """The fused candidate-model recandidate (big-scene path)
        compiled for real Mosaic: forced via REBUILD_MAX_MNPS=0 with an
        all-candidates cache (exact partition — far table identically
        zero), it must match the scan engine like every other path."""
        from mri_nanoparticle_simulation_tpu import rng
        from mri_nanoparticle_simulation_tpu.fields import expansion
        p = P.small_test_params(num_water=128, totaltime=0.001,
                                sprint_steps=500, mmoment=3.5e-15,
                                cube_hash_dim=8, far_table_order=3)
        sc = BacteriaBox(p, seed=3).populate()
        mp = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mM = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        assert sc.mnps.shape[0] <= p.cube_candidates
        cache = expansion.build_cache(mp, mM, p)
        monkeypatch.setattr(pe, "REBUILD_MAX_MNPS", 0)
        sprint = pe.make_sprint_fn(p, 128)
        kk = rng.key_from_seed(9)
        key_arr = jnp.asarray([np.uint32(kk[0]), np.uint32(kk[1])])
        ps = pe.to_planes(re.init_state(sc.waters, p), p)
        outs = []
        for _ in range(p.t // p.sprint_steps):
            ps, wins = sprint(mp, mM, key_arr, ps, 0, cache)
            outs.append(wins)
        wins = np.asarray(jnp.concatenate(outs, axis=0))
        st = pe.from_planes(ps, 128)
        _, c2, _, st2 = re.run_simulation(sc, p, seed=9)
        np.testing.assert_allclose(np.asarray(st.pos),
                                   np.asarray(st2.pos), atol=1e-4)
        np.testing.assert_allclose(wins[:, 0], c2, atol=0.05)

    def test_runtime_sweep_scalars_on_hardware(self):
        """The sweep launch scalars through real Mosaic (the CP flip is
        a scalar mod by an SMEM value; cell_r² rides a bitcast vector
        register): a runtime-override run must be bitwise-equal to the
        statically-compiled engine."""
        from mri_nanoparticle_simulation_tpu import rng
        p = P.small_test_params(num_water=256, totaltime=0.001,
                                sprint_steps=500)
        pv = p.replace(taucp=0.0003, cell_r=0.4).validate()
        sc = BacteriaBox(pv, seed=3).populate()
        _, c_s, _, st_s = pe.run_simulation(sc, pv, seed=9)
        sprint = pe.make_sprint_fn(p, sc.waters.shape[0])
        kk = rng.key_from_seed(9)
        key_arr = jnp.asarray([np.uint32(kk[0]), np.uint32(kk[1])])
        ps = pe.to_planes(re.init_state(sc.waters, pv), pv)
        mp = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mM = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        outs = []
        for _ in range(pv.t // pv.sprint_steps):
            ps, wins = sprint(mp, mM, key_arr, ps, 0,
                              tcp=jnp.uint32(pv.tcp),
                              cell_r=jnp.float32(pv.cell_r))
            outs.append(wins)
        wins = np.asarray(jnp.concatenate(outs, axis=0))
        st_r = pe.from_planes(ps, sc.waters.shape[0])
        np.testing.assert_array_equal(np.asarray(st_r.pos),
                                      np.asarray(st_s.pos))
        np.testing.assert_array_equal(wins[:, 0], np.asarray(c_s))


class TestMultiBlock:
    def test_two_block_grid_matches_scan(self):
        """num_water > one 4096-walker block: the kernel runs a 2-step
        grid; physics must match the scan engine exactly (per-block RNG
        seeding and valid-mask handling are the risks)."""
        p = P.small_test_params(chunk_steps=100, print_interval=0.0001,
                                num_water=4200, num_cells=12,
                                totaltime=0.0002, sprint_steps=200,
                                taucp=0.0001)
        sc = BacteriaBox(p, seed=3).populate()
        _, c1, _, st1 = re.run_simulation(sc, p, seed=1, dtype=jnp.float32)
        _, c2, _, st2 = pe.run_simulation(sc, p, seed=1, dtype=jnp.float32,
                                          interpret=True)
        assert pe.pad_count(4200) == 8192  # really 2 blocks
        np.testing.assert_allclose(np.asarray(st1.pos),
                                   np.asarray(st2.pos), atol=5e-6)
        np.testing.assert_allclose(c1, c2, atol=1e-2)


class TestOddPfreq:
    def test_odd_pfreq_step_count_threefry(self):
        """pfreq=125 (odd): the paired-step hardware loop runs a trailing
        single step; constant-kick phase counts steps exactly.  Run in
        threefry interpret mode on CPU (the hardware path shares the
        window/loop structure; its TPU variant is covered by the analytic
        check in the round log and the same code path)."""
        p = P.Params(num_water=32, num_cells=1, mmoment=0.0,
                     kick_mode=P.KICK_CONSTANT, phase_k=400.0, bound=8.0,
                     cell_r=3.5, water_start_bound=1.0,
                     avoid_intracellular_throw=False, tau=8e-6,
                     totaltime=0.002, taucp=0.001, print_interval=1e-3,
                     sprint_steps=250, chunk_steps=125, near_k=1,
                     hash_dim=4, max_neighbors=4).validate()
        assert p.pfreq % 2 == 1
        sc = BacteriaBox(p, seed=2).populate()
        _, c, _, _ = pe.run_simulation(sc, p, seed=8, interpret=True)
        K = p.phase_k * p.tau
        phase, expect = 0.0, []
        for step in range(p.pfreq, p.t + 1, p.pfreq):
            phase += p.pfreq * K
            expect.append(p.num_water * np.cos(phase))
            if step % p.tcp == 0:
                phase = -phase
        np.testing.assert_allclose(c, expect, rtol=1e-5)


class TestRuntimeSweepScalars:
    """taucp / cell_r as launch scalars (sweep-ergonomics path): a sprint
    compiled from BASE params but fed runtime tcp / cell_r overrides must
    match, bitwise, an engine compiled with those values baked statically
    — proving the scalar plumbing carries the full physics (CP flip
    timing and the containment radius) with zero recompiles."""

    def _scene_and_static(self, pv, engine):
        sc = BacteriaBox(pv, seed=3).populate()
        if engine == "pallas":
            r = pe.run_simulation(sc, pv, seed=9, interpret=True)
        else:
            r = re.run_simulation(sc, pv, seed=9)
        return sc, r

    def test_pallas_runtime_scalars_match_static(self):
        from mri_nanoparticle_simulation_tpu import rng
        p = P.small_test_params(num_water=64, totaltime=0.001,
                                sprint_steps=500)
        pv = p.replace(taucp=0.0003, cell_r=0.4).validate()
        sc, (_, c_s, _, st_s) = self._scene_and_static(pv, "pallas")

        sprint = pe.make_sprint_fn(p, sc.waters.shape[0], interpret=True)
        kk = rng.key_from_seed(9)
        key_arr = jnp.asarray([np.uint32(kk[0]), np.uint32(kk[1])])
        ps = pe.to_planes(re.init_state(sc.waters, pv), pv)
        mnp_pos = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mnp_M = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        outs = []
        for _ in range(pv.t // pv.sprint_steps):
            ps, wins = sprint(mnp_pos, mnp_M, key_arr, ps, 0,
                              tcp=jnp.uint32(pv.tcp),
                              cell_r=jnp.float32(pv.cell_r))
            outs.append(wins)
        wins = np.asarray(jnp.concatenate(outs, axis=0))
        st_r = pe.from_planes(ps, sc.waters.shape[0])
        np.testing.assert_array_equal(np.asarray(st_r.pos),
                                      np.asarray(st_s.pos))
        np.testing.assert_array_equal(np.asarray(st_r.phase),
                                      np.asarray(st_s.phase))
        np.testing.assert_array_equal(wins[:, 0], c_s)

    def test_scan_runtime_scalars_match_static(self):
        from mri_nanoparticle_simulation_tpu import rng
        p = P.small_test_params(num_water=64, totaltime=0.001,
                                sprint_steps=500)
        pv = p.replace(taucp=0.0003, cell_r=0.4).validate()
        sc, (_, c_s, _, st_s) = self._scene_and_static(pv, "scan")

        sprint = re.make_sprint_fn(p)
        kk = rng.key_from_seed(9)
        key_arr = jnp.asarray([np.uint32(kk[0]), np.uint32(kk[1])])
        st = re.init_state(sc.waters, pv)
        mnp_pos = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mnp_M = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        outs = []
        for _ in range(pv.t // pv.sprint_steps):
            st, wins = sprint(mnp_pos, mnp_M, key_arr, st, 0,
                              tcp=jnp.uint32(pv.tcp),
                              cell_r=jnp.float32(pv.cell_r))
            outs.append(wins)
        wins = np.asarray(jnp.concatenate(outs, axis=0))
        np.testing.assert_array_equal(np.asarray(st.pos),
                                      np.asarray(st_s.pos))
        np.testing.assert_array_equal(np.asarray(st.phase),
                                      np.asarray(st_s.phase))
        np.testing.assert_array_equal(wins[:, 0], c_s)

    def test_default_none_is_bitwise_identical(self):
        """Passing no overrides must reproduce the pre-change program
        exactly (the params values ride the same launch scalars)."""
        p = P.small_test_params(num_water=64, totaltime=0.0005,
                                sprint_steps=500)
        sc = BacteriaBox(p, seed=3).populate()
        _, c1, _, st1 = pe.run_simulation(sc, p, seed=9, interpret=True)
        _, c2, _, st2 = re.run_simulation(sc, p, seed=9)
        np.testing.assert_allclose(np.asarray(st1.pos),
                                   np.asarray(st2.pos), atol=5e-6)
        np.testing.assert_allclose(c1, c2, atol=1e-3)


class TestDiffusionScaleScalar:
    """The d_scale launch scalar in the Pallas kernel: runtime
    diffusion-coefficient scaling (stdev x sqrt(d_scale)), matching the
    scan engine's dyn stdev scale bitwise on shared Threefry streams."""

    def _pallas_sprints(self, p, sc, d_scale=None):
        from mri_nanoparticle_simulation_tpu import rng
        sprint = pe.make_sprint_fn(p, sc.waters.shape[0], interpret=True)
        kk = rng.key_from_seed(9)
        key_arr = jnp.asarray([np.uint32(kk[0]), np.uint32(kk[1])])
        ps = pe.to_planes(re.init_state(sc.waters, p), p)
        mnp_pos = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mnp_M = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        outs = []
        for _ in range(p.t // p.sprint_steps):
            ps, wins = sprint(mnp_pos, mnp_M, key_arr, ps, 0,
                              d_scale=d_scale)
            outs.append(wins)
        st = pe.from_planes(ps, sc.waters.shape[0])
        return np.asarray(st.pos), np.asarray(
            jnp.concatenate(outs, axis=0))

    def test_identity_override_bitwise(self):
        p = P.small_test_params(num_water=64, totaltime=0.0005,
                                sprint_steps=500)
        sc = BacteriaBox(p, seed=3).populate()
        pos0, w0 = self._pallas_sprints(p, sc)
        pos1, w1 = self._pallas_sprints(p, sc, d_scale=1.0)
        np.testing.assert_array_equal(pos0, pos1)
        np.testing.assert_array_equal(w0, w1)

    def test_matches_scan_engine_scaled(self):
        """d_scale=0.25 through the kernel vs the scan engine's dyn
        scalar: identical Threefry streams, same multiply order ->
        trajectories agree to interpreter-level rounding."""
        from mri_nanoparticle_simulation_tpu import rng
        p = P.small_test_params(num_water=64, totaltime=0.0005,
                                sprint_steps=500)
        sc = BacteriaBox(p, seed=3).populate()
        pos_p, w_p = self._pallas_sprints(p, sc, d_scale=0.25)

        sprint = re.make_sprint_fn(p)
        kk = rng.key_from_seed(9)
        key_arr = jnp.asarray([np.uint32(kk[0]), np.uint32(kk[1])])
        st = re.init_state(sc.waters, p)
        mnp_pos = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mnp_M = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        outs = []
        for _ in range(p.t // p.sprint_steps):
            st, wins = sprint(mnp_pos, mnp_M, key_arr, st, 0,
                              d_scale=0.25)
            outs.append(wins)
        w_s = np.asarray(jnp.concatenate(outs, axis=0))
        np.testing.assert_allclose(pos_p, np.asarray(st.pos), atol=5e-6)
        np.testing.assert_allclose(w_p[:, 0], w_s[:, 0], atol=1e-3)

    def test_nonpositive_rejected(self):
        p = P.small_test_params(num_water=64, totaltime=0.0005,
                                sprint_steps=500)
        sc = BacteriaBox(p, seed=3).populate()
        with pytest.raises(ValueError, match="d_scale"):
            self._pallas_sprints(p, sc, d_scale=-1.0)


class TestBigScenePathFused:
    def test_fused_recand_matches_scan_engine(self, monkeypatch):
        """Force the big-scene path (REBUILD_MAX_MNPS -> 0) with a
        far-table cache whose candidate set covers EVERY dipole, so the
        table term is identically zero and the fused candidate-model
        recandidate is an exact partition — the engine must then match
        the scan engine to the usual cross-engine tolerance."""
        from mri_nanoparticle_simulation_tpu import rng as rng_mod
        from mri_nanoparticle_simulation_tpu.fields import expansion
        p = P.small_test_params(num_water=128, totaltime=0.001,
                                sprint_steps=500, mmoment=3.5e-15,
                                cube_hash_dim=8, far_table_order=3)
        sc = BacteriaBox(p, seed=3).populate()
        mp = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mM = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        assert sc.mnps.shape[0] <= p.cube_candidates
        cache = expansion.build_cache(mp, mM, p)
        assert cache.far_coeffs is not None
        monkeypatch.setattr(pe, "REBUILD_MAX_MNPS", 0)
        sprint = pe.make_sprint_fn(p, 128, interpret=True)
        kk = rng_mod.key_from_seed(9)
        key_arr = jnp.asarray([np.uint32(kk[0]), np.uint32(kk[1])])
        ps = pe.to_planes(re.init_state(sc.waters, p), p)
        outs = []
        for _ in range(p.t // p.sprint_steps):
            ps, wins = sprint(mp, mM, key_arr, ps, 0, cache)
            outs.append(wins)
        wins = np.asarray(jnp.concatenate(outs, axis=0))
        st = pe.from_planes(ps, 128)
        _, c2, _, st2 = re.run_simulation(sc, p, seed=9)
        np.testing.assert_allclose(np.asarray(st.pos),
                                   np.asarray(st2.pos), atol=5e-6)
        np.testing.assert_allclose(wins[:, 0], c2, atol=1e-3)
        assert int(st.step) == int(st2.step) == p.t


class TestReflectScalar:
    """The reflect=(reflect_io, reflect_oi) launch scalars in the Pallas
    kernel (scalars[9]/[10]): runtime membrane bounce probabilities,
    matching the scan engine's dyn scalars on shared Threefry streams."""

    @staticmethod
    def _perm_params():
        # D x100 so 500 steps produce many membrane crossings
        base = P.small_test_params(
            num_water=64, totaltime=0.0005, sprint_steps=500,
            water_start_bound=7.9, avoid_intracellular_throw=False)
        return base.replace(D_cell=base.D_cell * 100,
                            D_extra=base.D_extra * 100).with_permeability()

    def _pallas_sprints(self, p, sc, reflect=None):
        from mri_nanoparticle_simulation_tpu import rng
        sprint = pe.make_sprint_fn(p, sc.waters.shape[0], interpret=True)
        kk = rng.key_from_seed(11)
        key_arr = jnp.asarray([np.uint32(kk[0]), np.uint32(kk[1])])
        ps = pe.to_planes(re.init_state(sc.waters, p), p)
        mnp_pos = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mnp_M = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        outs = []
        for _ in range(p.t // p.sprint_steps):
            ps, wins = sprint(mnp_pos, mnp_M, key_arr, ps, 0,
                              reflect=reflect)
            outs.append(wins)
        st = pe.from_planes(ps, sc.waters.shape[0])
        return np.asarray(st.pos), np.asarray(
            jnp.concatenate(outs, axis=0))

    def test_identity_override_bitwise(self):
        p = self._perm_params()
        sc = BacteriaBox(p, seed=5).populate()
        pos0, w0 = self._pallas_sprints(p, sc)
        pos1, w1 = self._pallas_sprints(
            p, sc, reflect=(p.reflect_io, p.reflect_oi))
        np.testing.assert_array_equal(pos0, pos1)
        np.testing.assert_array_equal(w0, w1)

    def test_asymmetric_override_matches_static_params(self):
        """(0.9, 0.3) as launch scalars through a kernel compiled with
        different static probabilities == the same values baked in."""
        p = self._perm_params()
        sc = BacteriaBox(p, seed=5).populate()
        pos_dyn, w_dyn = self._pallas_sprints(p, sc, reflect=(0.9, 0.3))
        p_static = p.replace(reflect_io=0.9, reflect_oi=0.3)
        pos_st, w_st = self._pallas_sprints(p_static, sc)
        np.testing.assert_array_equal(pos_dyn, pos_st)
        np.testing.assert_array_equal(w_dyn, w_st)
        # transparent membranes must differ (the scalar is really live)
        pos0, _ = self._pallas_sprints(p, sc, reflect=(0.0, 0.0))
        assert not np.array_equal(pos_dyn, pos0)

    def test_rejected_when_reflection_compiled_out(self):
        p = P.small_test_params(num_water=64, totaltime=0.0005,
                                sprint_steps=500)
        sc = BacteriaBox(p, seed=5).populate()
        with pytest.raises(ValueError, match="reflection enabled"):
            self._pallas_sprints(p, sc, reflect=(0.5, 0.5))
