"""Walker-engine physics tests.

The strongest test here is the NumPy oracle: an independent, line-by-line
transcription of the reference kernel semantics (diffusion, reflection,
kick, windows, Carr-Purcell flips) driven by the *same* Threefry counter
stream as the engine — so engine trajectories must match to floating-point
tolerance.  The reference itself could never be tested this way (stateful
time-seeded RNG)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu.engine import reference_engine as re
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox
from mri_nanoparticle_simulation_tpu.scene.nprng import threefry2x32_np


# ---------------------------------------------------------------------------
# NumPy oracle
# ---------------------------------------------------------------------------

def np_words_for_step(seed, step, lanes, n_words):
    key = (np.uint32(seed >> 32), np.uint32(seed & 0xFFFFFFFF))
    out = []
    old = np.seterr(over="ignore")
    for pair in range((n_words + 1) // 2):
        c1 = lanes.astype(np.uint32) + np.uint32(pair << 27)
        w0, w1 = threefry2x32_np(key, np.full_like(c1, step), c1)
        out += [w0, w1]
    np.seterr(**old)
    return out[:n_words]


def np_uniform(bits):
    return (bits >> np.uint32(8)).astype(np.float64) * 2.0 ** -24


def np_normal(a, b):
    ua, ub = np_uniform(a), np_uniform(b)
    return np.sqrt(-2.0 * np.log(1.0 - ua)) * np.cos(2.0 * np.pi * ub)


def np_field_masked(pos, mnps, cell_r):
    d = pos[:, None, :] - mnps[None, :, :3]
    r2 = np.sum(d * d, axis=2)
    outside = r2 > cell_r ** 2
    r2s = np.where(outside, r2, 1.0)
    val = mnps[None, :, 4] * 1e11 * \
        (2 * d[:, :, 2] ** 2 - d[:, :, 0] ** 2 - d[:, :, 1] ** 2) / \
        (r2s * r2s * np.sqrt(r2s))
    return np.sum(np.where(outside, val, 0.0), axis=1), outside


def numpy_oracle(scene, p, seed, n_steps, wrap="chunk"):
    """Replay the engine semantics step by step in float64 NumPy.

    ``wrap='chunk'`` wraps positions at chunk boundaries (the engine's
    semantics); ``wrap='step'`` wraps after every displacement — the
    reference's boundary_conditions placement (cuda_sim.cu:597-601,
    applied before updateNearest at :712-716).  Fields/residency are
    evaluated against the full MNP table (base + periodic images), so the
    two must agree up to roundoff: that is the engine's documented
    equivalence claim (reference_engine.py module docstring), tested
    adversarially in TestWrapSemantics."""
    pos = scene.waters.copy()
    mnps = scene.mnps
    cells = scene.cells
    w = len(pos)
    lanes = np.arange(w)
    phase = np.zeros(w)
    acc = np.zeros(w)
    use_refl = p.reflect_io > 0 or p.reflect_oi > 0
    n_words = 7 if (use_refl or p.kick_mode == P.KICK_INTENDED) else 5

    def in_cell_of(x):
        d2 = np.sum((x[:, None, :] - cells[None]) ** 2, axis=2)
        return d2.min(axis=1) < p.cell_r ** 2

    outs = []
    if wrap == "step":
        pos = np.mod(pos + p.bound, p.bound)
    b_prev = np_field_masked(pos, mnps, p.cell_r)[0]
    in_cell = in_cell_of(pos)
    for s in range(n_steps):
        if wrap == "chunk" and s % p.chunk_steps == 0:
            pos = np.mod(pos + p.bound, p.bound)
            b_prev, _ = np_field_masked(pos, mnps, p.cell_r)
            in_cell = in_cell_of(pos)
        words = np_words_for_step(seed, s, lanes, n_words)
        ux, uy, uz = (np_uniform(words[i]) for i in range(3))
        nrm = np_normal(words[3], words[4])
        dx, dy, dz = 2 * ux - 1, 2 * uy - 1, 2 * uz - 1
        inv = 1.0 / np.sqrt(np.maximum(dx * dx + dy * dy + dz * dz, 1e-12))
        mag = nrm * np.where(in_cell, p.in_stdev, p.out_stdev) * inv
        new = pos + np.stack([dx * mag, dy * mag, dz * mag], 1)
        if wrap == "step":
            new = np.mod(new + p.bound, p.bound)
        b, _ = np_field_masked(new, mnps, p.cell_r)
        in_new = in_cell_of(new)
        if use_refl:
            coin = np_uniform(words[5])
            flip = (in_cell & ~in_new & (coin < p.reflect_io)) | \
                   (~in_cell & in_new & (coin < p.reflect_oi))
            new = np.where(flip[:, None], pos, new)
            b = np.where(flip, b_prev, b)
            in_new = np.where(flip, in_cell, in_new)
        kick = b * p.phase_per_tesla
        if p.kick_mode == P.KICK_AS_WRITTEN:
            kick = kick + in_new * p.chem_shift_kick
        elif p.kick_mode == P.KICK_CONSTANT:
            kick = kick + in_new * (p.phase_k * p.tau)
        elif p.kick_mode == P.KICK_INTENDED:
            u = np_uniform(words[6])
            c = u - 0.5
            cau = np.sqrt(1.0 / np.maximum(2 * np.abs(c), 1e-12) - 1.0)
            kick = kick + in_new * (p.phase_stdev * p.tau * cau * np.sign(c)
                                    + p.chem_shift_kick)
        acc += kick
        pos, in_cell, b_prev = new, in_new, b
        if (s + 1) % p.pfreq == 0:
            phase = phase + acc
            acc = np.zeros(w)
            outs.append([np.sum(np.cos(phase)), np.sum(np.sin(phase))])
            if (s + 1) % p.tcp == 0:
                phase = -phase
    return pos, phase, np.array(outs)


@pytest.fixture(scope="module")
def tiny():
    p = P.small_test_params(num_water=16, num_cells=6,
                            totaltime=0.001, sprint_steps=500,
                            taucp=0.0002,        # flip every 200 steps
                            print_interval=0.0001, chunk_steps=50,
                            # make intracellular physics actually happen
                            water_start_bound=7.9, avoid_intracellular_throw=False)
    sc = BacteriaBox(p, seed=11).populate()
    return p, sc


class TestOracleAgreement:
    def run_both(self, p, sc, seed=5):
        times, c, s, st = re.run_simulation(sc, p, seed=seed,
                                            dtype=jnp.float64)
        o_pos, o_phase, o_outs = numpy_oracle(sc, p, seed, p.t)
        return (np.asarray(st.pos), np.asarray(st.phase), c, s,
                o_pos, o_phase, o_outs)

    def test_trajectories_match_oracle(self, tiny, f64):
        p, sc = tiny
        pos, phase, c, s, o_pos, o_phase, o_outs = self.run_both(p, sc)
        # engine wraps at chunk starts; oracle identical — positions should
        # agree to f64 roundoff + expansion-vs-exact field differences
        # (field error ~1e-9 T alters no branch decisions here)
        np.testing.assert_allclose(pos, o_pos, atol=1e-9)
        np.testing.assert_allclose(phase, o_phase, atol=1e-7)
        np.testing.assert_allclose(
            np.stack([c, s], 1), o_outs, atol=1e-6)

    def test_oracle_agreement_with_reflection(self, f64):
        p = P.small_test_params(
            num_water=16, num_cells=6, totaltime=0.0004, sprint_steps=400,
            taucp=0.0002, print_interval=0.0001, chunk_steps=50,
            water_start_bound=7.9, avoid_intracellular_throw=False,
        ).with_permeability()
        sc = BacteriaBox(p, seed=13).populate()
        times, c, s, st = re.run_simulation(sc, p, seed=9,
                                            dtype=jnp.float64)
        o_pos, o_phase, o_outs = numpy_oracle(sc, p, 9, p.t)
        np.testing.assert_allclose(np.asarray(st.pos), o_pos, atol=1e-9)
        np.testing.assert_allclose(
            np.stack([c, s], 1), o_outs, atol=1e-6)

    def test_oracle_agreement_intended_kick(self, f64):
        p = P.small_test_params(
            num_water=16, num_cells=6, totaltime=0.0004, sprint_steps=400,
            taucp=0.0002, print_interval=0.0001, chunk_steps=50,
            water_start_bound=7.9, avoid_intracellular_throw=False,
            kick_mode=P.KICK_INTENDED)
        sc = BacteriaBox(p, seed=17).populate()
        _, c, s, st = re.run_simulation(sc, p, seed=2, dtype=jnp.float64)
        o_pos, o_phase, o_outs = numpy_oracle(sc, p, 2, p.t)
        np.testing.assert_allclose(np.asarray(st.pos), o_pos, atol=1e-9)
        np.testing.assert_allclose(
            np.stack([c, s], 1), o_outs, atol=1e-6)


class TestPhysics:
    def test_diffusion_msd(self, f64):
        """Per-step MSD = out_stdev^2 = pi*D*tau (parameters.h:120-121) —
        the reference's calibration, preserved exactly."""
        p = P.small_test_params(num_water=512, num_cells=1, mmoment=0.0,
                                kick_mode=P.KICK_NONE, bound=40.0,
                                water_start_bound=2.0, totaltime=0.001,
                                sprint_steps=1000, taucp=10.0,
                                hash_dim=4, near_k=1)
        sc = BacteriaBox(p, seed=1).populate()
        _, _, _, st = re.run_simulation(sc, p, seed=3, dtype=jnp.float64)
        disp = np.asarray(st.pos) - sc.waters
        # no wrap events: walkers start centered in a 40 µm box
        msd = np.mean(np.sum(disp ** 2, axis=1))
        expect = p.t * np.pi * p.D_extra * p.tau
        assert msd == pytest.approx(expect, rel=0.15)

    def test_determinism(self, tiny):
        p, sc = tiny
        r1 = re.run_simulation(sc, p, seed=4)
        r2 = re.run_simulation(sc, p, seed=4)
        np.testing.assert_array_equal(r1[1], r2[1])
        np.testing.assert_array_equal(np.asarray(r1[3].pos),
                                      np.asarray(r2[3].pos))

    def test_seed_changes_run(self, tiny):
        p, sc = tiny
        r1 = re.run_simulation(sc, p, seed=4)
        r2 = re.run_simulation(sc, p, seed=5)
        assert not np.array_equal(np.asarray(r1[3].pos),
                                  np.asarray(r2[3].pos))

    def test_constant_kick_analytic(self, f64):
        """mmoment=0 + constant kick + everyone inside the one giant cell:
        phase is exactly n*K with sign flips at Carr-Purcell times, so
        sum cos is analytic.  Verifies window accounting, emission-before-
        flip ordering (cuda_sim.cu:1015-1022), and Kahan folding."""
        p = P.small_test_params(num_water=32, num_cells=1, mmoment=0.0,
                                kick_mode=P.KICK_CONSTANT, phase_k=400.0,
                                bound=8.0, cell_r=3.5,
                                water_start_bound=1.0,
                                avoid_intracellular_throw=False,
                                totaltime=0.001, sprint_steps=1000,
                                taucp=0.0003, print_interval=0.0001,
                                chunk_steps=100, near_k=1, hash_dim=4)
        sc = BacteriaBox(p, seed=2).populate()
        # all walkers inside the single cell the whole run (cell radius 3.5,
        # water cube diag << 3.5 around the cell center region)
        center = sc.cells[0]
        assert np.all(np.linalg.norm(sc.waters - center, axis=1) < 2.0)
        times, c, s, _ = re.run_simulation(sc, p, seed=8, dtype=jnp.float64)
        K = p.phase_k * p.tau
        phase = 0.0
        expect = []
        for step in range(p.pfreq, p.t + 1, p.pfreq):
            phase += p.pfreq * K
            expect.append(p.num_water * np.cos(phase))
            if step % p.tcp == 0:
                phase = -phase
        np.testing.assert_allclose(c, expect, rtol=1e-9)

    def test_impermeable_no_entry(self):
        """reflectIO=reflectOI=1: walkers thrown outside cells never
        acquire intracellular kicks (parameters.h:113-114)."""
        p = P.small_test_params(num_water=64, num_cells=12, mmoment=0.0,
                                kick_mode=P.KICK_CONSTANT, phase_k=1e6,
                                totaltime=0.001, sprint_steps=1000,
                                water_start_bound=7.0).impermeable()
        sc = BacteriaBox(p, seed=21).populate()
        _, c, s, st = re.run_simulation(sc, p, seed=6)
        assert not np.asarray(st.in_cell).any()
        np.testing.assert_allclose(c, p.num_water, rtol=1e-6)

    def test_no_escapes(self, tiny):
        p, sc = tiny
        _, _, _, st = re.run_simulation(sc, p, seed=5)
        assert int(st.escapes) == 0

    def test_step_counter(self, tiny):
        p, sc = tiny
        _, _, _, st = re.run_simulation(sc, p, seed=5)
        assert int(st.step) == p.t


class TestPrecision:
    def test_f32_curve_matches_f64(self, f64):
        """The production dtype's magnetization curve vs the f64 oracle on
        the same Threefry stream.  Individual trajectories may diverge
        (in-cell boundary decisions flip under rounding — chaotic but
        distribution-preserving); the ensemble curve must not.  Full-scale
        dossier: 128 walkers x 5e5 steps at reference density gave
        per-walker curve rms 5.6e-5 (~5e-4 extrapolated to 4e7 steps,
        20x under the <1% target)."""
        p = P.Params(num_water=64, num_cells=270, totaltime=0.1,
                     sprint_steps=10000, chunk_steps=500, taucp=0.025,
                     print_interval=0.001).validate()
        sc = BacteriaBox(p, seed=42).populate()
        _, c64, _, _ = re.run_simulation(sc, p, seed=7, dtype=jnp.float64)
        _, c32, _, _ = re.run_simulation(sc, p, seed=7, dtype=jnp.float32)
        err = np.abs(c64 - c32.astype(np.float64)) / p.num_water
        assert np.sqrt((err ** 2).mean()) < 3e-4

    def test_grid_field_mode_curve_matches_exact(self, f64):
        """FIELD_GRID (the octree analogue, BASELINE config 4) against the
        exact brute-force oracle: same trajectories up to the grid's
        trilinear far-field error; curve error bounded well under the 1%
        target."""
        p = P.small_test_params(num_water=48, totaltime=0.001,
                                sprint_steps=500, mmoment=3.5e-15)
        sc = BacteriaBox(p, seed=5).populate()
        _, ce, se, ste = re.run_simulation(
            sc, p.replace(field_mode=P.FIELD_EXACT), seed=3,
            dtype=jnp.float64)
        _, cg, sg, stg = re.run_simulation(
            sc, p.replace(field_mode=P.FIELD_GRID, grid_n=64), seed=3,
            dtype=jnp.float64)
        # grid mode wraps per step; exact mode per chunk — compare mod box
        d = np.abs(np.mod(np.asarray(ste.pos), p.bound) - np.asarray(stg.pos))
        d = np.minimum(d, p.bound - d)
        np.testing.assert_allclose(d, 0.0, atol=1e-9)
        err = np.abs(np.asarray(ce) - np.asarray(cg)) / p.num_water
        assert np.sqrt((err ** 2).mean()) < 1e-3

    def test_exact_field_mode_matches_expansion(self):
        """FIELD_EXACT (the reference's EXPLICIT mode) as an independent
        oracle: trajectories must match the production expansion backend
        (field differences ~1e-9 T never flip an f32 branch here)."""
        p = P.small_test_params(num_water=32, totaltime=0.0005,
                                sprint_steps=500)
        sc = BacteriaBox(p, seed=3).populate()
        _, c1, _, st1 = re.run_simulation(sc, p, seed=1)
        _, c2, _, st2 = re.run_simulation(
            sc, p.replace(field_mode=P.FIELD_EXACT), seed=1)
        np.testing.assert_allclose(np.asarray(st1.pos),
                                   np.asarray(st2.pos), atol=1e-5)
        np.testing.assert_allclose(c1, c2, atol=1e-3)


class TestWrapSemantics:
    """Adversarial test of the chunk-boundary wrapping deviation.

    The engine wraps positions at chunk starts; the reference wrapped
    every step (boundary_conditions, cuda_sim.cu:597-601).  The module
    docstring argues these are equivalent because MNP periodic images
    make the field translation-periodic within `border` of each face and
    cells never cross faces.  Here the claim is tested against an oracle
    that implements the OTHER wrap rule, on a scene whose walkers are
    seeded within ~one step length of faces, edges, and corners."""

    def _face_hugging_scene(self):
        p = P.small_test_params(
            num_water=26, num_cells=8, totaltime=0.0006, sprint_steps=600,
            chunk_steps=50, print_interval=0.0001, taucp=0.0003,
            mmoment=3.5e-15, water_start_bound=8.0)
        sc = BacteriaBox(p, seed=19).populate()
        b, eps = p.bound, 2e-3  # eps ~ out_stdev: one step from the face
        lo, hi, mid = eps, b - eps, b / 2
        pts = []
        for x in (lo, mid, hi):
            for y in (lo, mid, hi):
                for z in (lo, mid, hi):
                    if (x, y, z) != (mid, mid, mid):
                        pts.append([x, y, z])  # 26 faces/edges/corners
        sc.waters[:] = np.asarray(pts)[:p.num_water]
        return p, sc

    def test_chunk_wrap_matches_per_step_wrap_oracle(self, f64):
        p, sc = self._face_hugging_scene()
        # exact field mode isolates the wrap rule (identical field model
        # on both sides: full MNP table with periodic images)
        _, c, s, st = re.run_simulation(
            sc, p.replace(field_mode=P.FIELD_EXACT), seed=23,
            dtype=jnp.float64)
        o_pos, o_phase, o_outs = numpy_oracle(sc, p, 23, p.t, wrap="step")
        eng_pos = np.mod(np.asarray(st.pos) + p.bound, p.bound)
        d = np.abs(eng_pos - o_pos)
        d = np.minimum(d, p.bound - d)  # positions equal modulo the box
        np.testing.assert_allclose(d, 0.0, atol=1e-9)

        # Phases differ ONLY by the unimaged-tail field picked up while a
        # walker is outside the box: |ΔB| at an excursion point is the
        # field-periodicity defect of the truncated image table.  Measure
        # that defect directly on probe points one excursion depth outside
        # every face, and bound the phase gap by it (conservatively:
        # every step spent outside).
        depth = np.sqrt(p.chunk_steps) * p.out_stdev
        probes = []
        for axis in range(3):
            for side in (-depth, p.bound + depth):
                q = np.random.default_rng(0).uniform(
                    0, p.bound, size=(64, 3))
                q[:, axis] = side
                probes.append(q)
        probes = np.concatenate(probes)
        b_out = np_field_masked(probes, sc.mnps, p.cell_r)[0]
        b_wrap = np_field_masked(np.mod(probes, p.bound), sc.mnps,
                                 p.cell_r)[0]
        gap = np.abs(b_out - b_wrap).max()
        tol = p.t * p.phase_per_tesla * gap
        assert np.abs(np.asarray(st.phase) - o_phase).max() < tol
        np.testing.assert_allclose(np.stack([c, s], 1), o_outs,
                                   atol=p.num_water * tol)

    def test_expansion_covers_face_hugging_walkers(self, f64):
        """The production expansion backend on the same face-hugging
        scene: near-K selection must cover image dipoles for walkers
        straying outside the box."""
        p, sc = self._face_hugging_scene()
        _, c1, s1, st1 = re.run_simulation(sc, p, seed=23,
                                           dtype=jnp.float64)
        _, c2, s2, st2 = re.run_simulation(
            sc, p.replace(field_mode=P.FIELD_EXACT), seed=23,
            dtype=jnp.float64)
        np.testing.assert_allclose(np.asarray(st1.pos),
                                   np.asarray(st2.pos), atol=1e-9)
        np.testing.assert_allclose(c1, c2, atol=1e-6)


class TestPhaseDtype:
    def test_f64_phase_does_not_change_trajectories(self, f64):
        """phase never feeds back into positions: an f64-phase run is
        bitwise trajectory-identical to the f32-Kahan run, isolating
        accumulation drift exactly (the accuracy dossier's arm A)."""
        p = P.small_test_params(num_water=32, totaltime=0.001,
                                sprint_steps=500, mmoment=3.5e-15)
        sc = BacteriaBox(p, seed=5).populate()
        _, c32, _, st32 = re.run_simulation(sc, p, seed=3)
        _, c64, _, st64 = re.run_simulation(sc, p, seed=3,
                                            phase_dtype=jnp.float64)
        np.testing.assert_array_equal(np.asarray(st32.pos),
                                      np.asarray(st64.pos))
        assert np.asarray(st64.phase).dtype == np.float64
        # Kahan keeps the f32 fold within ~1e-8 of the f64 truth here
        drift = np.abs(np.asarray(st32.phase, np.float64)
                       - np.asarray(st64.phase)).max()
        assert drift < 1e-7
        np.testing.assert_allclose(c32, np.asarray(c64), atol=1e-3)


class TestDiffusionScaleOverride:
    """The d_scale launch scalar: runtime diffusion-coefficient scaling
    (stdev *= sqrt(d_scale)) for fits/sweeps sharing one compiled
    program (and the AD path of inverse.fit_diffusion_scale)."""

    def _one_sprint(self, p, sc, **kw):
        import jax.numpy as jnp
        from mri_nanoparticle_simulation_tpu import rng
        mnp_pos = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mnp_M = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        sprint = re.make_sprint_fn(p)
        k = rng.key_from_seed(7)
        key = jnp.asarray([np.uint32(k[0]), np.uint32(k[1])])
        st = re.init_state(sc.waters, p)
        st, wins = sprint(mnp_pos, mnp_M, key, st, 0, **kw)
        return np.asarray(st.pos), np.asarray(wins)

    def test_identity_override_bitwise(self):
        p = P.small_test_params(num_water=32, totaltime=0.0005,
                                sprint_steps=500)
        sc = BacteriaBox(p, seed=3).populate()
        pos0, w0 = self._one_sprint(p, sc)
        pos1, w1 = self._one_sprint(p, sc, d_scale=1.0)
        np.testing.assert_array_equal(pos0, pos1)
        np.testing.assert_array_equal(w0, w1)

    def test_power_of_four_scale_matches_scaled_params(self):
        """d_scale=4 must equal a params with both D's x4 BITWISE:
        sqrt(4x) = 2*sqrt(x) exactly in IEEE, and the extra multiply is
        by a power of two."""
        p = P.small_test_params(num_water=32, totaltime=0.0005,
                                sprint_steps=500)
        sc = BacteriaBox(p, seed=3).populate()
        pos_dyn, w_dyn = self._one_sprint(p, sc, d_scale=4.0)
        p4 = p.replace(D_cell=4 * p.D_cell, D_extra=4 * p.D_extra)
        pos_st, w_st = self._one_sprint(p4, sc)
        np.testing.assert_array_equal(pos_dyn, pos_st)
        np.testing.assert_array_equal(w_dyn, w_st)

    def test_nonpositive_rejected(self):
        p = P.small_test_params(num_water=32, totaltime=0.0005,
                                sprint_steps=500)
        sc = BacteriaBox(p, seed=3).populate()
        with pytest.raises(ValueError, match="d_scale"):
            self._one_sprint(p, sc, d_scale=0.0)


class TestReflectOverride:
    """The reflect=(reflect_io, reflect_oi) launch scalars: runtime
    membrane bounce probabilities for permeability sweeps/fits sharing
    one compiled program (dyn_ref[3:5] in the scan engine)."""

    def _one_sprint(self, p, sc, **kw):
        import jax.numpy as jnp
        from mri_nanoparticle_simulation_tpu import rng
        mnp_pos = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mnp_M = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        sprint = re.make_sprint_fn(p)
        k = rng.key_from_seed(11)
        key = jnp.asarray([np.uint32(k[0]), np.uint32(k[1])])
        st = re.init_state(sc.waters, p)
        st, wins = sprint(mnp_pos, mnp_M, key, st, 0, **kw)
        return np.asarray(st.pos), np.asarray(wins)

    @staticmethod
    def _perm_params():
        # D x100: per-step rms ~0.02 um, so 500 steps produce many
        # membrane crossings (default D barely moves a walker 0.05 um)
        base = P.small_test_params(
            num_water=32, totaltime=0.0005, sprint_steps=500,
            water_start_bound=7.9, avoid_intracellular_throw=False)
        return base.replace(D_cell=base.D_cell * 100,
                            D_extra=base.D_extra * 100).with_permeability()

    def test_identity_override_bitwise(self):
        """reflect=(static values) must reproduce reflect=None exactly:
        same trace, same launch scalars."""
        p = self._perm_params()
        assert p.reflect_io > 0      # the branch is really on
        sc = BacteriaBox(p, seed=5).populate()
        pos0, w0 = self._one_sprint(p, sc)
        pos1, w1 = self._one_sprint(p, sc,
                                    reflect=(p.reflect_io, p.reflect_oi))
        np.testing.assert_array_equal(pos0, pos1)
        np.testing.assert_array_equal(w0, w1)

    def test_asymmetric_override_matches_static_params(self):
        """An asymmetric (0.9, 0.3) override through an engine built
        with DIFFERENT static probabilities must equal an engine with
        (0.9, 0.3) baked in — same streams, same coin thresholds; a
        swapped or mis-bound scalar would flip different walkers."""
        p = self._perm_params().replace(num_water=128)
        sc = BacteriaBox(p, seed=5).populate()
        pos_dyn, w_dyn = self._one_sprint(p, sc, reflect=(0.9, 0.3))
        p_static = p.replace(reflect_io=0.9, reflect_oi=0.3)
        pos_st, w_st = self._one_sprint(p_static, sc)
        np.testing.assert_array_equal(pos_dyn, pos_st)
        np.testing.assert_array_equal(w_dyn, w_st)
        # and it is a real behavioral change: fully transparent (0, 0)
        # membranes must alter some walker's trajectory vs (0.9, 0.3)
        pos0, _ = self._one_sprint(p, sc, reflect=(0.0, 0.0))
        assert not np.array_equal(pos_dyn, pos0)

    def test_out_of_range_rejected(self):
        p = self._perm_params()
        sc = BacteriaBox(p, seed=5).populate()
        with pytest.raises(ValueError, match="reflect_io"):
            self._one_sprint(p, sc, reflect=(1.5, 0.3))
        with pytest.raises(ValueError, match="reflect_oi"):
            self._one_sprint(p, sc, reflect=(0.5, -0.1))
