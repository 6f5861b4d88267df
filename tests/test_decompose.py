"""Phase-decomposition runs (engine/decompose.py): phase = s*A + B.

Trajectories are moment-independent, so one forward run recording
per-walker (A, B) per window reconstructs the curve at ANY moment scale —
the linearity is exact physics, and these tests pin it against direct
simulations at several scales, across both engines.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mri_nanoparticle_simulation_tpu.engine import decompose as dec
from mri_nanoparticle_simulation_tpu.engine import pallas_engine as pe
from mri_nanoparticle_simulation_tpu.engine import reference_engine as re
from mri_nanoparticle_simulation_tpu.params import small_test_params
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox


def _scaled_scene(scene, s):
    sc = scene.mnps.copy()
    sc[:, 4] *= s
    class _S:  # minimal duck-typed scene view
        mnps = sc
        waters = scene.waters
    return _S()


@pytest.fixture(scope="module")
def setup():
    # intracellular throws ON so walkers start inside cells: the kick
    # stream (B) and the in-cell stdev/masking paths are active from
    # step 0 (with the default avoid_intracellular_throw the tiny-test
    # walkers rarely reach a membrane within 2000 steps)
    p = small_test_params(num_water=64, mmoment=2e-14,
                          avoid_intracellular_throw=False)
    return p, BacteriaBox(p, seed=3).populate()


class TestScanDecomposition:
    def test_curve_reconstruction_at_scales(self, setup):
        """mean cos(s*A + B) must match a direct run with moments scaled
        by s, for several s — including s=1 (split vs joint Kahan
        rounding is the only difference)."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=5, engine="scan")
        assert r.A.shape == (p.t // p.pfreq, 64)
        assert r.stats["steps"] == p.t
        # kicks land whenever a walker is intracellular; at 12 cells in
        # an 8 um box some walker is — B must be non-trivial
        assert np.any(r.B != 0.0)
        for s in (0.25, 1.0, 1.7):
            _, cos_d, _, _ = re.run_simulation(_scaled_scene(sc, s), p,
                                               seed=5)
            rec = np.mean(np.cos(s * r.A + r.B), axis=-1)
            np.testing.assert_allclose(rec, cos_d / 64, atol=5e-5)

    def test_cp_flips_preserve_linearity(self, setup):
        """Windows after Carr-Purcell flips (taucp=0.0005 -> flips every
        5 windows) must still reconstruct exactly: the flip negates both
        components."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=5, engine="scan")
        n_flip_windows = (p.t // p.pfreq) - (p.tcp // p.pfreq)
        assert n_flip_windows > 0  # the run does cross flip boundaries
        _, cos_d, _, _ = re.run_simulation(_scaled_scene(sc, 0.6), p, seed=5)
        rec = np.mean(np.cos(0.6 * r.A + r.B), axis=-1)
        np.testing.assert_allclose(rec[-1], cos_d[-1] / 64, atol=5e-5)


class TestPallasDecomposition:
    def test_matches_scan_record(self, setup):
        """Pallas decompose kernel (interpret mode, shared Threefry
        streams) must reproduce the scan engine's (A, B) record to f32
        rounding — the same cross-engine contract as the standard path."""
        p, sc = setup
        r_scan = dec.run_decomposition(sc, p, seed=5, engine="scan")
        r_pl = dec.run_decomposition(sc, p, seed=5, engine="pallas",
                                     interpret=True)
        np.testing.assert_allclose(r_pl.A, r_scan.A, rtol=2e-6, atol=1e-7)
        np.testing.assert_allclose(r_pl.B, r_scan.B, rtol=2e-6, atol=1e-7)
        assert r_pl.stats["coverage_violations"] == 0

    def test_state_plane_roundtrip(self, setup):
        """to_planes/from_planes on the decompose-shaped state ([W, 2]
        phase) must round trip."""
        p, sc = setup
        st = re.init_state(sc.waters, p, decompose=True)
        st = st._replace(
            phase=np.arange(64 * 2, dtype=np.float32).reshape(64, 2),
            phase_comp=np.ones((64, 2), np.float32))
        back = pe.from_planes(pe.to_planes(st, p), 64)
        np.testing.assert_array_equal(np.asarray(back.phase), st.phase)
        np.testing.assert_array_equal(np.asarray(back.phase_comp),
                                      st.phase_comp)


class TestCurvesAtScales:
    def test_sweep_matches_direct_runs(self, setup):
        """A whole mmoment sweep from ONE simulation: curves_at_scales
        vs one direct run per scale."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=7, engine="scan")
        scales = [0.5, 1.0, 2.0]
        curves = dec.curves_at_scales(r.A, r.B, scales)
        assert curves.shape == (3, p.t // p.pfreq)
        for i, s in enumerate(scales):
            _, cos_d, _, _ = re.run_simulation(_scaled_scene(sc, s), p,
                                               seed=7)
            np.testing.assert_allclose(curves[i], cos_d / 64, atol=5e-5)

    def test_quadrature_shape(self, setup):
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=7, engine="scan",
                                  max_steps=p.sprint_steps)
        c = dec.curves_at_scales(r.A, r.B, [1.0, 1.5], quadrature=True)
        assert c.shape == (2, 2, p.sprint_steps // p.pfreq)
        # sin component is a real signal, not zeros
        assert np.any(c[:, 1] != 0.0)


class TestEchoAxis:
    """The taucp axis from the SAME single run: flips multiply prefix
    sums by +-1 at window boundaries, so any aligned echo spacing is a
    cumsum over the recovered per-window increments (curves_at_plane)."""

    def test_plane_matches_direct_runs(self, setup):
        """(scale x taucp) grid from ONE base-taucp run vs a direct
        simulation per grid point.  Trajectories are invariant to both
        knobs (common random numbers), so agreement is f32-rounding."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=11, engine="scan")
        scales = [0.5, 1.0]
        taucps = [0.0002, p.taucp, 0.001]
        plane = dec.curves_at_plane(r.A, r.B, scales, taucps, p)
        assert plane.shape == (2, 3, p.t // p.pfreq)
        for si, s in enumerate(scales):
            for ti, t in enumerate(taucps):
                pt = p.replace(taucp=t).validate()
                _, cos_d, _, _ = re.run_simulation(_scaled_scene(sc, s),
                                                   pt, seed=11)
                np.testing.assert_allclose(plane[si, ti], cos_d / 64,
                                           atol=5e-5)

    def test_base_roundtrip(self, setup):
        """Reconstruction at the base taucp must reproduce the recorded
        series itself (flip undo + redo are inverse +-1 bookkeeping)."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=11, engine="scan",
                                  max_steps=p.sprint_steps)
        direct = dec.curves_at_scales(r.A, r.B, [1.0])
        plane = dec.curves_at_plane(r.A, r.B, [1.0], [p.taucp], p)
        np.testing.assert_allclose(plane[0, 0], direct[0], atol=2e-6)

    def test_no_flip_taucp(self, setup):
        """taucp > totaltime (never fires) is a valid grid point — the
        params docstring's own recipe for flip-free runs."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=13, engine="scan")
        plane = dec.curves_at_plane(r.A, r.B, [1.0], [0.003], p)
        pt = p.replace(taucp=0.003).validate()
        _, cos_d, _, _ = re.run_simulation(sc, pt, seed=13)
        np.testing.assert_allclose(plane[0, 0], cos_d / 64, atol=5e-5)

    def test_misaligned_taucp_rejected(self, setup):
        """Echo spacings that miss window boundaries reuse the params
        validation error, not a silent mistimed reconstruction."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=13, engine="scan",
                                  max_steps=p.sprint_steps)
        dA, dB = dec.window_increments(r.A, r.B, p)
        with pytest.raises(ValueError, match="align"):
            dec.reconstruct_curves(dA, dB, [1.0], [0.00025], p)
        with pytest.raises(ValueError, match="output interval"):
            dec.reconstruct_curves(dA, dB, [1.0], [0.00005], p)

    def test_walker_blocking_invariant(self, setup):
        """Streaming block size must not change the result."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=13, engine="scan",
                                  max_steps=p.sprint_steps)
        dA, dB = dec.window_increments(r.A, r.B, p)
        a = dec.reconstruct_curves(dA, dB, [0.7, 1.3], [0.0002, 0.001], p,
                                   quadrature=True, walker_block=7)
        b = dec.reconstruct_curves(dA, dB, [0.7, 1.3], [0.0002, 0.001], p,
                                   quadrature=True, walker_block=4096)
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-12)


class TestArbitrarySchedules:
    """reconstruct_at_schedule: ANY aligned refocusing train from the
    same record — pulses only negate accumulated phase, so non-uniform
    echo trains are the same ±1-signed cumsum the taucp grid uses."""

    def test_periodic_schedule_matches_taucp_grid(self, setup):
        """A uniform schedule must agree exactly with the taucp-based
        reconstruction (same parity bookkeeping, two code paths)."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=11, engine="scan")
        dA, dB = dec.window_increments(r.A, r.B, p)
        n = dA.shape[0]
        for taucp in (0.0002, 0.001):
            period = p.replace(taucp=taucp).validate().tcp // p.pfreq
            sched = list(range(period, n + 1, period))
            a = dec.reconstruct_curves(dA, dB, [0.6, 1.0], [taucp], p)
            b = dec.reconstruct_at_schedule(dA, dB, [0.6, 1.0], [sched])
            np.testing.assert_allclose(b, a, rtol=0, atol=1e-12)

    def test_empty_schedule_is_free_decay(self, setup):
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=11, engine="scan")
        dA, dB = dec.window_increments(r.A, r.B, p)
        a = dec.reconstruct_curves(dA, dB, [1.0], [0.003], p)  # never fires
        b = dec.reconstruct_at_schedule(dA, dB, [1.0], [[]])
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-12)

    def test_aperiodic_schedule_vs_bruteforce(self, setup):
        """A variable echo train checked against an independent
        per-walker sequential replay (add increment, record, negate at
        scheduled pulses) — validating the signed-cumsum identity."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=11, engine="scan")
        dA, dB = dec.window_increments(r.A, r.B, p)
        n, w = dA.shape
        sched = [2, 3, 7, 15]
        assert max(sched) <= n
        s = 1.3
        out = dec.reconstruct_at_schedule(dA, dB, [s], [sched],
                                          quadrature=True)
        ph = np.zeros(w)
        pulses = set(sched)
        for j in range(1, n + 1):
            ph = ph + (s * dA[j - 1] + dB[j - 1])
            np.testing.assert_allclose(out[0, 0, j - 1, 0],
                                       np.mean(np.cos(ph)), atol=1e-12)
            np.testing.assert_allclose(out[0, 0, j - 1, 1],
                                       np.mean(np.sin(ph)), atol=1e-12)
            if j in pulses:
                ph = -ph

    def test_schedule_echoes_refocus(self, setup):
        """Physics: right after a refocusing pulse the next window's
        signal recovers relative to free decay at the same time (the
        echo) — the pulse undoes accumulated dephasing."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=5, engine="scan")
        dA, dB = dec.window_increments(r.A, r.B, p)
        n = dA.shape[0]
        mid = n // 2
        free, echo = dec.reconstruct_at_schedule(
            dA, dB, [1.0], [[], [mid]])[0]
        # at the echo time 2*mid (or the last window if shorter), the
        # refocused curve exceeds free decay
        t_echo = min(2 * mid, n) - 1
        assert echo[t_echo] > free[t_echo]

    def test_rejects_out_of_range(self, setup):
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=11, engine="scan",
                                  max_steps=p.sprint_steps)
        dA, dB = dec.window_increments(r.A, r.B, p)
        n = dA.shape[0]
        with pytest.raises(ValueError, match="1-based"):
            dec.reconstruct_at_schedule(dA, dB, [1.0], [[0]])
        with pytest.raises(ValueError, match="1-based"):
            dec.reconstruct_at_schedule(dA, dB, [1.0], [[n + 1]])

    def test_record_file_schedules(self, setup, tmp_path):
        """reconstruct_record(path, scales, schedules=...) — offline
        schedule reconstruction from the npz alone."""
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=11, engine="scan")
        path = str(tmp_path / "rec.npz")
        np.savez_compressed(path, A=r.A, B=r.B, taucp=p.taucp,
                            tau=p.tau, pfreq=p.pfreq)
        dA, dB = dec.window_increments(r.A, r.B, p)
        direct = dec.reconstruct_at_schedule(dA, dB, [1.0], [[3, 8]])
        via_file = dec.reconstruct_record(path, [1.0], schedules=[[3, 8]])
        np.testing.assert_allclose(via_file, direct, rtol=0, atol=1e-12)
        with pytest.raises(ValueError, match="not both"):
            dec.reconstruct_record(path, [1.0], taucps=[p.taucp],
                                   schedules=[[3]])


class TestStreamingPlane:
    """decompose.StreamingPlane: the (scale x taucp) plane computed
    incrementally from per-sprint record blocks, with O(n_taucps x W)
    memory — no materialized record."""

    def test_matches_batch_plane(self, setup):
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=11, engine="scan")
        scales = [0.5, 1.0, 2.0]
        taucps = [0.0002, p.taucp, 0.001]
        n = r.A.shape[0]
        sp = dec.StreamingPlane(p, n, scales, taucps, quadrature=True,
                                row_block=3)
        # deliberately uneven chunks (1, 6, then the rest)
        for lo, hi in [(0, 1), (1, 7), (7, n)]:
            sp.update(r.A[lo:hi], r.B[lo:hi])
        batch = dec.curves_at_plane(r.A, r.B, scales, taucps, p,
                                    quadrature=True)
        np.testing.assert_allclose(sp.result(), batch, rtol=0, atol=1e-12)

    def test_consumer_run_no_record(self, setup):
        """run_decomposition(consumer=...) must feed the plane without
        materializing A/B, and reproduce the batch reconstruction."""
        p, sc = setup
        n = p.t // p.pfreq
        sp = dec.StreamingPlane(p, n, [1.0, 1.5])
        res = dec.run_decomposition(sc, p, seed=11, engine="scan",
                                    consumer=sp)
        assert res.A.shape[0] == 0          # nothing materialized
        assert len(res.times_ms) == n       # time axis still full-length
        assert res.stats["steps"] == p.t
        r = dec.run_decomposition(sc, p, seed=11, engine="scan")
        batch = dec.curves_at_plane(r.A, r.B, [1.0, 1.5], [p.taucp], p)
        np.testing.assert_allclose(sp.result(), batch, rtol=0, atol=1e-12)

    def test_row_block_invariant(self, setup):
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=11, engine="scan",
                                  max_steps=p.sprint_steps)
        n = r.A.shape[0]
        planes = []
        for rb in (1, 4, 64):
            sp = dec.StreamingPlane(p, n, [0.7], [0.0002, 0.001],
                                    row_block=rb)
            sp.update(r.A, r.B)
            planes.append(sp.result())
        np.testing.assert_allclose(planes[0], planes[1], rtol=0, atol=1e-12)
        np.testing.assert_allclose(planes[0], planes[2], rtol=0, atol=1e-12)

    def test_echo_capture_matches_batch(self, setup):
        p, sc = setup
        r = dec.run_decomposition(sc, p, seed=11, engine="scan")
        n = r.A.shape[0]
        sp = dec.StreamingPlane(p, n, [1.0], echo_pairs=[(1.3, 0.0002)],
                                row_block=3)
        for lo in range(0, n, 7):
            sp.update(r.A[lo:lo + 7], r.B[lo:lo + 7])
        te_s, mat_s = sp.echo_matrix()
        te_b, mat_b = dec.echo_cos_matrix(r.A, r.B, p, scale=1.3,
                                          taucp=0.0002)
        np.testing.assert_array_equal(te_s, te_b)
        np.testing.assert_allclose(mat_s, mat_b, rtol=0, atol=1e-12)

    def test_guards(self, setup):
        p, sc = setup
        with pytest.raises(ValueError, match="n_windows"):
            dec.StreamingPlane(p, 0, [1.0])
        sp = dec.StreamingPlane(p, 4, [1.0])
        with pytest.raises(ValueError, match="no echo_pairs"):
            sp.echo_matrix()
        a = np.zeros((3, 8))
        sp.update(a, a)
        with pytest.raises(ValueError, match="incomplete"):
            sp.result()
        with pytest.raises(ValueError, match="walker count"):
            sp.update(np.zeros((1, 9)), np.zeros((1, 9)))
        with pytest.raises(ValueError, match="overflow"):
            sp.update(np.zeros((2, 8)), np.zeros((2, 8)))
        with pytest.raises(ValueError, match="no spin echo"):
            dec.StreamingPlane(p, 2, [1.0],
                               echo_pairs=[(1.0, p.totaltime)])


class TestDevicePlane:
    """On-device plane reconstruction (run_plane_on_device): the raw
    record never leaves the device; carried f32+Kahan signed sums must
    reproduce the float64 host StreamingPlane to f32 rounding."""

    @pytest.mark.parametrize("engine", ["scan", "pallas"])
    def test_matches_host_plane(self, setup, engine):
        p, sc = setup
        taucps = [p.taucp, 0.001]
        scales = [0.5, 1.0, 2.0]
        plane = dec.StreamingPlane(p, p.t // p.pfreq, scales, taucps,
                                   quadrature=True)
        dec.run_decomposition(sc, p, seed=5, engine=engine,
                              interpret=(engine == "pallas"),
                              consumer=plane)
        host = plane.result()                    # [S, T, n, 2] f64
        t_d, dev, stats, _ = dec.run_plane_on_device(
            sc, p, scales, taucps, seed=5, engine=engine,
            interpret=(engine == "pallas"))
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host, atol=1e-4)
        assert stats["steps"] == p.t
        np.testing.assert_allclose(t_d, plane.times_ms)

    def test_sprint_boundary_flips(self, setup):
        """The base run's CP flips land on sprint boundaries in this
        config (tcp divides sprint_steps), so the cross-sprint carry
        (prev row + the boundary's u_prev[0] = -1) is exercised on
        every sprint."""
        p, sc = setup
        assert p.sprint_steps % p.tcp == 0
        _, dev, _, _ = dec.run_plane_on_device(sc, p, [1.0], None,
                                               seed=5, engine="scan")
        r = dec.run_decomposition(sc, p, seed=5, engine="scan")
        direct = np.mean(np.cos(np.asarray(r.A, np.float64)
                                + np.asarray(r.B, np.float64)), axis=1)
        np.testing.assert_allclose(dev[0, 0, :, 0], direct, atol=1e-4)

    def test_echo_capture_matches_host(self, setup):
        """On-device per-walker echo matrices (echo_pairs) must match
        the host StreamingPlane's in-stream capture to f32 rounding,
        and feed bootstrap_from_echoes — error bars with no record."""
        p, sc = setup
        pairs = [(1.0, p.taucp), (2.0, 0.001)]
        host = dec.StreamingPlane(p, p.t // p.pfreq, [1.0], None,
                                  quadrature=True, echo_pairs=pairs)
        dec.run_decomposition(sc, p, seed=5, engine="scan",
                              consumer=host)
        _, _, _, echoes = dec.run_plane_on_device(
            sc, p, [1.0], None, seed=5, engine="scan",
            echo_pairs=pairs)
        assert len(echoes) == 2
        for i, e in enumerate(echoes):
            te_h, mat_h = host.echo_matrix(i)
            np.testing.assert_allclose(e.times_ms, te_h)
            np.testing.assert_allclose(e.cos, mat_h, atol=1e-4)
        # the capture IS bootstrap_from_echoes' input contract
        # ([n_echoes, W] float); the fit itself needs >= 3 echoes,
        # which this 20-window fixture cannot host — the full
        # bootstrap-from-device-echoes path runs in the hardware suite
        assert echoes[0].cos.shape == (echoes[0].times_ms.size, 64)

    @pytest.mark.parametrize("engine", ["scan", "pallas"])
    def test_sharded_plane_matches_single_device(self, setup, engine):
        """run_plane_on_device(mesh=...): sharded sprints + per-shard
        plane folding with one psum of walker means.  Global Threefry
        lanes keep per-walker physics equal to the single-device run, so
        the ECHO matrices (per-walker data) match bitwise-tight and the
        CURVES differ only by the f32 mean-of-means grouping."""
        import jax
        from mri_nanoparticle_simulation_tpu.parallel import sharding
        p, sc = setup
        mesh = sharding.make_walker_mesh(jax.devices("cpu"))
        pairs = [(1.0, p.taucp)]
        interp = engine == "pallas"
        t1, c1, s1, e1 = dec.run_plane_on_device(
            sc, p, [0.5, 1.0], [p.taucp, 0.001], seed=5, engine=engine,
            interpret=interp, echo_pairs=pairs)
        t2, c2, s2, e2 = dec.run_plane_on_device(
            sc, p, [0.5, 1.0], [p.taucp, 0.001], seed=5, engine=engine,
            interpret=interp, echo_pairs=pairs, mesh=mesh)
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_allclose(c2, c1, atol=1e-4)
        np.testing.assert_allclose(e2[0].cos, e1[0].cos, atol=1e-6)
        assert s2 == s1

    def test_sharded_plane_rejects_indivisible_walkers(self, setup):
        import jax
        from mri_nanoparticle_simulation_tpu.parallel import sharding
        p, sc = setup
        mesh = sharding.make_walker_mesh(jax.devices("cpu")[:3])
        with pytest.raises(ValueError, match="divide evenly"):
            dec.run_plane_on_device(sc, p, [1.0], None, seed=5,
                                    engine="scan", mesh=mesh)

    def test_echo_pair_taucp_not_in_plane(self, setup):
        """An echo taucp absent from the requested taucps gets an extra
        internal cumsum lane; the CURVES output must still cover only
        the requested taucps."""
        p, sc = setup
        _, curves, _, echoes = dec.run_plane_on_device(
            sc, p, [1.0], [p.taucp], seed=5, engine="scan",
            echo_pairs=[(1.0, 0.001)])
        assert curves.shape[1] == 1          # only the requested taucp
        assert echoes[0].taucp_ms == 0.001
