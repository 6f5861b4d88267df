"""Scene construction invariants (the reference had no such tests; its
SimboxTest.cpp is bit-rotted — SURVEY.md §4)."""

import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu import scene as S


@pytest.fixture(scope="module")
def small():
    p = P.small_test_params()
    box = S.BacteriaBox(p, seed=123)
    return p, box, box.populate()


class TestNumpyThreefry:
    def test_matches_jax_implementation(self):
        from mri_nanoparticle_simulation_tpu import rng
        import jax.numpy as jnp
        c0 = np.arange(100, dtype=np.uint32)
        c1 = np.full(100, 7, np.uint32)
        a0, a1 = S.threefry2x32_np((np.uint32(3), np.uint32(9)), c0, c1)
        b0, b1 = rng.threefry2x32((jnp.uint32(3), jnp.uint32(9)),
                                  jnp.asarray(c0), jnp.asarray(c1))
        np.testing.assert_array_equal(a0, np.asarray(b0))
        np.testing.assert_array_equal(a1, np.asarray(b1))

    def test_kat(self):
        x0, x1 = S.threefry2x32_np((np.uint32(0), np.uint32(0)),
                                   np.uint32(0), np.uint32(0))
        assert (int(x0), int(x1)) == (0x6B200159, 0x99BA4EFE)


class TestCells:
    def test_count_and_bounds(self, small):
        p, _, sc = small
        assert sc.cells.shape == (p.num_cells, 3)
        assert (sc.cells >= p.cell_r).all()
        assert (sc.cells <= p.bound - p.cell_r).all()

    def test_no_overlap(self, small):
        p, _, sc = small
        d2 = np.sum((sc.cells[:, None] - sc.cells[None, :]) ** 2, axis=2)
        np.fill_diagonal(d2, np.inf)
        assert d2.min() >= 4 * p.cell_r ** 2

    def test_reproducible(self, small):
        p, _, sc = small
        sc2 = S.BacteriaBox(p, seed=123).populate()
        np.testing.assert_array_equal(sc.cells, sc2.cells)
        np.testing.assert_array_equal(sc.waters, sc2.waters)
        sc3 = S.BacteriaBox(p, seed=124).populate()
        assert not np.array_equal(sc.cells, sc3.cells)


class TestMNPs:
    def test_base_mnps_at_cell_centers(self, small):
        p, _, sc = small
        assert sc.num_intra_mnps == p.num_cells
        np.testing.assert_array_equal(sc.mnps[:p.num_cells, :3], sc.cells)
        assert (sc.mnps[:, 3] == 0).all()           # radius 0
        assert (sc.mnps[:, 4] == p.mmoment).all()   # moment

    def test_border_images(self, small):
        p, _, sc = small
        base = sc.mnps[:p.num_cells]
        imgs = sc.mnps[p.num_cells:]
        b, brd = p.bound, p.border
        # every image is a base MNP shifted by ±bound on ≥1 axis
        for img in imgs:
            diffs = base[:, :3] - img[:3]
            shifted = np.all(np.isin(np.round(np.abs(diffs) / b, 9),
                                     [0.0, 1.0]), axis=1) & \
                np.any(np.abs(diffs) > b / 2, axis=1)
            assert shifted.any()
        # count matches a direct per-MNP enumeration
        expected = 0
        for x, y, z in base[:, :3]:
            nx = 1 + (x + brd > b or x - brd < 0)
            ny = 1 + (y + brd > b or y - brd < 0)
            nz = 1 + (z + brd > b or z - brd < 0)
            expected += nx * ny * nz - 1
        assert len(imgs) == expected

    def test_full_images_26(self):
        p = P.small_test_params(boundary_mode=P.BOUNDARY_FULL)
        sc = S.BacteriaBox(p, seed=5).populate()
        assert len(sc.mnps) == p.num_cells * 27
        # all 27 copies of mnp 0 (base + 26 images) are distinct points
        copies = np.concatenate([sc.mnps[:1, :3],
                                 sc.mnps[p.num_cells::1][:26, :3]])
        assert len({tuple(np.round(c, 9)) for c in copies}) == 27


class TestWaters:
    def test_in_start_cube(self, small):
        p, _, sc = small
        off = (p.bound - p.water_start_bound) / 2
        assert (sc.waters >= off).all()
        assert (sc.waters <= off + p.water_start_bound).all()

    def test_avoid_intracellular(self, small):
        p, _, sc = small
        d2 = np.sum((sc.waters[:, None] - sc.cells[None, :]) ** 2, axis=2)
        assert d2.min(axis=1).min() >= p.cell_r ** 2

    def test_morton_sorted(self, small):
        p, _, sc = small
        codes = S.morton_code_positions(sc.waters, p.bound, 7)
        assert (np.diff(codes.astype(np.int64)) >= 0).all()


class TestLookup:
    def test_containment_guarantee(self, small):
        """Any point inside a cell must find that cell via its hash cube."""
        p, box, sc = small
        rng = np.random.default_rng(0)
        # sample points inside cells
        which = rng.integers(0, p.num_cells, 500)
        r = p.cell_r * rng.random(500) ** (1 / 3)
        v = rng.normal(size=(500, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = np.clip(sc.cells[which] + v * r[:, None], 0, p.bound * (1 - 1e-9))
        nearest, in_cell = S.nearest_cell(pts, sc.cells, sc.lookup_table, p)
        inside = np.sum((pts - sc.cells[which]) ** 2, axis=1) < p.cell_r ** 2
        assert (in_cell[inside]).all()
        np.testing.assert_array_equal(nearest[inside], which[inside])

    def test_outside_points(self, small):
        p, _, sc = small
        rng = np.random.default_rng(1)
        pts = rng.random((500, 3)) * p.bound
        d2 = np.sum((pts[:, None] - sc.cells[None, :]) ** 2, axis=2)
        truly_in = d2.min(axis=1) < p.cell_r ** 2
        _, in_cell = S.nearest_cell(pts, sc.cells, sc.lookup_table, p)
        np.testing.assert_array_equal(in_cell, truly_in)


class TestMorton:
    def test_interleave_matches_naive(self):
        rng = np.random.default_rng(3)
        ix, iy, iz = (rng.integers(0, 2 ** 21, 100, dtype=np.uint64)
                      for _ in range(3))
        got = S.morton_encode(ix, iy, iz)
        for k in range(100):
            naive = 0
            for bit in range(21):
                naive |= ((int(iz[k]) >> bit) & 1) << (3 * bit)
                naive |= ((int(iy[k]) >> bit) & 1) << (3 * bit + 1)
                naive |= ((int(ix[k]) >> bit) & 1) << (3 * bit + 2)
            assert int(got[k]) == naive


class TestContainment:
    def test_check_lattice_containment(self, small):
        p, box, sc = small
        pts = np.concatenate([sc.cells[:3],  # centers → inside
                              np.full((1, 3), p.bound / 2)])
        idx = box.check_lattice_containment(sc.cells, pts)
        assert (idx[:3] == np.arange(3)).all()


class TestStats:
    def test_write_stats(self, small, tmp_path):
        _, _, sc = small
        path = tmp_path / "stats.csv"
        sc.write_stats(str(path))
        text = path.read_text()
        assert "Number of MNPs" in text and "Number of Cells" in text


class TestFCCLatticeBox:
    """FCC lattice scene family (the reference lineage's fcc_diffusion.h
    geometry, octree_test.cpp:14,24-25)."""

    def params(self, **kw):
        return P.small_test_params(**kw)

    def test_count_bounds_and_no_overlap(self):
        p = self.params()
        sc = S.FCCLatticeBox(p, seed=1).populate()
        assert sc.cells.shape == (p.num_cells, 3)
        assert (sc.cells >= p.cell_r - 1e-9).all()
        assert (sc.cells <= p.bound - p.cell_r + 1e-9).all()
        d2 = np.sum((sc.cells[:, None] - sc.cells[None, :]) ** 2, axis=2)
        np.fill_diagonal(d2, np.inf)
        assert d2.min() >= 4 * p.cell_r ** 2

    def test_lattice_geometry(self):
        # with an explicit lattice constant, every nearest-neighbor
        # distance in the kept set is a/sqrt(2) (the FCC signature)
        p = self.params(num_cells=16)
        a = 3.0
        sc = S.FCCLatticeBox(p, lattice_a=a).populate()
        d2 = np.sum((sc.cells[:, None] - sc.cells[None, :]) ** 2, axis=2)
        np.fill_diagonal(d2, np.inf)
        nn = np.sqrt(d2.min(axis=1))
        np.testing.assert_allclose(nn, a / np.sqrt(2.0), rtol=1e-12)

    def test_cells_deterministic_waters_seeded(self):
        p = self.params()
        a = S.FCCLatticeBox(p, seed=1).populate()
        b = S.FCCLatticeBox(p, seed=2).populate()
        np.testing.assert_array_equal(a.cells, b.cells)  # no RNG in cells
        assert not np.array_equal(a.waters, b.waters)    # waters seeded
        c = S.FCCLatticeBox(p, seed=1).populate()
        np.testing.assert_array_equal(a.waters, c.waters)

    def test_reference_scale_default_a(self):
        # the default lattice constant hosts the reference's 270 cells
        p = P.Params(num_water=64, num_cells=270).validate()
        cells = S.FCCLatticeBox(p).init_cells()
        assert cells.shape == (270, 3)
        d2 = np.sum((cells[:, None] - cells[None, :]) ** 2, axis=2)
        np.fill_diagonal(d2, np.inf)
        assert d2.min() >= 4 * p.cell_r ** 2

    def test_overlapping_lattice_rejected(self):
        p = self.params()
        with pytest.raises(ValueError, match="overlap"):
            S.FCCLatticeBox(p, lattice_a=1.0).init_cells()

    def test_too_few_sites_rejected(self):
        p = self.params(num_cells=64)
        with pytest.raises(ValueError, match="sites"):
            S.FCCLatticeBox(p, lattice_a=5.0).init_cells()

    def test_runs_through_the_engine(self):
        from mri_nanoparticle_simulation_tpu.engine.sim import \
            SimulationRunner
        p = self.params(num_water=32, totaltime=0.0005, sprint_steps=500)
        sc = S.FCCLatticeBox(p, seed=1).populate()
        r = SimulationRunner(p, seed=2, engine="scan", scene=sc)
        _, cos, _, stats = r.run(progress=False)
        assert stats["steps"] == p.t
        assert np.all(np.abs(cos) <= p.num_water)
