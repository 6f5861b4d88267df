"""Native C++ scene builder: bit-identity with the NumPy path."""

import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox, native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native builder unavailable "
                                       "(g++ compile failed)")


class TestThreefryKAT:
    def test_random123_vectors(self):
        assert native.threefry_kat(0, 0, 0, 0) == (0x6B200159, 0x99BA4EFE)
        assert native.threefry_kat(0xFFFFFFFF, 0xFFFFFFFF,
                                   0xFFFFFFFF, 0xFFFFFFFF) == \
            (0x1CB996FC, 0xBB002BE7)
        assert native.threefry_kat(0x13198A2E, 0x03707344,
                                   0x243F6A88, 0x85A308D3) == \
            (0xC4923A9C, 0x483DF7A0)


class TestBitIdentity:
    def test_scene_native_equals_python(self):
        p = P.small_test_params()
        nat = BacteriaBox(p, seed=123, prefer_native=True)
        assert nat.use_native
        py = BacteriaBox(p, seed=123, prefer_native=False)
        assert not py.use_native
        sn = nat.populate()
        sp = py.populate()
        np.testing.assert_array_equal(sn.cells, sp.cells)
        np.testing.assert_array_equal(sn.waters, sp.waters)
        np.testing.assert_array_equal(sn.mnps, sp.mnps)
        np.testing.assert_array_equal(sn.lookup_table, sp.lookup_table)

    def test_reference_scale(self):
        """Full 270-cell/4032-water scene, both paths, bit-identical."""
        p = P.DEFAULT
        sn = BacteriaBox(p, seed=7, prefer_native=True).populate()
        sp = BacteriaBox(p, seed=7, prefer_native=False).populate()
        np.testing.assert_array_equal(sn.cells, sp.cells)
        np.testing.assert_array_equal(sn.waters, sp.waters)
        np.testing.assert_array_equal(sn.lookup_table, sp.lookup_table)

    def test_lookup_overflow_raises(self):
        p = P.small_test_params(num_cells=60, bound=6.0,
                                water_start_bound=4.0, hash_dim=3,
                                max_neighbors=4)
        with pytest.raises(ValueError, match="candidate cells"):
            BacteriaBox(p, seed=7, prefer_native=True).populate()


class TestScaleUp:
    @pytest.mark.slow
    def test_large_scene(self):
        """The scale-up regime (BASELINE config 4): thousands of cells,
        large water count — native path keeps this to seconds."""
        import time
        p = P.DEFAULT.replace(num_cells=2000, num_water=100_000,
                              water_start_bound=28.0, max_neighbors=24)
        t0 = time.time()
        sc = BacteriaBox(p, seed=1, prefer_native=True).populate()
        dt = time.time() - t0
        assert sc.cells.shape == (2000, 3)
        assert sc.waters.shape == (100_000, 3)
        d2 = None  # spot-check a few hundred pairs rather than 2000^2
        rng = np.random.default_rng(0)
        i = rng.integers(0, 2000, 500)
        j = rng.integers(0, 2000, 500)
        mask = i != j
        d = np.linalg.norm(sc.cells[i[mask]] - sc.cells[j[mask]], axis=1)
        assert d.min() >= 2 * p.cell_r
        assert dt < 60, f"native scale-up scene took {dt:.1f}s"
