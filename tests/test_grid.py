"""Uniform field grid: agreement with exact sums and with the expansion
backend (two independent implementations of the same field)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu.fields import dipole, expansion
from mri_nanoparticle_simulation_tpu.fields import grid as grid_mod
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox


@pytest.fixture(scope="module")
def setup():
    p = P.small_test_params(num_cells=12, bound=8.0)
    sc = BacteriaBox(p, seed=4).populate()
    mp = jnp.asarray(sc.mnps[:, :3], jnp.float32)
    mM = jnp.asarray(sc.mnps[:, 4], jnp.float32)
    fg = grid_mod.build_grid(mp, mM, p, grid_n=24, dtype=jnp.float32)
    return p, sc, fg


class TestGrid:
    def test_vs_exact_sum(self, setup, f64):
        p, sc, fg = setup
        rng = np.random.default_rng(0)
        pos = rng.random((800, 3)) * p.bound
        b, _ = grid_mod.query(fg, jnp.asarray(pos, jnp.float32), p.cell_r)
        exact = dipole.total_field_masked(
            jnp.asarray(pos), jnp.asarray(sc.mnps[:, :3]),
            jnp.asarray(sc.mnps[:, 4]), p.cell_r)
        err = np.abs(np.asarray(b, np.float64) - np.asarray(exact))
        # trilinear-grid accuracy (not the production path; the expansion
        # backend is ~50x tighter) — bound calibrated on this scene
        assert err.max() < 5e-6
        assert err.mean() < 2e-7

    def test_in_cell_exact(self, setup):
        p, sc, fg = setup
        rng = np.random.default_rng(1)
        pos = np.clip(sc.cells[rng.integers(0, p.num_cells, 600)]
                      + rng.normal(scale=0.7, size=(600, 3)),
                      0.0, p.bound * (1 - 1e-6))
        _, inc = grid_mod.query(fg, jnp.asarray(pos, jnp.float32), p.cell_r)
        d2 = np.min(np.sum((pos[:, None] - sc.cells[None]) ** 2, 2), 1)
        truly = d2 < p.cell_r ** 2
        assert truly.sum() > 20
        np.testing.assert_array_equal(np.asarray(inc), truly)

    def test_agrees_with_expansion(self, setup):
        """Two independent field implementations agree within their
        combined tolerance — a mutual cross-check with no exact oracle."""
        p, sc, fg = setup
        mp = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mM = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        rng = np.random.default_rng(2)
        anchors = jnp.asarray(rng.random((400, 3)) * p.bound, jnp.float32)
        nf = expansion.build(anchors, mp, mM, p)
        b_exp, inc_exp, _ = expansion.evaluate(nf, anchors, p.cell_r)
        b_grid, inc_grid = grid_mod.query(fg, anchors, p.cell_r)
        np.testing.assert_array_equal(np.asarray(inc_exp),
                                      np.asarray(inc_grid))
        assert np.abs(np.asarray(b_exp) - np.asarray(b_grid)).max() < 5e-6

    def test_resident_overflow_raises(self):
        p = P.small_test_params(num_cells=30, bound=6.0,
                                water_start_bound=4.0)
        sc = BacteriaBox(p, seed=2).populate()
        mp = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        mM = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        with pytest.raises(ValueError, match="max_residents"):
            grid_mod.build_grid(mp, mM, p, grid_n=8, max_residents=2)
