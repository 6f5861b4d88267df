"""Multi-chip sharding and ensembles on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu.engine import reference_engine as re
from mri_nanoparticle_simulation_tpu.parallel import ensemble, sharding
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox


@pytest.fixture(scope="module")
def small():
    p = P.small_test_params(num_water=64, totaltime=0.001, sprint_steps=500)
    sc = BacteriaBox(p, seed=5).populate()
    return p, sc


class TestWalkerSharding:
    def test_sharded_matches_single_device(self, small):
        """Counter-based RNG makes sharding exact: per-walker trajectories
        are bitwise identical to the single-chip run; only the summation
        order of the magnetization reduction differs."""
        p, sc = small
        mesh = sharding.make_walker_mesh(jax.devices("cpu"))
        assert mesh.shape[sharding.WALKER_AXIS] == 8
        t1, c1, s1, st1 = sharding.run_simulation_sharded(sc, p, mesh=mesh,
                                                          seed=3)
        t2, c2, s2, st2 = re.run_simulation(sc, p, seed=3)
        np.testing.assert_array_equal(np.asarray(st1.pos),
                                      np.asarray(st2.pos))
        np.testing.assert_array_equal(np.asarray(st1.phase),
                                      np.asarray(st2.phase))
        np.testing.assert_allclose(c1, c2, atol=1e-3)
        assert int(st1.escapes) == int(st2.escapes)

    def test_uneven_shard_rejected(self, small):
        p, _ = small
        mesh = sharding.make_walker_mesh(jax.devices("cpu")[:3])
        with pytest.raises(ValueError, match="divide evenly"):
            sharding.make_sharded_sprint_fn(p, mesh)


class TestEnsemble:
    def test_trials_independent(self):
        p = P.small_test_params(num_water=32, totaltime=0.0005,
                                sprint_steps=500)
        times, cos, sin, state = ensemble.run_ensemble(
            p, n_trials=4, base_seed=0, run_seed=50)
        assert cos.shape == (4, 5)
        # different scenes/streams -> different final states per trial
        pos = np.asarray(state.pos)
        assert not np.array_equal(pos[0], pos[1])

    def test_mmoment_sweep(self):
        """A trial with mmoment=0 has no dipole field: with the default
        as-written kick and waters outside cells, its curve is exactly W."""
        p = P.small_test_params(num_water=32, totaltime=0.0005,
                                sprint_steps=500)
        _, cos, _, _ = ensemble.run_ensemble(
            p, n_trials=2, base_seed=0, run_seed=50,
            mmoments=[0.0, p.mmoment * 4])
        np.testing.assert_allclose(cos[0], 32.0, atol=1e-4)
        assert np.abs(cos[1] - 32.0).max() > np.abs(cos[0] - 32.0).max()

    def test_padding_dipoles_inert(self):
        """Trial MNP padding must not alter physics: a 1-trial ensemble
        equals the plain single-scene run."""
        p = P.small_test_params(num_water=32, totaltime=0.0005,
                                sprint_steps=500)
        _, cos, _, st_e = ensemble.run_ensemble(
            p, n_trials=2, base_seed=7, run_seed=99)
        sc = BacteriaBox(p, seed=7).populate()
        _, c2, _, st_s = re.run_simulation(sc, p, seed=99)
        # ensemble pads the MNP table; trajectories must be unchanged
        np.testing.assert_array_equal(np.asarray(st_e.pos)[0],
                                      np.asarray(st_s.pos))
        np.testing.assert_allclose(cos[0], c2, atol=1e-4)


class TestSweep:
    def test_cell_r_sweep(self):
        """cell_r is kernel-static (like every reference knob was
        nvcc-static): the sweep recompiles per value and geometry
        responds (bigger cells -> waters thrown further out)."""
        p = P.small_test_params(num_water=16, totaltime=0.0002,
                                sprint_steps=200, num_cells=4)
        times, curves = ensemble.run_parameter_sweep(
            p, "cell_r", [0.4, 0.8], n_trials_each=1)
        assert curves.shape == (2, 1, 2)

    def test_mmoment_sweep_shares_compile(self):
        p = P.small_test_params(num_water=16, totaltime=0.0002,
                                sprint_steps=200)
        times, curves = ensemble.run_parameter_sweep(
            p, "mmoment", [0.0, p.mmoment], n_trials_each=2)
        assert curves.shape == (2, 2, 2)
        np.testing.assert_allclose(curves[0], 16.0, atol=1e-4)
