"""Differentiability of the walker engine — a capability the reference
architecture cannot express.

The reference's physics lives in CUDA kernels fed by pre-filled cuRAND
buffers (cuda_sim.cu:688-804): opaque to any form of autodiff, so
sensitivity studies meant recompiling and re-running per parameter value
(README.md:13).  Here the whole sprint is a pure jax function of its
inputs, so `jax.grad` differentiates a full simulation end-to-end:
gradients flow moments -> field -> phase kicks -> magnetization, while
the counter-based RNG is integer-only and acts as a constant of the
differentiation — the pathwise (reparameterized) derivative on frozen
trajectories.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mri_nanoparticle_simulation_tpu import params as P
from mri_nanoparticle_simulation_tpu import rng
from mri_nanoparticle_simulation_tpu.engine import reference_engine as re
from mri_nanoparticle_simulation_tpu.scene import BacteriaBox


class TestGradThroughSimulation:
    def test_grad_wrt_moment_scale_matches_finite_difference(self):
        """d(final Σcos φ)/d(moment scale) by reverse-mode AD through the
        full sprint scan vs a central finite difference.  Moment scaling
        leaves trajectories untouched (positions never depend on the
        field), so the loss is smooth in the scale and the two must
        agree tightly."""
        p = P.small_test_params(num_water=32, totaltime=0.0005,
                                sprint_steps=500, mmoment=3.5e-15)
        sc = BacteriaBox(p, seed=4).populate()
        sprint = re.make_sprint_fn(p)
        k = rng.key_from_seed(2)
        key_arr = jnp.asarray([np.uint32(k[0]), np.uint32(k[1])])
        mnp_pos = jnp.asarray(sc.mnps[:, :3], jnp.float32)
        base_M = jnp.asarray(sc.mnps[:, 4], jnp.float32)
        st0 = re.init_state(sc.waters, p)

        def loss(scale):
            _, wins = sprint(mnp_pos, base_M * scale, key_arr, st0, 0)
            return wins[-1, 0]

        g = jax.grad(loss)(jnp.float32(1.0))
        eps = 1e-3
        fd = (loss(jnp.float32(1.0 + eps)) -
              loss(jnp.float32(1.0 - eps))) / (2.0 * eps)
        assert np.isfinite(float(g))
        np.testing.assert_allclose(float(g), float(fd), rtol=2e-2,
                                   atol=1e-3)
        # the dipole field must actually matter in this scene
        assert abs(float(g)) > 1e-3
