"""Multi-chip walker sharding.

The reference is strictly single-GPU (SURVEY §2: no MPI/NCCL anywhere);
its only "collectives" are an intra-device cuBLAS gemv and a thrust
reduction (cuda_sim.cu:997, 1013).  On TPU, walkers are embarrassingly
parallel — the scene is replicated, walker state is sharded over the
`walkers` mesh axis, and the only cross-chip communication is a psum of
the per-window (sum cos, sum sin) pairs over ICI: 8 bytes per window, the
cheapest possible collective.

Counter-based RNG makes sharding exact rather than approximate: each
shard passes ``lane_offset = axis_index * local_walkers`` so every walker
keeps the globally-unique Threefry stream it would have had on one chip —
an N-chip run produces bit-identical physics to the single-chip run,
modulo the f32 summation order of the final reduction.

Works with both engines; the scan engine is the default here because a
sharded state pytree round-trips through shard_map without the Pallas
plane packing.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from .. import rng
from ..engine import reference_engine
from ..params import Params

WALKER_AXIS = "walkers"


def make_walker_mesh(devices: Optional[Sequence] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    return Mesh(np.asarray(devices), (WALKER_AXIS,))


def make_sharded_sprint_fn(params: Params, mesh: Mesh, dtype=jnp.float32):
    """Sharded sprint: walker state split over the mesh's walker axis,
    scene replicated, window sums psum'd over ICI.

    Returns ``sprint(mnp_pos, mnp_M, key_arr, state) -> (state, wins)``
    where ``wins`` is replicated [n_windows, 2] global sums.
    """
    n_shards = mesh.shape[WALKER_AXIS]
    if params.num_water % n_shards != 0:
        raise ValueError(
            f"num_water ({params.num_water}) must divide evenly over "
            f"{n_shards} devices")
    local_w = params.num_water // n_shards
    local_sprint = reference_engine.make_sprint_fn(params, dtype)

    def shard_fn(mnp_pos, mnp_M, key_arr, state):
        idx = jax.lax.axis_index(WALKER_AXIS)
        lane_offset = (idx * local_w).astype(jnp.uint32)
        esc0 = state.escapes
        new_state, wins = local_sprint(mnp_pos, mnp_M, key_arr, state,
                                       lane_offset)
        wins = jax.lax.psum(wins, WALKER_AXIS)
        esc = jax.lax.psum(new_state.escapes - esc0, WALKER_AXIS) + esc0
        return new_state._replace(escapes=esc), wins

    state_spec = reference_engine.WalkerState(
        pos=P(WALKER_AXIS), in_cell=P(WALKER_AXIS), phase=P(WALKER_AXIS),
        phase_comp=P(WALKER_AXIS), step=P(), escapes=P())

    sharded = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), state_spec),
        out_specs=(state_spec, P()), check_vma=False)
    return jax.jit(sharded)


def run_simulation_sharded(scene, params: Params, mesh: Optional[Mesh] = None,
                           seed: int = 0, dtype=jnp.float32,
                           max_steps: Optional[int] = None):
    """Full sharded run (tests / dryrun); mirrors
    reference_engine.run_simulation."""
    mesh = mesh or make_walker_mesh()
    sprint_fn = make_sharded_sprint_fn(params, mesh, dtype)
    mnp_pos = jnp.asarray(scene.mnps[:, :3], dtype)
    mnp_M = jnp.asarray(scene.mnps[:, 4], dtype)
    k = rng.key_from_seed(seed)
    key_arr = jnp.asarray([np.uint32(k[0]), np.uint32(k[1])])
    state = reference_engine.init_state(scene.waters, params, dtype)

    total = params.t if max_steps is None else min(params.t, max_steps)
    outs = []
    for _ in range(total // params.sprint_steps):
        state, wins = sprint_fn(mnp_pos, mnp_M, key_arr, state)
        outs.append(wins)
    wins = jnp.concatenate(outs, 0) if outs else jnp.zeros((0, 2), dtype)
    n = wins.shape[0]
    times = (np.arange(1, n + 1) * params.pfreq) * params.tau
    return times, np.asarray(wins[:, 0]), np.asarray(wins[:, 1]), state
