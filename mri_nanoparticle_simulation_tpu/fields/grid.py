"""Uniform field grid: the HBM-resident alternative to the octree.

A dense-grid reimagining of the reference's adaptive octree (C7 in
SURVEY.md §2): space is divided into G^3 voxels; each voxel stores

* eight *corner* B_z values of the far field with that voxel's resident
  dipoles excluded (the reference cached piecewise-constant sub-octant
  values per leaf, octree.cpp:274-297; we store corners and interpolate
  trilinearly — strictly more accurate);
* a fixed-width resident list: every dipole within
  ``scale * cell_r + half-diagonal`` of the voxel center (the same
  residency rule as Octree::MNP_in_space, octree.cpp:168-174), whose
  field is evaluated exactly (masked within cell_r) at query time —
  octree.cpp:151-158 / cuda_sim.cu:280-285 semantics.

The production engine uses the chunked local expansion instead (zero
gathers in the hot loop; see expansion.py); the grid is kept as

* an independent second implementation of the same field for
  cross-validation (grid and expansion must agree wherever both are
  within tolerance of the exact sum),
* a query structure for analysis/visualization workloads that ask for
  the field at arbitrary scattered points without chunk anchors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params
from . import dipole


class FieldGrid(NamedTuple):
    corners: jnp.ndarray      # [G, G, G, 8] far-field B_z at voxel corners
    res_idx: jnp.ndarray      # [G, G, G, K] resident dipole indices, -1 pad
    #: [G^3, K, 4] denormalized residents (x, y, z, M); padding entries
    #: sit 1e9 µm away with zero moment.  The query gathers ONE flat row
    #: per walker instead of K scattered per-dipole gathers — the same
    #: payload-table pattern as the cube-candidate cache in
    #: fields/expansion.py.  (End-to-end the scan-engine grid run is
    #: dispatch/latency-bound, so this is a structural simplification —
    #: one gather, no validity masking — rather than a measured speedup.)
    res_payload: jnp.ndarray
    mnp_pos: jnp.ndarray      # [N, 3]
    mnp_M: jnp.ndarray        # [N]
    spacing: float
    grid_n: int


#: corner offsets in (x, y, z) bit order (i>>2 & 1, i>>1 & 1, i & 1) —
#: the reference's sub-octant enumeration (octree.cpp:274-278)
_CORNERS = np.array([[(i >> 2) & 1, (i >> 1) & 1, i & 1]
                     for i in range(8)], np.float64)


def build_grid(mnp_pos, mnp_M, params: Params, grid_n: int = 32,
               max_residents: int = 16, dtype=jnp.float32) -> FieldGrid:
    """Build the grid on device.  O(G^3 * 8 * N) — a one-time cost."""
    h = params.bound / grid_n
    reach = params.scale * params.cell_r + np.sqrt(3.0) * h / 2.0

    mnp_pos = jnp.asarray(mnp_pos, dtype)
    mnp_M = jnp.asarray(mnp_M, dtype)
    n = mnp_pos.shape[0]
    if max_residents > n:
        max_residents = n

    ax = np.arange(grid_n)
    centers_np = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"),
                          axis=-1).reshape(-1, 3) * h + h / 2.0
    n_voxels = centers_np.shape[0]
    corners_off = jnp.asarray(_CORNERS, dtype) - 0.5

    @jax.jit
    def batch(centers):                                 # [B, 3]
        d2 = jnp.sum((centers[:, None, :] - mnp_pos) ** 2, axis=-1)
        col = jnp.arange(n, dtype=jnp.int32)[None, :]
        remaining = d2
        idxs, dists = [], []
        for _ in range(max_residents):
            j = jnp.argmin(remaining, axis=1).astype(jnp.int32)
            dj = jnp.take_along_axis(remaining, j[:, None], axis=1)[:, 0]
            idxs.append(j)
            dists.append(dj)
            remaining = jnp.where(col == j[:, None], jnp.inf, remaining)
        res_idx = jnp.stack(idxs, 1)                    # [B, K]
        res_d2 = jnp.stack(dists, 1)
        overflow = jnp.sum(
            jnp.where(jnp.isfinite(remaining),
                      remaining < reach * reach, False), axis=1)
        res_idx = jnp.where(res_d2 < reach * reach, res_idx, -1)

        # corner values with this voxel's residents excluded
        cpos = centers[:, None, :] + corners_off * dtype(h)  # [B, 8, 3]
        d = cpos[:, :, None, :] - mnp_pos                    # [B, 8, N, 3]
        contrib = dipole.dipole_bz(d[..., 0], d[..., 1], d[..., 2],
                                   mnp_M[None, None, :])
        # padded (-1) entries clip onto column 0; use additive-OR scatter
        # so they cannot clobber a real resident flag there
        safe_idx = jnp.clip(res_idx, 0, n - 1)
        is_res = jnp.zeros((centers.shape[0], n), jnp.int32).at[
            jnp.arange(centers.shape[0])[:, None], safe_idx].add(
            (res_idx >= 0).astype(jnp.int32)) > 0
        corners = jnp.sum(
            jnp.where(is_res[:, None, :], 0.0, contrib), axis=-1)
        return corners, res_idx, jnp.max(overflow)

    # batch voxels to bound the [B, 8, N, 3] intermediate (a full-grid
    # build would materialize tens of GB at G=64)
    bs = 2048
    pad = (-n_voxels) % bs
    centers_np = np.concatenate(
        [centers_np, np.zeros((pad, 3))]) if pad else centers_np
    all_c, all_i = [], []
    for s in range(0, len(centers_np), bs):
        c, i, ov = batch(jnp.asarray(centers_np[s:s + bs], dtype))
        if int(ov) > 0:
            raise ValueError(
                f"a voxel has more than max_residents={max_residents} "
                f"dipoles within its residency reach; raise max_residents "
                f"or grid_n")
        all_c.append(c)
        all_i.append(i)
    corners = jnp.concatenate(all_c)[:n_voxels]
    res_idx = jnp.concatenate(all_i)[:n_voxels]

    valid = res_idx >= 0
    safe = jnp.clip(res_idx, 0, n - 1)
    res_pos = jnp.where(valid[..., None], mnp_pos[safe],
                        dtype(1e9))                      # [V, K, 3]
    res_M = jnp.where(valid, mnp_M[safe], 0.0)           # [V, K]
    payload = jnp.concatenate([res_pos, res_M[..., None]], axis=-1)

    return FieldGrid(
        corners=corners.reshape(grid_n, grid_n, grid_n, 8),
        res_idx=res_idx.reshape(grid_n, grid_n, grid_n, max_residents),
        res_payload=payload.astype(dtype),
        mnp_pos=mnp_pos, mnp_M=mnp_M, spacing=float(h), grid_n=grid_n)


def query(grid: FieldGrid, pos, cell_r):
    """B_z at [W, 3] positions: trilinear far field + exact residents.

    Positions outside [0, bound)^3 are clamped to the boundary voxel (the
    engines wrap positions before querying).
    """
    h = grid.spacing
    g = grid.grid_n
    scaled = pos / h
    v = jnp.clip(jnp.floor(scaled).astype(jnp.int32), 0, g - 1)   # [W, 3]
    frac = jnp.clip(scaled - v, 0.0, 1.0)                         # [W, 3]
    flat = (v[:, 0] * g + v[:, 1]) * g + v[:, 2]                  # [W]

    # both lookups are flat 2D row gathers (the layout XLA lowers best —
    # see the measurement note on expansion.build's cube path)
    corners = grid.corners.reshape(g * g * g, 8)[flat]            # [W, 8]
    wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], 1)             # [W, 2]
    wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], 1)
    wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], 1)
    weights = (wx[:, :, None, None] * wy[:, None, :, None]
               * wz[:, None, None, :]).reshape(-1, 8)
    b_far = jnp.sum(corners * weights, axis=1)

    k = grid.res_payload.shape[1]
    payload = grid.res_payload.reshape(g * g * g, k * 4)[flat] \
        .reshape(-1, k, 4)                                        # [W, K, 4]
    rp = payload[..., :3]
    rm = payload[..., 3]
    d = pos[:, None, :] - rp
    b_res = jnp.sum(
        dipole.dipole_bz_masked(d[..., 0], d[..., 1], d[..., 2], rm,
                                cell_r),
        axis=-1)

    # padding residents sit 1e9 µm away: they can never pass the
    # containment test, so no validity mask is needed
    d2 = jnp.sum(d * d, axis=-1)
    in_cell = jnp.any(d2 < cell_r * cell_r, axis=-1)
    return b_far + b_res, in_cell
