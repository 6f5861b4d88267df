"""Field debugging / inspection utilities.

The reference's DEBUG_FIELD flag rebuilt the octree uniformly and dumped
B_z at every leaf to ``T2_sim_tree_field_info.csv`` for offline accuracy
checking (octree.cpp:393-394, 435-449; parameters.h:22).  Here the same
products are first-class functions — and the accuracy check the dump was
*for* is an automated test (tests/test_fields.py, test_grid.py).
"""

from __future__ import annotations

import numpy as np

from ..params import Params
from . import dipole


def dump_field_csv(mnps: np.ndarray, params: Params, path: str,
                   grid_n: int = 32) -> None:
    """Write B_z sampled on a uniform grid_n^3 lattice of voxel centers to
    CSV rows ``x,y,z,B_z`` (the DEBUG_FIELD product, but on the uniform
    grid that replaced the octree).  Uses the exact masked dipole sum."""
    import jax.numpy as jnp

    h = params.bound / grid_n
    ax = (np.arange(grid_n) + 0.5) * h
    pts = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    mnp_pos = jnp.asarray(mnps[:, :3], jnp.float32)
    mnp_M = jnp.asarray(mnps[:, 4], jnp.float32)
    out = []
    for s in range(0, len(pts), 8192):
        chunk = jnp.asarray(pts[s:s + 8192], jnp.float32)
        out.append(np.asarray(dipole.total_field_masked(
            chunk, mnp_pos, mnp_M, params.cell_r)))
    b = np.concatenate(out)
    with open(path, "w") as f:
        for (x, y, z), v in zip(pts, b):
            f.write(f"{x:.9g},{y:.9g},{z:.9g},{v:.9g}\n")


def field_profile(mnps: np.ndarray, params: Params, start, end,
                  n: int = 512) -> np.ndarray:
    """B_z along a line segment (for plots/inspection): returns [n, 2]
    (arclength µm, B_z Tesla)."""
    import jax.numpy as jnp

    start = np.asarray(start, float)
    end = np.asarray(end, float)
    ts = np.linspace(0.0, 1.0, n)
    pts = start[None, :] + ts[:, None] * (end - start)[None, :]
    b = np.asarray(dipole.total_field_masked(
        jnp.asarray(pts, jnp.float32), jnp.asarray(mnps[:, :3], jnp.float32),
        jnp.asarray(mnps[:, 4], jnp.float32), params.cell_r))
    return np.stack([ts * np.linalg.norm(end - start), b], axis=1)
