"""Chunked per-walker local field expansion — the TPU-native replacement
for the reference's adaptive octree.

The reference accelerates field lookups with a CPU-built adaptive octree
(src/octree.{h,cpp}) deep-copied to the GPU (cuda_sim.cu:296-397): leaves
cache B_z at sub-octant centers, and dipoles near a leaf ("residents") are
excluded from the cache and summed exactly at query time
(octree.cpp:284-296, cuda_sim.cu:269-286).  Pointer-chasing a tree is
hostile to a vector machine; the TPU design exploits a fact the reference
leaves on the table: **over a few thousand 1-ns steps a walker only
travels ~0.1 µm** (rms; the Box-Muller tail caps a single step at 5.8
sigma ~= 13 nm).  So instead of a global spatial structure queried per
step, each walker carries a tiny *chunk-local* model of the field, rebuilt
every ``chunk_steps`` steps at its current position ("anchor"):

* **near list** — the K nearest dipoles (positions + moments, gathered
  once per chunk), whose masked field is summed exactly each step: the
  analogue of octree residents, but per-walker and gather-free in the hot
  loop;
* **far Taylor** — a 2nd-order Taylor expansion (value, gradient,
  Hessian) about the anchor of the total field of all *other* dipoles,
  evaluated each step in ~25 flops: the analogue of the leaf B cache, but
  with controlled quadratic error instead of piecewise-constant error.

The same near list also answers the in-cell test (the reference's separate
nearest-cell hash table, cuda_sim.cu:453-485): a walker is inside a cell
iff its distance to one of the K nearest dipole centers is < cell_r, since
cells are disjoint and every dipole within cell_r of the walker is
necessarily among its K anchor-nearest (guaranteed by
``validate_near_k``).  One structure, zero gathers per step, O(num_water)
memory — versus the reference's 3.9 GB of trajectory buffers.

Everything is plain jnp, shared verbatim by the lax.scan engine and the
Pallas kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..params import Params
from . import dipole


class NearField(NamedTuple):
    """Per-walker chunk-local field model (all leading dims = walkers)."""
    anchor: jnp.ndarray    # [W, 3] expansion point (chunk-start position)
    near_pos: jnp.ndarray  # [W, K, 3] K nearest dipole positions
    near_M: jnp.ndarray    # [W, K] their moments
    b0: jnp.ndarray        # [W] far-field B_z at anchor
    grad: jnp.ndarray      # [W, 3] far-field gradient at anchor
    hess: jnp.ndarray      # [W, 6] far-field Hessian (xx,yy,zz,xy,xz,yz)


def build(anchor, mnp_pos, mnp_M, params: Params) -> NearField:
    """Select each walker's K nearest dipoles and Taylor-expand the rest.

    anchor: [W, 3] walker positions at chunk start.
    mnp_pos: [N, 3], mnp_M: [N] — all dipoles including periodic images
    (Scene.mnps).  Runs on device in XLA; cost O(W*N) per chunk, amortized
    to a few flops per walker-step.
    """
    k = params.near_k
    if k > mnp_pos.shape[0]:
        raise ValueError(
            f"near_k={k} exceeds the number of dipoles "
            f"({mnp_pos.shape[0]}); selection would duplicate entries and "
            f"double-count their field")
    # Pairwise squared distances via the MXU: |a|^2 + |b|^2 - 2 a.b — one
    # [W,3]x[3,N] matmul instead of materializing [W, N, 3] differences.
    # The ~2e-4 um^2 cancellation noise only fuzzes the *selection order*
    # of near-equidistant dipoles (the exact masked evaluation downstream
    # recomputes true distances), which the K-slack absorbs.
    an2 = jnp.sum(anchor * anchor, axis=-1)             # [W]
    mn2 = jnp.sum(mnp_pos * mnp_pos, axis=-1)           # [N]
    cross = jnp.dot(anchor, mnp_pos.T,
                    preferred_element_type=anchor.dtype)
    d2 = an2[:, None] + mn2[None, :] - 2.0 * cross      # [W, N]

    # K nearest dipoles per walker via K argmin passes.  (jax.lax.top_k on
    # [W, N] takes minutes to compile for TPU and milliseconds to run;
    # eight masked argmins compile instantly and run faster.)  The passes
    # run in bfloat16 — selection tolerates 0.4% distance fuzz for the
    # same K-slack reason — halving their HBM traffic.
    w = anchor.shape[0]
    n = mnp_pos.shape[0]
    col = jnp.arange(n, dtype=jnp.int32)[None, :]
    remaining = d2.astype(jnp.bfloat16) if anchor.dtype == jnp.float32 \
        else d2
    idx_list = []
    for _ in range(k):
        j = jnp.argmin(remaining, axis=1).astype(jnp.int32)  # [W]
        idx_list.append(j)
        remaining = jnp.where(col == j[:, None], jnp.inf, remaining)
    idx = jnp.stack(idx_list, axis=1)                   # [W, K]
    near_pos = mnp_pos[idx]                             # [W, K, 3]
    near_M = mnp_M[idx]                                 # [W, K]
    d = anchor[:, None, :] - mnp_pos[None, :, :]        # [W, N, 3]

    # Far field = masked sum over all dipoles NOT in the near list.  We must
    # not compute it as (total - near): an anchor can sit arbitrarily close
    # to a near dipole, where the unmasked 1/r^3..1/r^7 terms reach Tesla
    # scale and their cancellation would wipe out the ~µT far field in f32.
    # Instead each contribution is weighted by an exclusion mask built from
    # the top-k indices.
    far = jnp.isfinite(remaining)  # exactly the non-selected dipoles
    is_far = far.astype(anchor.dtype)
    # guard the closed forms against r -> 0 at excluded dipoles: give them
    # a dummy displacement (their weight is 0, but inf * 0 = nan).
    dx = jnp.where(far, d[..., 0], 1.0)
    dy = jnp.where(far, d[..., 1], 1.0)
    dz = jnp.where(far, d[..., 2], 1.0)
    M = mnp_M[None, :]

    b0 = jnp.sum(dipole.dipole_bz(dx, dy, dz, M) * is_far, axis=1)
    g = jnp.stack([jnp.sum(c * is_far, axis=1)
                   for c in dipole.dipole_bz_grad(dx, dy, dz, M)], -1)
    h = jnp.stack([jnp.sum(c * is_far, axis=1)
                   for c in dipole.dipole_bz_hessian(dx, dy, dz, M)], -1)

    return NearField(anchor=anchor, near_pos=near_pos, near_M=near_M,
                     b0=b0, grad=g, hess=h)


def evaluate(nf: NearField, pos, cell_r):
    """Field and cell residency at [W, 3] positions within the chunk.

    Returns (B [W] in Tesla, in_cell [W] bool, d2_min [W]).
    This is the per-step hot path: K fused masked dipole evaluations plus a
    10-coefficient Taylor evaluation — no memory gathers, no trees.
    """
    # exact masked near field + containment, fused over the K list
    d = pos[:, None, :] - nf.near_pos                   # [W, K, 3]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    d2 = dx * dx + dy * dy + dz * dz
    outside = d2 > cell_r * cell_r
    safe = jnp.where(outside, d2, jnp.ones_like(d2))
    inv_r5 = 1.0 / (safe * safe * jnp.sqrt(safe))
    contrib = nf.near_M * dipole.FIELD_SCALE * \
        (2 * dz * dz - dx * dx - dy * dy) * inv_r5
    b_near = jnp.sum(jnp.where(outside, contrib, 0.0), axis=-1)
    in_cell = jnp.any(~outside, axis=-1)
    d2_min = jnp.min(d2, axis=-1)

    # far-field Taylor about the anchor
    e = pos - nf.anchor                                 # [W, 3]
    ex, ey, ez = e[..., 0], e[..., 1], e[..., 2]
    h = nf.hess
    b_far = (nf.b0
             + nf.grad[..., 0] * ex + nf.grad[..., 1] * ey
             + nf.grad[..., 2] * ez
             + 0.5 * (h[..., 0] * ex * ex + h[..., 1] * ey * ey
                      + h[..., 2] * ez * ez)
             + h[..., 3] * ex * ey + h[..., 4] * ex * ez
             + h[..., 5] * ey * ez)
    return b_near + b_far, in_cell, d2_min


def validate_near_k(dipole_pos: np.ndarray, params: Params,
                    travel_bound: float | None = None,
                    n_probe: int = 200_000, seed: int = 0) -> int:
    """Scene-level guarantee check for the near-list size K.

    Correctness requires: every dipole within ``cell_r + travel_bound`` of
    any chunk anchor is among that anchor's K nearest.  Sufficient
    condition: no point in the box has more than K dipoles within
    ``cell_r + travel_bound + margin``.  ``dipole_pos`` must be ALL
    dipoles **including periodic images** (Scene.mnps[:, :3]): near a box
    face, images compete for near-list slots and can crowd out the one
    base cell a walker is about to enter.  We probe densely (uniform +
    clustered near dipoles, which also covers the face shells where
    images double the density) and return the observed maximum count;
    callers raise if it exceeds near_k.
    """
    if travel_bound is None:
        travel_bound = default_travel_bound(params)
    reach = params.cell_r + travel_bound
    rng = np.random.default_rng(seed)
    pts = rng.random((n_probe, 3)) * params.bound
    near = dipole_pos[rng.integers(0, len(dipole_pos), n_probe // 2)]
    pts2 = near + rng.normal(scale=reach, size=(n_probe // 2, 3))
    probes = np.concatenate([pts, np.clip(pts2, 0.0, params.bound)])
    counts = np.zeros(len(probes), np.int64)
    for c in dipole_pos:  # loop over dipoles to bound memory
        d2 = np.sum((probes - c) ** 2, axis=1)
        counts += d2 < reach * reach
    return int(counts.max())


def default_travel_bound(params: Params) -> float:
    """Conservative per-chunk walker travel bound, µm.

    Per-axis displacement over ``chunk_steps`` is a random walk with
    sigma = out_stdev * sqrt(chunk_steps) (extracellular D dominates);
    12 sigma on each axis makes escape probability < 1e-30 per chunk —
    and single steps are hard-capped at 5.8 sigma by the 24-bit Box-Muller
    (rng.normal_from_bits).  The engine counts anchor-escape events as an
    observability metric.
    """
    sigma_axis = params.out_stdev * float(np.sqrt(params.chunk_steps))
    return float(12.0 * sigma_axis * np.sqrt(3.0))
