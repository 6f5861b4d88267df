"""Fused Pallas TPU chunk kernel — the production engine.

Why this exists: the pure-JAX engine (reference_engine.py) is HBM-bound.
Every ``lax.scan`` step round-trips the walker carry plus the per-walker
field model through HBM (~1 MB/step at 4k walkers -> ~300 GB/s sustained,
measured), capping it at ~6.5e8 walker-steps/s on a v5e.  The entire
working set — walker state (~200 KB) and the chunk field model (~1 MB) —
fits in VMEM with room to spare, so a kernel that keeps it resident for a
whole chunk of timesteps eliminates that traffic entirely: per-chunk I/O is
one VMEM fill + drain, amortized to ~0.5 KB/step.

This is the TPU answer to the reference's ``simulateDiffusion`` +
``computePhaseAccumulation`` + cuBLAS/thrust pipeline (cuda_sim.cu:688-804,
996-1023), fused into ONE kernel that also does the RNG (in registers —
the reference pre-filled 3.9 GB of cuRAND buffers per sprint), the window
reductions, and the Carr-Purcell flips.

Layout: walkers are padded to a multiple of 128 and live as [R, 128] f32
planes (R = W_pad/128 sublanes x 128 lanes — the native VPU shape).  The
near-field model is K slabs of [R, 128] per component; the inner loop is
pure elementwise VPU work with zero gathers (see fields/expansion.py).

RNG modes:
* ``threefry``: the same counter-based Threefry-2x32 stream as the scan
  engine, bit-for-bit — used to cross-validate the two engines on
  identical trajectories.
* ``hardware``: the TPU's native PRNG (pltpu.prng_random_bits), seeded per
  (chunk, key); statistically equivalent, measurably faster, still fully
  deterministic for a fixed seed/schedule.

The XLA side (recandidate + window bookkeeping) wraps the kernel in
``make_sprint_fn`` with the same signature/semantics as the scan engine's.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


from ..utils.lazyimport import LazyModule

# pallas is touched only at kernel-construction time; a warm AOT-cache
# CLI run never traces, so it never pays the ~0.8 s pallas import
# (utils/lazyimport.py)
pl = LazyModule("jax.experimental.pallas")
pltpu = LazyModule("jax.experimental.pallas.tpu")

from .. import rng
from ..fields import dipole, expansion
from ..params import DIRECTION_CUBE, KICK_INTENDED, Params
from .reference_engine import WalkerState, intracellular_kick

LANES = 128
#: sublane rows per walker block: 32 x 128 = 4096 walkers per grid step.
#: One block's working set (state + K near slabs + Taylor planes) is
#: ~1.5 MB of VMEM, so arbitrarily large walker populations stream through
#: the kernel block by block (Mosaic double-buffers the next block's DMA
#: behind the current block's compute).
BLOCK_ROWS = 32

RNG_THREEFRY = "threefry"
RNG_HARDWARE = "hardware"

#: dipole-table limit for the in-kernel rebuild path ([4, N] f32 in SMEM:
#: 2048 entries = 32 KB).  Bigger scenes fall back to the XLA recandidate
#: with the cube-candidate cache (fields/expansion.py).
REBUILD_MAX_MNPS = 2048


class PlaneState(NamedTuple):
    """Walker state as [R, 128] VPU planes (pallas-engine native form)."""
    px: jnp.ndarray
    py: jnp.ndarray
    pz: jnp.ndarray
    in_cell: jnp.ndarray     # f32 0/1 mask
    phase: jnp.ndarray
    phase_comp: jnp.ndarray
    step: jnp.ndarray        # scalar uint32
    escapes: jnp.ndarray     # scalar int32
    coverage: jnp.ndarray    # scalar int32 (see WalkerState.coverage)


def pad_count(num_water: int) -> int:
    """Pad to full VPU planes; populations beyond one block pad to a
    whole number of blocks so the kernel grid divides evenly."""
    wp = -(-num_water // LANES) * LANES
    if wp > BLOCK_ROWS * LANES:
        blk = BLOCK_ROWS * LANES
        wp = -(-wp // blk) * blk
    return wp


def to_planes(state: WalkerState, params: Params) -> PlaneState:
    """[W]-vector state -> padded [R, 128] planes.  Dummy lanes (beyond
    num_water) start at the box center and simply diffuse; the `valid`
    mask (built in make_sprint_fn) excludes them from magnetization sums.

    Host-NumPy inputs (the init_state/checkpoint form) stay NumPy: the
    result is consumed as a jitted-sprint argument (pure transfer),
    whereas jnp padding ops here cost ~6 small device compiles of CLI
    startup through the axon tunnel."""
    xp = np if isinstance(state.pos, np.ndarray) else jnp
    w = state.pos.shape[0]
    wp = pad_count(w)
    r = wp // LANES

    def plane(x, fill):
        return xp.concatenate(
            [x, xp.full((wp - w,), fill, x.dtype)]).reshape(r, LANES)

    half = xp.asarray(params.bound / 2, state.pos.dtype)
    if state.phase.ndim == 2:    # decompose run: [W, 2] -> [2, R, 128]
        phase = xp.stack([plane(state.phase[:, 0], 0),
                          plane(state.phase[:, 1], 0)])
        comp = xp.stack([plane(state.phase_comp[:, 0], 0),
                         plane(state.phase_comp[:, 1], 0)])
    else:
        phase = plane(state.phase, 0)
        comp = plane(state.phase_comp, 0)
    return PlaneState(
        px=plane(state.pos[:, 0], half),
        py=plane(state.pos[:, 1], half),
        pz=plane(state.pos[:, 2], half),
        in_cell=plane(state.in_cell.astype(state.pos.dtype), 0),
        phase=phase,
        phase_comp=comp,
        step=state.step,
        escapes=state.escapes,
        coverage=state.coverage,
    )


def from_planes(ps: PlaneState, num_water: int) -> WalkerState:
    def vec(x):
        return x.reshape(-1)[:num_water]
    if ps.phase.ndim == 3:       # decompose run: [2, R, 128] -> [W, 2]
        phase = jnp.stack([vec(ps.phase[0]), vec(ps.phase[1])], axis=-1)
        comp = jnp.stack([vec(ps.phase_comp[0]), vec(ps.phase_comp[1])],
                         axis=-1)
    else:
        phase = vec(ps.phase)
        comp = vec(ps.phase_comp)
    return WalkerState(
        pos=jnp.stack([vec(ps.px), vec(ps.py), vec(ps.pz)], axis=-1),
        in_cell=vec(ps.in_cell) > 0.5,
        phase=phase,
        phase_comp=comp,
        step=ps.step,
        escapes=ps.escapes,
        coverage=ps.coverage,
    )


def _threefry_words(key01, c0_scalar, lane, n_words, rounds):
    """Counter-based words on a [R,128] lane grid; bitwise-identical to
    rng.words_for_step."""
    c0 = jnp.full_like(lane, c0_scalar)
    out = []
    for pair in range((n_words + 1) // 2):
        w0, w1 = rng.threefry2x32(key01, c0,
                                  lane + jnp.uint32(pair << 27),
                                  rounds=rounds)
        out += [w0, w1]
    return out[:n_words]


def make_chunk_kernel(params: Params, r_planes: int, dtype=jnp.float32,
                      rng_impl: str = RNG_THREEFRY,
                      interpret: bool = False,
                      n_mnp_pad: int | None = None,
                      decompose: bool = False):
    """Build the pallas_call executing one chunk (chunk_steps timesteps,
    spanning chunk_steps/pfreq output windows) for all walkers.

    Arguments are packed to keep per-launch binding cost low (the launch
    overhead is material: ~0.2 ms/call, and a full run makes 20k calls):

        f(scalars_u32[11],
          state  [6, R, 128]  (px, py, pz, in_cell, phase, comp),
          near   [4, K, R, 128]  (x, y, z, M),
          taylor [10, R, 128]  (b0, gx, gy, gz, hxx, hyy, hzz, hxy, hxz, hyz))
        -> (state' [6, R, 128], escapes [R, 128],
            coverage [n_blocks, 1, 1] SMEM, wins [n_blocks, n_win, 2])

    scalars = [step0, key_hi, key_lo, chunk_seed, lane_offset, num_water,
    tcp, cell_r2_bits, stdev_scale_bits, reflect_io_bits,
    reflect_oi_bits].  The chunk anchor IS the input position (positions
    are wrapped before the recandidate build), and walker lanes /
    validity masks are derived in-kernel from (program_id, lane_offset,
    num_water) — no per-launch index planes.  tcp (Carr-Purcell
    interval, steps), cell_r^2, the diffusion stdev scale sqrt(d_scale)
    and the membrane bounce probabilities reflect_io/oi (all f32 bit
    patterns) ride the scalar vector instead of being baked into the
    program so parameter sweeps over taucp / cell_r / D / permeability
    share ONE compile (the reference recompiled with nvcc per value,
    README.md:13); all are read once per launch, outside the step loop.
    The reflect scalars are only read (and the coin word only drawn)
    when the static params enable reflection.

    **In-kernel rebuild mode** (``n_mnp_pad`` set): the near/taylor inputs
    are replaced by the raw dipole table in SMEM, and the kernel performs
    the whole recandidate itself at chunk start — periodic wrap, exact
    K-nearest selection (branchless sorted insertion over the table), and
    the far-field Taylor sums with the selected dipoles excluded by
    index.  This deletes the XLA-side recandidate entirely (~0.4 ms/chunk
    of reductions + glue at the reference scale) for ~0.12 ms of in-kernel
    work:

        f(scalars_u32[11], state [6, R, 128],
          mnp [4, n_mnp_pad] SMEM (x, y, z, M*FIELD_SCALE))
        -> same outputs.

    (A multi-chunk-per-launch variant was measured identical in speed —
    the XLA scan pipeline already hides launch cost — and 10x slower to
    compile, so one launch per chunk it is.)

    **Decomposition mode** (``decompose=True``): trajectories never depend
    on the dipole moment, so each walker's phase is exactly linear in a
    global moment scale — phase = s*A + B with A the dipole-field part
    and B the kick part (see reference_engine.make_sprint_fn).  The state
    grows to 8 planes (A, comp_A, B, comp_B replace phase, comp), and the
    window output becomes the per-walker VMEM record
    ``dec [n_win, 2, R, 128]`` (A, B per window) instead of the SMEM
    (sum cos, sum sin) pair — one production-speed run then reconstructs
    the T2 curve at ANY moment scale (engine/decompose.py).
    """
    params.validate()
    if params.chunk_steps % params.pfreq != 0:
        raise ValueError(
            "pallas engine requires chunk_steps to be a multiple of pfreq")
    n_win = params.chunk_steps // params.pfreq
    k = params.near_k
    rebuild = n_mnp_pad is not None
    travel2_f = float(expansion.default_travel_bound(params) ** 2)
    use_reflection = params.reflect_io > 0 or params.reflect_oi > 0
    use_kick_u = params.kick_mode == KICK_INTENDED
    n_words = 7 if (use_reflection or use_kick_u) else 5

    # plain python floats: weak-typed scalars that adopt the plane dtype
    # without becoming traced constants the kernel would have to capture
    in_stdev = float(params.in_stdev)
    out_stdev = float(params.out_stdev)
    phase_per_tesla = float(params.phase_per_tesla)
    two_pi = float(2.0 * np.pi)
    bound_f = float(params.bound)
    # background-gradient constants (T/µm); only touched when
    # params.use_gradient (static) — the default physics pays nothing
    gx_c, gy_c, gz_c = (float(g) for g in params.b0_gradient)

    travel_f = float(np.sqrt(travel2_f))
    r_blk = min(r_planes, BLOCK_ROWS)
    if r_planes % r_blk != 0:
        raise ValueError(f"r_planes ({r_planes}) must be a multiple of the "
                         f"block rows ({r_blk}); pad_count guarantees this")
    n_blocks = r_planes // r_blk
    blk_walkers = r_blk * LANES

    def rebuild_model(mnp, ax_full, ay_full, az_full, scalars):
        """In-kernel recandidate: exact K-nearest selection + far Taylor.

        Selection is a branchless sorted insertion over the SMEM dipole
        table — exact f32 distances (stronger than the XLA path's
        bf16-fuzzed argmin passes).  The far pass excludes the selected
        dipoles by table index, the same exactness contract as
        expansion._far_sums_*.

        Runs over row sub-groups of 8 so the ~40 live planes of loop
        carry stay a register-file-sized working set (at the full 32-row
        block they spill, tripling the rebuild cost — measured)."""
        sub = min(8, r_blk)
        groups = [
            _rebuild_group(mnp, ax_full[g:g + sub], ay_full[g:g + sub],
                           az_full[g:g + sub], min(sub, r_blk - g),
                           g, scalars)
            for g in range(0, r_blk, sub)]
        cat = lambda i: ([jnp.concatenate([grp[i][j] for grp in groups], 0)
                          for j in range(len(groups[0][i]))])
        # coverage violations leave each sub-group as ONE scalar already
        # (a count plane routed through the vector outputs crashed the
        # Mosaic lowering at 32-row blocks: limits[i] <= dim(i)); the
        # summed scalar leaves the kernel through SMEM like the windows
        cov = jnp.zeros((), dtype)
        for grp in groups:
            cov = cov + grp[5]
        return cat(0), cat(1), cat(2), cat(3), cat(4), cov

    def _rebuild_group(mnp, ax, ay, az, rows, g0, scalars):
        inf = jnp.full((rows, LANES), 1e30, dtype)
        # unfilled slots sit 1e9 um away with zero moment: even if a scene
        # has fewer dipoles than K (rejected at sprint build anyway), the
        # containment test can never see a phantom dipole
        farpos = jnp.full((rows, LANES), 1e9, dtype)
        zero = jnp.zeros((rows, LANES), dtype)
        neg1 = jnp.full((rows, LANES), -1, jnp.int32)
        # coverage reach (cell_r + travel)^2, rebuilt HERE at sub-group
        # shape from the cell_r launch scalar: row-slicing the
        # kernel-level broadcast planes crashed the Mosaic lowering
        # (limits[i] <= dim(i)) at 32-row blocks
        cr2_g = jax.lax.bitcast_convert_type(
            jnp.full((rows, LANES), scalars[7]), jnp.float32).astype(dtype)
        reach_g = jnp.sqrt(cr2_g) + travel_f
        reach2 = reach_g * reach_g
        # slots: (d2, (x, y, z, m), idx) ascending by d2, plus the
        # coverage-sentinel count: EVERY dipole within reach (selected
        # or not) — > K at this anchor means the near list provably
        # misses one (see WalkerState.coverage).  It rides the selection
        # loop, which already has d2 in hand (a separate counting pass
        # sent the Mosaic compile time from ~15 s to >400 s; so did
        # folding it into the far loop's carry).  Padded table slots sit
        # 1e6 µm away and never count.
        init = ((inf,) * k,
                ((farpos,) * k, (farpos,) * k, (farpos,) * k, (zero,) * k),
                (neg1,) * k,
                jnp.zeros((rows, LANES), dtype))

        def sel_body(j, carry):
            d2s, fields, ids, cnt = carry
            x0 = mnp[0, j]
            y0 = mnp[1, j]
            z0 = mnp[2, j]
            m0 = mnp[3, j]
            dx = ax - x0
            dy = ay - y0
            dz = az - z0
            d2 = dx * dx + dy * dy + dz * dz
            cnt = cnt + jnp.where(d2 < reach2, 1.0, 0.0).astype(dtype)
            return (*expansion.sorted_insert(d2s, fields, ids, d2,
                                             (x0, y0, z0, m0), j), cnt)

        # 8-wide unroll: batches the SMEM scalar loads so their latency
        # pipelines behind the vector work (the 1-dipole body measured
        # ~5x its ALU floor)
        def sel_block(t, slots):
            j0 = t * 8
            for u in range(8):
                slots = sel_body(j0 + u, slots)
            return slots

        _, (xs, ys, zs, ms), ids, cnt = jax.lax.fori_loop(
            0, n_mnp_pad // 8, sel_block, init)

        def far_body(j, accs):
            x0 = mnp[0, j]
            y0 = mnp[1, j]
            z0 = mnp[2, j]
            m0 = mnp[3, j]
            parts = dipole.bz_taylor_parts(ax - x0, ay - y0, az - z0, m0)
            w = expansion.excluded_weight(ids, j, dtype)
            return tuple(a + c * w for a, c in zip(accs, parts))

        def far_block(t, accs):
            j0 = t * 8
            for u in range(8):
                accs = far_body(j0 + u, accs)
            return accs

        accs = jax.lax.fori_loop(
            0, n_mnp_pad // 8, far_block,
            (jnp.zeros((rows, LANES), dtype),) * 10)

        # per-walker validity at sub-group shape (padded lanes sit at
        # the box center and must not count), then ONE scalar out
        local_g = ((jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
                    + g0) * LANES
                   + jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
                   + pl.program_id(0) * blk_walkers)
        valid_g = (jax.lax.bitcast_convert_type(local_g, jnp.uint32)
                   < scalars[5]).astype(dtype)
        ind = jnp.where(cnt > float(k), 1.0, 0.0).astype(dtype)
        cov = jnp.sum(ind * valid_g)
        return list(xs), list(ys), list(zs), list(ms), list(accs), cov

    def kernel(scalars, state, *rest):
        # outputs: state planes, per-walker escape plane (VMEM), ONE
        # coverage-violation scalar (SMEM — any extra vector output or
        # 2-row flags packing crashed the Mosaic lowering at 32-row
        # blocks: limits[i] <= dim(i)), and the SMEM window sums
        if rebuild:
            (mnp,), (o_state, o_esc, o_cov, o_wins) = rest[:1], rest[1:]
        else:
            (near, taylor), (o_state, o_esc, o_cov, o_wins) = \
                rest[:2], rest[2:]
        step0 = scalars[0]
        key01 = (scalars[1], scalars[2])
        tcp_u = scalars[6]
        # cell_r^2 travels as its f32 bit pattern (scalar bitcasts are
        # unsupported in Mosaic, so view it on the vector side); read once
        # per launch, it is a plain vector register in the step loop
        cell_r2 = jax.lax.bitcast_convert_type(
            jnp.full((r_blk, LANES), scalars[7]), jnp.float32).astype(dtype)
        # stdev scale sqrt(d_scale) (f32 bits, 1.0 by default): runtime
        # diffusion-coefficient sweeps/fits share this compiled program.
        # Folded into the stdev constants ONCE per launch — the step loop
        # pays zero extra ops for the runtime D axis (and dstd == 1.0
        # keeps the default-path products bitwise-unchanged)
        dstd = jax.lax.bitcast_convert_type(
            jnp.full((r_blk, LANES), scalars[8]), jnp.float32).astype(dtype)
        in_stdev_d = in_stdev * dstd
        out_stdev_d = out_stdev * dstd
        if use_reflection:
            # membrane bounce probabilities as launch scalars (read once
            # per launch like cell_r2/dstd): permeability sweeps/fits
            # share this compiled program.  Dead (never read) when the
            # static params have reflection off.
            rio_v = jax.lax.bitcast_convert_type(
                jnp.full((r_blk, LANES), scalars[9]),
                jnp.float32).astype(dtype)
            roi_v = jax.lax.bitcast_convert_type(
                jnp.full((r_blk, LANES), scalars[10]),
                jnp.float32).astype(dtype)
        if rng_impl == RNG_HARDWARE:
            # distinct hardware-PRNG stream per walker block — seeding all
            # blocks identically would give them identical random sequences
            pltpu.prng_seed(scalars[3]
                            + jnp.uint32(pl.program_id(0))
                            * jnp.uint32(2654435761))

        # in-kernel walker indices: block-local iota + block offset
        local = (jax.lax.broadcasted_iota(jnp.int32, (r_blk, LANES), 0)
                 * LANES
                 + jax.lax.broadcasted_iota(jnp.int32, (r_blk, LANES), 1))
        blk0 = pl.program_id(0) * blk_walkers
        # scalar bitcasts are unsupported in Mosaic; do the uint32 view on
        # the vector side and compare unsigned
        idx_u = jax.lax.bitcast_convert_type(local + blk0, jnp.uint32)
        valid_v = (idx_u < scalars[5]).astype(dtype)
        lane_v = idx_u + scalars[4]

        def hw_bits(n):
            # prng_random_bits yields int32; bitcast before the logical
            # shift or sign extension corrupts the top bits.  (A single
            # (n*r_blk, 128) draw row-sliced produces the identical
            # stream and identical speed — measured; per-call overhead
            # is already negligible.)
            return [pltpu.bitcast(pltpu.prng_random_bits((r_blk, LANES)),
                                  jnp.uint32) for _ in range(n)]

        def uni(bits):
            return rng.uniform_from_bits(bits, dtype)

        def run_chunk(model, chunk_step0, x, y, z, phases):
            """One chunk of chunk_steps timesteps against a fixed field
            model; emits its windows into o_wins.  ``phases`` is
            (phase, comp) — or (A, comp_A, B, comp_B) in decompose mode.
            Returns the end-of-chunk walker state and the chunk max
            anchor distance (escape detection)."""
            (anchor_x, anchor_y, anchor_z, nx, ny, nz, nM,
             tb0, tgx, tgy, tgz, thxx, thyy, thzz, thxy, thxz,
             thyz) = model

            def eval_field(px, py, pz):
                """Masked K-near sum + far Taylor (expansion.evaluate,
                fused on planes).  Returns (B, in_cell_mask)."""
                b_near = jnp.zeros_like(px)
                min_d2 = jnp.full_like(px, 1e9)
                for j in range(k):
                    dx = px - nx[j]
                    dy = py - ny[j]
                    dz = pz - nz[j]
                    dz2 = dz * dz
                    d2 = dx * dx + dy * dy + dz2
                    # d2 == 0 (walker exactly on a dipole) sends rsqrt to
                    # inf and contrib to nan — but d2 = 0 < cell_r2 always
                    # lands in the masked (in-cell) arm of the select, so
                    # the nan never escapes and no epsilon clamp is needed
                    # (cell_r > 0 is enforced by Params.validate)
                    rs = jax.lax.rsqrt(d2)
                    rs2 = rs * rs
                    inv_r5 = rs2 * rs2 * rs
                    # 2dz^2 - dx^2 - dy^2 == 3dz^2 - d2 (one op cheaper);
                    # nM is pre-scaled by FIELD_SCALE at pack time
                    contrib = nM[j] * (3.0 * dz2 - d2) * inv_r5
                    b_near = b_near + jnp.where(d2 > cell_r2, contrib, 0.0)
                    min_d2 = jnp.minimum(min_d2, d2)
                # the raw running-min distance is returned instead of a
                # containment mask: the carry must stay f32 (Mosaic cannot
                # legalize vector<i1> scf.for carries), and carrying
                # min_d2 lets each step derive the bool with ONE compare
                # where the float-0/1 scheme cost compare+select+compare
                ex = px - anchor_x
                ey = py - anchor_y
                ez = pz - anchor_z
                b_far = (tb0 + tgx * ex + tgy * ey + tgz * ez
                         + 0.5 * (thxx * ex * ex + thyy * ey * ey
                                  + thzz * ez * ez)
                         + thxy * ex * ey + thxz * ex * ez + thyz * ey * ez)
                return b_near + b_far, min_d2

            def one_step(carry, u0, u1, u2, nrm, u_coin, u_kick,
                         track_maxd2=True, dirs=None):
                """The physics of one timestep given its random inputs
                (simulateDiffusion body, cuda_sim.cu:708-732, fused with
                the phase kick).  ``track_maxd2=False`` skips the
                anchor-escape sampling for this step (the hardware-RNG
                path samples sparsely; the bound's 7-sigma margin dwarfs
                the 5.8-sigma single-step travel cap times the sampling
                stride).  ``dirs`` (hardware cube path): raw direction
                components already mapped to [-1, 1), bypassing the
                uniform inputs."""
                (x, y, z, mind2, bprev, acc, maxd2) = carry
                # containment bool derived from the carried nearest-dipole
                # distance (see eval_field: f32 carry, one compare here)
                incell = mind2 < cell_r2
                if dirs is not None:
                    dx, dy, dz = dirs
                    inv_norm = jax.lax.rsqrt(
                        jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-12))
                elif params.direction_mode == DIRECTION_CUBE:
                    dx = 2.0 * u0 - 1.0
                    dy = 2.0 * u1 - 1.0
                    dz = 2.0 * u2 - 1.0
                    inv_norm = jax.lax.rsqrt(
                        jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-12))
                else:
                    cos_t = 2.0 * u0 - 1.0
                    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
                    phi = two_pi * u1
                    dx = sin_t * jnp.cos(phi)
                    dy = sin_t * jnp.sin(phi)
                    dz = cos_t
                    inv_norm = 1.0
                # exact select (bitwise-equal to the scan engine's
                # jnp.where), one op cheaper than the two-mul blend;
                # incell is a bool plane so the mask feeds straight in
                stdev = jnp.where(incell, in_stdev_d, out_stdev_d)
                mag = nrm * stdev * inv_norm
                x2 = x + dx * mag
                y2 = y + dy * mag
                z2 = z + dz * mag

                b, mind2_new = eval_field(x2, y2, z2)
                in_new = mind2_new < cell_r2

                if use_reflection:
                    # pure boolean crossing logic + selects — value-
                    # identical to the scan engine's float blend (its
                    # flip factor is exactly 0 or 1); thresholds are the
                    # rio_v/roi_v launch-scalar planes
                    flip = ((incell & jnp.logical_not(in_new)
                             & (u_coin < rio_v))
                            | (jnp.logical_not(incell) & in_new
                               & (u_coin < roi_v)))
                    x2 = jnp.where(flip, x, x2)
                    y2 = jnp.where(flip, y, y2)
                    z2 = jnp.where(flip, z, z2)
                    b = jnp.where(flip, bprev, b)
                    # boolean algebra, not where(): Mosaic cannot lower
                    # an i1-valued select at 32-row blocks (trunci
                    # vector<32x128xi8> -> i1 is unsupported); the
                    # masked form compiles on hardware for every block
                    # height and is value-identical
                    in_new = (flip & incell) | (~flip & in_new)
                    mind2_new = jnp.where(flip, mind2, mind2_new)

                kick = b * phase_per_tesla
                intra = intracellular_kick(params, u_kick, in_new, dtype)
                if params.use_gradient:
                    # background-gradient kick at the recorded position;
                    # moment-independent -> rides the B column in
                    # decompose mode (see reference_engine.step_fn).
                    # Static flag: (0,0,0) compiles the 4 ops out.
                    bg_kick = (x2 * gx_c + y2 * gy_c
                               + z2 * gz_c) * phase_per_tesla
                    intra = bg_kick if intra is None else intra + bg_kick
                if decompose:
                    acc = (acc[0] + kick,
                           acc[1] if intra is None else acc[1] + intra)
                else:
                    if intra is not None:
                        kick = kick + intra
                    acc = (acc[0] + kick,)

                if track_maxd2:
                    ddx = x2 - anchor_x
                    ddy = y2 - anchor_y
                    ddz = z2 - anchor_z
                    maxd2 = jnp.maximum(maxd2,
                                        ddx * ddx + ddy * ddy + ddz * ddz)
                return (x2, y2, z2, mind2_new, b, acc, maxd2)

            def run_window(win_step0, carry):
                if rng_impl == RNG_THREEFRY:
                    # per-step counter draws: bit-compatible with the scan
                    # engine for cross-validation
                    def body(i, c):
                        words = _threefry_words(
                            key01, win_step0 + i.astype(jnp.uint32), lane_v,
                            n_words, params.rng_rounds)
                        nrm = jnp.sqrt(
                            -2.0 * jnp.log(1.0 - uni(words[3]))) * \
                            jnp.cos(two_pi * uni(words[4]))
                        return one_step(
                            c, uni(words[0]), uni(words[1]), uni(words[2]),
                            nrm,
                            uni(words[5]) if n_words > 5 else None,
                            uni(words[6]) if n_words > 6 else None)
                    return jax.lax.fori_loop(0, params.pfreq, body, carry)

                # hardware PRNG: two steps per iteration sharing one
                # Box-Muller pair (cos and sin of the same draw are
                # independent normals) — halves the log/sqrt/cos cost
                extra = (1 if use_reflection else 0) + \
                    (1 if use_kick_u else 0)

                pack_dirs = params.direction_mode == DIRECTION_CUBE

                def unpack_pm1(word):
                    """Two [-1, 1) floats from one uint32: 16-bit halves,
                    each converted with a single fused multiply-add.
                    16-bit direction resolution quantizes the step by
                    ~7e-8 um — four orders below the f32 position ulp at
                    box scale; the normal magnitude keeps full 24-bit
                    resolution (its tail cap is a travel-bound input)."""
                    hi = jax.lax.bitcast_convert_type(
                        word >> jnp.uint32(16), jnp.int32)
                    lo = jax.lax.bitcast_convert_type(
                        word & jnp.uint32(0xFFFF), jnp.int32)
                    scale = dtype(2.0 ** -15)
                    return (hi.astype(dtype) * scale - 1.0,
                            lo.astype(dtype) * scale - 1.0)

                def body2(i, c, track2=True):
                    del i
                    # polynomial Box-Muller (rng.fast_normal_pair): ~4x
                    # cheaper than library log/cos/sin, ~1e-5-sigma accurate
                    if pack_dirs:
                        # direction components ride 16-bit word halves:
                        # 5 draws per step pair instead of 8 (each
                        # prng_random_bits costs ~6 VPU-ops — measured
                        # 17.0 -> 18.9e9 steps/s with all 7 extra draws
                        # removed)
                        w = hw_bits(5 + 2 * extra)
                        n1, n2 = rng.fast_normal_pair(w[3], w[4])
                        dx1, dy1 = unpack_pm1(w[0])
                        dz1, dx2 = unpack_pm1(w[1])
                        dy2, dz2 = unpack_pm1(w[2])
                        d1, d2_ = (dx1, dy1, dz1), (dx2, dy2, dz2)
                        u = (None,) * 6
                        nw = 5
                    else:
                        w = hw_bits(8 + 2 * extra)
                        n1, n2 = rng.fast_normal_pair(w[6], w[7])
                        d1 = d2_ = None
                        u = tuple(uni(w[j]) for j in range(6))
                        nw = 8
                    coin1 = uni(w[nw]) if use_reflection else None
                    coin2 = uni(w[nw + 1]) if use_reflection else None
                    nw += 2 if use_reflection else 0
                    kick1 = uni(w[nw]) if use_kick_u else None
                    kick2 = uni(w[nw + 1]) if use_kick_u else None
                    c = one_step(c, u[0], u[1], u[2], n1,
                                 coin1, kick1, track_maxd2=False, dirs=d1)
                    return one_step(c, u[3], u[4], u[5], n2,
                                    coin2, kick2, track_maxd2=track2,
                                    dirs=d2_)
                if params.pfreq % 4 == 0:
                    # 2x-unrolled pair loop (4 steps/iteration): pipelines
                    # the rsqrt/select dependency chains across step pairs
                    # — measured +3.6% (16.5 -> 17.1e9 walker-steps/s),
                    # bitwise-identical output.  A 4x version compiles
                    # pathologically slowly in Mosaic for no further gain.
                    # Escape sampling runs once per 4-step body (the
                    # 7-sigma travel margin dwarfs the <=3-step lag).
                    def body4(i, c):
                        return body2(i, body2(i, c, track2=False))
                    carry = jax.lax.fori_loop(0, params.pfreq // 4,
                                              body4, carry)
                else:
                    carry = jax.lax.fori_loop(0, params.pfreq // 2, body2,
                                              carry)
                if params.pfreq % 2:
                    w = hw_bits(5 + extra)
                    n1, _ = rng.fast_normal_pair(w[3], w[4])
                    nw = 5
                    coin1 = uni(w[nw]) if use_reflection else None
                    nw += 1 if use_reflection else 0
                    kick1 = uni(w[nw]) if use_kick_u else None
                    carry = one_step(carry, uni(w[0]), uni(w[1]),
                                     uni(w[2]), n1, coin1, kick1)
                return carry

            # chunk-start state (anchor == wrapped input position)
            b_start, mind2_start = eval_field(x, y, z)
            maxd2 = jnp.zeros_like(x)
            n_acc = 2 if decompose else 1

            def zeros_acc():
                return tuple(jnp.zeros_like(x) for _ in range(n_acc))

            carry = (x, y, z, mind2_start, b_start, zeros_acc(), maxd2)
            for w_idx in range(n_win):
                win_step0 = chunk_step0 + jnp.uint32(w_idx * params.pfreq)
                x, y, z, mind2, bprev, _, maxd2 = carry
                carry = (x, y, z, mind2, bprev, zeros_acc(), maxd2)
                carry = run_window(win_step0, carry)
                (x, y, z, mind2, bprev, acc, maxd2) = carry

                # Kahan fold (performUpdate, cuda_sim.cu:814-828), one
                # stream per accumulator (phase, or A and B)
                folded = []
                for a in range(n_acc):
                    ph, cp = phases[2 * a], phases[2 * a + 1]
                    ky = acc[a] - cp
                    kt = ph + ky
                    cp = (kt - ph) - ky
                    folded += [kt, cp]
                phases = tuple(folded)
                if decompose:
                    # per-walker (A, B) record for this window — the
                    # moment-scale reconstruction basis
                    o_wins[w_idx, 0] = phases[0]
                    o_wins[w_idx, 1] = phases[2]
                else:
                    phase = phases[0]
                    o_wins[0, w_idx, 0] = jnp.sum(jnp.cos(phase) * valid_v)
                    o_wins[0, w_idx, 1] = jnp.sum(jnp.sin(phase) * valid_v)

                # Carr-Purcell flip after emission (cuda_sim.cu:1015-1020);
                # tcp is a launch scalar so taucp sweeps share one compile;
                # in decompose mode the flip negates BOTH components,
                # preserving phase = s*A + B exactly
                end_step = win_step0 + jnp.uint32(params.pfreq)
                do_flip = (end_step % tcp_u) == 0
                sign = jnp.where(do_flip, -1.0, 1.0).astype(x.dtype)
                phases = tuple(p * sign for p in phases)

            (x, y, z, mind2, _, _, maxd2) = carry
            return x, y, z, mind2 < cell_r2, phases, maxd2

        x, y, z = state[0], state[1], state[2]
        incell = state[3]
        phases = tuple(state[4 + i] for i in range(4 if decompose else 2))
        if rebuild:
            # periodic wrap at chunk boundary, in-kernel (same semantics
            # as the XLA-side jnp.mod of the big-scene path)
            ax = jnp.mod(x + bound_f, bound_f)
            ay = jnp.mod(y + bound_f, bound_f)
            az = jnp.mod(z + bound_f, bound_f)
            # coverage reach (cell_r + travel)^2 is rebuilt inside each
            # sub-group from the cell_r launch scalar + static travel
            nx, ny, nz, nM, tl, cov_scalar = rebuild_model(
                mnp, ax, ay, az, scalars)
            model = (ax, ay, az, nx, ny, nz, nM, *tl)
        else:
            ax, ay, az = x, y, z
            model = (ax, ay, az,
                     [near[0][j] for j in range(k)],
                     [near[1][j] for j in range(k)],
                     [near[2][j] for j in range(k)],
                     [near[3][j] for j in range(k)],
                     *[taylor[i] for i in range(10)])
        x, y, z, incell, phases, maxd2 = run_chunk(
            model, step0, ax, ay, az, phases)
        esc_count = jnp.where(maxd2 > travel2_f, 1.0, 0.0) * valid_v

        o_state[0] = x
        o_state[1] = y
        o_state[2] = z
        o_state[3] = incell.astype(dtype)  # bool plane -> f32 0/1 state row
        for i, p in enumerate(phases):
            o_state[4 + i] = p
        o_esc[:] = esc_count
        if rebuild:
            o_cov[0, 0, 0] = cov_scalar
        else:
            # XLA side counts coverage at its own recandidate (it has
            # the distance matrix); the kernel contributes zero
            o_cov[0, 0, 0] = jnp.zeros((), dtype)

    n_state = 8 if decompose else 6
    sspec = pl.BlockSpec((11,), lambda b: (0,), memory_space=pltpu.SMEM)
    state_spec = pl.BlockSpec((n_state, r_blk, LANES), lambda b: (0, b, 0),
                              memory_space=pltpu.VMEM)
    esc_spec = pl.BlockSpec((r_blk, LANES), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    # the per-block scalar rides a [n_blocks, 1, 1] SMEM output whose
    # block shape (1, 1, 1) has its last two dims EQUAL to the array's —
    # a [n_blocks, 1] array with (1, 1) blocks violates the Mosaic
    # tiling rule (divisible by 8, or equal) as soon as n_blocks > 1,
    # i.e. for any population beyond one 4096-walker block
    cov_spec = pl.BlockSpec((1, 1, 1), lambda b: (b, 0, 0),
                            memory_space=pltpu.SMEM)
    if decompose:
        # per-walker (A, B) per window — VMEM planes, blocks disjoint in
        # the plane-row dim; leading dims equal the array's (tiling rule)
        wspec = pl.BlockSpec((n_win, 2, r_blk, LANES),
                             lambda b: (0, 0, b, 0),
                             memory_space=pltpu.VMEM)
        wins_shape = (n_win, 2, r_planes, LANES)
    else:
        wspec = pl.BlockSpec((1, n_win, 2), lambda b: (b, 0, 0),
                             memory_space=pltpu.SMEM)
        wins_shape = (n_blocks, n_win, 2)
    if rebuild:
        mnp_spec = pl.BlockSpec((4, n_mnp_pad), lambda b: (0, 0),
                                memory_space=pltpu.SMEM)
        in_specs = [sspec, state_spec, mnp_spec]
    else:
        near_spec = pl.BlockSpec((4, k, r_blk, LANES),
                                 lambda b: (0, 0, b, 0),
                                 memory_space=pltpu.VMEM)
        taylor_spec = pl.BlockSpec((10, r_blk, LANES), lambda b: (0, b, 0),
                                   memory_space=pltpu.VMEM)
        in_specs = [sspec, state_spec, near_spec, taylor_spec]

    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        out_shape=(
            jax.ShapeDtypeStruct((n_state, r_planes, LANES), dtype),
            jax.ShapeDtypeStruct((r_planes, LANES), dtype),
            jax.ShapeDtypeStruct((n_blocks, 1, 1), dtype),
            jax.ShapeDtypeStruct(wins_shape, dtype),
        ),
        in_specs=in_specs,
        out_specs=(state_spec, esc_spec, cov_spec, wspec),
        interpret=interpret,
    )
    return call


def make_sprint_fn(params: Params, num_water: int, dtype=jnp.float32,
                   rng_impl: str = RNG_THREEFRY, interpret: bool = False,
                   decompose: bool = False):
    """Jitted sprint with the same contract as
    reference_engine.make_sprint_fn, but running chunks in the Pallas
    kernel.  Operates on PlaneState.

    sprint(mnp_pos, mnp_M, key_arr, plane_state, lane_offset,
           cache=None, tcp=None, cell_r=None, d_scale=None, reflect=None)
        -> (plane_state', wins [n_windows, 2])

    ``tcp`` (Carr-Purcell interval in steps, uint32), ``cell_r``
    (cell radius, f32 — squared in-flight with scan-engine-identical
    rounding), ``d_scale`` and ``reflect`` (a (reflect_io, reflect_oi)
    pair; requires reflection enabled in the static params) optionally
    override their static params values with *traced* runtime scalars:
    a taucp / cell_r / D / permeability sweep can then reuse ONE
    compiled sprint across all values (the reference rebuilt with nvcc
    per value, README.md:13).  Defaults (None) bake the params values
    into the very same launch scalars — the compiled program is
    identical either way.

    When the scene's dipole table fits SMEM (<= REBUILD_MAX_MNPS entries),
    the whole recandidate runs inside the chunk kernel and the XLA side
    degenerates to a scan over kernel launches; the dipole-table length
    (static under jit) selects the path at trace time.

    ``decompose=True``: phase-decomposition run (see make_chunk_kernel) —
    the PlaneState carries phase / phase_comp as [2, R, 128] (A, B)
    stacks, and ``wins`` becomes [n_windows, 2, R, 128] per-walker (A, B)
    planes.  Production-speed basis for moment-scale reconstruction
    (engine/decompose.py).
    """
    params.validate()
    wp = pad_count(num_water)
    r = wp // LANES
    if params.chunk_steps % params.pfreq == 0:
        chunk_steps = params.chunk_steps
    else:
        raise ValueError("pallas engine: chunk_steps must be a multiple "
                         "of pfreq (e.g. 2000 with pfreq=1000)")
    n_chunks = params.sprint_steps // chunk_steps
    if n_chunks * chunk_steps != params.sprint_steps:
        raise ValueError("sprint_steps must be a multiple of chunk_steps")
    n_win_chunk = chunk_steps // params.pfreq
    bound = dtype(params.bound)
    kerns = {}

    def get_kern(n_mnp_pad):
        if n_mnp_pad not in kerns:
            kerns[n_mnp_pad] = make_chunk_kernel(
                params, r, dtype, rng_impl, interpret,
                n_mnp_pad=n_mnp_pad, decompose=decompose)
        return kerns[n_mnp_pad]

    def pack_state(ps: PlaneState):
        base = jnp.stack([ps.px, ps.py, ps.pz, ps.in_cell])
        if decompose:     # phase/comp are [2, R, 128] (A, B) stacks
            return jnp.concatenate([base, ps.phase, ps.phase_comp])
        return jnp.concatenate([base, ps.phase[None], ps.phase_comp[None]])

    def make_scalars(ps, lane_offset, key_arr, tcp_u, cr2_bits, dstd_bits,
                     rio_bits, roi_bits):
        step0 = ps.step
        lane_off = jnp.asarray(lane_offset, jnp.uint32)
        # chunk_seed folds in lane_offset so walker shards on other
        # chips seed distinct hardware-PRNG streams (threefry mode is
        # shard-invariant by construction via the lane counter)
        return jnp.stack(
            [step0, key_arr[0], key_arr[1],
             (step0 ^ (key_arr[1] * jnp.uint32(2654435761)))
             + lane_off * jnp.uint32(2246822519),
             lane_off, jnp.uint32(num_water),
             tcp_u, cr2_bits, dstd_bits, rio_bits, roi_bits])

    def dyn_scalars(tcp, cell_r, d_scale, reflect=None):
        """Resolve the runtime-sweepable scalars: defaults come from the
        static params (bitwise-identical program either way), overrides
        are traced values so taucp / cell_r / d_scale / reflect sweeps
        share one compile.

        cell_r is squared HERE as an f32 x f32 product — the same
        rounding as the scan engine's ``cell_r * cell_r`` — so the
        in-cell verdict is bitwise consistent across every path (a
        pre-squared f64 constant differs by 1 ulp for radii like 0.55).
        d_scale square-roots here too (f32, matching the scan engine's
        dyn stdev scale) and rides as the sqrt's bit pattern.
        reflect is a (reflect_io, reflect_oi) pair riding as f32 bit
        patterns; the kernel only reads them when the static params
        enable reflection (guarded upstream)."""
        tcp_u = (jnp.uint32(params.tcp) if tcp is None
                 else jnp.asarray(tcp, jnp.uint32))
        cr = (jnp.float32(params.cell_r) if cell_r is None
              else jnp.asarray(cell_r, jnp.float32))
        dstd = (jnp.float32(1.0) if d_scale is None
                else jnp.sqrt(jnp.asarray(d_scale, jnp.float32)))
        rio = (jnp.float32(params.reflect_io) if reflect is None
               else jnp.asarray(reflect[0], jnp.float32))
        roi = (jnp.float32(params.reflect_oi) if reflect is None
               else jnp.asarray(reflect[1], jnp.float32))
        return (tcp_u, jax.lax.bitcast_convert_type(cr * cr, jnp.uint32),
                cr, jax.lax.bitcast_convert_type(dstd, jnp.uint32),
                jax.lax.bitcast_convert_type(rio, jnp.uint32),
                jax.lax.bitcast_convert_type(roi, jnp.uint32))

    def advance(ps, state_out, o_esc, o_cov, steps, cov_extra=None):
        # o_esc: [R, 128] per-walker escape counts, o_cov: [n_blocks, 1, 1]
        # per-block coverage-violation counts, both already validity-
        # masked in-kernel; cov_extra: XLA-side violation count
        # (big-scene recandidate paths)
        escapes = ps.escapes + jnp.sum(o_esc).astype(jnp.int32)
        coverage = ps.coverage + jnp.sum(o_cov).astype(jnp.int32)
        if cov_extra is not None:
            coverage = coverage + cov_extra
        if decompose:
            phase, comp = state_out[4:6], state_out[6:8]
        else:
            phase, comp = state_out[4], state_out[5]
        return PlaneState(px=state_out[0], py=state_out[1],
                          pz=state_out[2], in_cell=state_out[3],
                          phase=phase, phase_comp=comp,
                          step=ps.step + jnp.uint32(steps),
                          escapes=escapes, coverage=coverage)

    def sprint(mnp_pos, mnp_M, key_arr, ps: PlaneState, lane_offset,
               cache=None, tcp=None, cell_r=None, d_scale=None,
               reflect=None):
        (tcp_u, cr2_bits, cr_dyn, dstd_bits, rio_bits,
         roi_bits) = dyn_scalars(tcp, cell_r, d_scale, reflect)
        n_mnp = mnp_pos.shape[0]
        if params.near_k > n_mnp:
            raise ValueError(
                f"near_k={params.near_k} exceeds the number of dipoles "
                f"({n_mnp}); selection would duplicate entries and "
                f"double-count their field")
        if n_mnp <= REBUILD_MAX_MNPS:
            # in-kernel rebuild: the kernel performs the whole recandidate
            # at chunk start (no XLA recandidate at all); the sprint is a
            # scan over chunk launches.  (A single multi-chunk launch
            # measures identically — the scan pipeline already hides the
            # launch cost — but compiles 10x slower at big sprints.)
            n_pad = -(-n_mnp // 8) * 8
            pos_p = jnp.concatenate(
                [mnp_pos, jnp.full((n_pad - n_mnp, 3), 1e6, dtype)]) \
                if n_pad != n_mnp else mnp_pos
            m_p = jnp.concatenate(
                [mnp_M, jnp.zeros(n_pad - n_mnp, dtype)]) \
                if n_pad != n_mnp else mnp_M
            mnp_tbl = jnp.concatenate(
                [pos_p.T, (m_p * dtype(dipole.FIELD_SCALE))[None, :]], 0)
            kern = get_kern(n_pad)

            def chunk_body(ps: PlaneState, chunk_idx):
                del chunk_idx
                state_out, o_esc, o_cov, block_wins = kern(
                    make_scalars(ps, lane_offset, key_arr, tcp_u,
                                 cr2_bits, dstd_bits, rio_bits, roi_bits),
                    pack_state(ps), mnp_tbl)
                return advance(ps, state_out, o_esc, o_cov, chunk_steps), \
                    block_wins if decompose else jnp.sum(block_wins, axis=0)

            ps, wins = jax.lax.scan(chunk_body, ps,
                                    jnp.arange(n_chunks, dtype=jnp.uint32))
            return ps, wins.reshape(n_chunks * n_win_chunk, *wins.shape[2:])

        # big-scene path: XLA recandidate (cube-candidate cache) feeding
        # the near/taylor kernel inputs
        if cache is None and expansion.uses_large_path(wp, n_mnp):
            # callers that run many sprints should precompute the cache
            # once (it only depends on the scene) and pass it in; the
            # far table is skipped here because this build runs inside
            # the jitted sprint, i.e. once per sprint CALL on device
            cache = expansion.build_cache(mnp_pos, mnp_M, params,
                                          far_table=False)
        kern = get_kern(None)

        # cache WITH far table -> the whole recandidate (selection + mid
        # sums + far-table shift) runs in the fused candidate-model
        # kernel (expansion.build_planes), plane-native end to end;
        # otherwise the XLA build() path with the far-sums kernel
        use_fused_recand = (isinstance(cache, expansion.SceneCache)
                            and cache.far_coeffs is not None)
        # XLA-side coverage sentinel inputs: reach from the runtime
        # cell_r + static travel bound; padded walker lanes (which sit at
        # the box center) are masked out of the violation count
        travel_f = float(expansion.default_travel_bound(params))
        reach_dyn = (cr_dyn.astype(dtype) + dtype(travel_f))
        reach2_dyn = reach_dyn * reach_dyn
        valid_vec = (jnp.arange(wp, dtype=jnp.int32)
                     < num_water)                          # [wp]
        valid_pl = valid_vec.reshape(r, LANES)

        def chunk_body(ps: PlaneState, chunk_idx):
            del chunk_idx  # ps.step already advances chunk by chunk
            # periodic wrap at chunk boundary (see reference_engine notes)
            px = jnp.mod(ps.px + bound, bound)
            py = jnp.mod(ps.py + bound, bound)
            pz = jnp.mod(ps.pz + bound, bound)
            cov_extra = None
            if use_fused_recand:
                near, taylor, cov_cnt = expansion.build_planes(
                    px, py, pz, params, cache, interpret=interpret,
                    reach2=reach2_dyn)
                cov_extra = jnp.sum(
                    (cov_cnt > params.near_k) & valid_pl,
                    dtype=jnp.int32)
            else:
                pos = jnp.stack([px.reshape(-1), py.reshape(-1),
                                 pz.reshape(-1)], axis=-1)
                nf = expansion.build(pos, mnp_pos, mnp_M, params,
                                     cache=cache, far_impl="pallas",
                                     interpret=interpret,
                                     reach2=reach2_dyn)
                cov_extra = jnp.sum(
                    (nf.n_reach > params.near_k) & valid_vec,
                    dtype=jnp.int32)

                def slab(a):  # [W, K] -> [K, R, 128]
                    return a.T.reshape(params.near_k, r, LANES)

                def pl_(a):   # [W] -> [R, 128]
                    return a.reshape(r, LANES)

                near = jnp.stack(
                    [slab(nf.near_pos[..., 0]),
                     slab(nf.near_pos[..., 1]),
                     slab(nf.near_pos[..., 2]),
                     # fold the unit conversion into the moment
                     # (one fewer multiply per k per step)
                     slab(nf.near_M * dtype(dipole.FIELD_SCALE))])
                taylor = jnp.stack(
                    [pl_(nf.b0),
                     pl_(nf.grad[..., 0]), pl_(nf.grad[..., 1]),
                     pl_(nf.grad[..., 2]),
                     pl_(nf.hess[..., 0]), pl_(nf.hess[..., 1]),
                     pl_(nf.hess[..., 2]), pl_(nf.hess[..., 3]),
                     pl_(nf.hess[..., 4]), pl_(nf.hess[..., 5])])

            state_in = pack_state(PlaneState(
                px=px, py=py, pz=pz, in_cell=ps.in_cell, phase=ps.phase,
                phase_comp=ps.phase_comp, step=ps.step, escapes=ps.escapes,
                coverage=ps.coverage))
            state_out, o_esc, o_cov, block_wins = kern(
                make_scalars(ps, lane_offset, key_arr, tcp_u,
                             cr2_bits, dstd_bits, rio_bits, roi_bits),
                state_in, near, taylor)
            return advance(ps, state_out, o_esc, o_cov, chunk_steps,
                           cov_extra=cov_extra), \
                block_wins if decompose else jnp.sum(block_wins, axis=0)

        ps, wins = jax.lax.scan(chunk_body, ps,
                                jnp.arange(n_chunks, dtype=jnp.uint32))
        return ps, wins.reshape(n_chunks * n_win_chunk, *wins.shape[2:])

    inner = jax.jit(sprint)
    use_reflection = params.reflect_io > 0 or params.reflect_oi > 0

    def guarded(mnp_pos, mnp_M, key_arr, ps, lane_offset,
                cache=None, tcp=None, cell_r=None, d_scale=None,
                reflect=None):
        from .reference_engine import _check_dyn_overrides
        if reflect is not None and not use_reflection:
            # the kernel neither draws the coin word nor reads the
            # reflect scalars when the static params have reflection off
            raise ValueError(
                "reflect overrides need reflection enabled in the static "
                "params (e.g. params.with_permeability()); the engine "
                "was built with reflect_io = reflect_oi = 0")
        _check_dyn_overrides(tcp, cell_r, d_scale, reflect)
        return inner(mnp_pos, mnp_M, key_arr, ps, lane_offset,
                     cache=cache, tcp=tcp, cell_r=cell_r,
                     d_scale=d_scale, reflect=reflect)

    guarded.inner = inner   # AOT warm-start hooks .lower() (engine/aot.py)
    return guarded


def run_simulation(scene, params: Params, seed: int = 0, dtype=jnp.float32,
                   rng_impl: str = RNG_THREEFRY, interpret: bool = False,
                   max_steps: int | None = None):
    """Single-device full run with the Pallas engine (mirror of
    reference_engine.run_simulation)."""
    from .reference_engine import init_state

    num_water = scene.waters.shape[0]
    sprint_fn = make_sprint_fn(params, num_water, dtype, rng_impl, interpret)
    mnp_pos = jnp.asarray(scene.mnps[:, :3], dtype)
    mnp_M = jnp.asarray(scene.mnps[:, 4], dtype)
    kk = rng.key_from_seed(seed)
    key_arr = jnp.asarray([np.uint32(kk[0]), np.uint32(kk[1])])
    ps = to_planes(init_state(scene.waters, params, dtype), params)

    total = params.t if max_steps is None else min(params.t, max_steps)
    outs = []
    for _ in range(total // params.sprint_steps):
        ps, wins = sprint_fn(mnp_pos, mnp_M, key_arr, ps, 0)
        outs.append(wins)
    wins = jnp.concatenate(outs, axis=0) if outs else jnp.zeros((0, 2), dtype)
    n = wins.shape[0]
    times = (np.arange(1, n + 1) * params.pfreq) * params.tau
    return times, np.asarray(wins[:, 0]), np.asarray(wins[:, 1]), \
        from_planes(ps, num_water)
