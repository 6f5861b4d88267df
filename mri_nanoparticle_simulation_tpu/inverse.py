"""Inverse relaxometry: recover physical parameters from an observed
magnetization decay by differentiating THROUGH the simulator.

The scientific use of a T2 nanoparticle simulator is usually the inverse
question: given a measured decay curve, what magnetic moment (i.e. what
nanoparticle load) produced it?  The reference answers it by brute-force
forward sweeps — recompile, re-run, eyeball (README.md:13: parameters
are compile-time constants).  Here the whole simulation is a pure JAX
function, so the curve is differentiable in the physical parameters and
the inverse problem is ordinary gradient descent:

    target = simulate(scale*)            # or a measured curve
    scale  = argmin_s  mean( (simulate(s) - target)^2 )

via reverse-mode AD through every diffusion step, field evaluation,
phase kick and Carr-Purcell flip.  The counter-based RNG is integer-only
and acts as a constant of the differentiation, giving the pathwise
(reparameterized) derivative on frozen trajectories — the loss in
``scale`` is smooth and, with the same simulation seed as the target,
exactly minimized at the true value.

TPU-shaped: the ENTIRE optimization (every Adam iteration, each
containing a full forward simulation and its backward pass) is one
`lax.scan` inside one jit — a single device computation, no host round
trips.  Each sprint of the forward pass is wrapped in `jax.checkpoint`,
so backward-pass memory is O(one sprint of state), not O(total steps):
moment recovery through a 4e7-step production run rematerializes sprints
instead of storing them.

The scan (anchor) engine is used because its XLA graph is what JAX
reverse-differentiates today; the Pallas production kernel would need a
hand-written VJP kernel.

**Production scale does not need one**: trajectories are independent of
the moment, so phase = s*A + B exactly (engine/decompose.py), and
:func:`fit_moment_scale_decomposed` fits s against a *decomposition
record* from ONE forward run of the production Pallas kernel — each
optimization step evaluates the closed form mean(cos(s*A + B)), no
backward pass through the simulator at all.  AD-through-the-simulator
(above) remains the general tool for parameters that DO bend
trajectories (cell_r, diffusion coefficients); the decomposition path is
the exact, fast answer for the moment axis specifically.
"""

from __future__ import annotations

import argparse
import sys
from typing import Callable, NamedTuple, Optional

import numpy as np

from .params import Params


class MomentFitResult(NamedTuple):
    scale: float            #: fitted moment scale (relative to params.mmoment)
    mmoment: float          #: fitted absolute moment, A*m^2... same unit as Params.mmoment
    loss: float             #: final mean-squared curve error
    scale_history: np.ndarray   #: [iters] scale per Adam iteration
    loss_history: np.ndarray    #: [iters] loss per Adam iteration


def make_curve_fn(params: Params, scene, seed: int = 0,
                  dtype=None) -> Callable:
    """Build ``curve(moment_scale) -> m[t]``: the normalized magnetization
    curve (sum cos phi / num_water, one point per output window) as a
    differentiable function of the moment scale, on a fixed scene and a
    fixed RNG seed (frozen trajectories).

    The full run is a `lax.scan` over sprints with each sprint
    `jax.checkpoint`-ed: forward cost unchanged, backward memory bounded
    by one sprint."""
    import jax
    import jax.numpy as jnp

    from . import rng
    from .engine import reference_engine as re

    dtype = dtype or jnp.float32
    p = params.validate()  # rejects t % sprint_steps != 0, among others
    sprint = re.make_sprint_fn(p, dtype)
    k = rng.key_from_seed(seed)
    key_arr = jnp.asarray([np.uint32(k[0]), np.uint32(k[1])])
    mnp_pos = jnp.asarray(np.asarray(scene.mnps[:, :3], np.float32), dtype)
    base_M = jnp.asarray(np.asarray(scene.mnps[:, 4], np.float32), dtype)
    st0 = re.init_state(scene.waters, p, dtype)
    n_sprints = p.t // p.sprint_steps

    def curve(moment_scale):
        @jax.checkpoint
        def body(st, _):
            st, wins = sprint(mnp_pos, base_M * moment_scale, key_arr,
                              st, 0)
            return st, wins[:, 0]

        _, cos = jax.lax.scan(body, st0, None, length=n_sprints)
        return cos.reshape(-1) / p.num_water

    return curve


def fit_moment_scale(target, params: Params, scene, *, seed: int = 0,
                     init_scale: float = 1.0, iters: int = 80,
                     lr: float = 0.05,
                     dtype=None) -> MomentFitResult:
    """Recover the moment scale that produced ``target`` (a normalized
    magnetization curve, one value per output window — e.g. a T2 CSV's
    sum_cos column / num_water, or a measured decay resampled onto the
    window grid).

    Adam on log(scale) (positivity by construction); the whole
    optimization runs as ONE jitted `lax.scan` over iterations.  With
    ``seed`` equal to the target's simulation seed the loss minimum is
    exactly the true scale; against independently-generated (or
    measured) data the minimum sits within the Monte-Carlo noise floor
    of the walker count."""
    import jax
    import jax.numpy as jnp
    import optax

    curve = make_curve_fn(params, scene, seed=seed, dtype=dtype)
    target = jnp.asarray(np.asarray(target, np.float32))
    n = params.t // params.pfreq
    if target.shape != (n,):
        raise ValueError(f"target must have one value per output window "
                         f"([{n}]), got {target.shape}")

    opt = optax.adam(lr)

    def loss_fn(theta):
        return jnp.mean((curve(jnp.exp(theta)) - target) ** 2)

    @jax.jit
    def run(theta0):
        def step(carry, _):
            theta, opt_state = carry
            loss, g = jax.value_and_grad(loss_fn)(theta)
            updates, opt_state = opt.update(g, opt_state)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state), (jnp.exp(theta), loss)

        carry0 = (theta0, opt.init(theta0))
        (theta, _), (scales, losses) = jax.lax.scan(
            step, carry0, None, length=iters)
        return jnp.exp(theta), scales, losses

    scale, scales, losses = run(jnp.float32(np.log(init_scale)))
    scale = float(np.asarray(scale))
    losses = np.asarray(losses)
    return MomentFitResult(
        scale=scale,
        mmoment=scale * params.mmoment,
        loss=float(losses[-1]),
        scale_history=np.asarray(scales),
        loss_history=losses,
    )


def make_diffusion_curve_fn(params: Params, scene, seed: int = 0,
                            dtype=None) -> Callable:
    """Build ``curve(d_scale) -> m[t]``: the magnetization curve as a
    differentiable function of a global diffusion-coefficient scale
    (D_cell and D_extra both scaled by ``d_scale``), on a fixed scene
    and RNG seed.

    Unlike the moment, diffusion BENDS trajectories — phase is not
    linear in D and no decomposition shortcut exists — so this is the
    genuine differentiate-through-the-simulator path: the engine's
    ``d_scale`` launch scalar multiplies the step stdevs by
    sqrt(d_scale), the same Threefry draws act as frozen noise, and
    reverse-mode AD yields the pathwise derivative of the curve in D.

    Honesty note: the chunk-travel bound and the K-coverage certificate
    are sized for the STATIC params' stdevs.  ``d_scale`` > 1 walks
    farther per chunk and can raise the ``escapes`` / coverage-sentinel
    counters; for a D fit, set ``params.D_cell/D_extra`` to the UPPER
    end of the search bracket and fit d_scale in (0, 1] (sqrt keeps the
    loss smooth there).
    """
    import jax
    import jax.numpy as jnp

    from . import rng
    from .engine import reference_engine as re

    dtype = dtype or jnp.float32
    p = params.validate()
    sprint = re.make_sprint_fn(p, dtype)
    k = rng.key_from_seed(seed)
    key_arr = jnp.asarray([np.uint32(k[0]), np.uint32(k[1])])
    mnp_pos = jnp.asarray(np.asarray(scene.mnps[:, :3], np.float32), dtype)
    mnp_M = jnp.asarray(np.asarray(scene.mnps[:, 4], np.float32), dtype)
    st0 = re.init_state(scene.waters, p, dtype)
    n_sprints = p.t // p.sprint_steps

    def curve(d_scale):
        @jax.checkpoint
        def body(st, _):
            st, wins = sprint(mnp_pos, mnp_M, key_arr, st, 0,
                              d_scale=d_scale)
            return st, wins[:, 0]

        _, cos = jax.lax.scan(body, st0, None, length=n_sprints)
        return cos.reshape(-1) / p.num_water

    return curve


def fit_diffusion_scale(target, params: Params, scene, *, seed: int = 0,
                        init_scale: float = 1.0, iters: int = 80,
                        lr: float = 0.05,
                        dtype=None) -> MomentFitResult:
    """Recover the diffusion-coefficient scale that produced ``target``
    (ADC recovery): Adam on log(d_scale) through the full simulator —
    every displacement, membrane event, field evaluation and flip sits
    on the tape.  The reference cannot ask this question at all: D is a
    compile-time constant baked into derived stdevs (parameters.h:120).

    Returns a :class:`MomentFitResult` whose ``scale`` is the fitted
    d_scale (the ``mmoment`` field is nan — not a moment fit).
    """
    import jax
    import jax.numpy as jnp
    import optax

    curve = make_diffusion_curve_fn(params, scene, seed=seed, dtype=dtype)
    target = jnp.asarray(np.asarray(target, np.float32))
    n = params.t // params.pfreq
    if target.shape != (n,):
        raise ValueError(f"target must have one value per output window "
                         f"([{n}]), got {target.shape}")

    opt = optax.adam(lr)

    def loss_fn(theta):
        return jnp.mean((curve(jnp.exp(theta)) - target) ** 2)

    @jax.jit
    def run(theta0):
        def step(carry, _):
            theta, opt_state = carry
            loss, g = jax.value_and_grad(loss_fn)(theta)
            updates, opt_state = opt.update(g, opt_state)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state), (jnp.exp(theta), loss)

        (theta, _), (scales, losses) = jax.lax.scan(
            step, (theta0, opt.init(theta0)), None, length=iters)
        return jnp.exp(theta), scales, losses

    scale, scales, losses = run(jnp.float32(np.log(init_scale)))
    scale = float(np.asarray(scale))
    losses = np.asarray(losses)
    return MomentFitResult(
        scale=scale,
        mmoment=float("nan"),
        loss=float(losses[-1]),
        scale_history=np.asarray(scales),
        loss_history=losses,
    )


def make_engine_curve_fn(params: Params, scene, seed: int = 0,
                         engine: str = "pallas",
                         rng_impl: str = "threefry",
                         interpret: bool = False, dtype=None) -> Callable:
    """Build ``curve(d_scale) -> m[t]`` on the PRODUCTION engine (or the
    scan engine): a plain forward evaluation at a concrete diffusion
    scale — not differentiable through Pallas, but every call shares one
    compiled program via the kernel's d_scale launch scalar, and the
    Threefry / hardware-PRNG streams depend only on (seed, step), so all
    evaluations see identical random draws (common random numbers)."""
    import jax.numpy as jnp

    from . import rng
    from .engine import pallas_engine as pe
    from .engine import reference_engine as re

    dtype = dtype or jnp.float32
    p = params.validate()
    k = rng.key_from_seed(seed)
    key_arr = jnp.asarray([np.uint32(k[0]), np.uint32(k[1])])
    mnp_pos = jnp.asarray(np.asarray(scene.mnps[:, :3], np.float32), dtype)
    mnp_M = jnp.asarray(np.asarray(scene.mnps[:, 4], np.float32), dtype)
    n_sprints = p.t // p.sprint_steps
    if engine == "pallas":
        sprint = pe.make_sprint_fn(p, scene.waters.shape[0], dtype,
                                   rng_impl, interpret)
        st0 = pe.to_planes(re.init_state(scene.waters, p, dtype), p)
    elif engine == "scan":
        sprint = re.make_sprint_fn(p, dtype)
        st0 = re.init_state(scene.waters, p, dtype)
    else:
        raise ValueError(f"unknown engine {engine!r}")

    def curve(d_scale: float) -> np.ndarray:
        st = st0
        outs = []
        for _ in range(n_sprints):
            st, wins = sprint(mnp_pos, mnp_M, key_arr, st, 0,
                              d_scale=float(d_scale))
            outs.append(np.asarray(wins)[:, 0])
        return np.concatenate(outs) / p.num_water

    return curve


def fit_diffusion_scale_crn(target, params: Params, scene, *,
                            seed: int = 0,
                            bracket: tuple = (0.05, 1.0),
                            iters: int = 20, engine: str = "pallas",
                            rng_impl: str = "threefry",
                            interpret: bool = False,
                            dtype=None) -> MomentFitResult:
    """ADC recovery at PRODUCTION scale: golden-section search for the
    diffusion scale minimizing the curve MSE, each evaluation a full
    forward run of the production Pallas kernel at a runtime ``d_scale``
    (one compiled program for the whole fit — the launch scalar).

    Derivative-free by design: reverse-mode AD does not reach through a
    Pallas kernel, but common random numbers (counter RNG keyed only by
    (seed, step)) make the loss a deterministic, noise-free function of
    d_scale, so a ~20-evaluation bracket search resolves the minimum to
    ~1e-3 relative — each evaluation at the kernel's full 1.9e10
    walker-steps/s.  The search runs on log(d) (scale parameters live on
    a ratio scale).

    The same coverage honesty note as :func:`fit_diffusion_scale`
    applies: size ``params.D_cell/D_extra`` to the TOP of the search
    bracket and keep ``bracket[1] <= 1`` so the K-coverage certificate
    holds at every probed scale.

    Returns a :class:`MomentFitResult`: ``scale`` is the fitted d_scale,
    ``scale_history``/``loss_history`` record every probed point in
    evaluation order (``mmoment`` is nan — not a moment fit)."""
    lo, hi = float(bracket[0]), float(bracket[1])
    if not (0 < lo < hi):
        raise ValueError(f"bracket must satisfy 0 < lo < hi; got {bracket}")
    curve = make_engine_curve_fn(params, scene, seed=seed, engine=engine,
                                 rng_impl=rng_impl, interpret=interpret,
                                 dtype=dtype)
    target = np.asarray(target, np.float64)
    n = params.t // params.pfreq
    if target.shape != (n,):
        raise ValueError(f"target must have one value per output window "
                         f"([{n}]), got {target.shape}")

    hist_d, hist_l = [], []

    def loss(logd):
        d = float(np.exp(logd))
        val = float(np.mean((np.asarray(curve(d), np.float64)
                             - target) ** 2))
        hist_d.append(d)
        hist_l.append(val)
        return val

    # golden-section on log d: unimodal within a sane bracket (the MSE
    # of a monotone-in-D decay family against one of its members)
    invphi = (np.sqrt(5.0) - 1.0) / 2.0
    a, b = np.log(lo), np.log(hi)
    c, d_ = b - invphi * (b - a), a + invphi * (b - a)
    fc, fd = loss(c), loss(d_)
    for _ in range(max(0, iters - 2)):
        if fc < fd:
            b, d_, fd = d_, c, fc
            c = b - invphi * (b - a)
            fc = loss(c)
        else:
            a, c, fc = c, d_, fd
            d_ = a + invphi * (b - a)
            fd = loss(d_)
    best = int(np.argmin(hist_l))
    return MomentFitResult(
        scale=float(hist_d[best]),
        mmoment=float("nan"),
        loss=float(hist_l[best]),
        scale_history=np.asarray(hist_d),
        loss_history=np.asarray(hist_l),
    )


def fit_moment_scale_decomposed(target, A, B, *, mmoment: float = None,
                                init_scale: float = 1.0, iters: int = 200,
                                lr: float = 0.1) -> MomentFitResult:
    """Recover the moment scale from a phase-decomposition record
    (engine/decompose.run_decomposition): minimizes
    ``mean((mean_i cos(s*A + B) - target)^2)`` over s by Adam on log(s).

    Exact at any scale (phase = s*A + B is physics, not a model), and
    each iteration is one elementwise pass over (A, B) — no simulation,
    no backward pass through the simulator — so it runs at production
    scale against a record produced by the Pallas kernel.

    ``mmoment``: the base moment the record was produced with; fills the
    result's absolute-moment field (nan if omitted).
    """
    import jax
    import jax.numpy as jnp
    import optax

    A = jnp.asarray(np.asarray(A, np.float32))
    B = jnp.asarray(np.asarray(B, np.float32))
    target = jnp.asarray(np.asarray(target, np.float32))
    if target.shape != (A.shape[0],):
        raise ValueError(f"target must have one value per window "
                         f"([{A.shape[0]}]), got {target.shape}")
    if not init_scale > 0:
        raise ValueError("init_scale must be > 0")

    opt = optax.adam(lr)

    def loss_fn(theta):
        rec = jnp.mean(jnp.cos(jnp.exp(theta) * A + B), axis=-1)
        return jnp.mean((rec - target) ** 2)

    @jax.jit
    def run(theta0):
        def step(carry, _):
            theta, opt_state = carry
            loss, g = jax.value_and_grad(loss_fn)(theta)
            updates, opt_state = opt.update(g, opt_state)
            theta = optax.apply_updates(theta, updates)
            return (theta, opt_state), (jnp.exp(theta), loss)

        (theta, _), (scales, losses) = jax.lax.scan(
            step, (theta0, opt.init(theta0)), None, length=iters)
        return jnp.exp(theta), scales, losses

    scale, scales, losses = run(jnp.float32(np.log(init_scale)))
    scale = float(np.asarray(scale))
    losses = np.asarray(losses)
    return MomentFitResult(
        scale=scale,
        mmoment=scale * mmoment if mmoment is not None else float("nan"),
        loss=float(losses[-1]),
        scale_history=np.asarray(scales),
        loss_history=losses,
    )


def fit_from_record(record_path: str, target_csv: str, *,
                    init_scale: float = 1.0, iters: int = 200,
                    lr: float = 0.1) -> MomentFitResult:
    """Closed-form moment recovery from SAVED artifacts: a
    decomposition record (``mri-t2-sim --dump-record``) and an observed
    decay curve (reference CSV schema).  The measured workflow: simulate
    the basis once at production speed, then fit any number of measured
    curves offline — no simulator in the loop.

    The target's sum_cos column is normalized by the record's walker
    count; its rows must cover at least the record's windows (extra
    tail rows are ignored; times are trusted to align — both sides are
    window-gridded by construction).  ``record_path`` may be a
    ``--dump-record`` .npz or a ``--record-dir`` store directory."""
    from .engine.decompose import open_record
    from .io.writer import read_t2_csv

    A, B, meta = open_record(record_path)
    times = meta["times_ms"]
    mmoment = meta["mmoment"]
    cols = read_t2_csv(target_csv)
    n, w = A.shape
    if len(cols[0]) < n:
        raise ValueError(
            f"target has {len(cols[0])} rows but the record holds {n} "
            f"windows; the measured curve must cover the record")
    if times is not None and not np.allclose(cols[0][:n], times,
                                             rtol=1e-9, atol=1e-9):
        raise ValueError(
            f"target time axis does not match the record's windows "
            f"(target starts {cols[0][:3]}, record {times[:3]} ms); "
            f"resample the measurement onto the record's output grid")
    target = np.asarray(cols[1][:n], np.float64) / w
    if np.max(np.abs(target)) > 1.0 + 1e-3:
        raise ValueError(
            f"normalized target reaches {np.max(np.abs(target)):.3g} "
            f"(> 1): the CSV's sums were not produced by the record's "
            f"{w} walkers — check the measurement's walker count")
    return fit_moment_scale_decomposed(
        target, A, B, mmoment=mmoment, init_scale=init_scale,
        iters=iters, lr=lr)


def main(argv=None) -> int:
    """CLI demo: ``mri-t2-invert`` — simulate a target curve at a hidden
    moment scale, then recover it by gradient descent from 1.0."""
    from .params import small_test_params
    from .scene import BacteriaBox

    ap = argparse.ArgumentParser(
        description="Recover the nanoparticle moment from a decay curve "
                    "by differentiating through the simulator")
    ap.add_argument("--true-scale", type=float, default=1.4,
                    help="hidden moment scale that generates the target")
    ap.add_argument("--init-scale", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--num-water", type=int, default=256)
    ap.add_argument("--scene-seed", type=int, default=1)
    ap.add_argument("--seed", type=int, default=2,
                    help="simulation RNG seed (shared by target and fit)")
    ap.add_argument("--method", choices=["ad", "decompose", "crn"],
                    default="ad",
                    help="'ad': reverse-mode AD through the simulator "
                         "(general); 'decompose': one forward "
                         "phase-decomposition run + closed-form fit "
                         "(exact for the moment axis, production-fast); "
                         "'crn': derivative-free golden-section with "
                         "common random numbers on the production "
                         "Pallas kernel (the production path for the "
                         "D axis)")
    ap.add_argument("--axis", choices=["moment", "D"], default="moment",
                    help="which physical parameter to recover: the "
                         "nanoparticle moment (default) or the global "
                         "diffusion-coefficient scale (ADC)")
    ap.add_argument("--record", default=None, metavar="PATH",
                    help="fit against a SAVED decomposition record "
                         "(mri-t2-sim --dump-record .npz or "
                         "--record-dir store directory): closed-form "
                         "moment recovery from real data — pass the "
                         "measured curve via --target")
    ap.add_argument("--target", default=None, metavar="CSV",
                    help="with --record: the observed decay curve "
                         "(reference CSV schema time_ms,sum_cos; "
                         "normalized by the record's walker count)")
    args = ap.parse_args(argv)
    if (args.record is None) != (args.target is None):
        ap.error("--record and --target go together (record = the "
                 "simulation basis, target = the measured curve)")
    if args.record:
        if args.axis != "moment" or args.method == "crn":
            ap.error("--record is the moment axis's closed-form basis "
                     "(phase = s*A + B); D fits need fresh simulation")
        if not args.init_scale > 0:
            ap.error("scales must be > 0")
        fit = fit_from_record(args.record, args.target,
                              init_scale=args.init_scale,
                              iters=args.iters, lr=args.lr)
        print(f"recovered moment scale = {fit.scale:.5f} "
              f"(absolute moment {fit.mmoment:.4e}), "
              f"loss {fit.loss:.3e}")
        return 0
    if not args.true_scale > 0 or not args.init_scale > 0:
        ap.error("scales must be > 0")
    if args.axis == "D":
        if args.method == "decompose":
            ap.error("no decomposition shortcut exists for the D axis "
                     "(diffusion BENDS trajectories); use 'ad' or 'crn'")
        if not args.true_scale <= 1.0:
            ap.error("--axis D fits within the certified bracket "
                     "(0, 1]: size the params' D to the bracket top "
                     "(see inverse.make_diffusion_curve_fn)")
    elif args.method == "crn":
        ap.error("'crn' searches the d_scale launch scalar; use it "
                 "with --axis D (the moment axis has the exact "
                 "'decompose' shortcut instead)")

    # ~20x the tiny-test moment: deep intra-window dephasing gives the
    # fit a strong signal (at 3.5e-15 the curve barely decays)
    p = small_test_params(num_water=args.num_water,
                          mmoment=2e-14 if args.axis == "moment" else 5e-14)
    sc = BacteriaBox(p, seed=args.scene_seed).populate()
    if args.method == "crn":
        # production engine on a chip; the scan engine elsewhere (a
        # Pallas kernel only lowers on TPU, and the demo must run
        # anywhere).  The TARGET comes from the SAME engine as the fit:
        # the engines fold sqrt(d_scale) in different multiply orders,
        # so a cross-engine target at a non-power-of-two scale would
        # put a trajectory-divergence noise floor under the CRN loss —
        # exactly the premise ('deterministic, zero at truth') the fit
        # rests on.
        import jax
        eng = ("pallas" if any(d.platform == "tpu"
                               for d in jax.devices()) else "scan")
        curve = make_engine_curve_fn(p, sc, seed=args.seed, engine=eng)
    elif args.axis == "D":
        curve = make_diffusion_curve_fn(p, sc, seed=args.seed)
    else:
        curve = make_curve_fn(p, sc, seed=args.seed)
    target = np.asarray(curve(args.true_scale))
    print(f"target: {len(target)} windows, final m = {target[-1]:.4f} "
          f"(hidden {args.axis} scale {args.true_scale})")
    if args.method == "decompose":
        from .engine.decompose import run_decomposition
        rec = run_decomposition(sc, p, seed=args.seed, engine="scan")
        fit = fit_moment_scale_decomposed(
            target, rec.A, rec.B, mmoment=p.mmoment,
            init_scale=args.init_scale, iters=args.iters, lr=args.lr)
    elif args.method == "crn":
        # bracket straddles the hidden truth: lo never above half of it
        # (a truth below a fixed lo would silently converge to the
        # bracket edge), hi at the certified 1.0
        lo = min(max(0.05, args.true_scale / 5), args.true_scale / 2)
        fit = fit_diffusion_scale_crn(
            target, p, sc, seed=args.seed, bracket=(lo, 1.0),
            iters=args.iters, engine=eng)
    elif args.axis == "D":
        fit = fit_diffusion_scale(target, p, sc, seed=args.seed,
                                  init_scale=args.init_scale,
                                  iters=args.iters, lr=args.lr)
    else:
        fit = fit_moment_scale(target, p, sc, seed=args.seed,
                               init_scale=args.init_scale, iters=args.iters,
                               lr=args.lr)
    err = abs(fit.scale - args.true_scale) / args.true_scale
    print(f"recovered scale = {fit.scale:.5f} "
          f"(true {args.true_scale}, rel err {err:.2e}), "
          f"loss {fit.loss:.3e} after {args.iters} {args.method} iterations")
    return 0 if err < 0.05 else 1


if __name__ == "__main__":
    sys.exit(main())
