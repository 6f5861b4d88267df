"""Counter-based random number generation (Threefry-2x32).

TPU-native replacement for the reference's RNG layer:

* device RNG: cuRAND XORWOW batches filling 3.9 GB of per-sprint buffers
  (``src/gpu_random.{h,cu}``, ``src/cuda_sim.cu:54-55,929-947,976-977``);
* host RNG: xoroshiro128+ (``src/xorshift.h``).

Both are *stateful* generators, which forces the reference to materialize
every random number in memory before use and makes runs irreproducible
(seeded with ``time(NULL)``, gpu_random.cu:22, cuda_sim.cu:912).  A
counter-based generator is a pure function ``(key, counter) -> bits``: each
(walker, step, word) coordinate deterministically names its random number,
so the hot loop generates values in registers, checkpoint/resume is trivial
(the counter is the step index), and the same stream can be replayed by any
engine (the pure-JAX scan engine, the Pallas kernel, or a NumPy oracle) for
bitwise cross-validation.

Everything here is plain ``jax.numpy`` on ``uint32``, so it runs unchanged
inside Pallas TPU kernels, under ``jit``/``vmap``, and on CPU.

The 20-round Threefry-2x32 implemented here matches the Random123
specification (Salmon et al., "Parallel random numbers: as easy as 1, 2, 3",
SC'11) and is validated against its published known-answer vectors in
``tests/test_rng.py``.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

# Threefry-2x32 rotation schedule (Random123).
_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = 0x1BD11BDA  # key-schedule parity constant (Skein/Threefish)

Key = Tuple[jnp.ndarray, jnp.ndarray]  # pair of uint32 scalars


def key_from_seed(seed: int) -> Key:
    """Derive a Threefry key from a 64-bit integer seed."""
    seed = int(seed) & 0xFFFFFFFFFFFFFFFF
    return (jnp.uint32(seed >> 32), jnp.uint32(seed & 0xFFFFFFFF))


def _rotl32(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(key: Key, c0: jnp.ndarray, c1: jnp.ndarray,
                 rounds: int = 20) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Threefry-2x32 block cipher: encrypt counter (c0, c1) under ``key``.

    ``c0``/``c1`` may be arrays (broadcast together); returns two uint32
    arrays of the broadcast shape.  ``rounds=20`` is the standard (and
    jax.random-compatible) strength; 12 (the nearest multiple of 4 to the
    Random123-recommended minimum of 13 — injections happen every 4
    rounds here) is ample for Monte Carlo statistics and faster.
    """
    if rounds % 4 != 0:
        raise ValueError("rounds must be a multiple of 4")
    ks0 = jnp.uint32(key[0])
    ks1 = jnp.uint32(key[1])
    ks2 = ks0 ^ ks1 ^ jnp.uint32(_PARITY)
    ks = (ks0, ks1, ks2)

    x0 = jnp.asarray(c0, jnp.uint32) + ks0
    x1 = jnp.asarray(c1, jnp.uint32) + ks1

    for i in range(rounds):
        x0 = x0 + x1
        x1 = _rotl32(x1, _ROTATIONS[i % 8])
        x1 = x1 ^ x0
        if i % 4 == 3:
            j = i // 4 + 1
            x0 = x0 + ks[j % 3]
            x1 = x1 + ks[(j + 1) % 3] + jnp.uint32(j)
    return x0, x1


def words_for_step(key: Key, step: jnp.ndarray, lane: jnp.ndarray,
                   n_words: int, rounds: int = 20) -> list:
    """Random uint32 words for one timestep.

    Every (step, lane, word) coordinate maps to a unique Threefry counter:
    ``c0 = step``, ``c1 = lane + n_lanes_stride * pair`` where the stride is
    2**27 (supports up to 134M walkers and 32 word-pairs per step — the
    engine uses 3 pairs).  ``lane`` may be any int32 array (e.g. a [32, 128]
    walker-index grid inside the Pallas kernel); ``step`` is a scalar.

    Returns a list of ``n_words`` uint32 arrays shaped like ``lane``.

    This replaces the reference scheme of pre-filling
    ``5 uniform + 1 normal doubles x num_water x sprintSteps`` buffers
    (cuda_sim.cu:929-947): here the words are (re)computed in registers.
    """
    n_pairs = (n_words + 1) // 2
    step = jnp.asarray(step, jnp.uint32)
    lane = jnp.asarray(lane, jnp.uint32)
    out = []
    for pair in range(n_pairs):
        c1 = lane + jnp.uint32(pair << 27)
        w0, w1 = threefry2x32(key, step, c1, rounds=rounds)
        out.append(w0)
        out.append(w1)
    return out[:n_words]


def uniform_from_bits(bits: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Map uint32 bits to a uniform float in [0, 1).

    Uses the top 24 bits so the resulting value is exactly representable in
    float32 — the float64 CPU oracle and the float32 TPU engine therefore
    consume *identical* real numbers, enabling trajectory-level
    cross-validation.  (The reference drew float64 uniforms from cuRAND;
    24-bit resolution is far below every physical scale here: positions move
    ~2.3e-3 µm/step, so quantizing the direction at 2^-24 is ~1e-10 µm.)
    """
    shifted = bits >> jnp.uint32(8)
    # view the (now < 2^24, hence sign-safe) word as int32 before the float
    # conversion: Mosaic has no uint32->float cast, int32->float is native
    as_int = jax.lax.bitcast_convert_type(shifted, jnp.int32)
    return as_int.astype(dtype) * (2.0 ** -24)


def normal_from_bits(bits_a: jnp.ndarray, bits_b: jnp.ndarray,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Standard normal via Box-Muller from two uint32 words.

    ``n = sqrt(-2 ln(1 - u_a)) * cos(2 pi u_b)``.  With 24-bit uniforms the
    magnitude is inherently capped at sqrt(-2 ln 2^-24) ~= 5.77 sigma
    (probability mass < 1e-8) — the same regime cuRAND's normal generator
    covers, and a useful hard bound for the chunked field expansion's travel
    radius (see fields/local_expansion.py).
    """
    u_a = uniform_from_bits(bits_a, dtype)
    u_b = uniform_from_bits(bits_b, dtype)
    # jnp.log(1 - u), NOT log1p(-u): 1-u is exact for 24-bit uniforms, and
    # the Pallas kernel uses the same expression, keeping the threefry-mode
    # engines bit-identical (log1p can round one ulp differently)
    r = jnp.sqrt(dtype(-2.0) * jnp.log(dtype(1.0) - u_a))
    theta = dtype(2.0 * math.pi) * u_b
    return r * jnp.cos(theta)


# ----------------------------------------------------------------------------
# Bulk helpers (scene construction, tests)
# ----------------------------------------------------------------------------

def uniforms(key: Key, counter0: int, shape, dtype=jnp.float32,
             rounds: int = 20) -> jnp.ndarray:
    """A [shape] tensor of uniforms with counters starting at ``counter0``.

    Lays counters out as c0 = counter0 + i for pair i; convenient for bulk
    draws outside the hot loop.
    """
    n = int(math.prod(shape)) if shape else 1
    n_pairs = (n + 1) // 2
    idx = jnp.arange(n_pairs, dtype=jnp.uint32)
    w0, w1 = threefry2x32(key, jnp.uint32(counter0) + idx,
                          jnp.zeros_like(idx), rounds=rounds)
    bits = jnp.stack([w0, w1], axis=-1).reshape(-1)[:n]
    return uniform_from_bits(bits, dtype).reshape(shape)


# ----------------------------------------------------------------------------
# Polynomial transcendentals for the production (hardware-RNG) kernel
# ----------------------------------------------------------------------------

# log2(1+t) = t * p(t) on [0,1), degree-5 p, zero-intercept fit
# (relative err 1.9e-5 uniformly — the zero at t=0 keeps small normals
# accurate, where an absolute-error fit loses all relative precision)
_LOG2_C = (1.4426688869485185, -0.7201758216206064, 0.4680272392716005,
           -0.3010465580177073, 0.14468375751156232, -0.03417634452694971)
# cos(pi f/2) on [0,1) in f^2 (max err 1.3e-7)
_COS_C = (0.9999999672698001, -1.23369874640111, 0.25365382913455387,
          -0.02081621162152305, 0.0008612932951789545)
# sin(pi f/2)/f on [0,1) in f^2 (max err 1.9e-8)
_SIN_C = (1.5707963220855086, -0.6459638380556043, 0.07969037204200492,
          -0.004674963271538138, 0.00015212617510292162)
# ln(1-x)/(-x) on [0, 0.3], degree-5 (relative err 2.2e-5): the
# exponent/mantissa route cancels catastrophically for v=1-x near 1
# (e=-1 against t*p(t) ~ +1), so small x uses this series directly
_LN1M_C = (0.9999997031078102, 0.5000403028246534, 0.3320388732188125,
           0.2663687307521427, 0.10610806995246555, 0.3989336089305266)
_LN2 = 0.6931471805599453


def _poly(x, coeffs):
    acc = coeffs[-1]
    for c in coeffs[-2::-1]:
        acc = acc * x + c
    return acc


def fast_normal_pair(bits_a, bits_b):
    """Two independent standard normals via Box-Muller with polynomial
    transcendentals (float32 only).

    The VPU's library log/cos/sin cost ~160 cycles per Box-Muller pair —
    comparable to the rest of a whole timestep.  These fits (ln via
    exponent/mantissa split + degree-6 log2 poly; sin/cos via quadrant
    reduction + degree-4 polys in f^2) agree with the exact formulas to
    ~1e-5 sigma, noise-floor territory for Monte Carlo, at ~4x fewer
    cycles.  Used by the hardware-RNG production kernel; the threefry
    validation path keeps the exact library formulas.
    """
    u_a = uniform_from_bits(bits_a, jnp.float32)
    u_b = uniform_from_bits(bits_b, jnp.float32)

    # ln(1-u): v = 1-u in (2^-24, 1], exactly representable
    v = 1.0 - u_a
    vb = jax.lax.bitcast_convert_type(v, jnp.int32)
    e = ((vb >> 23) & 0xFF) - 127
    m = jax.lax.bitcast_convert_type(
        (vb & 0x7FFFFF) | 0x3F800000, jnp.float32)
    t = m - 1.0
    ln_big = _LN2 * (e.astype(jnp.float32) + t * _poly(t, _LOG2_C))
    ln_small = -u_a * _poly(u_a, _LN1M_C)   # relative-accurate near v=1
    ln_v = jnp.where(u_a < 0.29, ln_small, ln_big)
    r = jnp.sqrt(jnp.maximum(-2.0 * ln_v, 0.0))

    # cos/sin(2 pi u) via quadrant reduction: u = (q + f)/4
    a = u_b * 4.0
    q = jnp.floor(a)
    f = a - q
    f2 = f * f
    c0 = _poly(f2, _COS_C)
    s0 = f * _poly(f2, _SIN_C)
    qi = q.astype(jnp.int32)
    cosv = jnp.where(qi == 0, c0,
                     jnp.where(qi == 1, -s0,
                               jnp.where(qi == 2, -c0, s0)))
    sinv = jnp.where(qi == 0, s0,
                     jnp.where(qi == 1, c0,
                               jnp.where(qi == 2, -s0, -c0)))
    return r * cosv, r * sinv
