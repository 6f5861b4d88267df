"""Scale-up kernel floor decomposition (VERDICT r3 weak #4 / item 8).

The scale-up bench (100k walkers x 2000 cells, tau 5e-7, PROVEN sizes
K=10/C=32) measured 1.60e10 walker-steps/s vs the 1.92e10 headline —
attributed to the fused candidate-model rebuild (expansion.build_planes)
but never decomposed.  This script measures the decomposition
differentially, with no profiler and no cycle-convention guesswork:

  * chunk-length sweep at fixed K/C: steady rate r(CH) satisfies
    1/r = t_step + t_rebuild / CH per walker-step -> linear fit in
    1/CH yields t_step (per-step kernel) and t_rebuild (per-chunk
    rebuild incl. its XLA gather feed) separately;
  * K sweep at fixed C/CH: d(t_step)/dK = per-near-dipole per-step
    cost — r3 established the same quantity on the headline kernel
    (~17-op masked dipole eval at its ALU floor), so it doubles as a
    seconds-per-issue-slot calibration for this hardware/day;
  * C sweep at fixed K/CH: d(t_rebuild)/dC = per-candidate rebuild
    cost, the quantity under suspicion, then expressed in
    calibrated issue-slots/candidate and compared to the kernel's
    static op count (sorted insertion ~6K selects + d2 8 ops +
    masked mid Taylor sums ~45 ops per candidate slab).

C=16 / K=5 arms are TIMING-ONLY: the covering-lattice proof requires
K=10/C=32 for this scene (PLAN.md), and the in-kernel coverage sentinel
still counts violations — physics output of undersized arms is not used.

Usage: python scripts/scaleup_floor.py   (needs the TPU; ~5-10 min)
Prints a markdown table + derived floor note for PLAN.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(p, scene, cache, n_sprints=25):
    import jax.numpy as jnp

    from mri_nanoparticle_simulation_tpu import rng
    from mri_nanoparticle_simulation_tpu.engine import (pallas_engine,
                                                       reference_engine)

    w = p.num_water
    mnp_pos = jnp.asarray(scene.mnps[:, :3], jnp.float32)
    mnp_M = jnp.asarray(scene.mnps[:, 4], jnp.float32)
    k = rng.key_from_seed(7)
    key_arr = jnp.asarray([np.uint32(k[0]), np.uint32(k[1])])
    state = reference_engine.init_state(scene.waters, p, jnp.float32)
    sprint = pallas_engine.make_sprint_fn(
        p, w, jnp.float32, rng_impl=pallas_engine.RNG_HARDWARE)
    ps = pallas_engine.to_planes(state, p)
    ps, wins = sprint(mnp_pos, mnp_M, key_arr, ps, 0, cache=cache)
    np.asarray(wins)                         # compile + warm
    t0 = time.perf_counter()
    for _ in range(n_sprints):
        ps, wins = sprint(mnp_pos, mnp_M, key_arr, ps, 0, cache=cache)
    np.asarray(wins)
    np.asarray(ps[0])
    wall = time.perf_counter() - t0
    return n_sprints * p.sprint_steps * w / wall


def main():
    import jax.numpy as jnp

    from mri_nanoparticle_simulation_tpu.fields import expansion
    from mri_nanoparticle_simulation_tpu.params import Params
    from mri_nanoparticle_simulation_tpu.scene import BacteriaBox
    from mri_nanoparticle_simulation_tpu.utils.cache import \
        enable_compile_cache

    enable_compile_cache()
    np.asarray(jnp.zeros(16))                # warm backend

    base = dict(num_water=100_000, num_cells=2000, tau=5e-7,
                sprint_steps=20_000, mmoment=3.5e-17,
                water_start_bound=28.0, max_neighbors=24)
    scene_p = Params(near_k=10, cube_candidates=32, chunk_steps=4000,
                     **base).validate()
    scene = BacteriaBox(scene_p, seed=42).populate()
    print(f"scene: {scene.mnps.shape[0]} MNPs "
          f"({scene_p.num_cells} cells + images)", flush=True)

    mnp_pos = jnp.asarray(scene.mnps[:, :3], jnp.float32)
    mnp_M = jnp.asarray(scene.mnps[:, 4], jnp.float32)
    caches = {}
    for c in (32, 16):
        pc = Params(near_k=10, cube_candidates=c, chunk_steps=4000,
                    **base).validate()
        caches[c] = expansion.build_cache(mnp_pos, mnp_M, pc)

    # (near_k, cube_candidates, chunk_steps)
    matrix = [(10, 32, 4000), (10, 32, 2000), (10, 32, 8000),
              (5, 32, 4000), (10, 16, 4000)]
    rates = {}
    print("| K | C | chunk | walker-steps/s | ns/walker-step |")
    print("|---|---|---|---|---|")
    for k, c, ch in matrix:
        kn = dict(base)
        kn["sprint_steps"] = ch * 5      # keep sprints chunk-aligned
        p = Params(near_k=k, cube_candidates=c, chunk_steps=ch,
                   **kn).validate()
        r = measure(p, scene, caches[c])
        rates[(k, c, ch)] = r
        print(f"| {k} | {c} | {ch} | {r:.3e} | {1e9 / r:.3f} |",
              flush=True)

    # decomposition: per-walker-step seconds t(CH) = t_step + t_reb/CH
    inv = {ch: 1.0 / rates[(10, 32, ch)] for ch in (2000, 4000, 8000)}
    x = np.array([1.0 / ch for ch in (2000, 4000, 8000)])
    y = np.array([inv[ch] for ch in (2000, 4000, 8000)])
    t_reb, t_step = np.polyfit(x, y, 1)      # slope, intercept (s/walker)
    per_near = (1.0 / rates[(5, 32, 4000)] - 1.0 / rates[(10, 32, 4000)]) / (5 - 10)
    per_cand_chunk = (1.0 / rates[(10, 16, 4000)] - 1.0 / rates[(10, 32, 4000)]) \
        * 4000 / (16 - 32)
    print()
    print(f"t_step (per-step kernel)        : {t_step * 1e9:.3f} ns/walker-step")
    print(f"t_rebuild (per chunk, amortized): {t_reb * 1e9:.1f} ns/walker-chunk "
          f"(= {t_reb / t_step / 4000 * 100:.1f}% of a 4000-step chunk)")
    print(f"per-near-dipole per-step cost   : {per_near * 1e9:.3f} ns "
          f"(r3 headline: this is the ~17-op masked dipole eval -> "
          f"calibrates 1 issue-slot ~= {per_near * 1e9 / 21:.4f} ns)")
    slot = per_near / 21.0
    print(f"per-candidate rebuild cost      : {per_cand_chunk * 1e9:.1f} ns/chunk "
          f"= {per_cand_chunk / slot:.0f} issue-slots/candidate")
    print(f"rebuild at C=32: {32 * per_cand_chunk / slot:.0f} slots + "
          f"fixed {(t_reb - 32 * per_cand_chunk) / slot:.0f} slots "
          f"(gathers/anchor/far-poly)")


if __name__ == "__main__":
    main()
