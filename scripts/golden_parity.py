#!/usr/bin/env python
"""Golden-parity harness: measure this framework directly against the
reference's OWN compiled host C++ (scene builder + octree).

Arms (results -> GOLDEN_PARITY.json, summarized in ACCURACY.md):

1.  FIELD.  The reference octree's cached ``get_field`` (dumped by
    golden/ref_scene_dump on a probe lattice + near-dipole shells) vs
    the exact f64 dipole sum over the SAME MNP set — quantifying the
    reference's own leaf-cache error (SURVEY §7 quirks 2-3) instead of
    citing it.  Side by side: OUR production field model (expansion
    build/evaluate, f32) vs the same exact sum, evaluated at the probes
    as chunk anchors AND at travel-bound offsets from them (the worst
    in-chunk case), plus the uniform-grid backend.

2.  SCENE.  Distributional equivalence of the scene builders over an
    ensemble of seeds: KS statistics for cell / water coordinates,
    nearest-cell-distance distributions, min cell pair separation
    invariant, periodic image counts (apply_bcs_on_mnps vs our
    scene/images.py on the same intra-box MNP sets — exact count match
    expected, since image construction is deterministic given MNPs).

Usage:  python scripts/golden_parity.py [--seeds 8] [--probe-n 24]
        [--out GOLDEN_PARITY.json]

Run from the repo root.  Builds golden/ tools if needed (g++, ~5 s).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "golden")


def ensure_tools():
    exe = os.path.join(GOLDEN, "build", "ref_scene_dump")
    if not os.path.exists(exe):
        subprocess.run(["bash", os.path.join(GOLDEN, "build.sh")],
                       check=True, capture_output=True)
    return exe


def run_dump(seed: int, out_dir: str, probe_n: int, near_per: int = 32):
    exe = ensure_tools()
    subprocess.run([exe, str(seed), out_dir, str(probe_n), str(near_per)],
                   check=True, capture_output=True, cwd=out_dir)
    def load(name, skip=1):
        return np.loadtxt(os.path.join(out_dir, name), delimiter=",",
                          skiprows=skip)
    return (load("scene_mnps.csv"), load("scene_cells.csv"),
            load("scene_waters.csv"), load("field_probes.csv"))


def exact_sums(probes_xyz, mnps, cell_r):
    """Exact f64 dipole sums over the dumped MNP set, both conventions.
    unmasked = CPU octree build convention (octree.cpp:206-210);
    masked   = GPU integration convention (cuda_sim.cu:107-114,
    strict ``sqDist > cell_r^2``)."""
    d = probes_xyz[:, None, :] - mnps[None, :, :3]          # [P, N, 3]
    d2 = np.sum(d * d, axis=-1)
    num = 2 * d[..., 2] ** 2 - d[..., 0] ** 2 - d[..., 1] ** 2
    contrib = mnps[None, :, 4] * 1e11 * num / (d2 * d2 * np.sqrt(d2))
    unmasked = contrib.sum(-1)
    masked = np.where(d2 > cell_r * cell_r, contrib, 0.0).sum(-1)
    return unmasked, masked


def err_stats(approx, exact, scale):
    """Error statistics normalized by a common field scale (the RMS of
    the exact masked field over the probe set — relative-to-local-B blows
    up at field zero crossings and says nothing about phase error)."""
    e = np.abs(approx - exact)
    return {
        "rms_over_scale": float(np.sqrt(np.mean(e ** 2)) / scale),
        "max_over_scale": float(e.max() / scale),
        "p99_over_scale": float(np.quantile(e, 0.99) / scale),
    }


def field_arm(seed: int, probe_n: int, args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mri_nanoparticle_simulation_tpu import params as P
    from mri_nanoparticle_simulation_tpu.fields import expansion
    from mri_nanoparticle_simulation_tpu.fields import grid as grid_mod

    with tempfile.TemporaryDirectory() as td:
        mnps, cells, waters, probes = run_dump(seed, td, probe_n)
    pxyz = probes[:, :3]
    b_cpu, b_gpu, n_res = probes[:, 3], probes[:, 4], probes[:, 5]
    cell_r = 0.55
    exact_unmasked, exact_masked = exact_sums(pxyz, mnps, cell_r)
    scale = float(np.sqrt(np.mean(exact_masked ** 2)))

    res = {"seed": seed, "n_probes": int(len(pxyz)),
           "n_mnps_with_images": int(len(mnps)),
           "field_scale_T": scale}

    # -- the reference octree against its own exact field ----------------
    # CPU convention (unmasked residents) vs unmasked exact: pure leaf-
    # cache interpolation error (quirk 3's sampling asymmetry included).
    res["ref_octree_cpu_vs_exact"] = err_stats(b_cpu, exact_unmasked, scale)
    # GPU convention vs masked exact: what the reference GPU actually
    # integrated vs what it meant to integrate.
    res["ref_octree_gpu_vs_exact"] = err_stats(b_gpu, exact_masked, scale)

    # -- our production field model on the SAME MNP set ------------------
    p = P.DEFAULT.replace(near_k=args.near_k, chunk_steps=args.chunk_steps)
    mnp_pos = jnp.asarray(mnps[:, :3], jnp.float32)
    mnp_M = jnp.asarray(mnps[:, 4], jnp.float32)
    need_k = expansion.validate_near_k(mnps[:, :3], p, n_probe=20000)
    if need_k > p.near_k:
        p = p.replace(near_k=int(need_k))
    anchors = jnp.asarray(pxyz, jnp.float32)
    nf = expansion.build(anchors, mnp_pos, mnp_M, p)
    b_ours, _, _ = expansion.evaluate(nf, anchors, jnp.float32(cell_r))
    res["ours_expansion_at_anchor_vs_exact"] = err_stats(
        np.asarray(b_ours, np.float64), exact_masked, scale)

    # worst in-chunk case: evaluate at a travel-bound offset from the
    # anchor (the Taylor model's largest extrapolation)
    tb = expansion.default_travel_bound(p)
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(len(pxyz), 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    off = pxyz + dirs * tb
    keep = np.all((off >= 0) & (off < P.DEFAULT.bound), axis=1)
    exact_off = exact_sums(off[keep], mnps, cell_r)[1]
    b_off, _, _ = expansion.evaluate(nf, jnp.asarray(off, jnp.float32),
                                     jnp.float32(cell_r))
    res["ours_expansion_at_travel_bound_vs_exact"] = err_stats(
        np.asarray(b_off, np.float64)[keep], exact_off,
        float(np.sqrt(np.mean(exact_off ** 2))))
    res["travel_bound_um"] = float(tb)

    # -- our uniform-grid backend (octree's direct analogue) -------------
    if args.grid_n:
        fg = grid_mod.build_grid(mnp_pos, mnp_M, p, grid_n=args.grid_n,
                                 max_residents=64)
        bg, _ = grid_mod.query(fg, anchors, jnp.float32(cell_r))
        res[f"ours_grid{args.grid_n}_vs_exact"] = err_stats(
            np.asarray(bg, np.float64), exact_masked, scale)
    return res


def ks_stat(a, b):
    """Two-sample Kolmogorov-Smirnov statistic + asymptotic p-value
    (no scipy dependency)."""
    a, b = np.sort(a), np.sort(b)
    allv = np.concatenate([a, b])
    cdf_a = np.searchsorted(a, allv, side="right") / len(a)
    cdf_b = np.searchsorted(b, allv, side="right") / len(b)
    d = float(np.max(np.abs(cdf_a - cdf_b)))
    en = np.sqrt(len(a) * len(b) / (len(a) + len(b)))
    t = (en + 0.12 + 0.11 / en) * d
    p = 2 * sum((-1) ** (k - 1) * np.exp(-2 * (t * k) ** 2)
                for k in range(1, 101))
    return d, float(min(max(p, 0.0), 1.0))


def scene_arm(n_seeds: int):
    from mri_nanoparticle_simulation_tpu import params as P
    from mri_nanoparticle_simulation_tpu.scene import BacteriaBox
    from mri_nanoparticle_simulation_tpu.scene import images as images_mod

    ref_cells, ref_waters, ref_img_counts = [], [], []
    ours_cells, ours_waters, ours_img_counts = [], [], []
    ref_min_sep, ours_min_sep = [], []
    img_exact_match = []
    for s in range(n_seeds):
        with tempfile.TemporaryDirectory() as td:
            mnps, cells, waters, _ = run_dump(1000 + s, td, probe_n=2,
                                              near_per=0)
        ref_cells.append(cells)
        ref_waters.append(waters)
        ref_img_counts.append(len(mnps) - len(cells))
        d = np.linalg.norm(cells[:, None] - cells[None], axis=-1)
        ref_min_sep.append(d[d > 0].min())
        # image construction is deterministic given the intra MNP set:
        # feed the REFERENCE's intra MNPs through OUR images builder and
        # demand the same multiset of image positions
        # (SimulationBox.cpp:348-527 vs scene/images.py)
        intra = np.concatenate([cells, np.zeros((len(cells), 1)),
                                np.full((len(cells), 1), 3.5e-17)], axis=1)
        ours_imgs = images_mod.apply_bcs_on_mnps(intra, P.DEFAULT)

        def canon(pts):
            pts = pts.round(9)
            return pts[np.lexsort((pts[:, 2], pts[:, 1], pts[:, 0]))]

        a = canon(ours_imgs[len(cells):, :3])
        b = canon(mnps[len(cells):, :3])
        img_exact_match.append(bool(a.shape == b.shape and
                                    np.array_equal(a, b)))

        sc = BacteriaBox(P.DEFAULT, seed=s).populate()
        ours_cells.append(sc.cells)
        ours_waters.append(sc.waters)
        ours_img_counts.append(sc.mnps.shape[0] - sc.num_intra_mnps)
        d = np.linalg.norm(sc.cells[:, None] - sc.cells[None], axis=-1)
        ours_min_sep.append(d[d > 0].min())

    rc = np.concatenate(ref_cells)
    oc = np.concatenate(ours_cells)
    rw = np.concatenate(ref_waters)
    ow = np.concatenate(ours_waters)
    out = {"n_seeds": n_seeds,
           "ref_image_counts": ref_img_counts,
           "ours_image_counts": ours_img_counts,
           "ref_min_cell_sep_um": float(np.min(ref_min_sep)),
           "ours_min_cell_sep_um": float(np.min(ours_min_sep)),
           "min_sep_invariant_2cellr": bool(
               np.min(ref_min_sep) >= 1.1 and np.min(ours_min_sep) >= 1.1),
           "image_construction_exact_match": img_exact_match}
    for i, name in enumerate("xyz"):
        d, pv = ks_stat(rc[:, i], oc[:, i])
        out[f"cells_{name}_ks"] = {"d": d, "p": pv}
        d, pv = ks_stat(rw[:, i], ow[:, i])
        out[f"waters_{name}_ks"] = {"d": d, "p": pv}

    # Water-to-nearest-cell distances are strongly CORRELATED within a
    # scene (all 4032 waters share the same ~11 cells near the start
    # cube), so a pooled KS wildly overstates the sample size and fails
    # on pure scene-to-scene noise (measured: 2 scenes/side -> p~1e-19
    # while 12-scene means agree to 0.3 sigma).  Compare per-scene MEANS
    # with a two-sample z instead — the statistically valid unit is the
    # scene, not the water.
    def nn_mean(waters, cells):
        d = np.linalg.norm(waters[:, None] - cells[None], axis=-1)
        return float(d.min(axis=1).mean())

    def scene_z(ref_vals, ours_vals):
        r, o = np.asarray(ref_vals, float), np.asarray(ours_vals, float)
        se = np.sqrt(r.var(ddof=1) / len(r) + o.var(ddof=1) / len(o))
        return {"ref_mean": float(r.mean()), "ours_mean": float(o.mean()),
                "z": float((r.mean() - o.mean()) / se) if se > 0 else 0.0}

    out["water_nearest_cell_mean_dist"] = scene_z(
        [nn_mean(w, c) for w, c in zip(ref_waters, ref_cells)],
        [nn_mean(w, c) for w, c in zip(ours_waters, ours_cells)])
    out["image_count"] = scene_z(ref_img_counts, ours_img_counts)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=8,
                    help="scene-ensemble size for the distribution arm")
    ap.add_argument("--probe-n", type=int, default=24)
    ap.add_argument("--near-k", type=int, default=5)
    ap.add_argument("--chunk-steps", type=int, default=4000)
    ap.add_argument("--grid-n", type=int, default=96)
    ap.add_argument("--field-seeds", type=int, default=2)
    ap.add_argument("--out", default="GOLDEN_PARITY.json")
    args = ap.parse_args()

    results = {"field": [], "scene": None}
    for s in range(args.field_seeds):
        print(f"[field arm] seed {42 + s}...", file=sys.stderr)
        results["field"].append(field_arm(42 + s, args.probe_n, args))
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print("[scene arm]...", file=sys.stderr)
    results["scene"] = scene_arm(args.seeds)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
