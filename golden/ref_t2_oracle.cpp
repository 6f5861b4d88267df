/**
 * Golden-parity harness, part 2: the as-written CPU T2 oracle.
 *
 * Runs REFERENCE PHYSICS end-to-end on the CPU: the scene, octree and
 * field come from the reference's own compiled host C++ (BacteriaBox /
 * Octree, called through their public API); the per-step walker loop is
 * OUR line-by-line re-expression of the as-written device kernels —
 * every step below cites the cuda_sim.cu lines it reproduces:
 *
 *   rand_displacement        cuda_sim.cu:562-583  (uniform-in-cube
 *       direction normalized to the unit sphere — NOT uniform on the
 *       sphere, quirk 4 — magnitude = signed normal x in/out stdev)
 *   boundary_conditions      cuda_sim.cu:597-601  (per-step fmod wrap)
 *   updateNearest            cuda_sim.cu:453-485  (hash-cell candidate
 *       list -> argmin; in_cell = cDist < cell_r^2)
 *   cell_reflect             cuda_sim.cu:502-509  (coin vs reflectIO/OI
 *       on membrane crossings; both 0 by default -> transparent, the
 *       coin is still consumed)
 *   accumulatePhase          cuda_sim.cu:625-640  (GPU get_field = leaf
 *       B + masked residents, :269-286 + :107-114; the RANDOM_KICK
 *       Cauchy term multiplies the operator-precedence-bugged sign
 *       factor == 0, leaving only the constant chemical-shift kick —
 *       quirk 1; then B * 2pi * g * tau * 1e-3)
 *   window reduction + CP    cuda_sim.cu:996-1023 (per-pfreq window:
 *       phase += window kick sum; row = sum over walkers of cos(phase);
 *       AFTER the row, flip phase when time % tcp == 0)
 *
 * The RNG is std::mt19937_64 per walker (5 uniforms + 1 normal per
 * step, same distributions as the cuRAND buffers, cuda_sim.cu:54-55);
 * the comparison arm is STATISTICAL (ensembles over seeds), so RNG
 * identity is not required — only distribution identity.
 *
 * The time axis is configurable (steps / pfreq / tcp / walker subset /
 * moment scale): those knobs live in the sprint driver the reference
 * compiled into cuda_sim.cu, which we are re-expressing anyway; the
 * physics (scene geometry, field, stdevs, kick constants) stays the
 * reference's compiled truth.  moment_scale multiplies the *field* only
 * (B is linear in the moment), letting a short oracle run decay as far
 * as the 40 ms production run without rebuilding the octree.
 *
 * Usage: ref_t2_oracle <scene_seed> <rng_seed> <out_csv> [n_water]
 *                      [steps] [pfreq] [tcp] [moment_scale] [d_scale]
 *                      [cell_r_run] [reflect_io] [reflect_oi]
 *                      [mode] [gz]
 *
 * mode 0 (default) is the as-written physics above.  mode 1 is the
 * INTENDED physics (SURVEY quirks 1 + 4 corrected): step directions
 * uniform on the unit sphere instead of normalized uniform-in-cube,
 * and the intracellular Cauchy kick with the evident intent of
 * cuda_sim.cu:632 — phase_stdev * sqrt(1/(2|u-1/2|)-1) * sign(u-1/2)
 * * tau + the chemical-shift term (the as-written sign factor parses
 * to 0).  This gives the framework's kick_mode=intended /
 * direction_mode=sphere the same two-independent-implementations
 * status as the as-written path (the walker loop here shares no code
 * with the JAX/Pallas engines).
 *
 * gz (T/um, default 0) adds a constant background field gradient:
 * kick += w.z * gz * 2*pi*g*tau*1e-3 at the recorded position — the
 * oracle arm for the framework's DWI axis (params.b0_gradient).
 *
 * d_scale scales BOTH diffusion coefficients: the derived stdevs are
 * sqrt(pi * D * tau) (parameters.h:120-121), so the displacement
 * magnitudes multiply by sqrt(d_scale) — reference physics with a
 * rescaled D, the oracle arm for the framework's runtime D axis.
 *
 * reflect_io / reflect_oi override the membrane bounce probabilities
 * (the reference derives them from P_expr but ships them as 0 —
 * transparent membranes, parameters.h:116-117; the cell_reflect branch
 * cuda_sim.cu:502-509 is compiled either way).  Nonzero values are the
 * oracle arm for the framework's permeability physics (reflect_io /
 * reflect_oi in params.py): the SAME coin stream is consumed in both
 * configurations, only the comparison thresholds change.
 */

#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>
#include <vector>

#include "BacteriaBox.h"
#include "octree.h"
#include "parameters.h"
#include "rand_walk.h"
#include "xorshift.h"

#include "ref_common.h"

ParameterStruct p(0);

struct Lookup {
    // dense copy of the nearest-cell lookup table (int** hashDim^3 x
    // maxNeighbors, -1-terminated; SimulationBox.cpp:262-290)
    std::vector<int> flat;
    int dim, cap;
    const Triple *cells;
    // runtime residency radius (p.cell_r is static const; the cell_r
    // arm varies the KERNEL-side radius on fixed geometry, mirroring
    // the framework's cell_r launch scalar)
    double cell_r = p.cell_r;

    void update_nearest(water_info *w) const {
        // updateNearest, cuda_sim.cu:453-485
        double cubeLength = p.bound / p.hashDim;
        int x_idx = (int)(w->x / cubeLength);
        int y_idx = (int)(w->y / cubeLength);
        int z_idx = (int)(w->z / cubeLength);
        const int *nearest =
            &flat[(size_t)(z_idx * dim * dim + y_idx * dim + x_idx) * cap];
        double cDist = p.bound * p.bound * 3;
        int cIndex = -1;
        while (*nearest != -1) {
            double dx = cells[*nearest].x - w->x;
            double dy = cells[*nearest].y - w->y;
            double dz = cells[*nearest].z - w->z;
            double dist = NORMSQ(dx, dy, dz);
            if (dist < cDist) {
                cDist = dist;
                cIndex = *nearest;
            }
            nearest++;
        }
        w->in_cell = (cDist < cell_r * cell_r);
        w->nearest = cIndex;
    }
};

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr,
                "usage: %s <scene_seed> <rng_seed> <out_csv> [n_water=4032] "
                "[steps=1000000] [pfreq=1000] [tcp=250000] "
                "[moment_scale=1] [d_scale=1] [cell_r_run=p.cell_r] "
                "[reflect_io=p.reflectIO] [reflect_oi=p.reflectOI] "
                "[mode=0 (1=intended physics)] [gz=0 (T/um)]\n",
                argv[0]);
        return 2;
    }
    uint64_t scene_seed = strtoull(argv[1], nullptr, 10);
    uint64_t rng_seed = strtoull(argv[2], nullptr, 10);
    std::string out_csv = argv[3];
    int n_water = argc > 4 ? atoi(argv[4]) : p.num_water;
    long steps = argc > 5 ? atol(argv[5]) : 1000000;
    int pfreq = argc > 6 ? atoi(argv[6]) : 1000;
    long tcp = argc > 7 ? atol(argv[7]) : 250000;
    double mscale = argc > 8 ? atof(argv[8]) : 1.0;
    double dsc = argc > 9 ? atof(argv[9]) : 1.0;
    if (!(dsc > 0) || dsc != dsc) {   /* atof returns 0 on garbage */
        fprintf(stderr, "d_scale must be a positive number; got '%s'\n",
                argc > 9 ? argv[9] : "1");
        return 2;
    }
    // 0 selects the compiled default (so later positional args stay
    // reachable without hard-coding p.cell_r in every caller); a
    // non-numeric value is an error, not a silent default
    double cell_r_run = p.cell_r;
    if (argc > 10) {
        char *end = nullptr;
        double v = strtod(argv[10], &end);
        if (end == argv[10] || *end != '\0' || v != v || v < 0) {
            fprintf(stderr, "cell_r_run must be a number >= 0 "
                    "(0 = compiled default); got '%s'\n", argv[10]);
            return 2;
        }
        if (v != 0.0) cell_r_run = v;
    }
    // membrane bounce probabilities (cell_reflect thresholds); the
    // reference's ParameterStruct members are runtime-assignable
    // (parameters.h:99 "Assign values in constructor"), so overriding
    // them here is exactly a rebuilt __constant__ params copy
    if (argc > 11) p.reflectIO = atof(argv[11]);
    if (argc > 12) p.reflectOI = atof(argv[12]);
    if (p.reflectIO < 0 || p.reflectIO > 1 || p.reflectOI < 0 ||
        p.reflectOI > 1 || p.reflectIO != p.reflectIO ||
        p.reflectOI != p.reflectOI) {
        fprintf(stderr, "reflect_io/oi must be in [0, 1]\n");
        return 2;
    }
    int mode = argc > 13 ? atoi(argv[13]) : 0;
    if (mode != 0 && mode != 1) {
        fprintf(stderr, "mode must be 0 (as-written) or 1 (intended)\n");
        return 2;
    }
    double gz = argc > 14 ? atof(argv[14]) : 0.0;
    if (gz != gz) {
        fprintf(stderr, "gz must be a number (T/um)\n");
        return 2;
    }
    double dstd = sqrt(dsc);
    if (n_water > p.num_water) n_water = p.num_water;
    long n_windows = steps / pfreq;

    XORShift<> gen(scene_seed);
    BacteriaBox box(&gen);
    box.populateSimulation();
    Octree *tree = box.getOctree();

    // GOLDEN_MAX_PRODUCT=<v>: rebuild the field octree with a custom
    // leaf criterion (SimulationBox.cpp:86 hardcodes 2e-6).  Used for
    // attribution runs: the reference octree's cached-leaf field error
    // (GOLDEN_PARITY.json: 6.8e-2 RMS of field scale) contributes
    // measurable extra decay at deep moment scales; tightening the
    // criterion isolates that contribution without touching physics.
    std::vector<MNP_info> mnp_copy;
    const char *mp_env = getenv("GOLDEN_MAX_PRODUCT");
    if (mp_env) {
        double mpv = strtod(mp_env, NULL);
        if (mpv > 0) {
            MNP_info *m0 = box.getMNPs();
            mnp_copy.assign(m0, m0 + box.getMNPCount());
            XORShift<> gen2(scene_seed + 77);
            tree = new Octree(mpv, 5, .002, gen2, &mnp_copy);
            fprintf(stderr, "[golden] custom octree max_product=%g\n",
                    mpv);
        }
    }

    // GOLDEN_EXACT_FIELD=1: bypass the octree entirely and evaluate the
    // brute-force masked dipole sum over ALL MNPs (incl. periodic
    // images) at every recorded position — the exact limit of octree
    // tightening.  As max_product -> 0 the cached-leaf error vanishes
    // and every near dipole becomes a masked resident, so the queried
    // field converges to sum_i [d2 > cell_r^2] * M_i*1e11*
    // (2dz^2-dx^2-dy^2)/d2^2.5 (GPU convention, cuda_sim.cu:107-114).
    // O(n_mnps) per step: pair with GOLDEN_WALKER_STRIDE for runtime.
    bool exact_field = false;
    {
        const char *ef = getenv("GOLDEN_EXACT_FIELD");
        exact_field = ef && atoi(ef) != 0;
        if (exact_field)
            fprintf(stderr, "[golden] exact brute-force field over %d "
                    "MNPs\n", box.getMNPCount());
    }
    // GOLDEN_WALKER_STRIDE=k: simulate only walker ids {0, k, 2k, ...}
    // of the n_water-walker run, KEEPING each walker's PRNG stream
    // (seeded by its id) and source water (strided Morton subsample) —
    // a strict subset of the full run's trajectories, so a strided
    // exact-field run pairs zero-noise against a strided octree run.
    int wstride = 1;
    {
        const char *ws = getenv("GOLDEN_WALKER_STRIDE");
        if (ws && atoi(ws) > 1) wstride = atoi(ws);
    }
    int n_mnps = box.getMNPCount();
    std::vector<double> mx(n_mnps), my(n_mnps), mz(n_mnps), mm(n_mnps);
    {
        const MNP_info *mi = box.getMNPs();
        for (int i = 0; i < n_mnps; i++) {
            mx[i] = mi[i].x; my[i] = mi[i].y; mz[i] = mi[i].z;
            mm[i] = mi[i].M;
        }
    }

    Lookup lk;
    lk.cell_r = cell_r_run;
    lk.dim = p.hashDim;
    lk.cap = p.maxNeighbors;
    lk.cells = box.getCells();
    int h3 = p.hashDim * p.hashDim * p.hashDim;
    lk.flat.resize((size_t)h3 * p.maxNeighbors);
    int **table = box.getLookupTable();
    for (int i = 0; i < h3; i++)
        memcpy(&lk.flat[(size_t)i * p.maxNeighbors], table[i],
               sizeof(int) * p.maxNeighbors);

    const water_info *w0 = box.getWaters();
    // phase-kick constants, accumulatePhase cuda_sim.cu:630-637
    const double chem_kick = p.phase_k * 1e-3 * 42.58 * 2 * M_PI * 7 * p.tau;
    const double b_to_phase = 2 * M_PI * p.g * p.tau * 1e-3;

    std::vector<double> rows(n_windows, 0.0);

#pragma omp parallel
    {
        std::vector<double> local(n_windows, 0.0);
        const double cr2 = cell_r_run * cell_r_run;
#pragma omp for schedule(dynamic, 8)
        for (int t = 0; t < n_water; t++) {
            if (t % wstride != 0) continue;
            std::mt19937_64 prng(rng_seed * 1000003ull + (uint64_t)t);
            std::uniform_real_distribution<double> U(0.0, 1.0);
            std::normal_distribution<double> N(0.0, 1.0);

            // strided subsample: the waters array is Morton-SORTED
            // (SimulationBox.cpp:131-147), so taking the first n_water
            // would cluster the subset in low-Morton space; striding
            // keeps it spatially stratified
            int src = (int)((long)t * p.num_water / n_water);
            water_info w = w0[src];
            lk.update_nearest(&w);  // cuda_sim.cu:694-695
            double phase = 0.0, win_sum = 0.0;
            long win = 0;
            for (long i = 0; i < steps; i++) {
                water_info init = w;
                double nC;
                double dx, dy, dz;
                if (mode == 0) {
                    // rand_displacement, cuda_sim.cu:562-583 (as-written
                    // quirk 4: normalized uniform-in-cube direction)
                    dx = U(prng) * 2 - 1.0;
                    dy = U(prng) * 2 - 1.0;
                    dz = U(prng) * 2 - 1.0;
                    nC = N(prng) * (w.in_cell ? p.in_stdev : p.out_stdev)
                        * dstd / sqrt(NORMSQ(dx, dy, dz));
                } else {
                    // intended physics: direction uniform on the unit
                    // sphere (cos(theta) and azimuth uniform), magnitude
                    // = signed normal x in/out stdev, like the reference
                    double ct = U(prng) * 2 - 1.0;
                    double phi = U(prng) * 2 * M_PI;
                    double st = sqrt(ct * ct < 1.0 ? 1.0 - ct * ct : 0.0);
                    dx = st * cos(phi);
                    dy = st * sin(phi);
                    dz = ct;
                    (void)U(prng);  // keep the 3-uniform direction budget
                    nC = N(prng) * (w.in_cell ? p.in_stdev : p.out_stdev)
                        * dstd;
                }
                w.x += dx * nC;
                w.y += dy * nC;
                w.z += dz * nC;
                // boundary_conditions, cuda_sim.cu:597-601
                w.x = fmod(w.x + p.bound, p.bound);
                w.y = fmod(w.y + p.bound, p.bound);
                w.z = fmod(w.z + p.bound, p.bound);
                lk.update_nearest(&w);  // cuda_sim.cu:716
                // cell_reflect, cuda_sim.cu:502-509 + :720
                double coin = U(prng);
                bool flip =
                    (init.in_cell && !w.in_cell && coin < p.reflectIO) ||
                    (!init.in_cell && w.in_cell && coin < p.reflectOI);
                if (flip) w = init;
                // accumulatePhase at the recorded position,
                // cuda_sim.cu:625-640 (as-written kick: Cauchy term x 0;
                // intended mode restores the evident sign(u-1/2) intent)
                double nD = U(prng);
                double B;
                if (exact_field) {
                    double acc = 0.0;
                    for (int m = 0; m < n_mnps; m++) {
                        double dx = w.x - mx[m], dy = w.y - my[m],
                               dz = w.z - mz[m];
                        double d2 = dx * dx + dy * dy + dz * dz;
                        double num = mm[m] * (2 * dz * dz - dx * dx
                                              - dy * dy);
                        acc += d2 > cr2 ? num / (d2 * d2 * sqrt(d2))
                                        : 0.0;
                    }
                    B = acc * 1e11;
                } else {
                    B = golden_field_gpu(tree, &w, nullptr, cell_r_run);
                }
                B *= mscale;
                double intra = chem_kick;
                if (mode == 1) {
                    double c = nD - 0.5;
                    double ac = fabs(c) * 2;
                    double cauchy =
                        sqrt(1.0 / (ac > 1e-12 ? ac : 1e-12) - 1.0);
                    intra += p.phase_stdev * cauchy * (c > 0 ? 1.0 : -1.0)
                        * p.tau;
                }
                double kick =
                    (w.in_cell ? intra : 0.0) + B * b_to_phase
                    + w.z * gz * b_to_phase;
                win_sum += kick;
                // window boundary: gemv sum -> performUpdate -> reduce ->
                // CP flip, cuda_sim.cu:996-1023
                if ((i + 1) % pfreq == 0) {
                    phase += win_sum;
                    win_sum = 0.0;
                    local[win] += cos(phase);
                    long time = i + 1;
                    if (time % tcp == 0) phase = -phase;
                    win++;
                }
            }
        }
#pragma omp critical
        for (long j = 0; j < n_windows; j++) rows[j] += local[j];
    }

    FILE *f = fopen(out_csv.c_str(), "w");
    for (long j = 0; j < n_windows; j++)
        fprintf(f, "%.17g,%.17g\n", (j + 1) * (double)pfreq * p.tau, rows[j]);
    fclose(f);
    fprintf(stderr, "oracle done: %d walkers x %ld steps -> %ld rows\n",
            (n_water + wstride - 1) / wstride, steps, n_windows);
    return 0;
}
