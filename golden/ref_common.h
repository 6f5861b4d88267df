/**
 * Shared helpers for the golden-parity tools (OUR code; reference is
 * only called through its public API).
 */
#ifndef GOLDEN_REF_COMMON_H
#define GOLDEN_REF_COMMON_H

#include "octree.h"
#include "parameters.h"
#include "rand_walk.h"

// Point-dipole B_z, reference formula (octree.cpp:206-210): the factor
// 1e11 = mu0/4pi in the reference's micron/Tesla unit system.
static inline double golden_dipole_bz(double dx, double dy, double dz,
                                      double M) {
    double d2 = NORMSQ(dx, dy, dz);
    double divisor = d2 * d2 * sqrt(d2);
    return M * 1e11 * (2 * dz * dz - dx * dx - dy * dy) / divisor;
}

// GPU-convention field at a water's position: leaf-cached B + MASKED
// residents (cuda_sim.cu:269-286; mask of cuda_sim.cu:107-114).  The CPU
// Octree::get_field re-adds residents UNmasked (octree.cpp:151-158 —
// SURVEY §7 quirk 2), so we post-correct: subtract every resident
// contribution the GPU would have zeroed (distance <= cell_r).
// ``cell_r``: the RUNTIME mask radius — defaults to the build value;
// the t2 oracle's cell_r arm overrides it after the scene is built
// (the GPU masks at query time with its __constant__ params copy, so a
// changed constant radius is exactly this post-build override).
static inline double golden_field_gpu(Octree *tree, water_info *w,
                                      int *n_res_out = nullptr,
                                      double cell_r = p.cell_r) {
    oct_node *leaf = tree->get_voxel(w);
    double B = tree->get_field(w, leaf);
    int n_res = 0;
    if (leaf->resident) {
        n_res = (int)leaf->resident->size();
        for (const MNP_info &np : *leaf->resident) {
            double dx = w->x - np.x, dy = w->y - np.y, dz = w->z - np.z;
            if (NORMSQ(dx, dy, dz) <= cell_r * cell_r)
                B -= golden_dipole_bz(dx, dy, dz, np.M);
        }
    }
    if (n_res_out) *n_res_out = n_res;
    return B;
}

#endif
