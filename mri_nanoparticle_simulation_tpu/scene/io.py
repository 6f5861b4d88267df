"""Scene I/O: user-provided geometries and exact scene round trips.

The reference hard-codes its geometry generators — changing cell
placement means editing BacteriaBox.cpp and recompiling (README.md:13).
Here a measured or externally-designed geometry is runtime data:

* :class:`CustomBox` builds a full scene (dipoles, periodic images,
  lookup table, thrown waters) around caller-supplied cell centers —
  the scene pipeline of BacteriaBox (SimulationBox.cpp:77-97) with
  ``init_cells`` replaced by your array;
* :func:`save_scene` / :func:`load_scene` round-trip a populated Scene
  through one ``.npz`` (bitwise: every array is stored verbatim), so a
  scene can be archived, shared, or re-simulated exactly;
* :func:`load_cells_csv` reads plain ``x,y,z`` rows (µm) — the
  interchange format for cell centers from segmentation/microscopy
  pipelines.
"""

from __future__ import annotations

import numpy as np

from ..params import Params
from .box import BacteriaBox, Scene


class CustomBox(BacteriaBox):
    """BacteriaBox with caller-supplied cell centers.

    ``cells`` is [n, 3] in µm; every center must keep the whole sphere
    inside the box ([cell_r, bound - cell_r] per axis, the same domain
    BacteriaBox throws into, BacteriaBox.cpp:53-60).  Overlapping cells
    are allowed (a measured geometry may contain touching cells — the
    physics is well-defined; the reference's non-overlap constraint is
    a property of its generator, not of the simulation).

    The params' ``num_cells`` must match ``len(cells)`` so the scene is
    self-consistent (CLI callers: ``params.replace(num_cells=len(cells))``).
    """

    def __init__(self, params: Params, cells, seed: int = 0,
                 prefer_native: bool = True):
        super().__init__(params, seed=seed, prefer_native=prefer_native)
        cells = np.asarray(cells, np.float64)
        if cells.ndim != 2 or cells.shape[1] != 3:
            raise ValueError(f"cells must be [n, 3] centers in µm; got "
                             f"shape {cells.shape}")
        if len(cells) != params.num_cells:
            raise ValueError(
                f"params.num_cells ({params.num_cells}) must equal the "
                f"provided cell count ({len(cells)}); use "
                f"params.replace(num_cells=...)")
        lo, hi = params.cell_r, params.bound - params.cell_r
        if np.any(cells < lo) or np.any(cells > hi):
            raise ValueError(
                f"every cell center must lie in [{lo:g}, {hi:g}] µm per "
                f"axis (sphere fully inside the box)")
        self._custom_cells = cells

    def init_cells(self) -> np.ndarray:
        return self._custom_cells.copy()


def load_cells_csv(path: str) -> np.ndarray:
    """Cell centers from ``x,y,z`` rows (µm, one cell per line;
    '#'-comment lines skipped)."""
    cells = np.loadtxt(path, delimiter=",", comments="#", ndmin=2)
    if cells.shape[1] != 3:
        raise ValueError(f"{path}: expected 3 columns (x,y,z µm), got "
                         f"{cells.shape[1]}")
    return cells


def save_scene(scene: Scene, path: str) -> str:
    """Archive a populated Scene to ``.npz`` (arrays verbatim + the
    params repr for a mismatch check at load)."""
    np.savez_compressed(
        path, cells=scene.cells, mnps=scene.mnps, waters=scene.waters,
        lookup_table=scene.lookup_table,
        num_intra_mnps=np.int64(scene.num_intra_mnps),
        params_repr=np.bytes_(repr(scene.params).encode()))
    return path


def load_scene(path: str, params: Params,
               strict_params: bool = True) -> Scene:
    """Rebuild the exact Scene from :func:`save_scene` output.

    ``strict_params`` (default) requires the loading params to equal the
    saving params — geometry-affecting knobs baked into the stored
    arrays (cell_r in the lookup table, border in the images, ...) would
    silently diverge otherwise.  Pass False to adopt the stored arrays
    under different *simulation* knobs deliberately (e.g. a new taucp —
    but then you own the geometry consistency)."""
    with np.load(path) as z:
        stored = bytes(z["params_repr"]).decode()
        if strict_params and stored != repr(params):
            raise ValueError(
                f"{path} was saved under different params; pass the "
                f"saving params (or strict_params=False to adopt the "
                f"stored geometry deliberately).\n  stored: {stored}\n"
                f"  given:  {params!r}")
        return Scene(params=params,
                     cells=z["cells"], mnps=z["mnps"],
                     waters=z["waters"],
                     lookup_table=z["lookup_table"],
                     num_intra_mnps=int(z["num_intra_mnps"]))
