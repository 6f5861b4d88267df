from .dipole import (FIELD_SCALE, dipole_bz, dipole_bz_grad,
                     dipole_bz_hessian, dipole_bz_masked, total_field_masked)
from .expansion import (NearField, build, default_travel_bound, evaluate,
                        validate_near_k)
from .grid import FieldGrid, build_grid, query as query_grid

__all__ = [
    "FIELD_SCALE", "dipole_bz", "dipole_bz_grad", "dipole_bz_hessian",
    "dipole_bz_masked", "total_field_masked", "NearField", "build",
    "default_travel_bound", "evaluate", "validate_near_k",
    "FieldGrid", "build_grid", "query_grid",
]
