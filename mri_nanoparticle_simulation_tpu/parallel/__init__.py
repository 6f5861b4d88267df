from .ensemble import build_trial_scenes, make_ensemble_sprint_fn, run_ensemble
from .sharding import (WALKER_AXIS, make_sharded_sprint_fn, make_walker_mesh,
                       run_simulation_sharded)

__all__ = [
    "build_trial_scenes", "make_ensemble_sprint_fn", "run_ensemble",
    "WALKER_AXIS", "make_sharded_sprint_fn", "make_walker_mesh",
    "run_simulation_sharded",
]
