from . import decompose, pallas_engine, reference_engine
from .sim import SimulationRunner

__all__ = ["decompose", "pallas_engine", "reference_engine",
           "SimulationRunner"]
