from . import pallas_engine, reference_engine
from .sim import SimulationRunner

__all__ = ["pallas_engine", "reference_engine", "SimulationRunner"]
