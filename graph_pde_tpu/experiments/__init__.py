from .registry import ExperimentConfig, register, get, names
from .runners import run_experiment

__all__ = ["ExperimentConfig", "register", "get", "names",
           "run_experiment"]
