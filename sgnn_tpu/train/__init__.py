from .trainer import SampleTrainer, TrainReport
from .engines import ENGINES, EngineSpec, run_engine, engine_from_config

__all__ = [
    "SampleTrainer",
    "TrainReport",
    "ENGINES",
    "EngineSpec",
    "run_engine",
    "engine_from_config",
]
