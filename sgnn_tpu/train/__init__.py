from .trainer import SampleTrainer, TrainReport
from .engines import ENGINES, EngineSpec, run_engine, engine_from_config
from .inference import InferenceServer, exact_accuracy, layerwise_inference

__all__ = [
    "SampleTrainer",
    "TrainReport",
    "ENGINES",
    "EngineSpec",
    "run_engine",
    "engine_from_config",
    "exact_accuracy",
    "layerwise_inference",
    "InferenceServer",
]
