from .gnn import GNNParams, init_model, model_forward, MODEL_FAMILIES

__all__ = ["GNNParams", "init_model", "model_forward", "MODEL_FAMILIES"]
