from .functional import dropout, log_softmax, nll_loss_masked, masked_accuracy
from .layers import Dense, xavier_uniform_init
from .optim import ReferenceAdam, AdamState

__all__ = [
    "dropout",
    "log_softmax",
    "nll_loss_masked",
    "masked_accuracy",
    "Dense",
    "xavier_uniform_init",
    "ReferenceAdam",
    "AdamState",
]
