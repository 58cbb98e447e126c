from .timing import PhaseTimer, Timer
from .logging import get_logger

__all__ = ["PhaseTimer", "Timer", "get_logger"]
