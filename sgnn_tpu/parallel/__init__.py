from .mesh import make_mesh, default_device_count
from .dp import DataParallelTrainer, make_dp_step

__all__ = ["make_mesh", "default_device_count", "DataParallelTrainer", "make_dp_step"]
