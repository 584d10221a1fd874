from real3dportrait_tpu.training.train_state import TrainState
from real3dportrait_tpu.training.trainer import Trainer

__all__ = ["TrainState", "Trainer"]
