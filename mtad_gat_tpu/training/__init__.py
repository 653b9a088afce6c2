from mtad_gat_tpu.training.trainer import Trainer, TrainState
from mtad_gat_tpu.training.multi_entity import MultiEntityTrainer
from mtad_gat_tpu.training.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["Trainer", "TrainState", "MultiEntityTrainer", "save_checkpoint", "load_checkpoint"]
