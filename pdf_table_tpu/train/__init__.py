"""Training: losses + data/tensor-parallel train steps (optax/pjit).

Reference training surface: LORE TSR fine-tuning only (SURVEY.md §2.8,
trainer/table_trainer.py:35, loss/lore_loss.py:15). This package provides
the TPU-native equivalents plus a DB-detector loss so the detection path is
trainable too (the reference ships DB losses at
model/db_net/seg_detector_loss.py:81-213 but no det trainer).
"""

from .losses import db_loss, focal_loss, reg_l1_loss
from .train_step import TrainState, make_train_step

__all__ = ["db_loss", "focal_loss", "reg_l1_loss", "TrainState",
           "make_train_step"]
