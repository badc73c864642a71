from ast_tpu.train.optimizer import build_optimizer
from ast_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, latest_checkpoint, transfer_params,
)

__all__ = [
    "build_optimizer",
    "save_checkpoint",
    "load_checkpoint",
    "latest_checkpoint",
    "transfer_params",
]
