from vats_tpu.checkpoint.manager import (
    CheckpointManager,
    load_checkpoint,
    save_checkpoint,
    unbox_restored,
)

__all__ = [
    "CheckpointManager",
    "load_checkpoint",
    "save_checkpoint",
    "unbox_restored",
]
