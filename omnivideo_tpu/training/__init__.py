from .checkpoint import CheckpointManager
from .dataset import (
    OmniVideoDataset,
    PadSpec,
    PrefetchLoader,
    collate,
    data_loader,
    make_dummy_dataset,
)
from .trainer import (
    TrainConfig,
    TrainState,
    init_train_state,
    make_optimizer,
    make_train_step,
    make_unified_train_step,
)

__all__ = [
    "TrainConfig",
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "make_unified_train_step",
    "init_train_state",
    "CheckpointManager",
    "OmniVideoDataset",
    "PadSpec",
    "collate",
    "data_loader",
    "PrefetchLoader",
    "make_dummy_dataset",
]
