"""Training checkpoint save/resume via orbax.

Role of reference DeepSpeed `save_checkpoint` with client_state epoch/step
tags (finetune_model.py:902-916) and `--resume_from model.pt`
(finetune_model.py:716-722) — TPU-native: orbax handles sharded arrays
natively, so FSDP-sharded params and optimizer state save/restore without
gathering.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from .trainer import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.mgr = ocp.CheckpointManager(
            Path(directory).absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: TrainState, metadata: Optional[dict] = None):
        self.mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state._asdict()),
                meta=ocp.args.JsonSave(metadata or {}),
            ),
        )
        self.mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mgr.latest_step()

    def restore(self, state_like: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.mgr.latest_step()
        assert step is not None, "no checkpoint found"
        restored = self.mgr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_like._asdict()),
            ),
        )["state"]
        return type(state_like)(**restored)
