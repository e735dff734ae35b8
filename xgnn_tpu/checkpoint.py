"""Checkpoint / resume (Orbax).

The reference has NO checkpointing (SURVEY §5.4) — this is a deliberate
improvement, not parity: model params, optimizer state, step counter, and the
engine's RNG/epoch position are saved so training resumes exactly.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .train import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: TrainState, extra: Optional[dict] = None):
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
            "epoch": np.asarray((extra or {}).get("epoch", -1)),
        }
        self._mgr.save(step, args=ocp.args.StandardSave(payload))
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template_state: TrainState, step: Optional[int] = None):
        """Restore into the structure of ``template_state``; returns
        ``(state, extra)`` or ``(None, None)`` when no checkpoint exists."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None, None
        template = {
            "params": template_state.params,
            "opt_state": template_state.opt_state,
            "step": np.asarray(template_state.step),
            "epoch": np.asarray(-1),
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        state = TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
        )
        return state, {"epoch": int(restored["epoch"])}

    def close(self):
        self._mgr.close()
