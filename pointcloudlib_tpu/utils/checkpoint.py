"""Orbax checkpointing with the reference's best/current/periodic policy.

The reference checkpoints only the KPConv path (train_cls.py:453-470:
``current_chkp.tar`` each epoch, ``best_chkp.tar`` on new best,
``chkp_{epoch:04d}.tar`` every checkpoint_gap). Here every model gets the
same policy via orbax.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: Path, periodic_gap: int = 50):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.periodic_gap = periodic_gap
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> Path:
        return self.directory / name

    def save(self, state: Any, step: int, best: bool = False) -> None:
        state = jax.device_get(state)
        self._ckptr.save(self._path("current"), state, force=True)
        if best:
            self._ckptr.save(self._path("best"), state, force=True)
        if self.periodic_gap and step and step % self.periodic_gap == 0:
            self._ckptr.save(self._path(f"step_{step:04d}"), state, force=True)
        self._ckptr.wait_until_finished()

    def restore(self, target: Any, name: str = "current") -> Optional[Any]:
        path = self._path(name)
        if not path.exists():
            return None
        return self._ckptr.restore(path, target=jax.device_get(target))
