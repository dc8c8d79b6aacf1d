"""Orbax checkpointing with the reference's best/current/periodic policy.

The reference checkpoints only the KPConv path (train_cls.py:453-470:
``current_chkp.tar`` each epoch, ``best_chkp.tar`` on new best,
``chkp_{epoch:04d}.tar`` every checkpoint_gap). Here every model gets the
same policy via orbax.

Storage format is a plain dict {params, batch_stats, opt_state, step} so
inference can restore just the model variables without knowing the
optimizer that trained them (the reference's eval has the same property:
it loads model_state_dict only, train_cls.py:429-431).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _to_tree(state: Any, save_step: int = 0) -> dict:
    return {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "save_step": save_step,  # epoch, for --resume
    }


class CheckpointManager:
    def __init__(self, directory: Path, periodic_gap: int = 50):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.periodic_gap = periodic_gap
        self._ckptr = ocp.StandardCheckpointer()

    def _path(self, name: str) -> Path:
        return self.directory / name

    def save(self, state: Any, step: int, best: bool = False,
             metric: Optional[float] = None) -> None:
        tree = jax.device_get(_to_tree(state, save_step=step))
        self._ckptr.save(self._path("current"), tree, force=True)
        if best:
            self._ckptr.save(self._path("best"), tree, force=True)
            if metric is not None:
                # sidecar (not in the orbax tree: old checkpoints stay
                # restorable) so --resume knows the bar to beat — else
                # the first resumed epoch would overwrite best_chkp
                # with a possibly worse model
                import json

                (self.directory / "best_metric.json").write_text(
                    json.dumps({"metric": float(metric),
                                "epoch": int(step)}))
        if self.periodic_gap and step and step % self.periodic_gap == 0:
            self._ckptr.save(self._path(f"step_{step:04d}"), tree, force=True)
        self._ckptr.wait_until_finished()

    def best_metric(self) -> Optional[float]:
        """The metric recorded when 'best' was last saved, if any."""
        p = self.directory / "best_metric.json"
        if not p.exists():
            return None
        import json

        return float(json.loads(p.read_text())["metric"])

    def restore(self, target: Any, name: str = "current") -> Optional[Any]:
        """Full restore into a TrainState built with the same optimizer."""
        out = self.restore_with_step(target, name)
        return out[0] if out is not None else None

    def restore_with_step(
        self, target: Any, name: str = "current"
    ) -> Optional[tuple]:
        """(state, save_step) — save_step is the epoch passed to save(),
        enabling mid-training resume (the reference restores weights only,
        train_cls.py:429-433 with the optimizer restore commented out)."""
        path = self._path(name)
        if not path.exists():
            return None
        tree = self._ckptr.restore(
            path, target=jax.device_get(_to_tree(target))
        )
        state = target.replace(
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            opt_state=tree["opt_state"],
            step=tree["step"],
        )
        return state, int(tree.get("save_step", 0))

    def restore_variables(
        self, params: Any, batch_stats: Any, name: str = "best"
    ) -> Optional[tuple]:
        """Model-variables-only restore (inference: optimizer unknown)."""
        path = self._path(name)
        if not path.exists():
            return None
        restorer = ocp.PyTreeCheckpointer()
        raw = restorer.restore(path)
        target = jax.device_get({"params": params, "batch_stats": batch_stats})
        restored = jax.tree_util.tree_map(
            lambda t, r: r, target,
            {"params": raw["params"], "batch_stats": raw["batch_stats"]},
        )
        return restored["params"], restored["batch_stats"]
