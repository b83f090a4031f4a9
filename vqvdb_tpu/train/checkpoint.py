"""Orbax checkpointing with real resume and a durable best-val slot.

The reference saved a full-state checkpoint dict on best-val (model /
optimizer / scheduler / scaler / loss histories; ref: python/
training.py:219-233) but shipped no code path that loads it — resume was
impossible. Here both halves exist: `save` writes the complete train state
(params, optimizer state, step, best-val, histories) via orbax, and
`restore_latest` rebuilds it into a structurally-identical template so
training continues exactly where it stopped.

The rolling step pool keeps only the newest `max_to_keep` checkpoints, so
the best-validation state would normally be pruned a few epochs after it
occurs. `save_best` therefore writes to a separate `best/` slot that the
pruner never touches (the reference's best-val `torch.save` kept the best
model the same way, training.py:216-233); `export-checkpoint --best` reads
it back.
"""

from __future__ import annotations

import json
import re
import shutil
from pathlib import Path
from typing import Any, Optional, Tuple, Union

import jax
import orbax.checkpoint as ocp

PathLike = Union[str, Path]

_STEP_RE = re.compile(r"^step_(\d+)$")


class CheckpointManager:
    """Step-numbered checkpoints under a root dir, keeping the newest K."""

    def __init__(self, root: PathLike, *, max_to_keep: int = 3) -> None:
        self.root = Path(root).resolve()
        self.root.mkdir(parents=True, exist_ok=True)
        self.max_to_keep = max_to_keep
        self._ckpt = ocp.StandardCheckpointer()

    # -- save ------------------------------------------------------------
    def save(self, step: int, tree: Any, *, metrics: Optional[dict] = None) -> Path:
        path = self.root / f"step_{step:010d}"
        if path.exists():
            shutil.rmtree(path)
        self._ckpt.save(path, tree)
        self._ckpt.wait_until_finished()
        if metrics is not None:
            (path / "metrics.json").write_text(json.dumps(metrics))
        self._prune()
        return path

    def save_best(self, step: int, tree: Any, *,
                  metrics: Optional[dict] = None) -> Path:
        """Write the best-val state to the durable `best/` slot (never pruned)."""
        path = self.root / "best"
        tmp = self.root / "best.tmp"
        if tmp.exists():
            shutil.rmtree(tmp)
        self._ckpt.save(tmp, tree)
        self._ckpt.wait_until_finished()
        meta = dict(metrics or {})
        meta["step"] = int(step)
        (tmp / "metrics.json").write_text(json.dumps(meta))
        if path.exists():
            shutil.rmtree(path)
        tmp.rename(path)
        return path

    def _prune(self) -> None:
        steps = self.all_steps()
        for s in steps[: -self.max_to_keep]:
            shutil.rmtree(self.root / f"step_{s:010d}", ignore_errors=True)

    # -- restore ---------------------------------------------------------
    def all_steps(self) -> list:
        steps = []
        for p in self.root.iterdir():
            m = _STEP_RE.match(p.name)
            if m and p.is_dir():
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self) -> Optional[int]:
        steps = self.all_steps()
        return steps[-1] if steps else None

    def restore(self, step: int, template: Any) -> Any:
        """Restore checkpoint `step` into the structure of `template`."""
        path = self.root / f"step_{step:010d}"
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return self._ckpt.restore(path, abstract)

    def restore_latest(self, template: Any) -> Optional[Tuple[int, Any]]:
        step = self.latest_step()
        if step is None:
            return None
        return step, self.restore(step, template)

    def restore_best(self, template: Any) -> Optional[Tuple[int, Any]]:
        """Restore the `best/` slot. Returns (step, state) or None."""
        path = self.root / "best"
        if not path.exists():
            return None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        state = self._ckpt.restore(path, abstract)
        meta = self.read_best_metrics() or {}
        return int(meta.get("step", -1)), state

    def read_best_metrics(self) -> Optional[dict]:
        p = self.root / "best" / "metrics.json"
        return json.loads(p.read_text()) if p.exists() else None

    def read_metrics(self, step: int) -> Optional[dict]:
        p = self.root / f"step_{step:010d}" / "metrics.json"
        return json.loads(p.read_text()) if p.exists() else None
