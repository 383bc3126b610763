"""Preemption-safe training checkpoints (params + opt_state + step).

The reference saves only ``model.state_dict()`` at the end of fit
(``torch_rechub/trainers/ctr_trainer.py:138``) — no optimizer state, no
mid-training resume.  For preemptible TPU VMs this module checkpoints the
FULL ``TrainState`` via orbax (atomic, versioned, ``max_to_keep`` retention)
so training resumes exactly where it stopped; falls back to msgpack files if
orbax is unavailable.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional, Tuple

import flax.serialization
import jax


class TrainCheckpointer:
    """Versioned train-state checkpoints: ``save(step, state)`` / ``restore(template)``."""

    def __init__(self, directory: str, max_to_keep: int = 3, use_orbax: bool = True):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._ocp = ocp
                self._mgr = ocp.CheckpointManager(self.directory, options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True))
            except Exception:
                self._mgr = None

    # -- orbax path ---------------------------------------------------------
    def save(self, step: int, state: Any) -> None:
        if self._mgr is not None:
            self._mgr.save(step, args=self._ocp.args.StandardSave(jax.device_get(state)))
            self._mgr.wait_until_finished()
            return
        path = os.path.join(self.directory, f"ckpt_{step}.msgpack")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(flax.serialization.to_bytes(jax.device_get(state)))
        os.replace(tmp, path)  # atomic
        self._gc()

    def latest_step(self) -> Optional[int]:
        if self._mgr is not None:
            return self._mgr.latest_step()
        steps = self._msgpack_steps()
        return max(steps) if steps else None

    def restore(self, template: Any, step: Optional[int] = None) -> Tuple[Any, Optional[int]]:
        """Restore into ``template``'s structure; returns (state, step) or (template, None)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return template, None
        if self._mgr is not None:
            restored = self._mgr.restore(step, args=self._ocp.args.StandardRestore(jax.device_get(template)))
            return restored, step
        path = os.path.join(self.directory, f"ckpt_{step}.msgpack")
        with open(path, "rb") as f:
            return flax.serialization.from_bytes(template, f.read()), step

    # -- msgpack fallback helpers ------------------------------------------
    def _msgpack_steps(self):
        out = []
        for name in os.listdir(self.directory):
            m = re.fullmatch(r"ckpt_(\d+)\.msgpack", name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _gc(self):
        steps = self._msgpack_steps()
        for s in steps[: -self.max_to_keep]:
            os.remove(os.path.join(self.directory, f"ckpt_{s}.msgpack"))
