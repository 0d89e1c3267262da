"""Training checkpoint / resume.

No full-model counterpart in the reference (SURVEY §5.4 — skrec only
checkpoints BERT4Rec via TF Estimator and caches derived dataset artifacts).
Here every JAX model gets resumable training: params + optimizer state are
saved with orbax (async-safe, atomic), and the scalar trainer state (epoch,
early-stopping counter/best) rides along as a pickle sidecar. Data order
stays deterministic because every epoch's PRNG key is derived by
``fold_in(seed, epoch)``, so resuming at epoch k reproduces the exact
remaining schedule.
"""
import os
import pickle
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

__all__ = ["Checkpointer"]


class Checkpointer:
    def __init__(self, directory: str, keep: int = 2):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        assert keep >= 1, "keep must be >= 1 (steps[:-0] would retain all)"
        self._keep = keep
        self._ckpt = ocp.StandardCheckpointer()

    def _step_dir(self, step: int) -> str:
        return os.path.join(self._dir, f"step_{step:08d}")

    def save(self, step: int, state: Any, extra: Optional[Dict] = None) -> None:
        """state: any pytree (params/opt_state/...); extra: picklable dict."""
        path = self._step_dir(step)
        self._ckpt.save(path, state, force=True)
        self._ckpt.wait_until_finished()
        if extra is not None:
            # sidecar lives NEXT to the orbax dir (orbax finalizes the dir
            # itself via atomic rename); tmp + rename so a crash mid-write
            # never leaves a truncated sidecar that blocks resume
            tmp = path + ".extra.pkl.tmp"
            with open(tmp, "wb") as f:
                pickle.dump(extra, f)
            os.replace(tmp, path + ".extra.pkl")
        self._gc()

    def _steps(self):
        out = []
        for name in os.listdir(self._dir):
            if name.startswith("step_") and not name.endswith(".extra.pkl"):
                try:
                    out.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return sorted(out)

    def _gc(self):
        import shutil
        steps = self._steps()
        for step in steps[: -self._keep]:
            path = self._step_dir(step)
            shutil.rmtree(path, ignore_errors=True)
            try:
                os.remove(path + ".extra.pkl")
            except OSError:
                pass

    def latest_step(self) -> Optional[int]:
        steps = self._steps()
        return steps[-1] if steps else None

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Tuple[Any, Dict, Optional[int]]:
        """Returns (state, extra, step); (template, {}, None) if nothing saved."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return state_template, {}, None
        path = self._step_dir(step)
        state = self._ckpt.restore(path, state_template)
        extra_path = path + ".extra.pkl"
        extra = {}
        if os.path.exists(extra_path):
            try:
                with open(extra_path, "rb") as f:
                    extra = pickle.load(f)
            except Exception:  # corrupt sidecar from a pre-fix crash:
                extra = {}     # resume with params only (early-stop resets)
        return state, extra, step
