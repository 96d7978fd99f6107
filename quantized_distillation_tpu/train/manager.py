"""Experiment manager: checkpointing + run registry.

Re-designs the reference's ``model_manager.py`` (``ModelManager``): a small
persistent registry mapping model name → checkpoint + the list of training
runs executed on it (function, kwargs, results), supporting reload-and-
continue. The torch.save pickle store becomes:

- **orbax** checkpoints of the full train state (params + optimizer state +
  codebooks + step) — multi-host-safe, async-capable, the TPU-native way to
  persist sharded pytrees, and
- a human-readable ``registry.json`` ledger of models and runs (the
  reference's ``get_num_training_runs`` / run-metadata behavior).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, List, Optional

import jax
import orbax.checkpoint as ocp

PyTree = Any


class ExperimentManager:
    """name → (checkpoints, run ledger) under a root directory."""

    def __init__(self, root: str):
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)
        self._registry_path = os.path.join(self.root, "registry.json")
        self._registry = self._load_registry()

    # ---- registry ----
    def _load_registry(self) -> Dict:
        if os.path.exists(self._registry_path):
            with open(self._registry_path) as f:
                return json.load(f)
        return {"models": {}}

    def _flush(self) -> None:
        tmp = self._registry_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self._registry, f, indent=2, default=str)
        os.replace(tmp, self._registry_path)

    def add_new_model(self, name: str, config: Optional[Dict] = None) -> None:
        """Register a model (reference: ModelManager.add_new_model)."""
        if name in self._registry["models"]:
            raise ValueError(f"model {name!r} already registered")
        self._registry["models"][name] = {
            "created": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "config": config or {},
            "runs": [],
            "latest_step": None,
        }
        self._flush()

    def has_model(self, name: str) -> bool:
        return name in self._registry["models"]

    def list_models(self) -> List[str]:
        return sorted(self._registry["models"])

    def record_run(
        self, name: str, fn: str, kwargs: Dict, results: Optional[Dict] = None
    ) -> None:
        """Append a training-run record (reference: ModelManager.train_model
        bookkeeping)."""
        self._registry["models"][name]["runs"].append(
            {
                "fn": fn,
                "kwargs": kwargs,
                "results": results or {},
                "time": time.strftime("%Y-%m-%dT%H:%M:%S"),
            }
        )
        self._flush()

    def get_runs(self, name: str) -> List[Dict]:
        return list(self._registry["models"][name]["runs"])

    def num_training_runs(self, name: str) -> int:
        return len(self._registry["models"][name]["runs"])

    def get_config(self, name: str) -> Dict:
        return dict(self._registry["models"][name]["config"])

    def update_config(self, name: str, config: Dict) -> None:
        """Re-register a model's config (e.g. a driver re-run with changed
        flags that chose to retrain rather than resume)."""
        self._registry["models"][name]["config"] = dict(config)
        self._flush()

    def resume_or_register(
        self,
        name: str,
        config: Dict,
        volatile: tuple = ("workdir", "quick"),
    ) -> bool:
        """True iff a checkpoint trained under the SAME config exists (the
        caller should :meth:`restore` it); otherwise (re)registers
        ``config`` and returns False (the caller should train).

        The reference's ModelManager resumed purely by name, which silently
        reuses a checkpoint trained under different data/size/schedule
        flags (observed poisoning a distillation run — BASELINE round 4).
        ``volatile`` keys (paths, smoke-run switches) are ignored in the
        comparison.
        """
        cur = {k: v for k, v in config.items() if k not in volatile}
        if self.has_model(name):
            stored = {
                k: v for k, v in self.get_config(name).items()
                if k not in volatile
            }
            if self.latest_step(name) and stored == cur:
                return True
            if stored != cur:
                print(
                    f"[manager] config changed for {name!r}; retraining "
                    "(stale checkpoint ignored)"
                )
                # Drop the stale pointer NOW: if the retrain is interrupted
                # before its first save, the next invocation would otherwise
                # see stored==cur plus the old latest_step and silently
                # restore a checkpoint trained under the OLD config — the
                # exact poisoning this API exists to prevent.
                self._registry["models"][name]["latest_step"] = None
            self.update_config(name, config)
            return False
        self.add_new_model(name, config)
        return False

    # ---- checkpoints ----
    def _ckpt_dir(self, name: str) -> str:
        return os.path.join(self.root, name, "checkpoints")

    def save(self, name: str, state: PyTree, step: int) -> None:
        """Checkpoint a (possibly sharded) train-state pytree at ``step``."""
        if name not in self._registry["models"]:
            raise KeyError(f"unknown model {name!r}; call add_new_model first")
        path = os.path.join(self._ckpt_dir(name), str(step))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
        self._registry["models"][name]["latest_step"] = step
        self._flush()

    def latest_step(self, name: str) -> Optional[int]:
        return self._registry["models"][name].get("latest_step")

    def restore(
        self, name: str, template: PyTree, step: Optional[int] = None
    ) -> PyTree:
        """Restore a checkpoint into the structure of ``template``.

        ``template`` supplies shapes/dtypes/shardings (abstract or concrete);
        the reference analog is load_model_state_dict + optimizer reload.
        """
        if step is None:
            step = self.latest_step(name)
        if step is None:
            raise FileNotFoundError(f"no checkpoint for model {name!r}")
        path = os.path.join(self._ckpt_dir(name), str(step))
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template)
        return ocp.StandardCheckpointer().restore(path, abstract)
