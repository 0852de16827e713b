"""Checkpoint manager (orbax-backed: atomic tmp-dir+rename saves,
process-index-0 gating, order-keyed flat leaves so restores are
independent of container round-tripping; legacy round-1 pickle
checkpoints still load).

Parity target: /root/reference/ggrt/base/checkpoint_manager.py — component-
keyed checkpoints ('pose_learner', 'gaussian', optimizers, schedulers),
step-stamped directories + a 'latest' pointer + best-by-score tracking,
max_to_keep retention, and partial loads (models without optimizer state).
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Optional

import jax
import numpy as np


def _tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


class CheckPointManager:
    def __init__(
        self,
        save_path: str,
        max_to_keep: int = 1000,
        keep_checkpoint_every_n_hours: float = 0.5,
    ):
        self.save_path = save_path
        self.max_to_keep = max_to_keep
        self.keep_every_n_hours = keep_checkpoint_every_n_hours
        self._kept: list[tuple[int, str]] = []
        self._best_score = -np.inf
        os.makedirs(save_path, exist_ok=True)
        self._manifest_path = os.path.join(save_path, "checkpoints.json")
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                manifest = json.load(f)
            self._kept = [tuple(x) for x in manifest.get("kept", [])]
            self._best_score = manifest.get("best_score", -np.inf)

    def _write_manifest(self):
        with open(self._manifest_path, "w") as f:
            json.dump({"kept": self._kept, "best_score": float(self._best_score)}, f)

    @property
    def _ckptr(self):
        if not hasattr(self, "_ckptr_inst"):
            import orbax.checkpoint as ocp

            self._ckptr_inst = ocp.PyTreeCheckpointer()
        return self._ckptr_inst

    def _save_tree(self, path: str, payload: Any):
        """Orbax-backed atomic save (tmp dir + rename), rank-0 gated.

        The train state is stored as order-keyed flat leaves so restore is
        independent of how orbax round-trips container types — the loop's
        _restore_state unflattens onto the live TrainState treedef."""
        if jax.process_index() != 0:
            return
        leaves = jax.tree_util.tree_leaves(payload["state"])
        tree = {
            "step": np.asarray(payload["step"]),
            "leaves": {f"{i:06d}": np.asarray(l) for i, l in enumerate(leaves)},
        }
        os.makedirs(path, exist_ok=True)
        target = os.path.join(os.path.abspath(path), "tree")
        if os.path.exists(target):
            shutil.rmtree(target)
        self._ckptr.save(target, tree)

    def _load_tree(self, path: str) -> Any:
        target = os.path.join(os.path.abspath(path), "tree")
        if os.path.isdir(target):
            restored = self._ckptr.restore(target)
            leaves = [restored["leaves"][k] for k in sorted(restored["leaves"])]
            return {"step": int(restored["step"]), "state": leaves}
        # Legacy pickle checkpoints (round-1 format).
        import pickle

        with open(os.path.join(path, "state.pkl"), "rb") as f:
            return pickle.load(f)

    def save(self, step: int, state: Any, score: Optional[float] = None):
        """Save the full train state; maintain 'latest' and 'best'."""
        name = f"ckpt_{step:08d}"
        path = os.path.join(self.save_path, name)
        payload = {"step": int(step), "state": state}
        self._save_tree(path, payload)

        latest = os.path.join(self.save_path, "latest")
        if os.path.islink(latest) or os.path.exists(latest):
            if os.path.isdir(latest) and not os.path.islink(latest):
                shutil.rmtree(latest)
            else:
                os.remove(latest)
        os.symlink(name, latest)

        if score is not None and score > self._best_score:
            self._best_score = float(score)
            best = os.path.join(self.save_path, "best")
            if os.path.exists(best):
                shutil.rmtree(best)
            shutil.copytree(path, best)

        self._kept.append((int(step), name))
        while len(self._kept) > self.max_to_keep:
            _, old = self._kept.pop(0)
            old_path = os.path.join(self.save_path, old)
            if os.path.exists(old_path):
                shutil.rmtree(old_path)
        self._write_manifest()

    def load(self, ckpt_path: Optional[str] = None) -> Optional[dict]:
        """Resolve explicit path -> latest -> None (train from scratch)."""
        candidates = []
        if ckpt_path:
            candidates.append(ckpt_path)
        candidates.append(os.path.join(self.save_path, "latest"))
        for c in candidates:
            if os.path.isdir(os.path.join(c, "tree")) or os.path.exists(
                os.path.join(c, "state.pkl")
            ):
                return self._load_tree(c)
        return None
