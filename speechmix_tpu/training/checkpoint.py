"""Checkpoint save/restore with resume-from-latest and best-step retention.

The reference delegates checkpointing to HF Trainer (save_steps,
save_total_limit=2, load_best_model_at_end — train.py:300-308) and restores
with torch.load (eval.py:10).  Two backends:

- "npz" (default): flat numpy .npz pytree snapshots, one file per step —
  dependency-free, works for params + optimizer state.
  Layout: <dir>/step_<N>.npz + step_<N>.npz.meta.json
- "orbax": orbax.checkpoint StandardSave/Restore — sharding-aware (restores
  distributed arrays onto the live mesh without a host gather) and the
  multi-host-safe choice (every process participates in save/restore).
  Layout: <dir>/step_<N>/ + step_<N>.meta.json

Both share the same manager semantics: save_total_limit pruning never
deletes the best-eval_loss checkpoint, so load-best-at-end (reference
train.py:300) always has its target.
"""

from __future__ import annotations

import json
import os
import re
import shutil
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import keypath_str


def _paths_and_leaves(tree):
    flat, treedef = jax.tree_util.tree_flatten_with_path(tree)
    paths = [keypath_str(kp) for kp, _ in flat]
    return paths, [leaf for _, leaf in flat], treedef


def save_pytree_npz(path: str, tree):
    paths, leaves, _ = _paths_and_leaves(tree)
    arrays = {f"arr_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)}
    np.savez(path, __paths__=np.array(paths, dtype=object), **arrays)


# Parameters added after checkpoints were already in the wild: absent from
# an older archive, the live initialized value is kept (with a warning)
# instead of failing the whole load.  Any OTHER missing leaf still raises —
# strictness catches truncated/mismatched checkpoints.
_OPTIONAL_LEAF_SUBSTRINGS = (
    "masked_spec_embed",  # SpecAugment embedding, added round 3
)


def load_pytree_npz(path: str, like):
    data = np.load(path, allow_pickle=True)
    paths, leaves, treedef = _paths_and_leaves(like)
    saved_paths = list(data["__paths__"])
    index = {p: i for i, p in enumerate(saved_paths)}
    out = []
    for p, leaf in zip(paths, leaves):
        if p not in index:
            if any(s in p for s in _OPTIONAL_LEAF_SUBSTRINGS):
                import warnings
                warnings.warn(
                    f"checkpoint {path} predates parameter {p}; keeping "
                    f"the initialized value")
                out.append(jnp.asarray(leaf))
                continue
            raise KeyError(f"checkpoint missing parameter {p}")
        arr = data[f"arr_{index[p]}"]
        out.append(jnp.asarray(arr, dtype=getattr(leaf, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, out)


def _orbax():
    import orbax.checkpoint as ocp
    return ocp


def _is_optional_path(parts) -> bool:
    p = "/".join(parts)
    return any(s in p for s in _OPTIONAL_LEAF_SUBSTRINGS)


def _drop_optional_leaves(tree, _parts=()):
    """Copy of a nested-dict pytree without the optional leaves (for
    restoring archives that predate them)."""
    if isinstance(tree, dict):
        out = {}
        for k, v in tree.items():
            parts = _parts + (str(k),)
            if not isinstance(v, dict) and _is_optional_path(parts):
                import warnings
                warnings.warn(f"checkpoint predates parameter "
                              f"{'/'.join(parts)}; keeping the initialized "
                              f"value")
                continue
            out[k] = _drop_optional_leaves(v, parts)
        return out
    return tree


def _merge_optional_leaves(state, like, _parts=()):
    """Fill leaves missing from `state` (dropped optional ones) with the
    initialized values from `like`."""
    if isinstance(like, dict):
        return {k: (_merge_optional_leaves(state.get(k), v,
                                           _parts + (str(k),))
                    if isinstance(state, dict) and k in state
                    else v)
                for k, v in like.items()}
    return state if state is not None else like


class CheckpointManager:
    """Step-indexed checkpoints with save_total_limit pruning (the best-
    eval_loss step is never pruned) and latest/best tracking.

    backend: "npz" (default, single-host flat .npz files) or "orbax"
    (sharding-aware, multi-host-safe; requires orbax-checkpoint).
    """

    def __init__(self, directory: str, save_total_limit: int = 2,
                 backend: str = "npz"):
        if backend not in ("npz", "orbax"):
            raise ValueError(f"unknown checkpoint backend {backend!r}")
        if backend == "orbax":
            _orbax()  # fail loudly at construction, not first save
        self.directory = directory
        self.save_total_limit = save_total_limit
        self.backend = backend
        os.makedirs(directory, exist_ok=True)

    # paths -----------------------------------------------------------------
    def _step_path(self, step: int) -> str:
        suffix = ".npz" if self.backend == "npz" else ""
        return os.path.join(self.directory, f"step_{step}{suffix}")

    def _meta_path(self, step: int) -> str:
        return self._step_path(step) + ".meta.json"

    def _step_paths(self):
        pattern = (r"step_(\d+)\.npz$" if self.backend == "npz"
                   else r"step_(\d+)$")
        out = []
        for name in os.listdir(self.directory):
            m = re.match(pattern, name)
            if m:
                out.append((int(m.group(1)),
                            os.path.join(self.directory, name)))
        return sorted(out)

    def _meta(self, path):
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                return json.load(f)
        return {}

    # save/restore ----------------------------------------------------------
    def save(self, step: int, state: dict, metrics: Optional[dict] = None):
        path = self._step_path(step)
        if self.backend == "npz":
            save_pytree_npz(path, state)
        else:
            ocp = _orbax()
            abspath = os.path.abspath(path)
            if os.path.exists(abspath):
                shutil.rmtree(abspath)
            with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
                ckptr.save(abspath, state)
        meta = {"step": step, "metrics": metrics or {}}
        with open(self._meta_path(step), "w") as f:
            json.dump(meta, f)
        self._prune()
        return path

    def best_step(self, metric: str = "eval_loss") -> Optional[int]:
        """Step with the lowest recorded eval metric (reference semantics:
        load_best_model_at_end + metric_for_best_model default)."""
        best, best_val = None, float("inf")
        for step, path in self._step_paths():
            val = self._meta(path).get("metrics", {}).get(metric)
            if val is not None and val < best_val:
                best, best_val = step, val
        return best

    def _prune(self):
        best = self.best_step()
        steps = self._step_paths()
        removable = [(s, p) for s, p in steps if s != best]
        excess = len(steps) - self.save_total_limit
        for _, path in removable[:max(excess, 0)]:
            if os.path.isdir(path):
                shutil.rmtree(path)
            else:
                os.remove(path)
            if os.path.exists(path + ".meta.json"):
                os.remove(path + ".meta.json")

    def latest_step(self) -> Optional[int]:
        steps = self._step_paths()
        return steps[-1][0] if steps else None

    def restore(self, like: dict, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        path = self._step_path(step)
        if self.backend == "npz":
            state = load_pytree_npz(path, like)
        else:
            ocp = _orbax()
            with ocp.Checkpointer(ocp.StandardCheckpointHandler()) as ckptr:
                try:
                    state = ckptr.restore(os.path.abspath(path),
                                          args=ocp.args.StandardRestore(like))
                except Exception as first_err:
                    # archives saved before an optional parameter existed
                    # (same back-compat contract as load_pytree_npz):
                    # retry without the optional leaves, keep their
                    # initialized values.  If the pruned restore ALSO
                    # fails the archive is genuinely bad — surface the
                    # ORIGINAL error, not the confusing second one.
                    pruned = _drop_optional_leaves(like)
                    try:
                        state = ckptr.restore(
                            os.path.abspath(path),
                            args=ocp.args.StandardRestore(pruned))
                    except Exception:
                        raise first_err
                    state = _merge_optional_leaves(state, like)
        meta = {}
        if os.path.exists(path + ".meta.json"):
            with open(path + ".meta.json") as f:
                meta = json.load(f)
        return state, meta
