"""Pytree checkpointing: atomic, preemption-safe, dependency-free.

Replaces tf.train.Saver (/root/reference/train.py:190,211-218,251-252) with a
single-file npz of path-flattened leaves plus JSON metadata.  The whole train
state {params, opt_state, step} round-trips bit-exactly, giving deterministic
resume (SURVEY §5.3-5.4): data sampling is counter-based on the step, so no
separate RNG state is needed.
"""

from __future__ import annotations

import json
import os
import re
import tempfile
from typing import Any, Optional

import jax
import numpy as np

_META_KEY = "__meta__"


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(directory: str, step: int, tree: Any,
                    prefix: str = "ckpt", keep: int = 5,
                    extra_meta: Optional[dict] = None) -> str:
    """Atomically write ``<dir>/<prefix>-<step>.npz``; prune old ones."""
    os.makedirs(directory, exist_ok=True)
    flat = _flatten(tree)
    meta = {"step": int(step), "keys": list(flat.keys())}
    if extra_meta:
        meta.update(extra_meta)
    path = os.path.join(directory, f"{prefix}-{step}.npz")
    fd, tmp = tempfile.mkstemp(dir=directory, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **flat, **{_META_KEY: json.dumps(meta)})
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    _prune(directory, prefix, keep)
    return path


def _prune(directory: str, prefix: str, keep: int) -> None:
    ckpts = sorted(_list(directory, prefix))
    for _, path in ckpts[:-keep]:
        os.unlink(path)


def _list(directory: str, prefix: str) -> list[tuple[int, str]]:
    pat = re.compile(rf"^{re.escape(prefix)}-(\d+)\.npz$")
    out = []
    if not os.path.isdir(directory):
        return out
    for name in os.listdir(directory):
        m = pat.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(directory, name)))
    return out


def latest_checkpoint(directory: str, prefix: str = "ckpt") -> Optional[str]:
    ckpts = _list(directory, prefix)
    return max(ckpts)[1] if ckpts else None


def read_meta(path: str) -> dict:
    """Checkpoint JSON metadata (step, keys, plus any extra_meta such as the
    data-loader kind used for the run)."""
    with np.load(path, allow_pickle=False) as data:
        return json.loads(str(data[_META_KEY]))


def restore_checkpoint(path: str, target: Any) -> tuple[Any, int]:
    """Restore into the structure of ``target``; returns (tree, step)."""
    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data[_META_KEY]))
        paths, treedef = jax.tree_util.tree_flatten_with_path(target)
        leaves = []
        for p, leaf in paths:
            key = jax.tree_util.keystr(p)
            if key not in data:
                raise KeyError(
                    f"checkpoint {path} missing leaf {key!r} "
                    f"(saved keys: {len(meta['keys'])})")
            val = data[key]
            if val.shape != np.shape(leaf):
                raise ValueError(
                    f"shape mismatch for {key!r}: checkpoint {val.shape} "
                    f"vs target {np.shape(leaf)}")
            leaves.append(val.astype(np.asarray(leaf).dtype))
        tree = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(target), leaves)
    return tree, meta["step"]
