"""Publishable single-file inference checkpoints.

Counterpart of /root/reference/tools/model_converters/publish_model.py
(strip the optimizer, save, suffix the file with its content hash): the
training checkpoints here are orbax directories carrying the full
TrainState; a *published* checkpoint is one compressed ``.npz`` holding
only params + batch_stats (flattened, '/'-joined keys) plus a tiny meta
record — portable, hashable, and loadable without an optimizer template.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np


def _flatten(tree, prefix: str) -> dict:
    import jax

    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = prefix + "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _unflatten(flat: dict, prefix: str) -> dict:
    tree: dict = {}
    for key, val in flat.items():
        if not key.startswith(prefix):
            continue
        parts = key[len(prefix):].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_published(path: str, params, batch_stats=None, meta: dict | None = None) -> str:
    """Write the published npz; returns the final (hash-suffixed) path."""
    flat = _flatten(params, "params/")
    if batch_stats:
        flat.update(_flatten(batch_stats, "batch_stats/"))
    flat["__meta__"] = np.frombuffer(
        json.dumps(meta or {}).encode(), np.uint8)
    # savez_compressed appends ".npz" to suffix-less paths; normalize first
    # so the hash/rename below operate on the file actually written.
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez_compressed(path, **flat)
    with open(path, "rb") as f:
        sha = hashlib.sha256(f.read()).hexdigest()
    final = f"{path[:-4]}-{sha[:8]}.npz"
    import os

    os.replace(path, final)
    return final


def load_published(path: str) -> tuple:
    """Returns (params, batch_stats, meta) from a published npz."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__", np.zeros(0, np.uint8))
                            ).decode() or "{}")
    return (_unflatten(flat, "params/"),
            _unflatten(flat, "batch_stats/"), meta)
