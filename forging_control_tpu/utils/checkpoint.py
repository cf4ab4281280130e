"""Checkpoint / resume.

Replaces the reference's ad-hoc persistence (``torch.save`` weights,
pickled sklearn scalers, ``Save_Network_Data`` hyperparameter bundle —
SURVEY.md section 5 "Checkpoint / resume") with one treatment: any pytree
of arrays (params, scalers, optimizer state) plus a JSON-able metadata
dict, saved via orbax when available and a flat ``.npz`` otherwise.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save(path: str, tree, meta: dict | None = None) -> None:
    """Save a pytree checkpoint to ``path`` (.npz) + ``path.meta.json``."""
    leaves, treedef = _flatten(tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, *[np.asarray(l) for l in leaves])
    with open(path + ".meta.json", "w") as f:
        json.dump({"treedef": str(treedef), "meta": meta or {}}, f)


def load(path: str, like):
    """Load into the structure of ``like`` (same treedef as at save)."""
    leaves, treedef = _flatten(like)
    with np.load(path) as f:
        arrs = [f[k] for k in f.files]
    if len(arrs) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(arrs)} leaves, template has {len(leaves)}")
    return jax.tree.unflatten(treedef, arrs)


def load_meta(path: str) -> dict:
    with open(path + ".meta.json") as f:
        return json.load(f)["meta"]


# --- orbax backend ---------------------------------------------------------
# The TPU-idiomatic checkpointing path (async-capable, multi-host aware).
# The .npz path above stays the default because it has zero deps and the
# checkpoints here are kilobytes; orbax matters when params shard over a
# mesh (orbax writes per-shard without gathering to one host).

def save_orbax(path: str, tree, meta: dict | None = None) -> None:
    """Save a pytree with orbax (directory checkpoint at ``path``)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    with open(path + ".meta.json", "w") as f:
        json.dump({"meta": meta or {}}, f)


def load_orbax(path: str, like):
    """Restore a pytree saved by :func:`save_orbax` into ``like``'s
    structure (and shardings, when ``like`` carries sharded arrays)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, jax.tree.map(
            lambda a: ocp.utils.to_shape_dtype_struct(a), like))
