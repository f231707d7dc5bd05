"""Checkpoint save/load for converted/trained parameter trees.

The reference is load-only (torch.load of combined_weights.pth,
can_swap_e2e.py:87-100).  Here we support both directions:

  - ``save_npz`` / ``load_npz``: single-file flat .npz of the whole tree
    (dependency-free, fast, portable) — the analogue of the single
    combined_weights.pth file.
  - ``save_orbax`` / ``load_orbax``: orbax-checkpoint directory format for
    sharded / multi-host training state.

Tree paths are flattened with '/' separators; '|' encodes dict-key slots of
the six network roots so a round-trip is exact.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for path, arr in flat.items():
        node = root
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return root


def save_npz(path: str, params) -> None:
    flat = _flatten(params)
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    np.savez(path, **flat)


def load_npz(path: str):
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    return _unflatten(flat)


def save_orbax(path: str, state) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), state, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, abstract_state=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if abstract_state is not None:
        return ckptr.restore(os.path.abspath(path), abstract_state)
    return ckptr.restore(os.path.abspath(path))


def tree_equal(a, b) -> bool:
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    return len(leaves_a) == len(leaves_b) and all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(leaves_a, leaves_b)
    )
