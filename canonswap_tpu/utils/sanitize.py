"""Numeric sanitizers: fail-fast NaN/inf gates on pipeline outputs.

The jitted compute path is pure by construction; this guards the seams
(weights import, host <-> device boundaries) the way the reference fails
fast on bad inputs (face_analysis.py:45).  Wired behind the ``debug_nans``
flag (CLI ``--debug-nans``), which also turns on ``jax_debug_nans`` so the
failing *primitive* is reported, not just the failing batch.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def enable_debug_nans() -> None:
    """Turn on JAX's per-primitive NaN checker (re-runs the offending op
    un-jitted and points at it; slows execution — debug only)."""
    jax.config.update("jax_debug_nans", True)


def assert_finite(tree: Any, where: str = "output") -> Any:
    """Raise FloatingPointError if any floating leaf of ``tree`` contains a
    NaN/inf.  Fetches to host; call only at batch boundaries."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(leaf)
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        if not np.isfinite(arr.astype(np.float32)).all():
            n = int((~np.isfinite(arr.astype(np.float32))).sum())
            bad.append(f"{jax.tree_util.keystr(path)}: {n}/{arr.size} bad")
    if bad:
        raise FloatingPointError(
            f"non-finite values in {where}: " + "; ".join(bad))
    return tree


def checksum_finite(tree: Any) -> jax.Array:
    """On-device scalar that is NaN iff any floating leaf has a NaN/inf —
    a one-float transfer gate for hot loops (bench.py's assert style)."""
    leaves = [
        jnp.sum(jnp.where(jnp.isfinite(x.astype(jnp.float32)), 0.0,
                          jnp.nan))
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.zeros(())
    return jnp.sum(jnp.stack(leaves))
