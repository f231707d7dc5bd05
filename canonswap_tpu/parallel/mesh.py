"""Device mesh / sharding layer.

The TPU-native replacement for the reference's device handling (torch
``.to('cuda:N')`` + onnxruntime provider lists, can_swap_e2e.py:49-58):
a ``jax.sharding.Mesh`` with named axes and helpers to place frame batches
and parameters.  XLA compiles the collectives (all-reduce for dp grads,
all-gather/reduce-scatter for tp) over ICI; nothing here hand-rolls comms.

Axes:
  data   — the frame axis.  Video frames are embarrassingly parallel
           (SURVEY.md §2e): this is the primary scaling axis.
  model  — optional tensor-parallel axis: output-channel sharding of the
           wide 2D convs (the 512-channel canonical-space blocks).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int | None = None,
    model: int = 1,
    *,
    devices: list | None = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (frame-batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_sharding(params, mesh: Mesh, min_channels: int = 256):
    """Sharding pytree for parameters: replicate everything except wide conv
    kernels / dense matrices, whose output-channel (last) axis is sharded over
    the 'model' axis when divisible and >= min_channels.

    With model=1 this degenerates to full replication (pure dp).
    """
    model_size = mesh.shape["model"]

    def rule(p):
        if (
            model_size > 1
            and hasattr(p, "ndim")
            and p.ndim >= 2
            and p.shape[-1] >= min_channels
            and p.shape[-1] % model_size == 0
        ):
            spec = [None] * (p.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_batch(x, mesh: Mesh):
    """Place an array (or pytree) with leading batch axis across 'data'."""
    return jax.tree.map(
        lambda a: jax.device_put(a, batch_sharding(mesh)), x
    )
