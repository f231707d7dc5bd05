"""Multi-scale deformable attention (jnp reference implementation).

The reference's ONE native component is a CUDA extension for this op
(src/utils/dependencies/XPose/models/UniPose/ops/, SURVEY.md §2c), used by
the XPose animal-landmark path.  This is the TPU-native equivalent: a pure
jnp reference (mirroring the reference's own fallback
``ms_deform_attn_core_pytorch``, ops/functions/ms_deform_attn_func.py:41-71)
plus a fused Pallas kernel (ops/pallas/ms_deform_attn.py) validated against
it — the same kernel-vs-reference harness pattern as the reference's
ops/test.py:31-62.

Semantics: per query, M heads sample P points from each of L feature levels
at fractional locations (bilinear, zero padding, align_corners=False) and
combine them with attention weights.

Shapes:
  value:               (N, sum_l H_l*W_l, M, D)
  spatial_shapes:      ((H_0, W_0), ..., (H_{L-1}, W_{L-1}))  [static]
  sampling_locations:  (N, Lq, M, L, P, 2) in [0, 1] (x, y)
  attention_weights:   (N, Lq, M, L, P)
  output:              (N, Lq, M * D)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from canonswap_tpu.ops.grid_sample import grid_sample_2d_ref


def ms_deform_attn_ref(
    value: jax.Array,
    spatial_shapes: tuple[tuple[int, int], ...],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
) -> jax.Array:
    n, _, m, d = value.shape
    _, lq, _, L, p, _ = sampling_locations.shape

    # split per level (static indices — traced split points break under jit)
    sizes = [h * w for h, w in spatial_shapes]
    bounds = [int(x) for x in np.cumsum(sizes)[:-1]]
    splits = jnp.split(value, bounds, axis=1)

    outputs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        # (N, H*W, M, D) -> (N*M, H, W, D)
        v = splits[lvl].reshape(n, h, w, m, d)
        v = v.transpose(0, 3, 1, 2, 4).reshape(n * m, h, w, d)
        # (N, Lq, M, P, 2) -> (N*M, Lq, P, 2), to [-1, 1]
        loc = sampling_locations[:, :, :, lvl]  # (N, Lq, M, P, 2)
        grid = 2.0 * loc.transpose(0, 2, 1, 3, 4).reshape(n * m, lq, p, 2) - 1.0
        sampled = grid_sample_2d_ref(v, grid)  # (N*M, Lq, P, D)
        outputs.append(sampled)

    # (N*M, Lq, L, P, D)
    stacked = jnp.stack(outputs, axis=2)
    # weights (N, Lq, M, L, P) -> (N*M, Lq, L, P)
    wgt = attention_weights.transpose(0, 2, 1, 3, 4).reshape(n * m, lq, L, p)
    out = jnp.einsum(
        "blkd,blk->bld",
        stacked.reshape(n * m, lq, L * p, d),
        wgt.reshape(n * m, lq, L * p),
    )
    return out.reshape(n, m, lq, d).transpose(0, 2, 1, 3).reshape(n, lq, m * d)


def ms_deform_attn(
    value, spatial_shapes, sampling_locations, attention_weights,
    impl: str = "jnp",
):
    """Dispatching wrapper; impl in {"jnp", "pallas"}."""
    if impl == "pallas":
        from canonswap_tpu.ops.pallas.ms_deform_attn import (
            ms_deform_attn_pallas,
        )

        return ms_deform_attn_pallas(
            value, spatial_shapes, sampling_locations, attention_weights
        )
    return ms_deform_attn_ref(
        value, spatial_shapes, sampling_locations, attention_weights
    )
