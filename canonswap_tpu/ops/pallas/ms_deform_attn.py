"""Pallas TPU kernel: multi-scale deformable attention.

TPU-native replacement for the reference's CUDA ms_deform_attn extension
(SURVEY.md §2c).  Random bilinear gathers are hostile to the VPU, so the
kernel reformulates the gather as an MXU matmul: per query block it builds a
sparse one-hot interpolation matrix (4 weighted taps per row) over the level's
flattened H*W axis and multiplies it with the level feature map — the classic
TPU trick that turns data-dependent gathers into systolic-array work.

One pallas_call per level (shapes per level are static); the wrapper
accumulates levels and applies the attention weights.

Numerics match ``ops.ms_deform_attn.ms_deform_attn_ref`` (see
tests/test_ms_deform_attn.py, run in interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _level_kernel(v_ref, loc_ref, w_ref, out_ref, *, hh, ww, blk, p):
    """One (batch*head, query-block) program for a single level.

    v_ref:   (HW, D) level features.
    loc_ref: (BLK, P, 2) sampling locations in [0, 1].
    w_ref:   (BLK, P) attention weights.
    out_ref: (BLK, D) weighted sampled output (this level's contribution).
    """
    loc = loc_ref[0]  # (BLK, P, 2) — drop the leading size-1 block dim
    x = loc[..., 0] * ww - 0.5  # align_corners=False pixel coords
    y = loc[..., 1] * hh - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    hw = hh * ww
    # flattened source index per corner, with zero weight when out of bounds
    col = jax.lax.broadcasted_iota(jnp.int32, (blk * p, hw), 1)

    def corner_onehot(dy, dx):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi < hh) & (xi >= 0) & (xi < ww)
        idx = jnp.clip(yi, 0, hh - 1) * ww + jnp.clip(xi, 0, ww - 1)
        wy = fy if dy == 1 else 1.0 - fy
        wx = fx if dx == 1 else 1.0 - fx
        tap = (wy * wx) * valid.astype(loc.dtype)  # (BLK, P)
        idx_f = idx.reshape(blk * p, 1)
        tap_f = tap.reshape(blk * p, 1)
        return jnp.where(col == idx_f, tap_f, 0.0)

    onehot = (
        corner_onehot(0, 0) + corner_onehot(0, 1)
        + corner_onehot(1, 0) + corner_onehot(1, 1)
    )  # (BLK*P, HW)

    sampled = jnp.dot(
        onehot, v_ref[0], preferred_element_type=jnp.float32
    )  # (BLK*P, D)
    d = sampled.shape[-1]
    sampled = sampled.reshape(blk, p, d)
    out_ref[0] = jnp.sum(sampled * w_ref[0][..., None], axis=1).astype(
        out_ref.dtype
    )


def _run_level(v, loc, w, hh, ww, blk, interpret):
    """v: (NM, HW, D); loc: (NM, Lq, P, 2); w: (NM, Lq, P) -> (NM, Lq, D)."""
    nm, lq, p, _ = loc.shape
    d = v.shape[-1]
    grid = (nm, pl.cdiv(lq, blk))
    kernel = functools.partial(_level_kernel, hh=hh, ww=ww, blk=blk, p=p)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, hh * ww, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, p, 2), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blk, p), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, blk, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nm, lq, d), v.dtype),
        interpret=interpret,
    )(v, loc, w)


def ms_deform_attn_pallas(
    value: jax.Array,
    spatial_shapes: tuple[tuple[int, int], ...],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    *,
    block_q: int = 64,
    interpret: bool = False,
) -> jax.Array:
    """Same contract as ops.ms_deform_attn.ms_deform_attn_ref."""
    n, _, m, d = value.shape
    _, lq, _, L, p, _ = sampling_locations.shape

    sizes = [h * w for h, w in spatial_shapes]
    splits = jnp.split(value, jnp.cumsum(jnp.asarray(sizes))[:-1], axis=1)

    blk = min(block_q, lq)
    pad_q = (-lq) % blk
    out = jnp.zeros((n * m, lq + pad_q, d), jnp.float32)

    for lvl, (hh, wwd) in enumerate(spatial_shapes):
        v = splits[lvl].reshape(n, hh, wwd, m, d)
        v = v.transpose(0, 3, 1, 2, 4).reshape(n * m, hh * wwd, d)
        loc = sampling_locations[:, :, :, lvl]
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(n * m, lq, p, 2)
        w = attention_weights[:, :, :, lvl]
        w = w.transpose(0, 2, 1, 3).reshape(n * m, lq, p)
        if pad_q:
            loc = jnp.pad(loc, ((0, 0), (0, pad_q), (0, 0), (0, 0)))
            w = jnp.pad(w, ((0, 0), (0, pad_q), (0, 0)))
        out = out + _run_level(v, loc, w, hh, wwd, blk, interpret)

    out = out[:, :lq]
    return out.reshape(n, m, lq, d).transpose(0, 2, 1, 3).reshape(n, lq, m * d)
