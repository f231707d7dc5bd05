"""Pallas TPU kernel: trilinear grid sample as MXU one-hot matmuls.

XLA's row gather is row-count-bound (~26-58M rows/s regardless of row
width — tools/exp_warp2.py), which makes the warp the second-largest stage
of the swap step (2 sites x ~39 ms at CANONICAL B=16).  This kernel removes
the gather entirely, the same way ``ops/pallas/ms_deform_attn.py`` does:
turn the data-dependent read into systolic-array work.

Formulation (exact trilinear, zero padding, align_corners=False — the
``F.grid_sample`` semantics of reference ``src/modules/warping_network.py:47``
and ``src/modules/dense_motion.py:50``):

  1. The volume is z-packed once in XLA: slab[b, y*W+x, zi*C+c] — every
     depth slice side by side on the channel axis.
  2. Per (batch, point-block) program, the xy-bilinear one-hot matrix
     (P x H*W; 4 weighted taps per row) is built on the VPU directly in
     2D — per-column y/x indices come from an iota divmod, so no 3D
     intermediate ever exists (Mosaic cannot shape-cast minor dims).
     Out-of-bounds taps drop out naturally: a comparison against a
     missing column index is never true = grid_sample zero padding.
  3. ONE MXU matmul (P x HW) @ (HW x D*C) samples ALL depth slices at the
     point's xy location with full 512-lane MXU fill.
  4. The trilinear z-mix is an elementwise 2-tap mask over the (P, D*C)
     samples followed by a (D*C x C) 0/1 group-sum matmul — again no
     reshape, and the second matmul is noise-sized.

Numerics match ``ops.grid_sample.grid_sample_3d_ref`` to the matmul
dtype's tolerance (tests/test_warp_pallas.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _unnormalize(coord, size):
    return ((coord + 1.0) * size - 1.0) * 0.5


def _kernel(gx_ref, gy_ref, gz_ref, slab_ref, out_ref, *, d, h, w, c):
    """gx/gy/gz_ref: (1, 1, P, 1) f32 normalized coords (trailing singleton
    so each block is a native (P, 1) column vector — no transpose needed to
    broadcast per-point scalars across the HW lane axis).
    slab_ref: (1, HW, D*C).  out_ref: (1, P, C)."""
    x = _unnormalize(gx_ref[0, 0], w)  # (P, 1) f32
    y = _unnormalize(gy_ref[0, 0], h)
    z = _unnormalize(gz_ref[0, 0], d)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx = x - x0
    fy = y - y0
    fz = z - z0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)
    p = x.shape[0]

    # (P, HW) bilinear one-hot, built without any 3D intermediate
    col = jax.lax.broadcasted_iota(jnp.int32, (p, h * w), 1)
    yi = col // w
    xi = col - yi * w
    wy = jnp.where(yi == y0i, 1.0 - fy, 0.0) + jnp.where(
        yi == y0i + 1, fy, 0.0
    )
    wx = jnp.where(xi == x0i, 1.0 - fx, 0.0) + jnp.where(
        xi == x0i + 1, fx, 0.0
    )
    onehot = wy * wx  # (P, HW)

    s = jax.lax.dot_general(
        onehot.astype(slab_ref.dtype),
        slab_ref[0],
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (P, D*C) xy-bilinear samples at every depth

    # z-mix: mask the two z taps elementwise, then group-sum depth slices
    # with a constant (D*C, C) selector matmul (no reshape — Mosaic rule)
    colz = jax.lax.broadcasted_iota(jnp.int32, (p, d * c), 1)
    zi = colz // c
    zw = jnp.where(zi == z0i, 1.0 - fz, 0.0) + jnp.where(
        zi == z0i + 1, fz, 0.0
    )  # (P, D*C)
    sz = s * zw
    rowj = jax.lax.broadcasted_iota(jnp.int32, (d * c, c), 0)
    colc = jax.lax.broadcasted_iota(jnp.int32, (d * c, c), 1)
    gsel = (rowj - (rowj // c) * c == colc).astype(jnp.float32)
    out = jax.lax.dot_general(
        sz, gsel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (P, C)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "c", "pblk", "interpret")
)
def _run(gx, gy, gz, slab, h, w, c, pblk, interpret):
    b, ptot = gx.shape
    hw = slab.shape[1]
    dc = slab.shape[2]
    d = dc // c
    nb = ptot // pblk
    kern = functools.partial(_kernel, d=d, h=h, w=w, c=c)
    g4 = lambda a: a.reshape(b, nb, pblk, 1)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 1, pblk, 1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, pblk, 1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, pblk, 1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hw, dc), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, pblk, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ptot, c), slab.dtype),
        interpret=interpret,
    )(g4(gx), g4(gy), g4(gz), slab)


def grid_sample_3d_onehot(
    vol: jax.Array,
    grid: jax.Array,
    *,
    pblk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Exact trilinear grid sample via one-hot MXU matmuls.

    vol: (B, D, H, W, C); grid: (B, Do, Ho, Wo, 3) with xyz in [-1, 1].
    Returns (B, Do, Ho, Wo, C).  Equivalent to ``grid_sample_3d_ref``.
    """
    b, d, h, w, c = vol.shape
    out_shape = grid.shape[:-1]
    # z-packed slab: (B, H*W, D*C), built with one transpose (bandwidth)
    slab = vol.transpose(0, 2, 3, 1, 4).reshape(b, h * w, d * c)
    g = grid.reshape(b, -1, 3).astype(jnp.float32)
    ptot = g.shape[1]
    pb = min(pblk, ptot)
    while ptot % pb:
        pb -= 1
    out = _run(g[..., 0], g[..., 1], g[..., 2], slab, h, w, c, pb, interpret)
    return out.reshape(*out_shape, c)
