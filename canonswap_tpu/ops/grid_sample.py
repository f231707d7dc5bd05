"""Trilinear / bilinear grid sampling (the warp primitive).

TPU-native re-implementation of the sampling semantics the reference relies on
(``F.grid_sample(..., align_corners=False)``, zero padding, trilinear/bilinear
interpolation; see reference ``src/modules/warping_network.py:47`` and
``src/modules/dense_motion.py:50``).

Layout: channels-last.  Volumes are (B, D, H, W, C); 3D grids are
(B, Do, Ho, Wo, 3) with grid[..., 0] = x (width axis), 1 = y (height),
2 = z (depth), all normalized to [-1, 1].

``grid_sample_3d_packed`` (one corner-packed row gather per point) is the
production path.  A Pallas VMEM-resident gather kernel was designed and
attempted, but Mosaic's ``tpu.dynamic_gather`` is unusable on this toolchain
(sublane-axis gathers crash the backend compiler; lane-axis gathers are
limited to 128 lanes, too narrow for a volume-sized row gather), and XLA's
row gather is row-count-bound at ~75M rows/s regardless of row width — so
the packed single-gather formulation is the measured optimum (42.6 ms vs
99.9 ms flat for B=16 CANONICAL shapes; tools/exp_warp.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    """Map [-1, 1] -> pixel coordinates, align_corners=False convention."""
    return ((coord + 1.0) * size - 1.0) * 0.5


def grid_sample_3d_ref(vol: jax.Array, grid: jax.Array) -> jax.Array:
    """Pure-jnp trilinear grid sample with zero padding.

    Args:
      vol: (B, D, H, W, C) feature volume.
      grid: (B, Do, Ho, Wo, 3) sample coordinates, xyz in [-1, 1].

    Returns:
      (B, Do, Ho, Wo, C) sampled features.
    """
    B, D, H, W, C = vol.shape
    out_shape = grid.shape[:-1]

    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    z = _unnormalize(grid[..., 2], D)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx = x - x0
    fy = y - y0
    fz = z - z0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    vol_flat = vol.reshape(B, D * H * W, C)

    def corner(dz, dy, dx):
        zi = z0i + dz
        yi = y0i + dy
        xi = x0i + dx
        valid = (
            (zi >= 0) & (zi < D) & (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        )
        zc = jnp.clip(zi, 0, D - 1)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        flat = (zc * H + yc) * W + xc  # (B, Do, Ho, Wo)
        flat2 = flat.reshape(B, -1)
        gathered = jnp.take_along_axis(vol_flat, flat2[..., None], axis=1)
        gathered = gathered.reshape(*out_shape, C)
        wz = jnp.where(dz == 1, fz, 1.0 - fz)
        wy = jnp.where(dy == 1, fy, 1.0 - fy)
        wx = jnp.where(dx == 1, fx, 1.0 - fx)
        wgt = (wz * wy * wx) * valid.astype(vol.dtype)
        return gathered * wgt[..., None]

    out = corner(0, 0, 0)
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                if (dz, dy, dx) == (0, 0, 0):
                    continue
                out = out + corner(dz, dy, dx)
    return out


def grid_sample_2d_ref(img: jax.Array, grid: jax.Array) -> jax.Array:
    """Pure-jnp bilinear grid sample with zero padding, align_corners=False.

    Args:
      img: (B, H, W, C).
      grid: (B, Ho, Wo, 2) with xy in [-1, 1].

    Returns:
      (B, Ho, Wo, C).
    """
    B, H, W, C = img.shape
    out_shape = grid.shape[:-1]

    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    img_flat = img.reshape(B, H * W, C)

    def corner(dy, dx):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        flat = (yc * W + xc).reshape(B, -1)
        gathered = jnp.take_along_axis(img_flat, flat[..., None], axis=1)
        gathered = gathered.reshape(*out_shape, C)
        wy = jnp.where(dy == 1, fy, 1.0 - fy)
        wx = jnp.where(dx == 1, fx, 1.0 - fx)
        wgt = (wy * wx) * valid.astype(img.dtype)
        return gathered * wgt[..., None]

    return corner(0, 0) + corner(0, 1) + corner(1, 0) + corner(1, 1)


def grid_sample_3d_packed(vol: jax.Array, grid: jax.Array) -> jax.Array:
    """Trilinear grid sample via corner packing: EXACT semantics of
    :func:`grid_sample_3d_ref`, one gather instead of eight.

    TPU gathers are granularity-bound: eight scattered C-wide taps per point
    read tiny rows.  Here the 8 trilinear corners are pre-packed into the
    channel axis (one shifted-slice concat, pure bandwidth), so every point
    needs a SINGLE gather of an 8C-wide row (C=32 -> 512-byte rows, the
    sweet spot), followed by a weighted within-row reduction.

    vol: (B, D, H, W, C); grid: (B, Do, Ho, Wo, 3), xyz in [-1, 1].
    """
    b, d, h, w, c = vol.shape
    out_shape = grid.shape[:-1]

    x = _unnormalize(grid[..., 0].astype(jnp.float32), w)
    y = _unnormalize(grid[..., 1].astype(jnp.float32), h)
    z = _unnormalize(grid[..., 2].astype(jnp.float32), d)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx = (x - x0).astype(vol.dtype)
    fy = (y - y0).astype(vol.dtype)
    fz = (z - z0).astype(vol.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    # packed volume over base corners (z0+1, y0+1, x0+1) in [0..D]x[0..H]x[0..W]
    vp = jnp.pad(vol, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    corners = [
        vp[:, dz : dz + d + 1, dy : dy + h + 1, dx : dx + w + 1]
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
    ]
    packed = jnp.concatenate(corners, axis=-1)  # (B, D+1, H+1, W+1, 8C)
    packed = packed.reshape(b, (d + 1) * (h + 1) * (w + 1), 8 * c)

    zc = jnp.clip(z0i + 1, 0, d)
    yc = jnp.clip(y0i + 1, 0, h)
    xc = jnp.clip(x0i + 1, 0, w)
    flat = (zc * (h + 1) + yc) * (w + 1) + xc
    rows = jnp.take_along_axis(
        packed, flat.reshape(b, -1)[..., None], axis=1
    )  # (B, P, 8C)
    # keep XLA from fusing elementwise work into the gather consumer: the
    # staged form measures 36.2 vs 42.2 ms/step (B=16 CANONICAL, v5e)
    rows = jax.lax.optimization_barrier(rows)
    rows = rows.reshape(*out_shape, 8, c)

    weights = []
    for dz in (0, 1):
        wz = fz if dz else 1.0 - fz
        vz = (z0i + dz >= 0) & (z0i + dz < d)
        for dy in (0, 1):
            wy = fy if dy else 1.0 - fy
            vy = (y0i + dy >= 0) & (y0i + dy < h)
            for dx in (0, 1):
                wx = fx if dx else 1.0 - fx
                vx = (x0i + dx >= 0) & (x0i + dx < w)
                valid = (vz & vy & vx) & (
                    (z0i + 1 == zc) & (y0i + 1 == yc) & (x0i + 1 == xc)
                )
                weights.append(wz * wy * wx * valid.astype(vol.dtype))
    wstack = jax.lax.optimization_barrier(
        jnp.stack(weights, axis=-1)
    )  # (..., 8); barrier: see above
    return jnp.einsum("...kc,...k->...c", rows, wstack)


def _axis_resample_matrix(size: int, shift: jax.Array, dtype) -> jax.Array:
    """(S, S) banded linear-resample matrix for sampling at
    ``identity_grid + shift`` along one axis.

    The identity grid is corner-aligned (2p/(S-1) - 1, util.py:41-58) while
    grid_sample unnormalizes align_corners=False, so the per-axis sample
    position is affine: t(p) = p * S/(S-1) + shift*S/2 - 0.5.  Out-of-range
    taps contribute zero (grid_sample zero padding)."""
    p = jnp.arange(size, dtype=dtype)
    t = p * (size / (size - 1.0)) + shift * (size / 2.0) - 0.5
    x0 = jnp.floor(t)
    f = t - x0
    x0i = x0.astype(jnp.int32)[:, None]
    cols = jnp.arange(size, dtype=jnp.int32)[None, :]
    return (1.0 - f)[:, None] * (cols == x0i) + f[:, None] * (cols == x0i + 1)


def translate_volume_trilinear(vol: jax.Array, shift: jax.Array) -> jax.Array:
    """Trilinear resample of (N, D, H, W, C) at a CONSTANT normalized shift:
    exactly ``grid_sample_3d_ref(vol, identity_grid + shift)`` but
    gather-free — the warp is separable per axis, so it becomes three small
    banded-matrix contractions (MXU work instead of random access).

    This is the TPU-native form of the dense-motion module's per-keypoint
    warps (reference dense_motion.py:29-53): every sparse motion is
    ``identity_grid + (kp_source_k - kp_driving_k)``.

    Args:
      vol: (N, D, H, W, C).
      shift: (N, 3) normalized xyz offsets.

    Returns (N, D, H, W, C).
    """
    n, d, h, w, c = vol.shape
    dt = vol.dtype
    wz = jax.vmap(lambda s: _axis_resample_matrix(d, s[2], dt))(shift)
    wy = jax.vmap(lambda s: _axis_resample_matrix(h, s[1], dt))(shift)
    wx = jax.vmap(lambda s: _axis_resample_matrix(w, s[0], dt))(shift)
    out = jnp.einsum("nab,nbhwc->nahwc", wz, vol)
    out = jnp.einsum("nab,ndbwc->ndawc", wy, out)
    return jnp.einsum("nab,ndhbc->ndhac", wx, out)


@functools.partial(jax.jit, static_argnames=("impl",))
def grid_sample_3d(vol: jax.Array, grid: jax.Array, impl: str = "auto") -> jax.Array:
    """Dispatching wrapper; ``impl`` in {"auto", "packed", "jnp"}."""
    if impl not in ("auto", "packed", "jnp"):
        raise ValueError(f"unknown grid_sample_3d impl: {impl!r}")
    if impl == "jnp":
        return grid_sample_3d_ref(vol, grid)
    return grid_sample_3d_packed(vol, grid)


@jax.jit
def grid_sample_2d(img: jax.Array, grid: jax.Array) -> jax.Array:
    return grid_sample_2d_ref(img, grid)
