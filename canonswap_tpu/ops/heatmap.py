"""Keypoint-to-gaussian heatmaps and normalized coordinate grids.

Re-implements the semantics of the reference's ``kp2gaussian`` /
``make_coordinate_grid`` (src/modules/util.py:17-58): coordinates are
normalized to [-1, 1] with x->width (right), y->height (down), z->depth (in),
using the align_corners-style mapping ``2 * i / (n - 1) - 1``.

Everything here is pure jnp: these are cheap fused elementwise ops on TPU and
need no custom kernel (they fuse into the surrounding program).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_coordinate_grid_3d(
    spatial_size: tuple[int, int, int], dtype=jnp.float32
) -> jax.Array:
    """Returns a (D, H, W, 3) grid of xyz coordinates in [-1, 1]."""
    d, h, w = spatial_size
    x = 2.0 * (jnp.arange(w, dtype=dtype) / (w - 1)) - 1.0
    y = 2.0 * (jnp.arange(h, dtype=dtype) / (h - 1)) - 1.0
    z = 2.0 * (jnp.arange(d, dtype=dtype) / (d - 1)) - 1.0
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1)


def kp2gaussian(
    kp: jax.Array, spatial_size: tuple[int, int, int], kp_variance: float
) -> jax.Array:
    """Gaussian blobs centred at each keypoint.

    Args:
      kp: (B, K, 3) keypoints in normalized xyz.
      spatial_size: (D, H, W).
      kp_variance: isotropic variance.

    Returns:
      (B, K, D, H, W) heatmaps.
    """
    grid = make_coordinate_grid_3d(spatial_size, kp.dtype)  # (D, H, W, 3)
    diff = grid[None, None] - kp[:, :, None, None, None, :]  # (B, K, D, H, W, 3)
    return jnp.exp(-0.5 * jnp.sum(diff**2, axis=-1) / kp_variance)
