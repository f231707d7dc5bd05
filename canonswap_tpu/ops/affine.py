"""Device-side batched affine warping and mask ops.

TPU replacements for the host cv2 warps and the torch mask utilities in the
reference (crop.py:21-96, 515-529): in the streaming pipeline, paste-back and
mask feathering run batched on device with fixed shapes — per-frame host cv2
calls become one XLA program over the frame batch.

cv2.warpAffine semantics: ``dst(p) = src(M^{-1} p)`` with bilinear sampling
and constant-zero border; we take M (src->dst, 2x3 or 3x3 row-major) and
sample through ``ops.grid_sample.grid_sample_2d_ref``-style gathering with
pixel (not normalized) coordinates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def warp_affine(
    img: jax.Array, M: jax.Array, out_hw: tuple[int, int]
) -> jax.Array:
    """Batched affine warp. img: (B, H, W, C); M: (B, 2, 3) or (B, 3, 3)
    mapping src->dst pixel coords.  Output (B, oh, ow, C), zeros outside."""
    B, H, W, C = img.shape
    oh, ow = out_hw
    Minv = jnp.linalg.inv(
        jnp.concatenate(
            [
                M[:, :2, :],
                jnp.broadcast_to(
                    jnp.asarray([[0.0, 0.0, 1.0]], M.dtype), (B, 1, 3)
                ),
            ],
            axis=1,
        )
    )  # (B, 3, 3)

    ys = jnp.arange(oh, dtype=img.dtype)
    xs = jnp.arange(ow, dtype=img.dtype)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (oh, ow)
    ones = jnp.ones_like(gx)
    dst = jnp.stack([gx, gy, ones], axis=-1)  # (oh, ow, 3)
    src = jnp.einsum("bij,hwj->bhwi", Minv[:, :2, :], dst)  # (B, oh, ow, 2)

    x = src[..., 0]
    y = src[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    flat = img.reshape(B, H * W, C)

    def corner(dy, dx):
        yi = y0i + dy
        xi = x0i + dx
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        idx = (yc * W + xc).reshape(B, -1)
        g = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, oh, ow, C)
        wy = fy if dy == 1 else 1.0 - fy
        wx = fx if dx == 1 else 1.0 - fx
        return g * (wy * wx * valid.astype(img.dtype))[..., None]

    return corner(0, 0) + corner(0, 1) + corner(1, 0) + corner(1, 1)


def _radial_kernel(kernel_size: int, dtype=jnp.float32) -> jax.Array:
    r = kernel_size // 2
    yy, xx = jnp.meshgrid(
        jnp.arange(kernel_size, dtype=dtype),
        jnp.arange(kernel_size, dtype=dtype),
        indexing="ij",
    )
    dist = jnp.sqrt((xx - r) ** 2 + (yy - r) ** 2)
    k = dist.max() - dist
    return k / k.sum()


def soft_erosion(
    x: jax.Array,
    kernel_size: int = 21,
    threshold: float = 0.9,
    iterations: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """Soft mask feathering (reference SoftErosion, crop.py:21-47).

    x: (B, H, W, 1) in [0,1].  Returns (soft mask, hard mask)."""
    k = _radial_kernel(kernel_size, x.dtype)[..., None, None]  # (kh,kw,1,1)

    def blur(v):
        return lax.conv_general_dilated(
            v, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    for _ in range(iterations - 1):
        x = jnp.minimum(x, blur(x))
    x = blur(x)
    hard = x >= threshold
    # below-threshold region renormalized by its own max (per batch element)
    below_max = jnp.max(
        jnp.where(hard, 0.0, x), axis=(1, 2, 3), keepdims=True
    )
    soft = jnp.where(hard, 1.0, x / jnp.maximum(below_max, 1e-6))
    return soft, hard


def dilate_mask(mask: jax.Array, kernel_size: int = 5) -> jax.Array:
    """(B, H, W, 1) binary dilation (crop.py:75-79)."""
    out = lax.reduce_window(
        mask, -jnp.inf, lax.max, (1, kernel_size, kernel_size, 1),
        (1, 1, 1, 1), "SAME",
    )
    return (out > 0).astype(mask.dtype)


def erode_mask(mask: jax.Array, kernel_size: int = 5) -> jax.Array:
    """(B, H, W, 1) binary erosion via min-pool (crop.py:81-85)."""
    out = -lax.reduce_window(
        -mask, -jnp.inf, lax.max, (1, kernel_size, kernel_size, 1),
        (1, 1, 1, 1), "SAME",
    )
    return (out > 0).astype(mask.dtype)


def smooth_mask(mask: jax.Array, kernel_size: int = 5) -> jax.Array:
    """(B, H, W, 1) box blur (crop.py:87-91)."""
    out = lax.reduce_window(
        mask, 0.0, lax.add, (1, kernel_size, kernel_size, 1),
        (1, 1, 1, 1), "SAME",
    )
    return out / (kernel_size * kernel_size)


def blend_images(fg: jax.Array, bg: jax.Array, mask: jax.Array) -> jax.Array:
    """mask*fg + (1-mask)*bg with bg bilinearly resized to fg (crop.py:93-96)."""
    from canonswap_tpu.ops.resize import bilinear_resize

    if bg.shape[1:3] != fg.shape[1:3]:
        bg = bilinear_resize(bg, fg.shape[1:3])
    return fg * mask + bg * (1.0 - mask)


def paste_back_batch(
    crops: jax.Array, M_c2o: jax.Array, originals: jax.Array, masks_ori: jax.Array
) -> jax.Array:
    """Device-batched paste-back (crop.py:523-529): warp the swapped crops to
    original-frame space and mask-blend.  All fixed shapes -> one XLA program.

    crops: (B, hc, wc, 3) float 0..1 (or 0..255); M_c2o: (B, 3, 3);
    originals/masks_ori: (B, H, W, 3/1)."""
    H, W = originals.shape[1:3]
    warped = warp_affine(crops, M_c2o, (H, W))
    return masks_ori * warped + (1.0 - masks_ori) * originals
