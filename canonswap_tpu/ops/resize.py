"""Resizing / pooling / pixel-shuffle primitives (channels-last).

Matches the torch semantics the reference depends on:
  - ``F.interpolate(mode='nearest', scale_factor=k)`` for integer k == repeat
    (UpBlock3d at util.py:143, SPADE segmap resize at util.py:297,
    nn.Upsample(scale_factor=2) in the SPADE decoder).
  - ``F.interpolate(mode='bilinear', align_corners=False)`` == half-pixel
    mapping, which is what ``jax.image.resize(method='linear')`` implements
    (Segformer logit upsample, can_swap_pipeline_e2e.py:183).
  - ``nn.AvgPool2d/3d`` with 2x2 windows (DownBlock2d/3d).
  - ``nn.PixelShuffle`` (SPADE decoder upscale head, spade_generator.py:36-39).
  - ``F.adaptive_avg_pool2d`` to (7, 7) (ArcFace, models/arcface_models.py:122).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def nearest_upsample(x: jax.Array, factors: tuple[int, ...]) -> jax.Array:
    """Integer nearest-neighbour upsample over the spatial dims.

    x: (N, *spatial, C); factors: one int per spatial dim.
    """
    for i, f in enumerate(factors):
        if f != 1:
            x = jnp.repeat(x, f, axis=1 + i)
    return x


def nearest_resize(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """torch ``F.interpolate(mode='nearest')`` for (N, H, W, C): floor mapping
    src_idx = floor(dst_idx * in/out)."""
    n, h, w, c = x.shape
    oh, ow = size
    rows = (jnp.arange(oh) * h // oh).astype(jnp.int32)
    cols = (jnp.arange(ow) * w // ow).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def bilinear_resize(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """(N, H, W, C) -> (N, size[0], size[1], C), half-pixel (align_corners=False)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="linear")


def avg_pool(x: jax.Array, window: tuple[int, ...]) -> jax.Array:
    """Average pool with stride == window over spatial dims of (N, *spatial, C)."""
    dims = (1, *window, 1)
    summed = lax.reduce_window(x, 0.0, lax.add, dims, dims, "VALID")
    return summed / jnp.prod(jnp.array(window)).astype(x.dtype)


def max_pool(x: jax.Array, window: tuple[int, ...],
             strides: tuple[int, ...] | None = None) -> jax.Array:
    """Max pool over spatial dims of (N, *spatial, C); stride defaults to
    the window (non-overlapping)."""
    dims = (1, *window, 1)
    strd = dims if strides is None else (1, *strides, 1)
    return lax.reduce_window(x, -jnp.inf, lax.max, dims, strd, "VALID")


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """(N, H, W, C*r*r) -> (N, H*r, W*r, C), matching torch's PixelShuffle
    channel ordering (out channel c reads input channel c*r*r + i*r + j)."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # (N, H, r_i, W, r_j, C)
    return x.reshape(n, h * r, w * r, c)


def adaptive_avg_pool(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """torch F.adaptive_avg_pool2d for (N, H, W, C).

    Implemented for the common case where H, W are divisible by the output
    size (ArcFace: 14x14 -> 7x7); falls back to jax.image.resize-style mean
    pooling via integral bins otherwise.
    """
    n, h, w, c = x.shape
    oh, ow = out_hw
    if h % oh == 0 and w % ow == 0:
        return avg_pool(x, (h // oh, w // ow))
    # general torch semantics: bin i covers [floor(i*H/oh), ceil((i+1)*H/oh))
    rows = [
        jnp.mean(
            x[:, (i * h) // oh : -((-(i + 1) * h) // oh), :, :], axis=1
        )
        for i in range(oh)
    ]
    x = jnp.stack(rows, axis=1)  # (N, oh, W, C)
    cols = [
        jnp.mean(
            x[:, :, (j * w) // ow : -((-(j + 1) * w) // ow), :], axis=2
        )
        for j in range(ow)
    ]
    return jnp.stack(cols, axis=2)


def volume_to_2d(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) -> (B, H, W, C*D) with torch-compatible channel order.

    torch does (B, C, D, H, W).view(B, C*D, H, W): flat channel k = c*D + d.
    Our channels-last equivalent keeps that ordering so converted 2D conv
    weights line up (used by warp_out, transfer blocks, and G3d).
    """
    b, d, h, w, c = x.shape
    x = x.transpose(0, 2, 3, 4, 1)  # (B, H, W, C, D)
    return x.reshape(b, h, w, c * d)


def volume_from_2d(x: jax.Array, depth: int) -> jax.Array:
    """Inverse of :func:`volume_to_2d`. (B, H, W, C*D) -> (B, D, H, W, C)."""
    b, h, w, cd = x.shape
    c = cd // depth
    x = x.reshape(b, h, w, c, depth)
    return x.transpose(0, 4, 1, 2, 3)


def conv3x3_on_nearest_upsample(
    seg: jax.Array, kernel: jax.Array, bias: jax.Array | None, factor: int
) -> jax.Array:
    """Exactly ``conv3x3_same(nearest_upsample(seg, (f, f)))`` computed at
    LOW resolution.

    For nearest-x f upsampling, the 3 conv taps of output phase p hit at most
    2 distinct source cells (offsets floor((p+d-1)/f) for d in 0..2), and
    taps landing on the same cell just sum their weights.  So the full-res
    conv folds into <= f^2 small per-phase convs at seg resolution plus a
    depth-to-space interleave — 2.25x (f=2) to 4x (f=4) fewer MACs than
    convolving the upsampled map (used for the SPADE mlp_shared convs on the
    upsampled segmap, reference util.py:295-299).

    seg: (B, H, W, Cin); kernel: (3, 3, Cin, Cout) SAME/zero-pad semantics.
    Returns (B, f*H, f*W, Cout).
    """
    b, h, w, cin = seg.shape
    cout = kernel.shape[-1]
    if factor == 1:
        y = lax.conv_general_dilated(
            seg, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias if bias is not None else y

    # per-phase folded 1D tap lists: [(offset, [d...]), ...]
    def phase_taps(p):
        groups: dict[int, list[int]] = {}
        for d in range(3):
            groups.setdefault((p + d - 1) // factor, []).append(d)
        return sorted(groups.items())

    segp = jnp.pad(seg, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cache: dict[tuple, jax.Array] = {}
    phases = []
    for py in range(factor):
        ty = phase_taps(py)
        for px in range(factor):
            tx = phase_taps(px)
            key = (
                tuple((o, tuple(ds)) for o, ds in ty),
                tuple((o, tuple(ds)) for o, ds in tx),
            )
            if key not in cache:
                # folded kernel (len(ty), len(tx), Cin, Cout)
                kf = jnp.stack([
                    jnp.stack([
                        sum(kernel[dy, dx] for dy in dys for dx in dxs)
                        for _, dxs in tx], axis=0)
                    for _, dys in ty], axis=0)
                oy0 = ty[0][0]   # first source offset in {-1, 0}
                ox0 = tx[0][0]
                win = segp[:, 1 + oy0 : 1 + oy0 + h + len(ty) - 1,
                           1 + ox0 : 1 + ox0 + w + len(tx) - 1]
                cache[key] = lax.conv_general_dilated(
                    win, kf, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
            phases.append(cache[key])
    # interleave: phases[py*f+px][B, Y, X, C] -> out[B, f*Y+py, f*X+px, C]
    ph = jnp.stack(phases, axis=0).reshape(factor, factor, b, h, w, cout)
    out = ph.transpose(2, 3, 0, 4, 1, 5).reshape(b, factor * h, factor * w, cout)
    return out + bias if bias is not None else out
