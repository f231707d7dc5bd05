"""2D convolution re-formulations for MXU-hostile channel shapes.

A SAME kh x kw conv to ONE output channel (the dense-motion occlusion head,
reference src/modules/dense_motion.py:24,99) runs at 1/128 MXU output fill
as written.  Exact identity:

    out[p] = sum_t  (x @ K_t)[p + delta_t]

i.e. a pointwise (1x1) conv to the kh*kw tap channels — a full-fill
(HW, Cin) @ (Cin, kh*kw) matmul — followed by a zero-FLOP shifted sum over
the taps.  Measured 9.2 -> 1.8 ms/16f at the CANONICAL occlusion shape
(tools/profile_r5.jsonl occl_*).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN_2D = ("NHWC", "HWIO", "NHWC")


def conv2d_cout1_shiftsum(
    x: jax.Array, kernel: jax.Array, bias: jax.Array | None = None
) -> jax.Array:
    """Exact SAME stride-1 2D conv for Cout == 1, zero padding.

    x: (B, H, W, Cin); kernel: (kh, kw, Cin, 1) — nn.Conv layout, so
    converted checkpoints are untouched.  Returns (B, H, W, 1).
    """
    kh, kw, cin, cout = kernel.shape
    if cout != 1:
        raise ValueError(f"conv2d_cout1_shiftsum expects Cout == 1, got {cout}")
    b, h, w, _ = x.shape
    # taps into channels: (1, 1, Cin, kh*kw), tap index t = dy*kw + dx
    kp = kernel.transpose(2, 0, 1, 3).reshape(1, 1, cin, kh * kw)
    y = lax.conv_general_dilated(
        x, kp, (1, 1), "VALID", dimension_numbers=_DN_2D
    )  # (B, H, W, kh*kw)
    py, px = kh // 2, kw // 2
    yp = jnp.pad(y, ((0, 0), (py, py), (px, px), (0, 0)))
    out = None
    for t in range(kh * kw):
        dy, dx = t // kw, t % kw
        term = yp[:, dy : dy + h, dx : dx + w, t]
        out = term if out is None else out + term
    out = out[..., None]
    if bias is not None:
        out = out + bias
    return out
