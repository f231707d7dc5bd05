"""Dynamic W8A8 int8 convolution for the MXU.

v5e's MXU runs s8 x s8 -> s32 at ~4x the bf16 conv rate for the 512-channel
64^2 shapes that dominate the swap module and SPADE decoder (measured:
1.87 -> 0.49 ms raw, 1.17 ms with full quantize/dequant — tools/exp_int8.py).
At 256^2 the activation-quantization traffic cancels the gain, so callers
gate on spatial size (<= 128^2).

Scheme: symmetric per-output-channel weight scales + dynamic per-sample
activation scales, int32 accumulation, fused dequant epilogue.  Weights stay
bf16/f32 in the checkpoint — quantization happens at apply time inside the
jitted program (the rounding is deterministic, and XLA constant-folds
nothing since params are jit arguments; the kernel-side reduction is tiny).

This is the sanctioned speed/quality lever (flag_int8 / int8_conv config);
exact bf16 remains the default path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN_2D = ("NHWC", "HWIO", "NHWC")


def _quantize_weight(kernel: jax.Array):
    """(kh, kw, Cin, Cout) -> (int8 kernel, (Cout,) f32 scales)."""
    k32 = kernel.astype(jnp.float32)
    sw = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0 + 1e-12
    kq = jnp.clip(jnp.round(k32 / sw), -127, 127).astype(jnp.int8)
    return kq, sw


def _quantize_act(x: jax.Array):
    """(N, ..., C) -> (int8, (N,) f32 per-sample scales)."""
    x32 = x.astype(jnp.float32)
    red = tuple(range(1, x.ndim))
    sx = jnp.max(jnp.abs(x32), axis=red) / 127.0 + 1e-12
    sb = sx.reshape((-1,) + (1,) * (x.ndim - 1))
    xq = jnp.clip(jnp.round(x32 / sb), -127, 127).astype(jnp.int8)
    return xq, sx


def conv2d_w8a8(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    strides: tuple[int, int] = (1, 1),
    padding="SAME",
) -> jax.Array:
    """Drop-in int8 replacement for a SAME 2D conv; output in x.dtype."""
    kq, sw = _quantize_weight(kernel)
    xq, sx = _quantize_act(x)
    acc = lax.conv_general_dilated(
        xq, kq, strides, padding, dimension_numbers=_DN_2D,
        preferred_element_type=jnp.int32,
    )
    scale = sx[:, None, None, None] * sw[None, None, None, :]
    y = acc.astype(jnp.float32) * scale
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def int8_worthwhile(x: jax.Array) -> bool:
    """Static gate: int8 wins when the conv is MXU-bound, not
    quantize-traffic-bound (measured: 64^2/128^2 with wide channels win,
    256^2 is a wash)."""
    h = x.shape[1]
    cin = x.shape[-1]
    return h <= 128 and cin >= 128
