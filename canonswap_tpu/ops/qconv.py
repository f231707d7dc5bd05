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

import os

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
    256^2 is a wash for the XLA form; the Pallas fused form wins there —
    see conv2d_int8_auto)."""
    h = x.shape[1]
    cin = x.shape[-1]
    return h <= 128 and cin >= 128


def _pallas_qconv_ok(x: jax.Array, kernel: jax.Array) -> bool:
    """Shapes where the VMEM-resident fused W8A8 Pallas kernel is allowed.

    OFF by default since round 5: the round-3 wins (3.29 vs 4.24 bf16 at
    256^2/128ch) no longer reproduce — the round-5 probe campaign measured
    the Pallas form LOSING to the plain XLA W8A8 conv at every routed shape
    (tools/profile_r5.jsonl: 256^2 128->512 9.33 vs 5.64; 256^2 128->128
    3.7 vs 2.65; 128^2 512->256 4.36 vs 3.22, B=16 scan-slope).  The kernel
    and its parity tests remain; set CANONSWAP_PALLAS_QCONV=1 to re-enable
    if a future toolchain shifts the balance back."""
    if os.environ.get("CANONSWAP_PALLAS_QCONV", "0") != "1":
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    kh, kw = kernel.shape[0], kernel.shape[1]
    h, w = x.shape[1], x.shape[2]
    cin, cout = kernel.shape[2], kernel.shape[3]
    return (
        h >= 128 and w >= 128
        # Mosaic DMA slices need 128-lane alignment on the channel dim
        and cin % 128 == 0 and cout % 128 == 0
        and kh % 2 == 1 and kw % 2 == 1 and kh <= 7 and kw <= 7
    )


def conv2d_int8_auto(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Best int8 stride-1 SAME conv for the shape: the fused Pallas W8A8
    kernel where its quant-traffic fusion wins (>=128^2, 128-aligned
    channels), the XLA W8A8 form at small MXU-bound shapes, exact bf16
    where quantization can't win."""
    if _pallas_qconv_ok(x, kernel):
        from canonswap_tpu.ops.pallas.qconv import qconv2d_pallas

        return qconv2d_pallas(x, kernel, bias)
    if int8_worthwhile(x):
        return conv2d_w8a8(x, kernel, bias)
    y = lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), "SAME", dimension_numbers=_DN_2D
    )
    return y + bias.astype(x.dtype) if bias is not None else y
