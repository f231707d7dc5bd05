"""StyleGAN2-style modulated convolution with demodulation and mask blending.

TPU-first re-design of the reference's ``AdaptiveSharedWeightConv2d/3d``
(src/modules/adaptive_modulate.py:73-304).  The reference materializes a
per-sample weight tensor (N, Cout, Cin, k, k) and runs a grouped conv with
groups=N — a CUDA-friendly trick that is hostile to the TPU MXU.

Here we use the algebraic identity

    conv(x, w * style_i) == conv(x * style, w)            (style per in-channel)
    demod_{n,o} = rsqrt(sum_i style_{n,i}^2 * sum_k w_{o,i,k}^2 + eps)

so the modulated path is a *single ordinary convolution* on a scaled input with
a per-(sample, out-channel) rescale — weights stay shared, the MXU sees one big
batched conv.  The blended op (mask * modulated + (1-mask) * standard) runs both
paths through ONE conv by stacking [x, x*style] on the batch axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DN_2D = ("NHWC", "HWIO", "NHWC")
_DN_3D = ("NDHWC", "DHWIO", "NDHWC")


def _demod(style: jax.Array, weight: jax.Array, spatial_dims: int, eps: float):
    """rsqrt(sum_{i,k} (w_{o,i,k} * style_{n,i})^2 + eps) -> (N, Cout)."""
    # weight layout: (*k, Cin, Cout); sum squared over kernel spatial dims.
    w2 = jnp.sum(weight**2, axis=tuple(range(spatial_dims)))  # (Cin, Cout)
    return lax.rsqrt(jnp.einsum("ni,io->no", style**2, w2) + eps)


def modulated_conv(
    x: jax.Array,
    weight: jax.Array,
    style: jax.Array,
    *,
    demodulate: bool = True,
    eps: float = 1e-8,
) -> jax.Array:
    """Modulated conv (2D or 3D inferred from rank), padding SAME, stride 1.

    Args:
      x: (N, H, W, Cin) or (N, D, H, W, Cin).
      weight: (kh, kw, Cin, Cout) or (kd, kh, kw, Cin, Cout).
      style: (N, Cin) per-input-channel modulation.
    """
    ndim = x.ndim
    sp = ndim - 2
    dn = _DN_2D if sp == 2 else _DN_3D
    style_b = style.reshape(style.shape[0], *([1] * sp), -1)
    y = lax.conv_general_dilated(
        x * style_b, weight, window_strides=(1,) * sp, padding="SAME",
        dimension_numbers=dn,
    )
    if demodulate:
        d = _demod(style, weight, sp, eps)
        y = y * d.reshape(d.shape[0], *([1] * sp), -1)
    return y


def adaptive_blend_conv(
    x: jax.Array,
    weight: jax.Array,
    style: jax.Array,
    mask: jax.Array,
    bias: jax.Array | None = None,
    *,
    eps: float = 1e-8,
    int8: bool = False,
) -> jax.Array:
    """The fused adaptive op: ``mask * out_mod + (1 - mask) * out_std``.

    ``out_std`` is the plain shared-weight conv; ``out_mod`` is the
    demodulated style conv (+ bias, matching the reference which adds bias to
    the modulated path only, adaptive_modulate.py:169-170).  Both paths share
    one conv call via batch stacking.

    Args:
      x: (N, *spatial, Cin).
      weight: (*k, Cin, Cout).
      style: (N, Cin).
      mask: (N, *spatial, 1) in [0, 1].
      bias: optional (Cout,).
    """
    N = x.shape[0]
    sp = x.ndim - 2
    dn = _DN_2D if sp == 2 else _DN_3D
    style_b = style.reshape(N, *([1] * sp), -1)
    stacked = jnp.concatenate([x, x * style_b], axis=0)
    from canonswap_tpu.ops.qconv import int8_worthwhile

    if int8 and sp == 2 and int8_worthwhile(stacked):
        # W8A8 path (ops/qconv): per-sample activation scales absorb the
        # style magnitudes of the stacked modulated half
        from canonswap_tpu.ops.qconv import conv2d_w8a8

        y = conv2d_w8a8(stacked, weight)
    else:
        y = lax.conv_general_dilated(
            stacked, weight, window_strides=(1,) * sp, padding="SAME",
            dimension_numbers=dn,
        )
    out_std, out_mod = y[:N], y[N:]
    d = _demod(style, weight, sp, eps)
    out_mod = out_mod * d.reshape(N, *([1] * sp), -1)
    if bias is not None:
        out_mod = out_mod + bias
    return mask * out_mod + (1.0 - mask) * out_std
