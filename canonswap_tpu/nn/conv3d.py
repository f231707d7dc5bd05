"""Conv3D expressed as depth-decomposed 2D convolutions.

XLA:TPU maps 2D convolutions onto the MXU far more reliably than 3D ones.
A stride-1 SAME kd x kh x kw conv over (B, D, H, W, C) decomposes exactly:

    out[:, d] = sum_t conv2d(x[:, d + t - pad_d], W[t])

i.e. kd ordinary 2D convs over the depth-flattened batch (B*D, H, W, C)
with depth-shifted accumulation.  Parameters stay in DHWIO layout so the
torch->jax converter and checkpoints are unchanged.

``Conv3D`` is a drop-in replacement for ``nn.Conv`` with a 3-tuple kernel
(stride 1, SAME); the ``impl`` flag selects the direct lax conv or the
decomposition (benchmarked on device; see bench notes in SURVEY §7 step 9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_DN_2D = ("NHWC", "HWIO", "NHWC")

# experiment hook: force one implementation everywhere ("auto" heuristics are
# tuned from tools/profile_stages.py measurements on the real chip)
_IMPL_OVERRIDE: str | None = None


def set_impl_override(impl: str | None) -> None:
    global _IMPL_OVERRIDE
    _IMPL_OVERRIDE = impl


def conv3d_decomposed(x: jax.Array, kernel: jax.Array,
                      bias: jax.Array | None = None) -> jax.Array:
    """x: (B, D, H, W, Cin); kernel: (kd, kh, kw, Cin, Cout); SAME, stride 1."""
    b, d, h, w, cin = x.shape
    kd = kernel.shape[0]
    pad = kd // 2
    cout = kernel.shape[-1]

    # zero-pad depth once; each tap is a contiguous depth slice
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    out = None
    for t in range(kd):
        sl = xp[:, t : t + d]  # (B, D, H, W, Cin)
        y = lax.conv_general_dilated(
            sl.reshape(b * d, h, w, cin), kernel[t], (1, 1), "SAME",
            dimension_numbers=_DN_2D,
        )
        out = y if out is None else out + y
    out = out.reshape(b, d, h, w, cout)
    if bias is not None:
        out = out + bias
    return out


def conv3d_stacked(x: jax.Array, kernel: jax.Array,
                   bias: jax.Array | None = None) -> jax.Array:
    """Depth taps packed into the channel axis: ONE 2D conv with kd*Cin
    input channels instead of kd separate convs.  Identical numerics;
    fills the MXU much better for small channel counts (the 32-channel
    volume resblocks)."""
    b, d, h, w, cin = x.shape
    kd = kernel.shape[0]
    pad = kd // 2
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    # (B, D, H, W, kd*Cin), channel index t*Cin + c
    xs = jnp.concatenate([xp[:, t : t + d] for t in range(kd)], axis=-1)
    # kernel (kd, kh, kw, Cin, Cout) -> (kh, kw, kd*Cin, Cout)
    k2 = kernel.transpose(1, 2, 0, 3, 4).reshape(
        kernel.shape[1], kernel.shape[2], kd * cin, cout
    )
    y = lax.conv_general_dilated(
        xs.reshape(b * d, h, w, kd * cin), k2, (1, 1), "SAME",
        dimension_numbers=_DN_2D,
    ).reshape(b, d, h, w, cout)
    if bias is not None:
        y = y + bias
    return y


def conv3d_outstacked(x: jax.Array, kernel: jax.Array,
                      bias: jax.Array | None = None) -> jax.Array:
    """Depth taps packed into the OUTPUT channel axis: one 2D conv with
    kd*Cout outputs, then a depth-shifted sum.  Identical numerics; fills
    the MXU when Cout is small (e.g. the k7^3 mask head: 22 out channels ->
    154 packed)."""
    b, d, h, w, cin = x.shape
    kd, kh, kw, _, cout = kernel.shape
    pad = kd // 2
    # kernel -> (kh, kw, cin, kd*cout), packed group index t*cout + o
    k2 = kernel.transpose(1, 2, 3, 0, 4).reshape(kh, kw, cin, kd * cout)
    y = lax.conv_general_dilated(
        x.reshape(b * d, h, w, cin), k2, (1, 1), "SAME",
        dimension_numbers=_DN_2D,
    ).reshape(b, d, h, w, kd, cout)
    yp = jnp.pad(y, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0), (0, 0)))
    out = None
    for t in range(kd):
        term = yp[:, t : t + d, :, :, t, :]
        out = term if out is None else out + term
    if bias is not None:
        out = out + bias
    return out


class Conv3D(nn.Module):
    """Drop-in stride-1 SAME 3D conv with selectable implementation.

    impl="auto" picks output-stacking when the output channel count is
    small relative to the input (MXU fill), else input-stacking."""

    features: int
    kernel_size: tuple[int, int, int] = (3, 3, 3)
    use_bias: bool = True
    impl: str = "auto"  # "auto" | "stacked" | "outstacked" | "decomposed" | "direct"

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        impl = _IMPL_OVERRIDE or self.impl
        if impl == "auto":
            kd = self.kernel_size[0]
            impl = (
                "outstacked"
                if self.features < 64 <= kd * self.features
                else "stacked"
            )
        if impl == "direct":
            y = lax.conv_general_dilated(
                x, kernel, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            return y + bias if bias is not None else y
        if impl == "decomposed":
            return conv3d_decomposed(x, kernel, bias)
        if impl == "outstacked":
            return conv3d_outstacked(x, kernel, bias)
        return conv3d_stacked(x, kernel, bias)
