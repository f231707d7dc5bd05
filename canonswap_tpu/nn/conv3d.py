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
                   bias: jax.Array | None = None,
                   int8: bool = False) -> jax.Array:
    """Depth taps packed into the channel axis: ONE 2D conv with kd*Cin
    input channels instead of kd separate convs.  Identical numerics;
    fills the MXU much better for small channel counts (the 32-channel
    volume resblocks).  ``int8``: W8A8 with per-sample activation scales
    (flag_int8 lever)."""
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
    if int8:
        x32 = xs.astype(jnp.float32)
        sx = jnp.max(jnp.abs(x32), axis=(1, 2, 3, 4)) / 127.0 + 1e-12  # (B,)
        xq = jnp.clip(jnp.round(x32 / sx[:, None, None, None, None]),
                      -127, 127).astype(jnp.int8)
        k32 = k2.astype(jnp.float32)
        sw = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0 + 1e-12
        kq = jnp.clip(jnp.round(k32 / sw), -127, 127).astype(jnp.int8)
        acc = lax.conv_general_dilated(
            xq.reshape(b * d, h, w, kd * cin), kq, (1, 1), "SAME",
            dimension_numbers=_DN_2D, preferred_element_type=jnp.int32,
        ).reshape(b, d, h, w, cout)
        y = acc.astype(jnp.float32) * (sx[:, None, None, None, None] * sw)
        if bias is not None:
            y = y + bias.astype(jnp.float32)
        return y.astype(x.dtype)
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


def pack_hw2(x: jax.Array) -> jax.Array:
    """Space-to-depth 2x2 over (H, W): (B, D, H, W, C) -> (B, D, H/2, W/2, 4C).

    Packed channel index = (py*2 + px)*C + c (phase-major).  The 32-channel
    volume convs underfill the MXU badly (measured 9.8 TFLOP/s); packing 2x2
    spatial phases into channels trades 4x the MACs for 128-wide operands,
    a net ~4x win on v5e (tools/profile_r2.jsonl: conv3d_packed128_rate)."""
    b, d, h, w, c = x.shape
    x = x.reshape(b, d, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    x = x.reshape(b, d, h // 2, w // 2, 4 * c)
    # keep the s2d transpose a standalone op: letting XLA fuse it into the
    # first packed conv costs ~9 ms/chain (measured 38.0 -> 28.7 ms for the
    # 6-resblock chain with barriers here and in unpack)
    return jax.lax.optimization_barrier(x)


def unpack_hw2(x: jax.Array) -> jax.Array:
    """Inverse of :func:`pack_hw2`."""
    x = jax.lax.optimization_barrier(x)  # see pack_hw2
    b, d, hh, wh, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, d, hh, wh, 2, 2, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6)
    return x.reshape(b, d, hh * 2, wh * 2, c)


def packed_to_2d(x: jax.Array) -> jax.Array:
    """Fused ``volume_to_2d(unpack_hw2(x))``: ONE transpose instead of two.

    (B, D, H/2, W/2, 4C) -> (B, H, W, C*D) with volume_to_2d's channel
    order (flat channel k = c*D + d).  Each standalone layout shuffle on
    the (16,16,32,32,128) volume costs ~2-4 ms/16f (tools/profile_r4.jsonl
    refine/swap vs their sub-chain sums), so module boundaries fuse them.
    """
    x = jax.lax.optimization_barrier(x)  # see pack_hw2
    b, d, hh, wh, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, d, hh, wh, 2, 2, c)
    x = x.transpose(0, 2, 4, 3, 5, 6, 1)  # (B, Hh, py, Wh, px, C, D)
    return x.reshape(b, hh * 2, wh * 2, c * d)


def twod_to_packed(x: jax.Array, depth: int) -> jax.Array:
    """Fused ``pack_hw2(volume_from_2d(x, depth))`` (inverse of
    :func:`packed_to_2d`): (B, H, W, C*D) -> (B, D, H/2, W/2, 4C)."""
    b, h, w, cd = x.shape
    c = cd // depth
    x = x.reshape(b, h // 2, 2, w // 2, 2, c, depth)
    x = x.transpose(0, 6, 1, 3, 2, 4, 5)  # (B, D, Hh, Wh, py, px, C)
    return jax.lax.optimization_barrier(
        x.reshape(b, depth, h // 2, w // 2, 4 * c))


import functools
import numpy as _np


@functools.lru_cache(maxsize=None)
def _phase_map_hw2() -> _np.ndarray:
    """Constant 0/1 tensor E[d, g, p, q]: tap offset d of output phase q
    lands at packed tap g with source phase p (one axis, factor 2):
    s = q + d - 1; g = s // 2 + 1; p = s % 2."""
    e = _np.zeros((3, 3, 2, 2), _np.float32)
    for q in (0, 1):
        for d in range(3):
            s = q + d - 1
            e[d, s // 2 + 1, s % 2, q] = 1.0
    return e


def pack_kernel_hw2(kernel: jax.Array) -> jax.Array:
    """(kd, 3, 3, Cin, Cout) -> (kd, 3, 3, 4Cin, 4Cout) packed-space kernel.

    For output phase q and tap offset o = d-1 along one axis, the source
    lands at packed offset floor((q+o)/2) in {-1,0,1} with phase (q+o) mod 2;
    every original weight maps to exactly one packed slot (rest zero), so the
    packed conv is numerically EXACT, not an approximation.  Built as one
    einsum against constant 0/1 phase maps (a scatter-based build measurably
    serialized the device between convs)."""
    kd, kh, kw, cin, cout = kernel.shape
    if (kh, kw) != (3, 3):
        raise ValueError("pack_kernel_hw2 expects a 3x3 spatial kernel")
    e = jnp.asarray(_phase_map_hw2(), kernel.dtype)
    # kp[t, gy, gx, (py px ci), (qy qx co)]
    kp = jnp.einsum("tabio,agyq,bhxr->tghyxiqro", kernel, e, e)
    return kp.reshape(kd, 3, 3, 4 * cin, 4 * cout)


def conv3d_packed(xp: jax.Array, kernel: jax.Array,
                  bias: jax.Array | None = None,
                  int8: bool = False) -> jax.Array:
    """Exact 3D conv on a :func:`pack_hw2`-packed volume.

    xp: (B, D, H/2, W/2, 4C); kernel: (kd, 3, 3, Cin, Cout) ORIGINAL layout
    (packed on the fly — XLA constant-folds it for fixed params).
    Returns the packed (B, D, H/2, W/2, 4*Cout) output.

    ``int8``: W8A8 with per-sample activation scales and per-packed-output-
    channel weight scales, s32 accumulation across the depth taps (the
    flag_int8 speed/quality lever; MXU runs s8 at ~2-4x the bf16 rate)."""
    kp = pack_kernel_hw2(kernel)
    cout = kernel.shape[-1]
    b, d, hh, wh, _ = xp.shape
    kd = kernel.shape[0]
    pad = kd // 2
    if int8:
        x32 = xp.astype(jnp.float32)
        sx = jnp.max(jnp.abs(x32), axis=(1, 2, 3, 4)) / 127.0 + 1e-12  # (B,)
        xq = jnp.clip(jnp.round(x32 / sx[:, None, None, None, None]),
                      -127, 127).astype(jnp.int8)
        k32 = kp.astype(jnp.float32)
        sw = jnp.max(jnp.abs(k32), axis=(0, 1, 2, 3)) / 127.0 + 1e-12
        kq = jnp.clip(jnp.round(k32 / sw), -127, 127).astype(jnp.int8)
        xpad = jnp.pad(xq, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
        acc = None
        for t in range(kd):
            y = lax.conv_general_dilated(
                xpad[:, t : t + d].reshape(b * d, hh, wh, xp.shape[-1]),
                kq[t], (1, 1), "SAME", dimension_numbers=_DN_2D,
                preferred_element_type=jnp.int32,
            )
            acc = y if acc is None else acc + y
        out = acc.reshape(b, d, hh, wh, 4 * cout).astype(jnp.float32)
        out = out * (sx[:, None, None, None, None] * sw)
        if bias is not None:
            out = out + jnp.tile(bias, 4).astype(jnp.float32)
        return out.astype(xp.dtype)
    xpad = jnp.pad(xp, ((0, 0), (pad, pad), (0, 0), (0, 0), (0, 0)))
    out = None
    for t in range(kd):
        y = lax.conv_general_dilated(
            xpad[:, t : t + d].reshape(b * d, hh, wh, xp.shape[-1]),
            kp[t], (1, 1), "SAME", dimension_numbers=_DN_2D,
        )
        out = y if out is None else out + y
    out = out.reshape(b, d, hh, wh, 4 * cout)
    if bias is not None:
        out = out + jnp.tile(bias, 4)
    return out


@functools.lru_cache(maxsize=None)
def _zband_map(depth: int) -> _np.ndarray:
    """Constant 0/1 tensor e[t, di, do]: depth tap t of output slice do
    reads input slice di = do + t - 1 (zero padding = absent band entry)."""
    e = _np.zeros((3, depth, depth), _np.float32)
    for do in range(depth):
        for t in range(3):
            di = do + t - 1
            if 0 <= di < depth:
                e[t, di, do] = 1.0
    return e


def to_zslab(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) -> (B, H, W, D*C), channel index d*C + c (d-major —
    the same channel order as the Pallas warp's z-packed slab)."""
    b, d, h, w, c = x.shape
    return x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, d * c)


def from_zslab(x: jax.Array, depth: int) -> jax.Array:
    """Inverse of :func:`to_zslab`."""
    b, h, w, dc = x.shape
    return x.reshape(b, h, w, depth, dc // depth).transpose(0, 3, 1, 2, 4)


def cslab_to_zslab(x: jax.Array, depth: int) -> jax.Array:
    """c-major 2D slab (volume_to_2d order, k = c*D + d) -> d-major zslab
    (k = d*C + c): a channel-axis permute of the (B, H, W, C*D) tensor."""
    b, h, w, cd = x.shape
    c = cd // depth
    return x.reshape(b, h, w, c, depth).transpose(0, 1, 2, 4, 3).reshape(
        b, h, w, cd)


def zslab_to_cslab(x: jax.Array, depth: int) -> jax.Array:
    """Inverse of :func:`cslab_to_zslab`."""
    b, h, w, dc = x.shape
    c = dc // depth
    return x.reshape(b, h, w, depth, c).transpose(0, 1, 2, 4, 3).reshape(
        b, h, w, dc)


def conv3d_zdense(xs: jax.Array, kernel: jax.Array,
                  bias: jax.Array | None = None,
                  int8: bool = False) -> jax.Array:
    """Exact kd=3 3D conv on a :func:`to_zslab` volume: ONE dense 2D conv
    with a block-banded (3, 3, D*Cin, D*Cout) kernel.

    The depth axis lives in the channel dim, so the depth taps become a
    banded channel mixing — the dense kernel carries (3D-2)/D^2 ~ 18%
    real weights (rest structural zeros), i.e. ~5.6x the true MACs, but as
    one MXU-shaped 512-channel conv instead of 3 halo-summed 128-channel
    convs over a tiny 32^2 grid.  Depth zero-padding falls out of the band
    structure (border slices simply have no source channel).

    xs: (B, H, W, D*Cin) d-major; kernel: (3, kh, kw, Cin, Cout) ORIGINAL
    checkpoint layout.  Returns (B, H, W, D*Cout) d-major.
    """
    kd, kh, kw, cin, cout = kernel.shape
    if kd != 3:
        raise ValueError("conv3d_zdense expects a depth-3 kernel")
    depth = xs.shape[-1] // cin
    e = jnp.asarray(_zband_map(depth), kernel.dtype)
    kdense = jnp.einsum("tabio,tde->abdieo", kernel, e)
    kdense = kdense.reshape(kh, kw, depth * cin, depth * cout)
    if int8:
        from canonswap_tpu.ops.qconv import conv2d_w8a8

        return conv2d_w8a8(
            xs, kdense, jnp.tile(bias, depth) if bias is not None else None)
    y = lax.conv_general_dilated(
        xs, kdense, (1, 1), "SAME", dimension_numbers=_DN_2D)
    if bias is not None:
        y = y + jnp.tile(bias, depth)
    return y


class ZSlabConv3D(nn.Module):
    """Stride-1 SAME 3D conv on a d-major z-slab (B, H, W, D*C) input via
    :func:`conv3d_zdense`.  Param names/shapes are identical to
    :class:`Conv3D` (kernel in the original (kd,kh,kw,Cin,Cout) checkpoint
    layout), so a module tree can switch layouts without re-initialising."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    int8: bool = False
    in_features: int = 0  # Cin; defaults to features (the resblock chains)

    @nn.compact
    def __call__(self, x):
        # Cin from the slab width alone is ambiguous (D*C), so it is pinned
        # statically: either passed, or Cin == Cout (the volume resblocks).
        cin = self.in_features or self.features
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size,) * 3 + (cin, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        return conv3d_zdense(x, kernel, bias, int8=self.int8)


class Conv3D(nn.Module):
    """Drop-in stride-1 SAME 3D conv with selectable implementation.

    impl="auto" picks output-stacking when the output channel count is
    small relative to the input (MXU fill), else input-stacking."""

    features: int
    kernel_size: tuple[int, int, int] = (3, 3, 3)
    use_bias: bool = True
    impl: str = "auto"  # "auto" | "stacked" | "outstacked" | "decomposed" | "direct"
    packed_io: bool = False  # input AND output in pack_hw2 layout
    int8: bool = False  # W8A8 packed conv (flag_int8 lever)

    @nn.compact
    def __call__(self, x):
        if self.packed_io:
            # params stay in the original (kd,kh,kw,Cin,Cout) layout so
            # converted checkpoints are untouched
            cin = x.shape[-1] // 4
            kernel = self.param(
                "kernel", nn.initializers.lecun_normal(),
                (*self.kernel_size, cin, self.features),
            )
            bias = (
                self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None
            )
            return conv3d_packed(x, kernel, bias, int8=self.int8)
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
        if self.int8 and cin * self.kernel_size[0] >= 128 \
                and self.features >= 64:
            # quantized path: one stacked 2D conv (int8 3D convs are not
            # reliably MXU-lowered; the stacked form is)
            return conv3d_stacked(x, kernel, bias, int8=True)
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
        if impl == "packed":
            return unpack_hw2(conv3d_packed(pack_hw2(x), kernel, bias))
        if impl == "outstacked":
            return conv3d_outstacked(x, kernel, bias)
        return conv3d_stacked(x, kernel, bias)
