"""flax.linen building blocks (channels-last) for the CanonSwap model zoo.

Functional re-designs of the reference blocks in src/modules/util.py:
SameBlock2d, DownBlock2d/3d, UpBlock3d, ResBlock2d/3d, Hourglass (3D),
SPADE / SPADEResnetBlock, GroupNorm leaky 3D resblocks.

Conventions:
  - images (N, H, W, C); volumes (N, D, H, W, C).
  - BatchNorm runs in inference mode by default (running stats are part of the
    converted checkpoint); pass ``train=True`` plus mutable batch_stats for
    training.
  - SPADE convs carry spectral norm *baked into the weights* at conversion
    time (W / sigma_max(W)); for from-scratch training use
    ``canonswap_tpu.nn.spectral.spectral_normalize`` on the fly.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from canonswap_tpu.nn.conv3d import Conv3D, ZSlabConv3D
from canonswap_tpu.ops.resize import (
    avg_pool, conv3x3_on_nearest_upsample, nearest_upsample)


class _Conv3x3Params(nn.Module):
    """Param-compatible stand-in for a 3x3 ``nn.Conv`` (params kernel/bias);
    the caller applies the convolution (used by SPADE's folded
    conv-on-upsampled-segmap path)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm2d, affine=False (torch default) for (N, H, W, C)."""
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class SameBlock2d(nn.Module):
    """Conv -> BN -> ReLU/LeakyReLU, preserving resolution (util.py:193-211)."""

    features: int
    kernel: int = 3
    lrelu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.leaky_relu(x, 0.01) if self.lrelu else nn.relu(x)


class DownBlock2d(nn.Module):
    """Conv -> BN -> ReLU -> AvgPool2x2 (util.py:150-166)."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        return avg_pool(x, (2, 2))


class DownBlock3d(nn.Module):
    """Conv3d -> BN -> ReLU -> AvgPool(1,2,2) (util.py:169-190)."""

    features: int
    conv_impl: str = "auto"
    int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv3D(self.features, (3, 3, 3), name="Conv_0",
                   impl=self.conv_impl, int8=self.int8 and not train)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        x = nn.relu(x)
        return avg_pool(x, (1, 2, 2))


class UpBlock3d(nn.Module):
    """Nearest(1,2,2) -> Conv3d -> BN -> ReLU (util.py:130-147)."""

    features: int
    conv_impl: str = "auto"
    int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nearest_upsample(x, (1, 2, 2))
        x = Conv3D(self.features, (3, 3, 3), name="Conv_0",
                   impl=self.conv_impl, int8=self.int8 and not train)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        return nn.relu(x)


class ResBlock2d(nn.Module):
    """Pre-activation residual block: BN-LReLU-Conv x2 + skip (util.py:105-128)."""

    negative_slope: float = 0.01
    kernel: int = 3
    int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from canonswap_tpu.ops.qconv import int8_worthwhile

        c = x.shape[-1]
        conv = (_QConv if self.int8 and int8_worthwhile(x) and not train
                else None)

        def cv(h, name):
            if conv is not None:
                return conv(c, (self.kernel, self.kernel), name=name)(h)
            return nn.Conv(c, (self.kernel, self.kernel), padding="SAME",
                           name=name)(h)

        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(x)
        h = nn.leaky_relu(h, self.negative_slope)
        h = cv(h, "Conv_0")
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(h)
        h = nn.leaky_relu(h, self.negative_slope)
        h = cv(h, "Conv_1")
        return x + h


class ResBlock3d(nn.Module):
    """Pre-activation 3D residual block: BN-ReLU-Conv x2 + skip (util.py:80-102).

    With ``packed=True`` the block runs on a pack_hw2 (B,D,H/2,W/2,4C) layout
    end-to-end (exact numerics, ~4x MXU fill for the 32-channel volume
    chains; see conv3d.pack_hw2).  Param tree is identical either way: norms
    see a (...,4,C) view so their params stay C-sized.

    With ``zslab=depth`` the block instead runs on the d-major z-slab layout
    (B, H, W, D*C) via :func:`conv3d.conv3d_zdense` — one dense block-banded
    2D conv per conv3d (~5.6x the true MACs but in the 512-channel shape
    class the MXU runs >2x faster; see conv3d_zdense).  Norms see a
    (..., D, C) view, so stats/params match the volume form exactly."""

    kernel: int = 3
    packed: bool = False
    zslab: int = 0  # depth D when the input is a (B,H,W,D*C) z-slab
    int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.zslab:
            d = self.zslab
            c = x.shape[-1] // d
            q = self.int8 and not train

            def bn(h, name):
                m = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=name)
                return m(h.reshape(*h.shape[:-1], d, c)).reshape(h.shape)

            h = bn(x, "BatchNorm_0")
            h = nn.relu(h)
            h = ZSlabConv3D(c, self.kernel, int8=q, name="Conv_0")(h)
            h = bn(h, "BatchNorm_1")
            h = nn.relu(h)
            h = ZSlabConv3D(c, self.kernel, int8=q, name="Conv_1")(h)
            return x + h
        c = x.shape[-1] // (4 if self.packed else 1)
        k = (self.kernel,) * 3

        def bn(h, name):
            m = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=name)
            if self.packed:
                return m(h.reshape(*h.shape[:-1], 4, c)).reshape(h.shape)
            return m(h)

        # int8 is inference-only: round/clip gradients are zero a.e.
        q = self.int8 and not train
        h = bn(x, "BatchNorm_0")
        h = nn.relu(h)
        h = Conv3D(c, k, name="Conv_0", packed_io=self.packed, int8=q)(h)
        h = bn(h, "BatchNorm_1")
        h = nn.relu(h)
        h = Conv3D(c, k, name="Conv_1", packed_io=self.packed, int8=q)(h)
        return x + h


class ResBlock3dLeakGN(nn.Module):
    """Conv-GN32-LReLU x2 + 1x1-shortcut residual, post-activation
    (ResBlock3D_stage3_leak, util.py:515-543). Used by the refine module."""

    features: int
    negative_slope: float = 0.01
    packed: bool = False  # pack_hw2 layout in/out (see ResBlock3d)
    zslab: int = 0  # depth D when the input is a (B,H,W,D*C) z-slab
    int8: bool = False

    @nn.compact
    def __call__(self, x):
        if self.zslab:
            return self._zslab(x)
        cin = x.shape[-1] // (4 if self.packed else 1)

        def gn(h, name):
            # groups of the ORIGINAL channel axis; the (...,4,C) view pools
            # the phase axis into the group statistics (same element set as
            # unpacked, so numerics match)
            m = nn.GroupNorm(num_groups=min(32, self.features),
                             epsilon=1e-5, name=name)
            if self.packed:
                return m(h.reshape(*h.shape[:-1], 4, self.features)
                         ).reshape(h.shape)
            return m(h)

        if cin == self.features:
            short = x
        elif self.packed:
            # 1x1x1 conv is phase-pointwise: run it on a (...,4,C) view so
            # the param keeps its (1,1,1,Cin,Cout) shape
            b, d, hh, wh, _ = x.shape
            short = nn.Conv(
                self.features, (1, 1, 1), padding="VALID", name="shortcut"
            )(x.reshape(b, d, hh * wh, 4, cin)).reshape(
                b, d, hh, wh, 4 * self.features)
        else:
            short = nn.Conv(self.features, (1, 1, 1), padding="VALID",
                            name="shortcut")(x)
        h = Conv3D(self.features, (3, 3, 3), name="conv1",
                   packed_io=self.packed, int8=self.int8)(x)
        h = gn(h, "gn1")
        h = nn.leaky_relu(h, self.negative_slope)
        h = Conv3D(self.features, (3, 3, 3), name="conv2",
                   packed_io=self.packed, int8=self.int8)(h)
        h = gn(h, "gn2")
        h = h + short
        return nn.leaky_relu(h, self.negative_slope)

    def _zslab(self, x):
        """d-major z-slab form (B, H, W, D*C): conv3d via conv3d_zdense,
        GroupNorm on a (..., D, C) view — identical stats/params to the
        volume form (stats per (b, group) over (H, W, D))."""
        d = self.zslab
        cin = x.shape[-1] // d

        def gn(h, name):
            m = nn.GroupNorm(num_groups=min(32, self.features),
                             epsilon=1e-5, name=name)
            return m(h.reshape(*h.shape[:-1], d, self.features)
                     ).reshape(h.shape)

        if cin == self.features:
            short = x
        else:
            b, hh, ww, _ = x.shape
            short = nn.Conv(
                self.features, (1, 1, 1), padding="VALID", name="shortcut"
            )(x.reshape(b, hh, ww, d, cin)).reshape(
                b, hh, ww, d * self.features)
        h = ZSlabConv3D(self.features, int8=self.int8, in_features=cin,
                        name="conv1")(x)
        h = gn(h, "gn1")
        h = nn.leaky_relu(h, self.negative_slope)
        h = ZSlabConv3D(self.features, int8=self.int8, name="conv2")(h)
        h = gn(h, "gn2")
        h = h + short
        return nn.leaky_relu(h, self.negative_slope)


class HourglassEncoder(nn.Module):
    """3D hourglass encoder (util.py:214-231): returns all feature maps."""

    block_expansion: int
    num_blocks: int
    max_features: int
    conv_impl: str = "auto"
    int8: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = [x]
        for i in range(self.num_blocks):
            feats = min(self.max_features, self.block_expansion * (2 ** (i + 1)))
            outs.append(DownBlock3d(feats, name=f"down{i}",
                                    conv_impl=self.conv_impl,
                                    int8=self.int8)(outs[-1], train))
        return outs


class HourglassDecoder(nn.Module):
    """3D hourglass decoder with skip concat (util.py:234-264)."""

    block_expansion: int
    in_features: int
    num_blocks: int
    max_features: int
    conv_impl: str = "auto"
    int8: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        feats = list(feats)
        out = feats.pop()
        for j, i in enumerate(reversed(range(self.num_blocks))):
            out_filters = min(self.max_features, self.block_expansion * (2**i))
            out = UpBlock3d(out_filters, name=f"up{j}",
                            conv_impl=self.conv_impl,
                            int8=self.int8)(out, train)
            out = jnp.concatenate([out, feats.pop()], axis=-1)
        c = self.block_expansion + self.in_features
        out = Conv3D(c, (3, 3, 3), name="Conv_0", impl=self.conv_impl,
                     int8=self.int8 and not train)(out)
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5)(out)
        return nn.relu(out)


class Hourglass(nn.Module):
    """3D hourglass (util.py:267-279). out_filters = block_expansion + in_features."""

    block_expansion: int
    in_features: int
    num_blocks: int
    max_features: int
    # "direct" measured 36.1 vs 45.2 ms/step for the dense-motion hourglass
    # on v5e (tools/profile_r2.jsonl hourglass_direct): XLA's native 3D conv
    # wins at these mixed 64..1024-channel shapes
    conv_impl: str = "direct"
    int8: bool = False

    @property
    def out_filters(self) -> int:
        return self.block_expansion + self.in_features

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = HourglassEncoder(
            self.block_expansion, self.num_blocks, self.max_features,
            name="encoder", conv_impl=self.conv_impl, int8=self.int8,
        )(x, train)
        return HourglassDecoder(
            self.block_expansion, self.in_features, self.num_blocks,
            self.max_features, name="decoder", conv_impl=self.conv_impl,
            int8=self.int8,
        )(feats, train)


class SPADE(nn.Module):
    """Spatially-adaptive denorm (util.py:282-302).

    The segmap here is the warped feature itself (64x64) and x is always an
    integer multiple of it, so the nearest resize is an exact `repeat`.

    ``norm_scale > 1`` computes the gamma/beta modulation fields at
    1/norm_scale of x's resolution and bilinearly upsamples them (the
    SpadeConfig.norm_scale speed lever): the modulations carry information
    from the segmap-resolution feature only, so everything above segmap
    resolution in gamma/beta is local conv interpolation texture —
    half-res keeps all segmap content.  Exact at 1.
    """

    int8: bool = False
    norm_scale: int = 1

    @nn.compact
    def __call__(self, x, segmap, normalized=None):
        """``normalized`` lets the caller pass a precomputed instance_norm(x)
        (SPADEResnetBlock shares it between norm_s and norm_0 — exact, the
        two SPADEs normalize the same input)."""
        c = x.shape[-1]
        if normalized is None:
            normalized = instance_norm(x)
        fh, fw = x.shape[1] // segmap.shape[1], x.shape[2] // segmap.shape[2]
        ns = self.norm_scale if (
            self.norm_scale > 1 and fh == fw
            and fh % self.norm_scale == 0) else 1
        fh_eff = fh // ns
        if fh == fw and fh_eff in (1, 2, 4):
            # mlp_shared on the nearest-upsampled segmap folds to segmap
            # resolution (exact; 2.25-4x fewer MACs — ops.resize.
            # conv3x3_on_nearest_upsample). gamma/beta stay full-res: their
            # input actv varies at x's resolution.
            kern, kb = _Conv3x3Params(128, segmap.shape[-1],
                                      name="mlp_shared")()
            actv = nn.relu(
                conv3x3_on_nearest_upsample(segmap, kern, kb, fh_eff))
        else:
            seg = nearest_upsample(segmap, (fh_eff, fw // ns))
            actv = nn.relu(
                nn.Conv(128, (3, 3), padding="SAME", name="mlp_shared")(seg))
        # ONE conv for [gamma | beta]: conv is linear in the kernel, so
        # concatenating the kernels is exact — and doubles the MXU lane fill
        # for the 64-channel up-blocks (N=64 -> 128)
        kg, bg = _Conv3x3Params(c, 128, name="mlp_gamma")()
        kb2, bb = _Conv3x3Params(c, 128, name="mlp_beta")()
        kgb = jnp.concatenate([kg, kb2], axis=-1)
        bgb = jnp.concatenate([bg, bb])
        from canonswap_tpu.ops.qconv import (
            _pallas_qconv_ok, conv2d_int8_auto, int8_worthwhile,
        )

        if self.int8 and (int8_worthwhile(actv)
                          or _pallas_qconv_ok(actv, kgb)):
            gb = conv2d_int8_auto(actv, kgb, bgb)
        else:
            gb = jax.lax.conv_general_dilated(
                actv, kgb, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bgb
        if ns > 1:
            n_, hh, ww, cc = gb.shape
            gb = jax.image.resize(gb, (n_, hh * ns, ww * ns, cc),
                                  method="linear")
        gamma, beta = gb[..., :c], gb[..., c:]
        return normalized * (1 + gamma) + beta


class _QConv(nn.Module):
    """nn.Conv-compatible (params kernel/bias) W8A8 conv; falls back to the
    exact conv when the shape isn't worth quantizing (ops/qconv.py)."""

    features: int
    kernel: tuple
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        from canonswap_tpu.ops.qconv import conv2d_int8_auto

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel, x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return conv2d_int8_auto(x, kernel, bias)


class SPADEResnetBlock(nn.Module):
    """SPADE residual block (util.py:305-344).

    Inference checkpoints carry spectral norm baked into conv_0/conv_1/conv_s
    (runtime/weights.py::_conv_spectral); set ``sn=True`` for from-scratch
    training to apply live power-iteration spectral norm instead
    (nn/spectral.py) — param names are identical either way.
    ``int8``: W8A8 convs where MXU-bound (the flag_int8 lever).
    """

    fin: int
    fout: int
    sn: bool = False
    int8: bool = False
    norm_scale: int = 1

    def _conv(self, features, kernel, name, use_bias=True):
        if self.sn:
            from canonswap_tpu.nn.spectral import SNConv

            return SNConv(features, kernel, use_bias=use_bias, name=name)
        if self.int8:
            return _QConv(features, kernel, use_bias=use_bias, name=name)
        return nn.Conv(features, kernel, padding="SAME", use_bias=use_bias,
                       name=name)

    @nn.compact
    def __call__(self, x, seg):
        fmiddle = min(self.fin, self.fout)
        learned_shortcut = self.fin != self.fout
        ns = self.norm_scale
        if learned_shortcut:
            xn = instance_norm(x)  # shared by norm_s and norm_0 (exact)
            x_s = SPADE(int8=self.int8, norm_scale=ns,
                        name="norm_s")(x, seg, normalized=xn)
            x_s = self._conv(self.fout, (1, 1), "conv_s", use_bias=False)(x_s)
        else:
            xn = None
            x_s = x
        dx = SPADE(int8=self.int8, norm_scale=ns,
                   name="norm_0")(x, seg, normalized=xn)
        dx = self._conv(fmiddle, (3, 3), "conv_0")(nn.leaky_relu(dx, 0.2))
        dx = SPADE(int8=self.int8, norm_scale=ns,
                   name="norm_1")(dx, seg)
        dx = self._conv(self.fout, (3, 3), "conv_1")(nn.leaky_relu(dx, 0.2))
        return x_s + dx
