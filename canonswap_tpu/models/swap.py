"""Canonical-space identity-injection ("swap") module.

Re-design of the reference's ``transfer_model2``
(src/modules/adaptive_modulate.py:485-554): 7 adaptive 2D residual blocks on
the depth-flattened volume, then 6 plain 3D residual blocks.  Each adaptive
block blends a StyleGAN2-modulated conv (style from the 512-d ArcFace ID
latent) with an unmodulated conv through a learned spatial mask
(adaptive_modulate.py:139-193).

The modulated+standard conv pair runs as ONE batched conv via
``ops.adaptive_blend_conv`` (see that module for the math).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from canonswap_tpu.configs.model_config import SwapConfig
from canonswap_tpu.nn.blocks import _Conv3x3Params, ResBlock3d
from canonswap_tpu.ops.modulated_conv import adaptive_blend_conv
from canonswap_tpu.ops.resize import volume_from_2d, volume_to_2d


class AdaptiveConv2d(nn.Module):
    """AdaptiveSharedWeightConv2d (adaptive_modulate.py:73-193), channels-last.

    Returns (out, mask)."""

    features: int
    latent_dim: int
    kernel: int = 3
    int8: bool = False

    @nn.compact
    def __call__(self, x, latent):
        cin = x.shape[-1]
        # shared kernel, torch init was randn*0.01
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) * 0.01,
            (self.kernel, self.kernel, cin, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # style MLP: latent -> hidden(=cin) -> cin
        s = nn.Dense(cin, name="style_fc0")(latent)
        s = nn.leaky_relu(s, 0.2)
        s = nn.Dense(cin, name="style_fc1")(s)
        # learned spatial mask
        m = nn.Conv(1, (3, 3), padding="SAME", name="mask_conv")(x)
        mask = jax.nn.sigmoid(m)
        out = adaptive_blend_conv(x, weight, s, mask, bias, int8=self.int8)
        return out, mask


class _AdaptiveConvParams(nn.Module):
    """Param-tree stand-in for AdaptiveConv2d whose conv/mask math the fused
    chain kernel applies; computes and returns the style vector (tiny dense
    math stays in XLA)."""

    features: int
    in_features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, latent):
        weight = self.param(
            "weight",
            lambda key, shape: jax.random.normal(key, shape) * 0.01,
            (self.kernel, self.kernel, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        s = nn.Dense(self.in_features, name="style_fc0")(latent)
        s = nn.leaky_relu(s, 0.2)
        s = nn.Dense(self.in_features, name="style_fc1")(s)
        mk, mb = _Conv3x3Params(1, self.in_features, name="mask_conv")()
        return weight, bias, mk, mb, s


class _AdaptiveBlockParams(nn.Module):
    """Param-tree stand-in for one AdaptiveResBlock2d (fused chain path)."""

    features: int

    @nn.compact
    def __call__(self, latent):
        c1 = _AdaptiveConvParams(self.features, self.features,
                                 name="conv1")(latent)
        c2 = _AdaptiveConvParams(self.features, self.features,
                                 name="conv2")(latent)
        block = {
            "weight": jnp.stack([c1[0], c2[0]]),
            "bias": jnp.stack([c1[1], c2[1]]),
            "mask_kernel": jnp.stack([c1[2], c2[2]]),
            "mask_bias": jnp.stack([c1[3], c2[3]]),
        }
        style = jnp.stack([c1[4], c2[4]], axis=1)  # (N, 2, c)
        return block, style


class AdaptiveResBlock2d(nn.Module):
    """ResnetBlock_Adaptive2D (adaptive_modulate.py:310-349)."""

    features: int
    latent_dim: int
    int8: bool = False

    @nn.compact
    def __call__(self, x, latent):
        y, mask1 = AdaptiveConv2d(self.features, self.latent_dim,
                                  int8=self.int8, name="conv1")(x, latent)
        y = nn.relu(y)
        y, mask2 = AdaptiveConv2d(self.features, self.latent_dim,
                                  int8=self.int8, name="conv2")(y, latent)
        return x + y, (mask1 + mask2) / 2


class SwapModule(nn.Module):
    """transfer_model2: identity injection in canonical space."""

    cfg: SwapConfig = SwapConfig()

    @nn.compact
    def __call__(
        self, volume, id_latent, train: bool = False, return_mask: bool = False
    ):
        """volume: (B, D, H, W, C); id_latent: (B, latent_dim)."""
        d = volume.shape[1]
        x = volume_to_2d(volume)  # (B, H, W, C*D)
        cd = x.shape[-1]
        masks = []
        if self.cfg.fused_chain and not return_mask and not train:
            from canonswap_tpu.ops.pallas.chain import (
                adaptive_chain, adaptive_chain_params)

            blocks, styles = [], []
            for i in range(self.cfg.n_blocks):
                blk, st = _AdaptiveBlockParams(
                    cd, name=f"bottleneck2d_{i}")(id_latent)
                blocks.append(blk)
                styles.append(st)
            latents_style = jnp.stack(styles, axis=1)  # (N, nb, 2, c)
            prep = adaptive_chain_params(blocks, latents_style)
            interp = jax.default_backend() not in ("tpu", "axon")
            x = adaptive_chain(x, prep, interpret=interp,
                               ksplit=self.cfg.chain_ksplit)
        else:
            for i in range(self.cfg.n_blocks):
                x, mask = AdaptiveResBlock2d(
                    cd, self.cfg.latent_dim, int8=self.cfg.int8_conv,
                    name=f"bottleneck2d_{i}"
                )(x, id_latent)
                masks.append(mask)
        from canonswap_tpu.nn.conv3d import pack_hw2, unpack_hw2

        x = pack_hw2(volume_from_2d(x, d))
        if self.cfg.fused_chain and not train:
            from canonswap_tpu.nn.blocks import _Res3dBNParams
            from canonswap_tpu.ops.pallas.chain3d import (
                res3d_bn_chain, res3d_bn_chain_params)

            blocks3 = [
                _Res3dBNParams(x.shape[-1] // 4, name=f"res3d_{i}")()
                for i in range(self.cfg.n_resblocks_3d)
            ]
            interp = jax.default_backend() not in ("tpu", "axon")
            x = res3d_bn_chain(x, res3d_bn_chain_params(blocks3),
                               interpret=interp)
        else:
            for i in range(self.cfg.n_resblocks_3d):
                x = ResBlock3d(name=f"res3d_{i}", packed=True,
                               int8=self.cfg.int8_conv)(x, train)
        x = unpack_hw2(x)
        if return_mask:
            return x, masks
        return x
