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
from canonswap_tpu.nn.blocks import ResBlock3d
from canonswap_tpu.ops.modulated_conv import adaptive_blend_conv
from canonswap_tpu.ops.resize import volume_to_2d


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
        self, volume, id_latent, train: bool = False,
        return_mask: bool = False, packed_out: bool = False,
    ):
        """volume: (B, D, H, W, C); id_latent: (B, latent_dim).

        ``packed_out=True`` returns the 3D chain's NATIVE layout — pack_hw2
        (B, D, H/2, W/2, 4C) for conv3d_impl="packed", the d-major z-slab
        (B, H, W, D*C) for "zdense" — so the matching consumer (RefineModule
        ``packed_in`` under the same config) skips the layout round trip at
        the module boundary (each shuffle of the 67 MB volume costs
        ~2-4 ms/16f — tools/profile_r4.jsonl)."""
        d = volume.shape[1]
        x = volume_to_2d(volume)  # (B, H, W, C*D)
        cd = x.shape[-1]
        masks = []
        for i in range(self.cfg.n_blocks):
            x, mask = AdaptiveResBlock2d(
                cd, self.cfg.latent_dim, int8=self.cfg.int8_conv,
                name=f"bottleneck2d_{i}"
            )(x, id_latent)
            masks.append(mask)
        zd = self.cfg.conv3d_impl == "zdense"
        if zd:
            from canonswap_tpu.nn.conv3d import cslab_to_zslab, from_zslab

            x = cslab_to_zslab(x, d)
            for i in range(self.cfg.n_resblocks_3d):
                x = ResBlock3d(name=f"res3d_{i}", zslab=d,
                               int8=self.cfg.int8_conv)(x, train)
            if not packed_out:
                x = from_zslab(x, d)
        else:
            from canonswap_tpu.nn.conv3d import twod_to_packed, unpack_hw2

            x = twod_to_packed(x, d)
            for i in range(self.cfg.n_resblocks_3d):
                x = ResBlock3d(name=f"res3d_{i}", packed=True,
                               int8=self.cfg.int8_conv)(x, train)
            if not packed_out:
                x = unpack_hw2(x)
        if return_mask:
            return x, masks
        return x
