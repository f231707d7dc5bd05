"""SPADE decoder G: warped 2D feature -> output image.

Re-design of reference src/modules/spade_generator.py:13-58.
(B, 64, 64, 256) -> (B, 512, 512, 3) with upscale=2 (pixel-shuffle head).
The 64x64 input feature itself is the SPADE segmap at every block.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from canonswap_tpu.configs.model_config import SpadeConfig
from canonswap_tpu.nn.blocks import _Conv3x3Params, SPADEResnetBlock
from canonswap_tpu.ops.resize import nearest_upsample, pixel_shuffle


class _SPADENormParams(nn.Module):
    """Param-tree stand-in for one SPADE norm (mlp_shared/mlp_gamma/mlp_beta)
    whose convolutions the fused chain kernel applies itself."""

    features: int
    seg_features: int

    @nn.compact
    def __call__(self):
        ak, ab = _Conv3x3Params(128, self.seg_features, name="mlp_shared")()
        gk, gb = _Conv3x3Params(self.features, 128, name="mlp_gamma")()
        bk, bb = _Conv3x3Params(self.features, 128, name="mlp_beta")()
        return ak, ab, jnp.concatenate([gk, bk], -1), jnp.concatenate([gb, bb])


class _SPADEBlockParams(nn.Module):
    """Param-tree stand-in for one fin==fout SPADEResnetBlock (the fused
    G_middle chain applies the math in ops/pallas/chain.py)."""

    features: int
    seg_features: int

    @nn.compact
    def __call__(self):
        n0 = _SPADENormParams(self.features, self.seg_features, name="norm_0")()
        n1 = _SPADENormParams(self.features, self.seg_features, name="norm_1")()
        c0 = _Conv3x3Params(self.features, self.features, name="conv_0")()
        c1 = _Conv3x3Params(self.features, self.features, name="conv_1")()
        return {
            "a_kernel": jnp.stack([n0[0], n1[0]]),
            "a_bias": jnp.stack([n0[1], n1[1]]),
            "gb_kernel": jnp.stack([n0[2], n1[2]]),
            "gb_bias": jnp.stack([n0[3], n1[3]]),
            "cv_kernel": jnp.stack([c0[0], c1[0]]),
            "cv_bias": jnp.stack([c0[1], c1[1]]),
        }


class SPADEDecoder(nn.Module):
    cfg: SpadeConfig = SpadeConfig()

    @nn.compact
    def __call__(self, feature):
        c = self.cfg
        ic = min(c.max_features, c.block_expansion * (2**c.num_down_blocks))
        seg = feature
        sn = c.spectral_norm
        q = c.int8_conv
        x = nn.Conv(2 * ic, (3, 3), padding="SAME", name="fc")(feature)
        if c.fused_chain and not sn:
            # the G_middle chain runs at segmap resolution (fh == 1), so the
            # mlp_shared convs apply to seg directly; everything else lives
            # in the fused VMEM-resident kernel (ops/pallas/chain.py)
            from canonswap_tpu.ops.pallas.chain import (
                spade_chain, spade_chain_params)

            blocks = [
                _SPADEBlockParams(2 * ic, seg.shape[-1],
                                  name=f"G_middle_{i}")()
                for i in range(6)
            ]
            dn = ("NHWC", "HWIO", "NHWC")
            actv = jnp.stack([
                jnp.stack([
                    nn.relu(jax.lax.conv_general_dilated(
                        seg, blk["a_kernel"][k].astype(seg.dtype), (1, 1),
                        "SAME", dimension_numbers=dn) + blk["a_bias"][k])
                    for k in (0, 1)
                ], axis=1)
                for blk in blocks
            ], axis=1)  # (N, nb, 2, H, W, 128)
            prep = spade_chain_params(blocks)
            interp = jax.default_backend() not in ("tpu", "axon")
            x = spade_chain(x, actv, prep, interpret=interp,
                            ksplit=c.chain_ksplit)
        else:
            for i in range(6):
                x = SPADEResnetBlock(2 * ic, 2 * ic, sn=sn, int8=q,
                                     name=f"G_middle_{i}")(x, seg)
        x = nearest_upsample(x, (2, 2))
        x = SPADEResnetBlock(2 * ic, ic, sn=sn, int8=q,
                             norm_scale=c.norm_scale, name="up_0")(x, seg)
        x = nearest_upsample(x, (2, 2))
        x = SPADEResnetBlock(ic, c.out_channels, sn=sn, int8=q,
                             norm_scale=c.norm_scale,
                             phase_fold=c.phase_fold, name="up_1")(x, seg)
        x = nn.leaky_relu(x, 0.2)
        if c.upscale is None or c.upscale <= 1:
            x = nn.Conv(3, (3, 3), padding="SAME", name="conv_img")(x)
        else:
            x = nn.Conv(3 * 4, (3, 3), padding="SAME", name="conv_img")(x)
            x = pixel_shuffle(x, 2)
        return jax.nn.sigmoid(x)
