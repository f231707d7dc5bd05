"""SPADE decoder G: warped 2D feature -> output image.

Re-design of reference src/modules/spade_generator.py:13-58.
(B, 64, 64, 256) -> (B, 512, 512, 3) with upscale=2 (pixel-shuffle head).
The 64x64 input feature itself is the SPADE segmap at every block.
"""

from __future__ import annotations

import jax
from flax import linen as nn

from canonswap_tpu.configs.model_config import SpadeConfig
from canonswap_tpu.nn.blocks import SPADEResnetBlock
from canonswap_tpu.ops.resize import nearest_upsample, pixel_shuffle


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
        for i in range(6):
            x = SPADEResnetBlock(2 * ic, 2 * ic, sn=sn, int8=q,
                                 name=f"G_middle_{i}")(x, seg)
        # int8 is resolution-aware: it wins on the 64^2 middles (37.5 ->
        # 24.9 ms/16f) and — since round 5's XLA-W8A8 re-route (ops/qconv) —
        # on the 128^2 up_0 (q_c0_128_512_256: 3.22 vs 6.13 ms bf16,
        # tools/profile_r5.jsonl); still a REGRESSION at 256^2 (up_1
        # 31.6 -> 41.5 — quantize traffic beats the MXU saving), so up_1
        # stays exact bf16: faster AND closer to exact.
        x = nearest_upsample(x, (2, 2))
        x = SPADEResnetBlock(2 * ic, ic, sn=sn, int8=q,
                             norm_scale=c.norm_scale, name="up_0")(x, seg)
        x = nearest_upsample(x, (2, 2))
        x = SPADEResnetBlock(ic, c.out_channels, sn=sn, int8=False,
                             norm_scale=c.norm_scale, name="up_1")(x, seg)
        x = nn.leaky_relu(x, 0.2)
        if c.upscale is None or c.upscale <= 1:
            x = nn.Conv(3, (3, 3), padding="SAME", name="conv_img")(x)
        else:
            x = nn.Conv(3 * 4, (3, 3), padding="SAME", name="conv_img")(x)
            x = pixel_shuffle(x, 2)
        return jax.nn.sigmoid(x)
