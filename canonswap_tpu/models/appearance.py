"""Appearance feature extractor F: source crop -> 3D feature volume.

Re-design of reference src/modules/appearance_feature_extractor.py:12-48.
256x256x3 -> (B, D=16, H=64, W=64, C=32) channels-last volume.

The torch reshape (B, 512, 64, 64) -> (B, 32, 16, 64, 64) splits the channel
axis as C=32 (outer) x D=16 (inner); our channels-last equivalent reshapes
(B, 64, 64, 512) -> (B, 64, 64, 32, 16) then moves D to the front, keeping
converted weights bit-compatible (see ops.resize.volume_to_2d convention).
"""

from __future__ import annotations

from flax import linen as nn

from canonswap_tpu.configs.model_config import AppearanceConfig
from canonswap_tpu.nn.blocks import DownBlock2d, ResBlock3d, SameBlock2d


class AppearanceFeatureExtractor(nn.Module):
    cfg: AppearanceConfig = AppearanceConfig()

    @nn.compact
    def __call__(self, image, train: bool = False):
        """image: (B, S, S, 3) in [0, 1] -> (B, D, S/4, S/4, C) volume."""
        c = self.cfg
        x = SameBlock2d(c.block_expansion, name="first")(image, train)
        for i in range(c.num_down_blocks):
            feats = min(c.max_features, c.block_expansion * (2 ** (i + 1)))
            x = DownBlock2d(feats, name=f"down{i}")(x, train)
        x = nn.Conv(c.max_features, (1, 1), name="second")(x)

        b, h, w, _ = x.shape
        if c.conv3d_impl == "zdense":
            # the 2D feature IS the c-major slab (torch channel split is
            # C-outer/D-inner) — one channel permute to the d-major z-slab
            # and the chain runs as block-banded dense convs
            from canonswap_tpu.nn.conv3d import cslab_to_zslab, from_zslab

            x = cslab_to_zslab(x, c.reshape_depth)
            for i in range(c.num_resblocks):
                x = ResBlock3d(name=f"res3d_{i}", zslab=c.reshape_depth,
                               int8=c.int8_conv)(x, train)
            return from_zslab(x, c.reshape_depth)
        x = x.reshape(b, h, w, c.reshape_channel, c.reshape_depth)
        x = x.transpose(0, 4, 1, 2, 3)  # (B, D, H, W, C)

        # the 32-channel resblock chain runs space-to-depth packed (exact;
        # ~4x MXU fill — conv3d.pack_hw2), one pack/unpack for the chain
        from canonswap_tpu.nn.conv3d import pack_hw2, unpack_hw2

        x = pack_hw2(x)
        for i in range(c.num_resblocks):
            x = ResBlock3d(name=f"res3d_{i}", packed=True,
                           int8=c.int8_conv)(x, train)
        return unpack_hw2(x)
