"""Warping module W: applies the dense deformation to the feature volume.

Re-design of reference src/modules/warping_network.py:14-111.  Exposes the
same three entry points the pipelines use:

  - ``warp``      : dense motion + trilinear warp -> (volume, occlusion)
  - ``warp_out``  : volume -> 2D 512ch -> SameBlock+1x1 conv -> x occlusion
  - ``__call__``  : fused warp + warp_out (the reference's forward)
"""

from __future__ import annotations

from flax import linen as nn

from canonswap_tpu.configs.model_config import WarpingConfig
from canonswap_tpu.models.dense_motion import DenseMotionNetwork
from canonswap_tpu.nn.blocks import SameBlock2d
from canonswap_tpu.ops.grid_sample import grid_sample_3d_packed
from canonswap_tpu.ops.resize import volume_to_2d


class WarpingNetwork(nn.Module):
    cfg: WarpingConfig = WarpingConfig()

    def setup(self):
        c = self.cfg
        self.dense_motion_network = DenseMotionNetwork(
            cfg=c.dense_motion,
            num_kp=c.num_kp,
            estimate_occlusion_map=c.estimate_occlusion_map,
            field_scale=c.dense_motion_scale,
        )
        out_ch = c.block_expansion * (2**c.num_down_blocks)
        self.third = SameBlock2d(out_ch, lrelu=True)
        self.fourth = nn.Conv(out_ch, (1, 1))

    def warp(self, feature_3d, kp_driving, kp_source, train: bool = False):
        """feature_3d: (B, D, H, W, C); kp_*: (B, K, 3).

        Returns (warped volume, occlusion map (B, H, W, 1), dense_motion dict).
        """
        dense = self.dense_motion_network(
            feature_3d, kp_driving=kp_driving, kp_source=kp_source, train=train
        )
        # trilinear warp backend (WarpingConfig.warp_impl): the XLA
        # corner-packed gather everywhere, or the Pallas one-hot MXU
        # kernel on TPU (ops/pallas/warp.py; int8 variant = fast bundle)
        impl = self.cfg.warp_impl
        if impl in ("pallas", "pallas_quant"):
            # the custom-partitioned wrapper shards the batch axis under a
            # mesh (per-sample gather) and is a pass-through single-chip
            from canonswap_tpu.ops.pallas.warp import (
                grid_sample_3d_onehot_sharded)

            warped = grid_sample_3d_onehot_sharded(
                feature_3d, dense["deformation"], pblk=256,
                quant=impl == "pallas_quant",
            )
        elif impl == "packed":
            warped = grid_sample_3d_packed(feature_3d, dense["deformation"])
        else:
            raise ValueError(f"unknown warp_impl: {impl!r}")
        return warped, dense.get("occlusion_map"), dense

    def warp_out(self, volume, occlusion_map=None, train: bool = False):
        """(B, D, H, W, C) -> (B, H, W, 256) decoder input."""
        x = volume_to_2d(volume)  # (B, H, W, C*D) == torch channel order
        x = self.third(x, train)
        x = self.fourth(x)
        if occlusion_map is not None:
            x = x * occlusion_map
        return x

    def __call__(self, feature_3d, kp_driving, kp_source, train: bool = False):
        warped, occ, dense = self.warp(
            feature_3d, kp_driving=kp_driving, kp_source=kp_source, train=train
        )
        out = self.warp_out(warped, occ, train)
        return {
            "out": out,
            "occlusion_map": occ,
            "deformation": dense["deformation"],
        }
