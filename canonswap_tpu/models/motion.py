"""Motion extractor M: image -> implicit keypoints / pose / expression.

Re-design of reference src/modules/motion_extractor.py:18-35 (ConvNeXtV2-tiny
backbone + 7 linear heads).  ``refine_kp_info`` applies the post-processing
the reference does in can_swapper.get_kp_info (can_swap_e2e.py:190-198):
pose bins -> degrees, kp/exp reshaped to (B, K, 3).
"""

from __future__ import annotations

import jax
from flax import linen as nn

from canonswap_tpu.configs.model_config import MotionConfig
from canonswap_tpu.nn.convnext import ConvNeXtV2
from canonswap_tpu.ops.pose import headpose_to_degree


class MotionExtractor(nn.Module):
    cfg: MotionConfig = MotionConfig()

    @nn.compact
    def __call__(self, image, train: bool = False):
        """image: (B, S, S, 3) in [0, 1] -> dict of raw head outputs."""
        return ConvNeXtV2(
            depths=tuple(self.cfg.depths),
            dims=tuple(self.cfg.dims),
            num_kp=self.cfg.num_kp,
            num_bins=self.cfg.num_bins,
            name="detector",
        )(image, train)


def refine_kp_info(kp_info: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """Raw head outputs -> refined motion dict.

    pitch/yaw/roll: (B, 1) degrees; kp/exp: (B, K, 3); t: (B, 3); scale: (B, 1).
    Keypoint math runs in float32 even under half-precision inference — the
    reference floats the kp dict the same way (can_swap_e2e.py:184-188).
    """
    import jax.numpy as jnp

    kp_info = {k: v.astype(jnp.float32) for k, v in kp_info.items()}
    b = kp_info["kp"].shape[0]
    out = dict(kp_info)
    out["pitch"] = headpose_to_degree(kp_info["pitch"])[:, None]
    out["yaw"] = headpose_to_degree(kp_info["yaw"])[:, None]
    out["roll"] = headpose_to_degree(kp_info["roll"])[:, None]
    out["kp"] = kp_info["kp"].reshape(b, -1, 3)
    out["exp"] = kp_info["exp"].reshape(b, -1, 3)
    return out
