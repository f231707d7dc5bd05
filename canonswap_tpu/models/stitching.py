"""Stitching / eye / lip retargeting MLPs.

Re-design of reference src/modules/stitching_retargeting_network.py:18-38
(hyper-params models.yaml:31-43).  These are latent in the reference (the
pipelines force flag_stitching=False and never instantiate them,
can_swap_e2e.py:258-282), but they are part of the component surface, so we
ship working equivalents: simple ReLU MLPs mapping concat(kp, ratio) -> kp
deltas.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax.numpy as jnp
from flax import linen as nn


class StitchingRetargetingNetwork(nn.Module):
    hidden_sizes: Sequence[int]
    output_size: int

    @nn.compact
    def __call__(self, x):
        for i, h in enumerate(self.hidden_sizes):
            x = nn.relu(nn.Dense(h, name=f"fc{i}")(x))
        return nn.Dense(self.output_size, name="out")(x)


def concat_feat(kp, ratio):
    """concat(flatten(kp), ratio) (helper.py concat_feat equivalent)."""
    b = kp.shape[0]
    return jnp.concatenate([kp.reshape(b, -1), ratio.reshape(b, -1)], axis=1)


class StitchingModule(nn.Module):
    """Bundle of the three retargeting MLPs (S, R_eye, R_lip) with the
    LivePortrait retarget/stitch math the reference's vestigial methods
    reference (can_swap_e2e.py:258-282; hyper-params models.yaml:31-43)."""

    num_kp: int = 21

    def setup(self):
        k3 = self.num_kp * 3
        self.stitching = StitchingRetargetingNetwork(
            hidden_sizes=(128, 128, 64), output_size=k3 + 2, name="stitching"
        )
        self.eye = StitchingRetargetingNetwork(
            hidden_sizes=(256, 256, 128, 128, 64), output_size=k3, name="eye"
        )
        self.lip = StitchingRetargetingNetwork(
            hidden_sizes=(128, 128, 64), output_size=k3, name="lip"
        )

    def __call__(self, kp_source, kp_driving):
        """Init helper: runs all three nets once."""
        eye_ratio = jnp.zeros((kp_source.shape[0], 3), kp_source.dtype)
        lip_ratio = jnp.zeros((kp_source.shape[0], 2), kp_source.dtype)
        return (
            self.stitch(kp_source, kp_driving),
            self.retarget_eye(kp_source, eye_ratio),
            self.retarget_lip(kp_source, lip_ratio),
        )

    def stitch(self, kp_source, kp_driving):
        """kp_driving' = kp_driving + delta (+ tx/ty on xy): the LivePortrait
        stitching that keeps the un-cropped regions stable."""
        b, k, _ = kp_driving.shape
        feat = concat_feat(kp_source, kp_driving)
        delta = self.stitching(feat)
        kp = kp_driving + delta[:, : k * 3].reshape(b, k, 3)
        return kp.at[..., 0:2].add(delta[:, k * 3 : k * 3 + 2][:, None, :])

    def retarget_eye(self, kp_source, eye_close_ratio):
        """(B,K,3) + (B,3) -> (B,K,3) delta (can_swap_e2e.py:258-269)."""
        delta = self.eye(concat_feat(kp_source, eye_close_ratio))
        return delta.reshape(-1, kp_source.shape[1], 3)

    def retarget_lip(self, kp_source, lip_close_ratio):
        """(B,K,3) + (B,2) -> (B,K,3) delta (can_swap_e2e.py:271-282)."""
        delta = self.lip(concat_feat(kp_source, lip_close_ratio))
        return delta.reshape(-1, kp_source.shape[1], 3)
