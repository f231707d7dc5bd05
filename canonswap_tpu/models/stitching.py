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
