"""ConvNeXtV2 backbone (channels-last) for the motion extractor.

Re-designed from the reference's src/modules/convnextv2.py:15-149 (itself the
public ConvNeXtV2). On TPU the network is naturally channels-last: the
reference's NCHW<->NHWC permutes around LayerNorm/GRN disappear entirely.

Inference path only needs deterministic behaviour; DropPath (stochastic
depth) is applied only when ``train=True`` and a 'droppath' RNG is provided.
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class GRN(nn.Module):
    """Global response normalization (util.py:356-368); x is (N, H, W, C)."""

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.zeros, (dim,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        gx = jnp.sqrt(jnp.sum(x**2, axis=(1, 2), keepdims=True))  # L2 over H,W
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class ConvNeXtBlock(nn.Module):
    """dwconv7x7 -> LN -> pw 4x -> GELU -> GRN -> pw (convnextv2.py:15-45)."""

    dim: int
    drop_path: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x
        x = nn.Conv(
            self.dim, (7, 7), padding="SAME", feature_group_count=self.dim,
            name="dwconv",
        )(x)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(4 * self.dim, name="pwconv1")(x)
        x = nn.gelu(x, approximate=False)
        x = GRN(name="grn")(x)
        x = nn.Dense(self.dim, name="pwconv2")(x)
        if train and self.drop_path > 0.0:
            keep = 1.0 - self.drop_path
            rng = self.make_rng("droppath")
            mask = jax.random.bernoulli(
                rng, keep, (x.shape[0],) + (1,) * (x.ndim - 1)
            )
            x = x * mask / keep
        return inp + x


class ConvNeXtV2(nn.Module):
    """4-stage ConvNeXtV2 trunk + the 7 motion heads (convnextv2.py:48-144).

    Returns a dict {pitch, yaw, roll, t, exp, scale, kp} of raw head outputs.
    """

    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_kp: int = 21
    num_bins: int = 66
    drop_path_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        import numpy as np

        dp_rates = np.linspace(0.0, self.drop_path_rate, sum(self.depths))
        cur = 0
        for i in range(4):
            if i == 0:
                x = nn.Conv(self.dims[0], (4, 4), strides=(4, 4), name="stem_conv")(x)
                x = nn.LayerNorm(epsilon=1e-6, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(epsilon=1e-6, name=f"down{i}_norm")(x)
                x = nn.Conv(
                    self.dims[i], (2, 2), strides=(2, 2), name=f"down{i}_conv"
                )(x)
            for j in range(self.depths[i]):
                x = ConvNeXtBlock(
                    self.dims[i],
                    drop_path=float(dp_rates[cur + j]),
                    name=f"stage{i}_block{j}",
                )(x, train)
            cur += self.depths[i]

        x = jnp.mean(x, axis=(1, 2))  # global average pool -> (N, C)
        x = nn.LayerNorm(epsilon=1e-6, name="head_norm")(x)

        return {
            "kp": nn.Dense(3 * self.num_kp, name="fc_kp")(x),
            "pitch": nn.Dense(self.num_bins, name="fc_pitch")(x),
            "yaw": nn.Dense(self.num_bins, name="fc_yaw")(x),
            "roll": nn.Dense(self.num_bins, name="fc_roll")(x),
            "t": nn.Dense(3, name="fc_t")(x),
            "exp": nn.Dense(3 * self.num_kp, name="fc_exp")(x),
            "scale": nn.Dense(1, name="fc_scale")(x),
        }
