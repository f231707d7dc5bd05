"""ArcFace ID encoder (SE-IR ResNet) — the ``netArc`` identity embedder.

Re-design of reference models/arcface_models.py:10-136.  The reference ships
this as a whole pickled nn.Module (arcface_checkpoint.tar, loaded at
can_swap_e2e.py:82-85); the layer depths therefore live in the pickle — the
weight converter reads them out at conversion time.  Default (3, 4, 23, 3)
matches the SimSwap-lineage r100 checkpoint shape.

Forward returns ``(embedding, mid_feature)`` like the reference (the pipeline
uses output[0], can_swap_e2e.py:105).  ``get_id`` replicates ``getid``:
resize to 112, forward, L2-normalize.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from canonswap_tpu.ops.resize import adaptive_avg_pool, max_pool, nearest_resize


class PReLU(nn.Module):
    """Single-parameter PReLU, torch default init 0.25."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, a * x)


class SEBlock(nn.Module):
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # (N, C)
        y = nn.Dense(c // self.reduction, name="fc0")(y)
        y = PReLU(name="prelu")(y)
        y = nn.Dense(c, name="fc1")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class IRBlock(nn.Module):
    planes: int
    stride: int = 1
    use_se: bool = True
    downsample: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=name,
            )

        residual = x
        out = bn("bn0")(x)
        out = nn.Conv(x.shape[-1], (3, 3), padding="SAME", use_bias=False,
                      name="conv1")(out)
        out = bn("bn1")(out)
        prelu = PReLU(name="prelu")
        out = prelu(out)
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=((1, 1), (1, 1)), use_bias=False, name="conv2")(out)
        out = bn("bn2")(out)
        if self.use_se:
            out = SEBlock(name="se")(out)
        if self.downsample:
            residual = nn.Conv(
                self.planes, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, name="ds_conv",
            )(x)
            residual = bn("ds_bn")(residual)
        return prelu(out + residual)


class ArcFaceResNet(nn.Module):
    layers: tuple[int, int, int, int] = (3, 4, 23, 3)
    use_se: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, 112, 112, 3) normalized -> ((N, 512) emb, (N, 512*7*7)... )

        Returns (embedding, mid_feature) matching the reference dual output:
        mid_feature is layer3's 7x7-pooled flatten (arcface_models.py:122-126).
        """

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name=name,
            )

        # the reference conv1 has NO padding (arcface_models.py:72): 112 -> 110
        x = nn.Conv(64, (3, 3), padding="VALID", use_bias=False, name="conv1")(x)
        x = bn("bn1")(x)
        x = PReLU(name="prelu")(x)
        x = max_pool(x, (2, 2))

        plan = [(64, 1), (128, 2), (256, 2), (512, 2)]
        inplanes = 64
        mid = None
        for li, ((planes, stride), nblocks) in enumerate(zip(plan, self.layers)):
            for bi in range(nblocks):
                s = stride if bi == 0 else 1
                ds = bi == 0 and (s != 1 or inplanes != planes)
                x = IRBlock(
                    planes, s, self.use_se, ds, name=f"layer{li + 1}_{bi}"
                )(x, train)
                inplanes = planes
            if li == 2:  # after layer3: the reference's second output
                m = adaptive_avg_pool(x, (7, 7))
                # torch flattens NCHW (channel-major)
                mid = m.transpose(0, 3, 1, 2).reshape(m.shape[0], -1)

        x = bn("bn2")(x)
        # dropout is identity at inference; torch flatten is channel-major
        n = x.shape[0]
        x = x.transpose(0, 3, 1, 2).reshape(n, -1)  # NCHW flatten order
        x = nn.Dense(512, name="fc")(x)
        # torch BatchNorm1d on features
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn3"
        )(x)
        return x, mid


def get_id(model: ArcFaceResNet, params, img: jax.Array) -> jax.Array:
    """img: (N, H, W, 3) (already ImageNet-normalized, see pipeline) ->
    L2-normalized (N, 512) ID embedding (can_swap_e2e.py:102-107).

    The reference resizes with ``F.interpolate`` default mode == nearest."""
    x = nearest_resize(img, (112, 112))
    emb, _ = model.apply(params, x)
    return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
