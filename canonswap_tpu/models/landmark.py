"""Facial landmark networks (106-pt dense + 203-pt refiner) in JAX.

The reference runs both as opaque ONNX sessions:
  - 2d106det (192x192, insightface Landmark.get, model_zoo/landmark.py:80-112)
    decode: pred in [-1,1] -> (pred+1) * size/2 -> inverse-affine to image.
  - landmark.onnx (LivePortrait 203-pt, 224x224, human_landmark_runner.py:60-85)
    decode: pred in [0,1] -> * 224 -> M_c2o to image.

Here they are native flax models (residual trunks + regression head).
The exact ONNX weights import via runtime/onnx_import.py when the user
supplies the files (and runtime/onnx_exec.py executes ANY real file's graph
directly); random-weight instances keep the full pipeline runnable and
trainable.  The *geometry* around them (crop construction, de-normalize,
inverse transform, frame-to-frame tracking) matches the reference exactly —
that is what determines pipeline behaviour.

Benchmark-cost honesty (the trunks are stand-ins, not the 2d106det /
landmark.onnx graphs): at the default widths the trunks measure 3.13 M
params / 3.31 GFLOPs per 224^2 frame (203-pt) and 3.03 M params /
2.42 GFLOPs per 192^2 frame (106-pt) — compiled-HLO cost_analysis, 2026-08.
The public insightface files they stand in for are MobileNet-class
(2d106det.onnx is ~5 MB ~= 1.3 M fp32 params; LivePortrait's landmark.onnx
is the same lineage), i.e. WELL UNDER 1 GFLOP/frame.  The benchmarked
landmark stage is therefore heavier than the real one — headline e2e fps is
conservative w.r.t. landmark cost, not optimistic.  bench.py also reports
the whole sidecar stage (landmark + parsing) as ``sidecars_ms_per_frame``
derived from its e2e-vs-core slope difference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from canonswap_tpu.ops.resize import avg_pool
from canonswap_tpu.utils import geometry as G


class _TrunkBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        # explicit (1,1) padding: flax SAME pads (0,1) under stride 2,
        # torch/ONNX producers pad (1,1) — must match for imported weights
        h = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding=((1, 1), (1, 1)), use_bias=False)(x)
        import math

        groups = math.gcd(self.features, 16)
        # epsilon 1e-5: the torch/ONNX GroupNorm convention — imported
        # weights from torch-exported files assume it (flax defaults 1e-6,
        # which diverges visibly on low-variance activations)
        h = nn.GroupNorm(num_groups=groups, epsilon=1e-5)(h)
        h = nn.relu(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(h)
        h = nn.GroupNorm(num_groups=groups, epsilon=1e-5)(h)
        if self.stride != 1 or residual.shape[-1] != self.features:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride,) * 2,
                use_bias=False, name="short",
            )(x)
        return nn.relu(h + residual)


class LandmarkNet(nn.Module):
    """Trunk + pooled regression head -> (B, num_points * dims)."""

    num_points: int
    dims: int = 2
    widths: tuple[int, ...] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.widths[0], (3, 3), strides=(2, 2),
                    padding=((1, 1), (1, 1)))(x)  # torch pad convention
        h = nn.relu(h)
        for i, w in enumerate(self.widths):
            h = _TrunkBlock(w, stride=2 if i > 0 else 1, name=f"block{i}")(h)
            h = _TrunkBlock(w, name=f"block{i}b")(h)
        h = jnp.mean(h, axis=(1, 2))
        h = nn.Dense(512, name="fc0")(h)
        h = nn.relu(h)
        return nn.Dense(self.num_points * self.dims, name="head")(h)


class Landmark106Runner:
    """2d106det equivalent: bbox -> 192 crop -> net -> de-normalized points.

    Decode matches model_zoo/landmark.py:80-104: center/scale affine crop,
    prediction in [-1, 1], (pred+1)*size/2, inverse-affine back.
    """

    input_size = 192

    def __init__(self, params=None, rng=None, widths=(32, 64, 128, 256)):
        self.net = LandmarkNet(num_points=106, widths=tuple(widths))
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            params = self.net.init(
                rng, jnp.zeros((1, self.input_size, self.input_size, 3))
            )
        self.params = params
        self._apply = jax.jit(self.net.apply)

    def crop_transform(self, bbox):
        """bbox -> 2x3 affine img->crop (center crop, scale 1.5)."""
        w, h = bbox[2] - bbox[0], bbox[3] - bbox[1]
        cx, cy = (bbox[2] + bbox[0]) / 2, (bbox[3] + bbox[1]) / 2
        s = self.input_size / (max(w, h, 1e-3) * 1.5)  # guard zero-size boxes
        t = self.input_size / 2
        return np.array(
            [[s, 0, t - s * cx], [0, s, t - s * cy]], np.float32
        )

    def get(self, img: np.ndarray, bbox) -> np.ndarray:
        M = self.crop_transform(bbox)
        crop = G.warp_affine(img, M, self.input_size)
        blob = crop.astype(np.float32)[None]  # mean 0 / std 1 convention
        pred = np.asarray(self._apply(self.params, jnp.asarray(blob)))[0]
        pts = pred.reshape(-1, 2)
        pts = (pts + 1.0) * (self.input_size // 2)
        Minv = np.linalg.inv(np.vstack([M, [0, 0, 1]]))[:2]
        return G.transform_pts(pts, Minv)


class Landmark203Runner:
    """LivePortrait 203-pt refiner equivalent (human_landmark_runner.py:26-95):
    crop 224 around previous landmarks (scale 1.5, vy -0.1), net, *224,
    M_c2o back — drives frame-to-frame landmark tracking."""

    input_size = 224

    def __init__(self, params=None, rng=None, widths=(32, 64, 128, 256)):
        self.net = LandmarkNet(num_points=203, widths=tuple(widths))
        if params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(1)
            params = self.net.init(
                rng, jnp.zeros((1, self.input_size, self.input_size, 3))
            )
        self.params = params
        self._apply = jax.jit(self.net.apply)

    def run(self, img_rgb: np.ndarray, lmk=None) -> np.ndarray:
        if lmk is not None:
            crop_dct = G.crop_image(
                img_rgb, lmk, dsize=self.input_size, scale=1.5, vy_ratio=-0.1
            )
            crop = crop_dct["img_crop"]
            M_c2o = crop_dct["M_c2o"]
        else:
            import cv2

            crop = cv2.resize(img_rgb, (self.input_size, self.input_size))
            scale = max(img_rgb.shape[:2]) / self.input_size
            M_c2o = np.diag([scale, scale, 1.0]).astype(np.float32)
        blob = (crop.astype(np.float32) / 255.0)[None]
        pred = np.asarray(self._apply(self.params, jnp.asarray(blob)))[0]
        pts = pred.reshape(-1, 2) * self.input_size
        return G.transform_pts(pts, M_c2o)
