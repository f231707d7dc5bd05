"""SCRFD-style face detector in JAX (backbone + PAFPN + per-stride heads).

The reference runs SCRFD as an opaque ONNX session (scrfd.py:72-303 wraps
det_10g.onnx / scrfd_10g_bnkps.onnx).  Here the network is a native flax
model: a residual backbone, a path-aggregation FPN, and the SCRFD head
(shared stacked convs + GroupNorm, 2 anchors per location, score/bbox/5-kps
branches per stride {8, 16, 32}).  Post-processing is the jittable
fixed-capacity decode in ``ops/detection.py``.

Weight import: the exact 10G checkpoint lives in ONNX files the user supplies;
``runtime/onnx_import.py`` extracts initializers which map onto these modules
(channel layouts match insightface's mmdet export).  Random-weight instances
still exercise the full jit/shape path (and training code can fine-tune).

Preprocessing matches the reference: (img - 127.5) / 128, aspect-preserving
letterbox to the detector input size (scrfd.py:154, 220-235).
"""

from __future__ import annotations

from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from canonswap_tpu.ops.detection import decode_scrfd
from canonswap_tpu.ops.resize import max_pool


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)), use_bias=False,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        h = ConvBNReLU(self.features, stride=self.stride)(x, train)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5)(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample",
            )(x)
            residual = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="downsample_bn",
            )(residual)
        return nn.relu(h + residual)


class Backbone(nn.Module):
    """Residual backbone emitting C3 (stride 8), C4 (16), C5 (32)."""

    widths: Sequence[int] = (56, 88, 88, 224)
    depths: Sequence[int] = (3, 4, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNReLU(self.widths[0] // 2, stride=2, name="stem0")(x, train)
        x = ConvBNReLU(self.widths[0] // 2, name="stem1")(x, train)
        feats = []
        for i, (w, d) in enumerate(zip(self.widths, self.depths)):
            for j in range(d):
                x = ResBlock(
                    w, stride=2 if j == 0 else 1, name=f"layer{i}_{j}"
                )(x, train)
            if i >= 1:
                feats.append(x)  # strides 8, 16, 32
        return feats


class PAFPN(nn.Module):
    """Path-aggregation FPN: top-down then bottom-up fusion."""

    out_channels: int = 56

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c = self.out_channels
        lat = [
            nn.Conv(c, (1, 1), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        # top-down
        td = [None] * len(lat)
        td[-1] = lat[-1]
        for i in range(len(lat) - 2, -1, -1):
            up = jnp.repeat(jnp.repeat(td[i + 1], 2, axis=1), 2, axis=2)
            td[i] = lat[i] + up
        td = [
            nn.Conv(c, (3, 3), padding="SAME", name=f"fpn_conv{i}")(t)
            for i, t in enumerate(td)
        ]
        # bottom-up
        out = [td[0]]
        for i in range(1, len(td)):
            down = nn.Conv(
                c, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                name=f"down_conv{i}",
            )(out[-1])
            out.append(td[i] + down)
        out = [out[0]] + [
            nn.Conv(c, (3, 3), padding="SAME", name=f"pafpn_conv{i}")(o)
            for i, o in enumerate(out[1:], start=1)
        ]
        return out


class SCRFDHead(nn.Module):
    """Shared head: stacked conv+GN, then score/bbox/kps branches.
    Outputs per anchor: 1 score, 4 bbox distances, 10 kps offsets."""

    channels: int = 80
    stacked: int = 2
    num_anchors: int = 2

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.stacked):
            h = nn.Conv(self.channels, (3, 3), padding="SAME", name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=8, name=f"gn{i}")(h)
            h = nn.relu(h)
        a = self.num_anchors
        score = nn.Conv(a * 1, (3, 3), padding="SAME", name="cls")(h)
        bbox = nn.Conv(a * 4, (3, 3), padding="SAME", name="reg")(h)
        kps = nn.Conv(a * 10, (3, 3), padding="SAME", name="kps")(h)
        b = x.shape[0]
        return {
            "score": jax.nn.sigmoid(score).reshape(b, -1, 1),
            "bbox": bbox.reshape(b, -1, 4),
            "kps": kps.reshape(b, -1, 10),
        }


class SCRFD(nn.Module):
    """Full detector; input (B, S, S, 3) preprocessed, outputs per stride."""

    strides: Sequence[int] = (8, 16, 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = Backbone(name="backbone")(x, train)
        feats = PAFPN(name="neck")(feats, train)
        head = SCRFDHead(name="head")  # shared across strides (SCRFD design)
        return {s: head(f) for s, f in zip(self.strides, feats)}


def preprocess(img: np.ndarray, input_size=(640, 640)):
    """Aspect-preserving letterbox + (x-127.5)/128 (scrfd.py:154, 220-235).

    Returns (blob (1, H, W, 3) float32, det_scale)."""
    import cv2

    h, w = img.shape[:2]
    im_ratio = h / w
    model_ratio = input_size[1] / input_size[0]
    if im_ratio > model_ratio:
        new_h = input_size[1]
        new_w = int(new_h / im_ratio)
    else:
        new_w = input_size[0]
        new_h = int(new_w * im_ratio)
    det_scale = new_h / h
    resized = cv2.resize(img, (new_w, new_h))
    det_img = np.zeros((input_size[1], input_size[0], 3), np.uint8)
    det_img[:new_h, :new_w] = resized
    blob = (det_img.astype(np.float32) - 127.5) / 128.0
    return blob[None], det_scale


def detect(
    model: SCRFD,
    params,
    blob: jax.Array,
    *,
    input_size=(640, 640),
    score_thresh: float = 0.5,
    iou_thresh: float = 0.4,
    topk: int = 128,
):
    """blob (B, H, W, 3) -> fixed-size detections (see ops.detection)."""
    outputs = model.apply(params, blob)
    return decode_scrfd(
        outputs,
        input_size=input_size,
        score_thresh=score_thresh,
        iou_thresh=iou_thresh,
        topk=topk,
    )
