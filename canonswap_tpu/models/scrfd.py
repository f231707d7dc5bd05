"""SCRFD-10GF face detector in JAX (the det_10g topology).

The reference runs SCRFD as an opaque ONNX session
(model_zoo/scrfd.py:72-303 wraps det_10g.onnx / scrfd_10g_bnkps.onnx).  Here
the network is a native flax model following the PUBLISHED SCRFD-10GF
architecture (Guo et al., "Sample and Computation Redistribution for
Efficient Face Detection", insightface mmdet config lineage):

  backbone  ResNetV1e — deep 3-conv stem (28, 28, 56) + 3x3/2 max-pool,
            BasicBlock stages, blocks (3, 4, 2, 3), planes (56, 88, 88, 224),
            strides (1, 2, 2, 2), avg-down shortcuts
  neck      PAFPN over C3/C4/C5 (88, 88, 224), out 56, 3 levels
  head      shared across strides (strides_share) and branches
            (cls_reg_share): 4 stacked 3x3 conv + norm + relu at 80 channels,
            then 3x3 score / bbox / kps branches, 2 anchors per position
            (scales {1, 2}), bbox/kps distances in stride units

Exact numeric fidelity to a real det_10g.onnx additionally needs the file's
weights: ``runtime/onnx_map.py`` zips them onto this module when the op
sequence matches, and ``runtime/onnx_exec.py`` executes ANY variant directly
as the compatibility fallback (no topology assumption at all).

Post-processing is the jittable fixed-capacity decode in ``ops/detection.py``
(distance2bbox/kps + score-sorted NMS semantics of scrfd.py:26-70, 275-303).

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
from canonswap_tpu.ops.resize import avg_pool, max_pool


def _bn(train: bool, name: str):
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, name=name)


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
            padding=((pad, pad), (pad, pad)), use_bias=False, name="conv",
        )(x)
        x = _bn(train, "bn")(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    """ResNet BasicBlock with the V1d/V1e avg-down shortcut: when the block
    downsamples (or changes width) the identity path is AvgPool 2x2 (stride
    2) then 1x1 conv + BN — not a strided 1x1 conv."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        h = ConvBNReLU(self.features, stride=self.stride, name="conv1")(
            x, train)
        h = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    name="conv2")(h)
        h = _bn(train, "bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.features:
            if self.stride != 1:
                residual = avg_pool(residual, (self.stride, self.stride))
            residual = nn.Conv(self.features, (1, 1), use_bias=False,
                               name="downsample")(residual)
            residual = _bn(train, "downsample_bn")(residual)
        return nn.relu(h + residual)


class ResNetV1e(nn.Module):
    """SCRFD-10GF backbone: deep stem + (3, 4, 2, 3) x (56, 88, 88, 224)
    BasicBlock stages; emits C3 (stride 8), C4 (16), C5 (32)."""

    stem_channels: int = 56
    stage_planes: Sequence[int] = (56, 88, 88, 224)
    stage_blocks: Sequence[int] = (3, 4, 2, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.stem_channels
        x = ConvBNReLU(c // 2, stride=2, name="stem0")(x, train)
        x = ConvBNReLU(c // 2, name="stem1")(x, train)
        x = ConvBNReLU(c, name="stem2")(x, train)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = max_pool(x, (3, 3), strides=(2, 2))
        feats = []
        for i, (w, d) in enumerate(zip(self.stage_planes, self.stage_blocks)):
            for j in range(d):
                stride = 2 if (j == 0 and i > 0) else 1
                x = BasicBlock(w, stride=stride, name=f"layer{i}_{j}")(
                    x, train)
            if i >= 1:
                feats.append(x)  # strides 8, 16, 32
        return feats


class PAFPN(nn.Module):
    """Path-aggregation FPN (mmdet PAFPN semantics): 1x1 laterals, top-down
    nearest-upsample adds, 3x3 fpn convs, bottom-up stride-2 adds, 3x3 pafpn
    convs on the aggregated levels."""

    out_channels: int = 56

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c = self.out_channels
        lat = [
            nn.Conv(c, (1, 1), name=f"lateral{i}")(f)
            for i, f in enumerate(feats)
        ]
        td = [None] * len(lat)
        td[-1] = lat[-1]
        for i in range(len(lat) - 2, -1, -1):
            up = jnp.repeat(jnp.repeat(td[i + 1], 2, axis=1), 2, axis=2)
            td[i] = lat[i] + up
        td = [
            nn.Conv(c, (3, 3), padding="SAME", name=f"fpn_conv{i}")(t)
            for i, t in enumerate(td)
        ]
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
    """Shared head (cls_reg_share + strides_share): 4 stacked conv+BN+relu at
    80 channels, then score/bbox/kps 3x3 branches; 2 anchors per location.
    The bnkps export uses BatchNorm in the head (the 'bn' in the name)."""

    channels: int = 80
    stacked: int = 4
    num_anchors: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x
        for i in range(self.stacked):
            h = nn.Conv(self.channels, (3, 3), padding="SAME",
                        use_bias=False, name=f"conv{i}")(h)
            h = _bn(train, f"bn{i}")(h)
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
        feats = ResNetV1e(name="backbone")(x, train)
        feats = PAFPN(name="neck")(feats, train)
        head = SCRFDHead(name="head")  # shared across strides (SCRFD design)
        return {s: head(f, train) for s, f in zip(self.strides, feats)}


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
