"""Run real user-supplied sidecar .onnx files through the generic graph
executor (runtime/onnx_exec.py) behind the SAME runner interfaces as the
native flax sidecars.

This is the no-topology-assumption path for the reference's four sidecar
checkpoints (readme.md:32-48): det_10g.onnx, 2d106det.onnx, landmark.onnx,
glintr100.onnx.  The flax rebuilds (models/scrfd.py, models/landmark.py,
models/arcface.py) stay the fast path — weights zip onto them via
runtime/onnx_map.py when the op sequence matches; when it doesn't, these
wrappers interpret the graph as-is, jitted by XLA, so detection/landmarks
remain numerically exact to the file.

All adapters translate our NHWC runner conventions to the graphs' NCHW.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from canonswap_tpu.runtime.onnx_exec import make_jit_runner


def _nchw(blob_nhwc):
    return jnp.transpose(jnp.asarray(blob_nhwc), (0, 3, 1, 2))


def make_scrfd_onnx_apply(path, strides=(8, 16, 32)):
    """-> apply(blob_nhwc) returning the per-stride dict that
    ops/detection.decode_scrfd consumes ({stride: {score,bbox,kps}}).

    det_10g emits 3 x fmc outputs (scores / bbox-distances / 5-kps per
    stride, model_zoo/scrfd.py:110-152); they are classified by trailing
    dim (1/4/10) and ordered by row count (stride 8 has the most anchors)."""
    run, ex = make_jit_runner(path)

    def apply(blob_nhwc):
        outs = run(_nchw(blob_nhwc))
        b = blob_nhwc.shape[0]
        by_kind = {1: [], 4: [], 10: []}
        for o in outs:
            o = jnp.asarray(o)
            k = int(o.shape[-1])
            if k not in by_kind:
                raise ValueError(
                    f"unexpected detector output trailing dim {k} "
                    f"(shape {o.shape}) — not an SCRFD-family graph?")
            by_kind[k].append(o.reshape(b, -1, k))
        for k, lst in by_kind.items():
            if len(lst) != len(strides):
                raise ValueError(
                    f"expected {len(strides)} outputs with dim {k}, got "
                    f"{len(lst)}")
            lst.sort(key=lambda o: -o.shape[1])  # stride 8 first
        return {
            s: {"score": by_kind[1][i], "bbox": by_kind[4][i],
                "kps": by_kind[10][i]}
            for i, s in enumerate(strides)
        }

    return apply


class OnnxLandmark106Runner:
    """2d106det.onnx through the executor, with the insightface Landmark.get
    geometry (model_zoo/landmark.py:80-112): center/scale crop to 192,
    mean 0 / std 1 blob, (pred+1)*size/2, inverse-affine back."""

    input_size = 192

    def __init__(self, path):
        self._run, self._ex = make_jit_runner(path)

    def get(self, img: np.ndarray, bbox) -> np.ndarray:
        from canonswap_tpu.models.landmark import Landmark106Runner
        from canonswap_tpu.utils import geometry as G

        M = Landmark106Runner.crop_transform(self, bbox)
        crop = G.warp_affine(img, M, self.input_size)
        blob = crop.astype(np.float32)[None]
        pred = np.asarray(self._run(_nchw(blob))[0]).reshape(-1, 2)
        pts = (pred + 1.0) * (self.input_size // 2)
        Minv = np.linalg.inv(np.vstack([M, [0, 0, 1]]))[:2]
        return G.transform_pts(pts, Minv)


class OnnxLandmark203Runner:
    """LivePortrait landmark.onnx through the executor, with the
    human_landmark_runner.py:60-85 geometry: crop 224 (scale 1.5, vy -0.1),
    /255 blob, out*224, M_c2o back."""

    input_size = 224

    def __init__(self, path):
        self._run, self._ex = make_jit_runner(path)

    def run(self, img_rgb: np.ndarray, lmk=None) -> np.ndarray:
        from canonswap_tpu.utils import geometry as G

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
        outs = self._run(_nchw(blob))
        # landmark.onnx emits the 203x2 points as its first (or only) output
        pred = np.asarray(outs[0]).reshape(-1, 2) * self.input_size
        return G.transform_pts(pred, M_c2o)


class OnnxArcFaceRunner:
    """glintr100.onnx through the executor (arcface_onnx.py:19-90): aligned
    112x112 crop, (x-127.5)/127.5 blob, 512-d embedding."""

    input_size = 112

    def __init__(self, path):
        self._run, self._ex = make_jit_runner(path)

    def get_feat(self, aligned_rgb: np.ndarray) -> np.ndarray:
        if aligned_rgb.ndim == 3:
            aligned_rgb = aligned_rgb[None]
        blob = (aligned_rgb.astype(np.float32) - 127.5) / 127.5
        return np.asarray(self._run(_nchw(blob))[0])
