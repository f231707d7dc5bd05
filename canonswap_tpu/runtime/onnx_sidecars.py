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
        # the real LivePortrait landmark.onnx emits several heads; the
        # 203x2 points are output index 2 (reference
        # human_landmark_runner.py:79 out_lst[2]); single-output graphs
        # (synthetic fixtures) keep index 0
        pred = outs[2] if len(outs) >= 3 else outs[0]
        pred = np.asarray(pred).reshape(-1, 2) * self.input_size
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


class OnnxINSwapperRunner:
    """inswapper_128.onnx through the executor (model_zoo/inswapper.py:21-114
    — routed-but-unusable in the reference: no ONNX ships).  Decode math:
    latent = L2(normed_embedding @ emap) where ``emap`` is the LAST graph
    initializer; forward(blob_128, latent) -> swapped crop; ``get`` blends it
    back with the diff-based feathered mask."""

    input_size = 128

    def __init__(self, path):
        from canonswap_tpu.runtime.onnx_import import load_onnx

        graph = load_onnx(path)
        # insightface reads graph.initializer[-1] as the id-projection map
        self.emap = np.asarray(list(graph.initializers.values())[-1],
                               np.float32)
        self._run, self._ex = make_jit_runner(graph)

    def latent(self, normed_embedding: np.ndarray) -> np.ndarray:
        lat = np.asarray(normed_embedding, np.float32).reshape(1, -1)
        lat = lat @ self.emap
        return lat / np.linalg.norm(lat)

    def forward(self, crop_rgb: np.ndarray, latent: np.ndarray) -> np.ndarray:
        """crop_rgb uint8 (128,128,3) + latent (1,512) -> swapped RGB
        float [0,1] (1,128,128,3)."""
        blob = crop_rgb.astype(np.float32)[None] / 255.0
        pred = np.asarray(self._run(_nchw(blob), jnp.asarray(latent))[0])
        return np.clip(pred.transpose(0, 2, 3, 1), 0, 1)

    def get(self, img_rgb, target_kps, source_normed_embedding):
        """Swap ``source``'s identity onto the face at ``target_kps`` in
        ``img_rgb``; returns the blended full image (inswapper.py:46-114
        semantics with the diff-threshold feathered paste-back)."""
        import cv2

        from canonswap_tpu.utils.face_align import estimate_norm_arcface

        M = estimate_norm_arcface(np.asarray(target_kps, np.float32),
                                  self.input_size)
        aimg = cv2.warpAffine(img_rgb, M,
                              (self.input_size, self.input_size))
        fake = (self.forward(aimg, self.latent(source_normed_embedding))[0]
                * 255.0).astype(np.uint8)
        IM = cv2.invertAffineTransform(M)
        h, w = img_rgb.shape[:2]
        fake_full = cv2.warpAffine(fake, IM, (w, h), borderValue=0.0)
        white = np.full((self.input_size, self.input_size), 255.0, np.float32)
        mask = cv2.warpAffine(white, IM, (w, h), borderValue=0.0)
        mask[mask > 20] = 255
        diff = np.abs(fake.astype(np.float32)
                      - aimg.astype(np.float32)).mean(axis=2)
        diff[:2, :] = 0
        diff[-2:, :] = 0
        diff[:, :2] = 0
        diff[:, -2:] = 0
        diff_full = cv2.warpAffine(diff, IM, (w, h), borderValue=0.0)
        diff_full = np.where(diff_full < 10, 0.0, 255.0).astype(np.float32)
        idx = np.where(mask == 255)
        if len(idx[0]) == 0:
            return img_rgb
        msize = int(np.sqrt((idx[0].max() - idx[0].min())
                            * (idx[1].max() - idx[1].min())))
        k = max(msize // 10, 10)
        mask = cv2.erode(mask, np.ones((k, k), np.uint8))
        kb = max(msize // 20, 5)
        mask = cv2.GaussianBlur(mask, (2 * kb + 1, 2 * kb + 1), 0)
        diff_full = cv2.blur(diff_full, (11, 11), 0)
        m = (mask / 255.0) * (diff_full / 255.0)
        m = m[..., None]
        out = m * fake_full.astype(np.float32) \
            + (1 - m) * img_rgb.astype(np.float32)
        return out.astype(np.uint8)


class OnnxAttributeRunner:
    """genderage.onnx through the executor (model_zoo/attribute.py:33-92):
    1.5x bbox crop to the model size, (x-127.5)/128 blob, (gender, age)."""

    def __init__(self, path, input_size=96):
        self.input_size = input_size
        self._run, self._ex = make_jit_runner(path)

    def get(self, img_rgb: np.ndarray, bbox) -> tuple[int, int]:
        import cv2

        w, h = bbox[2] - bbox[0], bbox[3] - bbox[1]
        cx, cy = (bbox[2] + bbox[0]) / 2, (bbox[3] + bbox[1]) / 2
        s = self.input_size / (max(w, h) * 1.5)
        t = self.input_size / 2
        M = np.array([[s, 0, t - s * cx], [0, s, t - s * cy]], np.float32)
        aimg = cv2.warpAffine(img_rgb, M, (self.input_size, self.input_size))
        blob = (aimg.astype(np.float32) - 127.5) / 128.0
        pred = np.asarray(self._run(_nchw(blob[None]))[0]).reshape(-1)
        gender = int(np.argmax(pred[:2]))
        age = int(np.round(pred[2] * 100))
        return gender, age
