"""Face analysis: detection + landmarks + aligned ID crops.

The JAX-native replacement for the reference's onnxruntime-driven
FaceAnalysisDIY (face_analysis_diy.py:35-79) and Face_detect_crop
(insightface_func/face_detect_crop_{single,multi}.py): SCRFD runs jitted on
device; sorting/alignment geometry runs on host.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from canonswap_tpu.models import scrfd as S
from canonswap_tpu.models.landmark import Landmark106Runner
from canonswap_tpu.utils import face_align as FA


@dataclasses.dataclass
class Face:
    bbox: np.ndarray  # (4,) x1y1x2y2 in image coords
    kps: np.ndarray  # (5, 2)
    det_score: float
    landmark_2d_106: np.ndarray | None = None


def sort_faces(faces: list[Face], direction: str = "large-small",
               face_center=None) -> list[Face]:
    """Reference sort_by_direction (face_analysis_diy.py:14-32)."""
    if not faces:
        return faces
    if direction == "left-right":
        return sorted(faces, key=lambda f: f.bbox[0])
    if direction == "right-left":
        return sorted(faces, key=lambda f: f.bbox[0], reverse=True)
    if direction == "top-bottom":
        return sorted(faces, key=lambda f: f.bbox[1])
    if direction == "bottom-top":
        return sorted(faces, key=lambda f: f.bbox[1], reverse=True)
    area = lambda f: (f.bbox[2] - f.bbox[0]) * (f.bbox[3] - f.bbox[1])  # noqa: E731
    if direction == "small-large":
        return sorted(faces, key=area)
    if direction == "large-small":
        return sorted(faces, key=area, reverse=True)
    if direction == "distance-from-retarget-face" and face_center is not None:
        def dist(f):
            cx = (f.bbox[2] + f.bbox[0]) / 2 - face_center[0]
            cy = (f.bbox[3] + f.bbox[1]) / 2 - face_center[1]
            return (cx**2 + cy**2) ** 0.5
        return sorted(faces, key=dist)
    return faces


class FaceAnalysis:
    """SCRFD + optional 106-landmark per face, with direction sorting."""

    def __init__(
        self,
        det_params=None,
        lmk106: Landmark106Runner | None = None,
        det_size: tuple[int, int] = (512, 512),
        det_thresh: float = 0.5,
        rng=None,
        det_onnx: str | None = None,
    ):
        """``det_onnx``: path to a real det_10g.onnx — the graph is executed
        directly (runtime/onnx_sidecars.py), no topology assumption; without
        it the native flax SCRFD runs (weights via runtime/onnx_map.py or
        random)."""
        self.det_size = det_size
        self.det_thresh = det_thresh
        if det_onnx is not None:
            from canonswap_tpu.ops.detection import decode_scrfd
            from canonswap_tpu.runtime.onnx_sidecars import (
                make_scrfd_onnx_apply)

            onnx_apply = make_scrfd_onnx_apply(det_onnx)
            self.det_model = None
            self.det_params = None

            def _detect(_params, blob):
                return decode_scrfd(
                    onnx_apply(blob), input_size=self.det_size,
                    score_thresh=self.det_thresh,
                )

            self._detect = _detect
            self.lmk106 = lmk106
            return
        self.det_model = S.SCRFD()
        if det_params is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            det_params = self.det_model.init(
                rng, jnp.zeros((1, det_size[1], det_size[0], 3))
            )
        self.det_params = det_params
        self.lmk106 = lmk106

        self._detect = jax.jit(
            functools.partial(
                S.detect,
                self.det_model,
                input_size=self.det_size,
                score_thresh=self.det_thresh,
            )
        )

    def detect(self, img_rgb: np.ndarray, max_num: int = 0):
        """-> (bboxes (N,5 incl score), kpss (N,5,2)) in image coords."""
        blob, det_scale = S.preprocess(img_rgb, self.det_size)
        res = self._detect(self.det_params, jnp.asarray(blob))
        valid = np.asarray(res["valid"][0])
        idx = np.nonzero(valid)[0]
        boxes = np.asarray(res["bboxes"][0])[idx] / det_scale
        scores = np.asarray(res["scores"][0])[idx]
        kps = np.asarray(res["kps"][0])[idx] / det_scale
        order = np.argsort(-scores)
        boxes, scores, kps = boxes[order], scores[order], kps[order]
        if max_num > 0:
            boxes, scores, kps = boxes[:max_num], scores[:max_num], kps[:max_num]
        return np.concatenate([boxes, scores[:, None]], axis=1), kps

    def get(
        self,
        img_rgb: np.ndarray,
        flag_do_landmark_2d_106: bool = True,
        direction: str = "large-small",
        max_face_num: int = 0,
    ) -> list[Face]:
        bboxes, kpss = self.detect(img_rgb, max_num=max_face_num)
        faces = []
        for i in range(bboxes.shape[0]):
            face = Face(
                bbox=bboxes[i, :4], kps=kpss[i], det_score=float(bboxes[i, 4])
            )
            if flag_do_landmark_2d_106 and self.lmk106 is not None:
                face.landmark_2d_106 = self.lmk106.get(img_rgb, face.bbox)
            faces.append(face)
        return sort_faces(faces, direction)

    def warmup(self):
        self.get(np.zeros((512, 512, 3), np.uint8))


class FaceIDCropper:
    """Detection + 5-pt multiview alignment for ArcFace ID crops — the
    Face_detect_crop equivalent (face_detect_crop_single.py:63-82 /
    _multi.py:79-100)."""

    def __init__(self, analysis: FaceAnalysis, mode: str = "newarc"):
        self.analysis = analysis
        self.mode = mode

    def get_single(self, img_rgb: np.ndarray, crop_size: int = 112,
                   max_num: int = 0):
        """Best-scoring face -> ([crop], [M]) or None."""
        import cv2

        bboxes, kpss = self.analysis.detect(img_rgb, max_num=max_num)
        if bboxes.shape[0] == 0:
            return None
        best = int(np.argmax(bboxes[:, 4]))
        M, _ = FA.estimate_norm_multiview(kpss[best], crop_size, self.mode)
        crop = cv2.warpAffine(img_rgb, M, (crop_size, crop_size), borderValue=0.0)
        return [crop], [M]

    def get_multi(self, img_rgb: np.ndarray, crop_size: int = 112,
                  max_num: int = 0):
        """All faces -> (crops, Ms) or None."""
        import cv2

        bboxes, kpss = self.analysis.detect(img_rgb, max_num=max_num)
        if bboxes.shape[0] == 0:
            return None
        crops, Ms = [], []
        for i in range(bboxes.shape[0]):
            M, _ = FA.estimate_norm_multiview(kpss[i], crop_size, self.mode)
            crops.append(
                cv2.warpAffine(img_rgb, M, (crop_size, crop_size), borderValue=0.0)
            )
            Ms.append(M)
        return crops, Ms
