"""XPoseRunner: animal-landmark inference driver for UniPose.

Equivalent of the reference's src/utils/animal_landmark_runner.py:25-138,
TPU-shaped: images letterbox into a FIXED canvas with a padding mask (the
model natively consumes masks), so the jitted forward compiles once.  The
reference resizes the short side to 800 (long side capped at 1333) and
normalizes with ImageNet stats (animal_landmark_runner.py:52-60); CLIP text
embeddings come precomputed from the user-supplied pickle cache
(clip_embedding_{9,68}.pkl, :33-40) — the CLIP text tower itself never runs
at inference in the reference either.
"""

from __future__ import annotations

import pickle

import numpy as np

import jax
import jax.numpy as jnp

from canonswap_tpu.models.xpose.unipose import UniPose, UniPoseConfig

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _iou_xyxy(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = np.prod(np.clip(br - tl, 0, None), axis=-1)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=-1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=-1)
    return inter / (area_a[:, None] + area_b[None] - inter + 1e-9)


def nms_xyxy(boxes: np.ndarray, scores: np.ndarray, iou_thr: float):
    order = np.argsort(-scores)
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        ious = _iou_xyxy(boxes[i][None], boxes[order[1:]])[0]
        order = order[1:][ious <= iou_thr]
    return np.asarray(keep, np.int64)


class XPoseRunner:
    """Open-vocabulary keypoint detection on a fixed canvas.

    Args:
      embeddings_cache_path: prefix of the CLIP embedding pickles; the
        reference ships clip_embedding_9.pkl / _68.pkl (ins, kpt) tuples.
      params: converted UniPose params (models.xpose.convert.convert_unipose)
        or None for random init (structure/testing).
      canvas: (H, W) static input canvas (reference: short side 800, long
        side <= 1333 -> (800, 1344) covers every aspect the reference sees).
    """

    def __init__(self, params=None, embeddings_cache_path: str | None = None,
                 cfg: UniPoseConfig = UniPoseConfig(),
                 canvas: tuple[int, int] = (800, 1344),
                 max_text_len: int = 350, rng=None):
        self.cfg = cfg
        self.model = UniPose(cfg)
        self.canvas = canvas
        self.max_text_len = max_text_len
        self.embeddings: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        if embeddings_cache_path:
            for n in (9, 68):
                with open(f"{embeddings_cache_path}_{n}.pkl", "rb") as f:
                    ins, kpt = pickle.load(f)
                self.embeddings[n] = (
                    np.asarray(ins, np.float32), np.asarray(kpt, np.float32))
        if params is None:
            params = self.model.init(
                rng if rng is not None else jax.random.PRNGKey(0),
                *self._dummy_inputs())
        self.params = params
        self._apply = jax.jit(self.model.apply)

    def _dummy_inputs(self):
        h, w = self.canvas
        k = self.cfg.num_body_points
        t = self.max_text_len
        return (
            jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w), bool),
            jnp.zeros((1, t, 512)), jnp.zeros((1, t), bool),
            jnp.zeros((1, t)), jnp.zeros((1, k, 512)), jnp.zeros((1, k)),
        )

    def preprocess(self, img_rgb: np.ndarray):
        """uint8 RGB -> (canvas tensor, mask, scale) with short-side-800
        semantics capped by the canvas (animal_landmark_runner.py:52-60)."""
        import cv2

        h0, w0 = img_rgb.shape[:2]
        ch, cw = self.canvas
        scale = min(800.0 / min(h0, w0), 1333.0 / max(h0, w0))
        scale = min(scale, ch / h0, cw / w0)
        nh, nw = int(round(h0 * scale)), int(round(w0 * scale))
        resized = cv2.resize(img_rgb, (nw, nh), interpolation=cv2.INTER_LINEAR)
        canvas = np.zeros((ch, cw, 3), np.float32)
        canvas[:nh, :nw] = (resized.astype(np.float32) / 255.0
                            - IMAGENET_MEAN) / IMAGENET_STD
        mask = np.ones((ch, cw), bool)
        mask[:nh, :nw] = False
        return canvas, mask, (nh, nw)

    def get_unipose_output(self, img_rgb: np.ndarray, num_keypoints: int,
                           box_threshold: float = 0.0,
                           iou_threshold: float = 0.5,
                           ins_embed: np.ndarray | None = None,
                           kpt_embed: np.ndarray | None = None):
        """Returns (boxes cxcywh [M,4], keypoints [M, 2K], scores [M]) in
        normalized VALID-region coordinates."""
        if ins_embed is None or kpt_embed is None:
            ins_embed, kpt_embed = self.embeddings[num_keypoints]
        k = self.cfg.num_body_points
        t = self.max_text_len
        ins = np.zeros((t, 512), np.float32)
        ins[: ins_embed.shape[0]] = ins_embed
        kpt = np.zeros((k, 512), np.float32)
        kpt[: kpt_embed.shape[0]] = kpt_embed[:k]
        kvis = np.zeros((k,), np.float32)
        kvis[: kpt_embed.shape[0]] = 1.0
        tmask = np.zeros((t,), bool)
        tmask[: ins_embed.shape[0]] = True
        pos_ids = tmask.astype(np.float32)

        canvas, mask, (nh, nw) = self.preprocess(img_rgb)
        out = self._apply(
            self.params,
            jnp.asarray(canvas)[None], jnp.asarray(mask)[None],
            jnp.asarray(ins)[None], jnp.asarray(tmask)[None],
            jnp.asarray(pos_ids)[None], jnp.asarray(kpt)[None],
            jnp.asarray(kvis)[None],
        )
        logits = jax.nn.sigmoid(out["pred_logits"])[0]
        scores = np.asarray(jnp.max(logits, axis=-1))
        boxes = np.asarray(out["pred_boxes"][0])
        kpts = np.asarray(out["pred_keypoints"][0][:, : 2 * num_keypoints])

        keep = scores > box_threshold
        boxes, kpts, scores = boxes[keep], kpts[keep], scores[keep]
        if len(boxes) == 0:
            return boxes, kpts, scores
        xyxy = np.concatenate(
            [boxes[:, :2] - boxes[:, 2:] / 2, boxes[:, :2] + boxes[:, 2:] / 2],
            axis=-1)
        keep_idx = nms_xyxy(xyxy, scores, iou_threshold)
        return boxes[keep_idx], kpts[keep_idx], scores[keep_idx]

    def run(self, img_rgb: np.ndarray, num_keypoints: int = 9,
            box_threshold: float = 0.0, iou_threshold: float = 0.5,
            ins_embed=None, kpt_embed=None):
        """Top detection's landmarks in PIXEL coords of the input image
        (animal_landmark_runner.py:105-128)."""
        boxes, kpts, scores = self.get_unipose_output(
            img_rgb, num_keypoints, box_threshold, iou_threshold,
            ins_embed=ins_embed, kpt_embed=kpt_embed)
        if len(kpts) == 0:
            # no detection survived: report the miss (None) so the Cropper's
            # miss/recovery policy can engage, instead of cropping at (0, 0)
            return None
        h0, w0 = img_rgb.shape[:2]
        # normalized coords are relative to the VALID region of the canvas
        z = kpts[0] * np.array([w0, h0] * num_keypoints, np.float32)
        return np.stack([z[0::2], z[1::2]], axis=1)
