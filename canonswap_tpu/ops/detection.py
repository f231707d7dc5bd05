"""Jittable anchor-free detection post-processing (SCRFD-family).

The reference decodes SCRFD outputs with dynamic-shape numpy (threshold ->
variable box count -> sort -> NMS; scrfd.py:26-70, 190-303).  Dynamic shapes
don't jit, so the TPU-native version is fixed-capacity:

  scores over ALL anchors -> top-K gather -> O(K^2) masked NMS -> fixed-size
  (K,) results with a validity mask.

Everything is batched over frames; K (pre-NMS capacity) is static.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def anchor_centers(height: int, width: int, stride: int, num_anchors: int = 2):
    """(H*W*A, 2) anchor centre coordinates in input-image pixels, matching
    the reference's meshgrid*stride + per-cell duplication (scrfd.py:239-247)."""
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    centers = jnp.stack([xs, ys], axis=-1) * stride  # (H, W, 2)
    centers = centers.reshape(-1, 1, 2)
    centers = jnp.broadcast_to(centers, (height * width, num_anchors, 2))
    return centers.reshape(-1, 2)


def distance2bbox(points: jax.Array, distance: jax.Array) -> jax.Array:
    """(N,2) centres + (N,4) distances -> (N,4) x1y1x2y2 (scrfd.py:26-41)."""
    x1 = points[:, 0] - distance[:, 0]
    y1 = points[:, 1] - distance[:, 1]
    x2 = points[:, 0] + distance[:, 2]
    y2 = points[:, 1] + distance[:, 3]
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def distance2kps(points: jax.Array, distance: jax.Array) -> jax.Array:
    """(N,2) centres + (N,2K) distances -> (N,K,2) keypoints (scrfd.py:44-70)."""
    n, two_k = distance.shape
    d = distance.reshape(n, two_k // 2, 2)
    return points[:, None, :] + d


def _iou_matrix(boxes: jax.Array) -> jax.Array:
    """(K,4) -> (K,K) pairwise IoU."""
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )
    x1 = jnp.maximum(boxes[:, None, 0], boxes[None, :, 0])
    y1 = jnp.maximum(boxes[:, None, 1], boxes[None, :, 1])
    x2 = jnp.minimum(boxes[:, None, 2], boxes[None, :, 2])
    y2 = jnp.minimum(boxes[:, None, 3], boxes[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
    union = area[:, None] + area[None, :] - inter
    return inter / jnp.maximum(union, 1e-9)


def nms_fixed(
    boxes: jax.Array, scores: jax.Array, iou_thresh: float = 0.4
) -> jax.Array:
    """Greedy NMS over score-sorted fixed-size candidates.

    Args:
      boxes: (K, 4) sorted by descending score.
      scores: (K,) (only used for validity: score <= 0 means padding).

    Returns (K,) bool keep mask.  Matches the reference's sequential NMS
    (scrfd.py:275-303) exactly, expressed as a lax.fori_loop over the
    precomputed IoU matrix (K is small — e.g. 128 — so K^2 is cheap).
    """
    iou = _iou_matrix(boxes)
    k = boxes.shape[0]
    valid = scores > 0

    def body(i, keep):
        # i is suppressed if any kept higher-score j<i overlaps it
        sup = jnp.any((iou[i] > iou_thresh) & keep & (jnp.arange(k) < i))
        return keep.at[i].set(keep[i] & ~sup)

    return jax.lax.fori_loop(0, k, body, valid)


@functools.partial(
    jax.jit, static_argnames=("input_size", "strides", "num_anchors", "topk")
)
def decode_scrfd(
    outputs: dict,
    *,
    input_size: tuple[int, int] = (640, 640),
    strides: tuple[int, ...] = (8, 16, 32),
    num_anchors: int = 2,
    score_thresh: float = 0.5,
    iou_thresh: float = 0.4,
    topk: int = 128,
):
    """Batched SCRFD decode: head outputs -> fixed-size detections.

    Args:
      outputs: {stride: {"score": (B, N_s, 1), "bbox": (B, N_s, 4),
                "kps": (B, N_s, 10)}} with distances already in stride units
                (heads output are multiplied by stride, scrfd.py:190-218).

    Returns dict(bboxes (B, topk, 4), kps (B, topk, 5, 2), scores (B, topk),
    valid (B, topk) bool), score-sorted, NMS-applied.
    """
    h, w = input_size
    all_scores, all_boxes, all_kps = [], [], []
    for s in strides:
        ac = anchor_centers(h // s, w // s, s, num_anchors)
        out = outputs[s]
        score = out["score"][..., 0]  # (B, N)
        bbox = out["bbox"] * s
        kps = out["kps"] * s
        b = score.shape[0]
        boxes = jax.vmap(lambda d: distance2bbox(ac, d))(bbox)
        kp = jax.vmap(lambda d: distance2kps(ac, d))(kps)
        all_scores.append(score)
        all_boxes.append(boxes)
        all_kps.append(kp)

    scores = jnp.concatenate(all_scores, axis=1)
    boxes = jnp.concatenate(all_boxes, axis=1)
    kps = jnp.concatenate(all_kps, axis=1)

    scores = jnp.where(scores >= score_thresh, scores, 0.0)
    top_scores, idx = jax.lax.top_k(scores, topk)  # (B, topk)
    top_boxes = jnp.take_along_axis(boxes, idx[..., None], axis=1)
    top_kps = jnp.take_along_axis(kps, idx[..., None, None], axis=1)

    keep = jax.vmap(lambda b, s: nms_fixed(b, s, iou_thresh))(
        top_boxes, top_scores
    )
    return {
        "bboxes": top_boxes,
        "kps": top_kps,
        "scores": top_scores,
        "valid": keep & (top_scores > 0),
    }
