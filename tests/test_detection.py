"""Detection post-processing parity: jittable fixed-capacity decode/NMS vs an
independent numpy re-derivation of the reference logic (scrfd.py:26-70,
220-303)."""

import numpy as np

import jax.numpy as jnp

from canonswap_tpu.ops import detection as D

RNG = np.random.default_rng(3)


def np_anchor_centers(h, w, stride, num_anchors=2):
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    ac = np.stack([xs, ys], axis=-1).astype(np.float32) * stride
    ac = ac.reshape(-1, 2)
    return np.stack([ac] * num_anchors, axis=1).reshape(-1, 2)


def np_nms(dets, thresh):
    """Reference NMS re-derivation (scrfd.py:275-303)."""
    x1, y1, x2, y2, scores = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1) * (y2 - y1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        inter = np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
        ovr = inter / (areas[i] + areas[order[1:]] - inter)
        order = order[1:][ovr <= thresh]
    return keep


def test_anchor_centers_match():
    got = np.asarray(D.anchor_centers(5, 7, 16))
    want = np_anchor_centers(5, 7, 16)
    np.testing.assert_array_equal(got, want)


def test_distance2bbox_kps():
    pts = RNG.uniform(0, 100, (10, 2)).astype(np.float32)
    dist = RNG.uniform(0, 20, (10, 4)).astype(np.float32)
    got = np.asarray(D.distance2bbox(jnp.asarray(pts), jnp.asarray(dist)))
    want = np.stack(
        [pts[:, 0] - dist[:, 0], pts[:, 1] - dist[:, 1],
         pts[:, 0] + dist[:, 2], pts[:, 1] + dist[:, 3]], -1
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)

    kd = RNG.uniform(-10, 10, (10, 10)).astype(np.float32)
    gotk = np.asarray(D.distance2kps(jnp.asarray(pts), jnp.asarray(kd)))
    wantk = kd.reshape(10, 5, 2) + pts[:, None, :]
    np.testing.assert_allclose(gotk, wantk, rtol=1e-6)


def test_nms_matches_reference():
    n = 40
    boxes = np.zeros((n, 4), np.float32)
    cx = RNG.uniform(50, 200, n)
    cy = RNG.uniform(50, 200, n)
    s = RNG.uniform(20, 60, n)
    boxes[:, 0], boxes[:, 1] = cx - s / 2, cy - s / 2
    boxes[:, 2], boxes[:, 3] = cx + s / 2, cy + s / 2
    scores = RNG.uniform(0.1, 1.0, n).astype(np.float32)

    order = np.argsort(-scores)
    sb, ss = boxes[order], scores[order]
    keep_mask = np.asarray(D.nms_fixed(jnp.asarray(sb), jnp.asarray(ss), 0.4))
    got = set(np.nonzero(keep_mask)[0].tolist())

    dets = np.concatenate([sb, ss[:, None]], axis=1)
    want = set(np_nms(dets, 0.4))
    assert got == want


def test_decode_scrfd_end_to_end():
    """Full decode pipeline against a numpy replay with one planted face."""
    h = w = 64
    strides = (8, 16, 32)
    outputs = {}
    for s in strides:
        n = (h // s) * (w // s) * 2
        outputs[s] = {
            "score": jnp.zeros((1, n, 1)),
            "bbox": jnp.asarray(RNG.uniform(0.1, 2.0, (1, n, 4)).astype(np.float32)),
            "kps": jnp.asarray(RNG.uniform(-2, 2, (1, n, 10)).astype(np.float32)),
        }
    # plant a confident detection at stride 16, anchor index 7
    outputs[16]["score"] = outputs[16]["score"].at[0, 7, 0].set(0.95)

    res = D.decode_scrfd(
        outputs, input_size=(h, w), strides=strides, score_thresh=0.5, topk=16
    )
    valid = np.asarray(res["valid"][0])
    assert valid.sum() == 1
    i = int(np.nonzero(valid)[0][0])
    assert np.isclose(float(res["scores"][0, i]), 0.95)
    # verify the planted box decode
    ac = np_anchor_centers(h // 16, w // 16, 16)
    d = np.asarray(outputs[16]["bbox"][0, 7]) * 16
    want_box = [ac[7, 0] - d[0], ac[7, 1] - d[1], ac[7, 0] + d[2], ac[7, 1] + d[3]]
    np.testing.assert_allclose(np.asarray(res["bboxes"][0, i]), want_box, rtol=1e-5)
