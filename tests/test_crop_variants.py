"""Driving-video crop variants: geometry parity vs the reference
implementation (src/utils/crop.py) on synthetic landmark tracks.

Covers parse_bbox_from_landmark / average_bbox / crop_image_by_bbox /
crop_image_mo2c and the Cropper.crop_driving_video / crop_video_with_mo2c
orchestration (reference cropper.py:225-341), making the
scale_crop_driving_video / vx_ratio / vy_ratio config knobs live.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/reference")

ref_crop = pytest.importorskip("src.utils.crop")

from canonswap_tpu.configs.pipeline_config import CropConfig  # noqa: E402
from canonswap_tpu.runtime.cropper import Cropper  # noqa: E402
from canonswap_tpu.utils import geometry as G  # noqa: E402


def _synthetic_lmk_track(n_frames=5, n_pts=203, seed=0):
    """Smooth 203-pt face-ish tracks drifting across a 320x240 frame."""
    rng = np.random.default_rng(seed)
    base = np.zeros((n_pts, 2), np.float32)
    # eye clusters + lip cluster at the indices the ratio/axis code reads
    base[0:24] = [100, 80] + rng.normal(0, 3, (24, 2))
    base[24:48] = [140, 80] + rng.normal(0, 3, (24, 2))
    base[48:108] = [120, 130] + rng.normal(0, 5, (60, 2))
    base[108:] = [120, 105] + rng.normal(0, 18, (n_pts - 108, 2))
    tracks = []
    for i in range(n_frames):
        drift = np.array([6.0 * i, 2.0 * i], np.float32)
        tracks.append((base + drift + rng.normal(0, 0.5, base.shape)
                       ).astype(np.float32))
    return tracks


@pytest.mark.parametrize("scale,vx,vy", [
    (2.2, 0.0, -0.1), (1.8, 0.05, 0.0),
])
def test_parse_bbox_matches_reference(scale, vx, vy):
    lmk = _synthetic_lmk_track(1)[0]
    ours = G.parse_bbox_from_landmark(lmk, scale=scale, vx_ratio=vx,
                                      vy_ratio=vy)
    ref = ref_crop.parse_bbox_from_landmark(
        lmk, scale=scale, vx_ratio=vx, vy_ratio=vy)
    np.testing.assert_allclose(ours["bbox"], ref["bbox"], atol=1e-3)
    np.testing.assert_allclose(ours["bbox_rot"], ref["bbox_rot"], atol=1e-3)
    np.testing.assert_allclose(ours["center"], ref["center"], atol=1e-3)
    assert abs(ours["angle"] - ref["angle"]) < 1e-4


def test_crop_image_by_bbox_matches_reference():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    lmk = _synthetic_lmk_track(1)[0]
    bbox = [60.0, 40.0, 220.0, 200.0]
    ours = G.crop_image_by_bbox(img, bbox, lmk=lmk, dsize=128)
    ref = ref_crop.crop_image_by_bbox(img, bbox, lmk=lmk, dsize=128)
    np.testing.assert_allclose(ours["M_o2c"], ref["M_o2c"], atol=1e-4)
    np.testing.assert_allclose(ours["lmk_crop"], ref["lmk_crop"], atol=1e-3)
    assert np.mean(np.abs(ours["img_crop"].astype(int)
                          - ref["img_crop"].astype(int))) < 1.0


def test_crop_image_mo2c_matches_reference():
    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    lmk = _synthetic_lmk_track(1)[0]
    mo2c, _ = G.estimate_similar_transform(lmk, dsize=96, scale=2.0)
    ours = G.crop_image_mo2c(img, lmk, mo2c, dsize=96)
    ref = ref_crop.crop_image_mo2c(img, lmk, mo2c, dsize=96)
    np.testing.assert_allclose(ours["M_c2o"], ref["M_c2o"], atol=1e-4)
    np.testing.assert_allclose(ours["pt_crop"], ref["pt_crop"], atol=1e-3)
    assert np.mean(np.abs(ours["img_crop"].astype(int)
                          - ref["img_crop"].astype(int))) < 1.0


class _StubFaceAnalysis:
    def __init__(self, tracks):
        self.tracks = tracks
        self.calls = 0

    def get(self, frame, **kw):
        class F:
            pass

        f = F()
        f.landmark_2d_106 = self.tracks[self.calls % len(self.tracks)][:106]
        self.calls += 1
        return [f]


class _StubLandmarkRunner:
    """Deterministic '203-pt refiner': returns the frame's true track."""

    def __init__(self, tracks):
        self.tracks = tracks
        self.i = 0

    def run(self, frame, lmk):
        out = self.tracks[self.i % len(self.tracks)]
        self.i += 1
        return out


def test_crop_driving_video_global_bbox_semantics():
    """Our crop_driving_video reproduces the reference's algorithm (per-frame
    bbox -> global average -> one shared axis-aligned crop) with the
    scale_crop_driving_video knobs."""
    tracks = _synthetic_lmk_track(4)
    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 255, (240, 320, 3), np.uint8)
              for _ in range(4)]
    cfg = CropConfig(scale_crop_driving_video=2.0,
                     vx_ratio_crop_driving_video=0.02,
                     vy_ratio_crop_driving_video=-0.08)
    cropper = Cropper(cfg, _StubFaceAnalysis(tracks),
                      _StubLandmarkRunner(tracks))
    ret = cropper.crop_driving_video(frames, dsize=128)
    assert len(ret["frame_crop_lst"]) == 4
    assert ret["M_c2o_lst"] == []  # reference returns no transforms here

    # independently recompute the reference's global bbox with ITS functions
    bboxes = []
    for lmk in tracks:
        rb = ref_crop.parse_bbox_from_landmark(
            lmk, scale=2.0, vx_ratio=0.02, vy_ratio=-0.08)["bbox"]
        bboxes.append([rb[0, 0], rb[0, 1], rb[2, 0], rb[2, 1]])
    gbox = ref_crop.average_bbox_lst(bboxes)
    ref0 = ref_crop.crop_image_by_bbox(frames[0], gbox, lmk=tracks[0],
                                       dsize=128)
    np.testing.assert_allclose(
        ret["lmk_crop_lst"][0], ref0["lmk_crop"], atol=1e-2)
    assert np.mean(np.abs(ret["frame_crop_lst"][0].astype(int)
                          - ref0["img_crop"].astype(int))) < 1.0


def test_crop_video_with_mo2c_reuses_transforms():
    tracks = _synthetic_lmk_track(3)
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 255, (240, 320, 3), np.uint8)
              for _ in range(3)]
    cfg = CropConfig(dsize=128)
    mo2c_lst = [
        G.estimate_similar_transform(t, dsize=128, scale=2.0)[0]
        for t in tracks
    ]
    cropper = Cropper(cfg, _StubFaceAnalysis(tracks),
                      _StubLandmarkRunner(tracks), network_input_size=64)
    ret = cropper.crop_video_with_mo2c(frames, mo2c_lst)
    assert len(ret["frame_crop_lst"]) == 3
    assert ret["frame_crop_lst"][0].shape == (64, 64, 3)
    for i in range(3):
        np.testing.assert_allclose(ret["M_o2c_lst"][i], mo2c_lst[i],
                                   atol=1e-5)
