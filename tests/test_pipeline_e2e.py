"""End-to-end pipeline tests (reduced model sizes, synthetic media).

These exercise the REAL code paths: video decode -> detection -> landmark
tracking -> crop -> batched motion/swap/parsing -> soft-mask paste-back ->
encode.  Weights are random (no checkpoint ships with the reference), so the
assertions target structure: files produced, decodable, right shapes/frame
counts — not visual fidelity.
"""

import os
import os.path as osp

import cv2
import numpy as np
import pytest

from canonswap_tpu.configs.model_config import TINY
from canonswap_tpu.configs.pipeline_config import (
    ArgumentConfig,
    CropConfig,
    InferenceConfig,
)
from canonswap_tpu.models.parsing import SegformerConfig
from canonswap_tpu.pipelines import swap_e2e, swap_v2i
from canonswap_tpu.pipelines.session import FaceSwapSession


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    rng = np.random.default_rng(0)
    src = rng.integers(0, 255, (200, 180, 3), np.uint8)
    cv2.imwrite(str(d / "source.png"), src)
    w = cv2.VideoWriter(
        str(d / "drv.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 25, (160, 120)
    )
    for _ in range(3):
        w.write(rng.integers(0, 255, (120, 160, 3), np.uint8))
    w.release()
    return d


@pytest.fixture(scope="module")
def session():
    return FaceSwapSession(
        InferenceConfig(batch_size=2),
        CropConfig(),
        TINY,
        det_size=(128, 128),
        arcface_layers=(1, 1, 1, 1),
        parsing_cfg=SegformerConfig(
            hidden_sizes=(8, 12, 20, 32), depths=(1, 1, 1, 1),
            num_heads=(1, 2, 5, 8), decoder_hidden=32,
        ),
        landmark_widths=(8, 12, 16, 24),
        landmark_trunk="residual",
    )


def test_swap_e2e_video(session, media, tmp_path):
    args = ArgumentConfig(
        source=str(media / "source.png"), driving=str(media / "drv.mp4"),
        output_dir=str(tmp_path / "out"),
    )
    wfp, wfp_concat = swap_e2e.execute(session, args)
    assert osp.exists(wfp) and os.path.getsize(wfp) > 0
    assert osp.exists(wfp_concat)
    frames = []
    cap = cv2.VideoCapture(wfp)
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    assert len(frames) == 3
    # motion-template cache was dumped next to the driving video
    assert osp.exists(str(media / "drv.pkl"))

    # second run hits the cache (and still succeeds)
    wfp2, _ = swap_e2e.execute(session, args)
    assert osp.exists(wfp2)


def test_swap_v2i(session, media, tmp_path):
    args = ArgumentConfig(
        source=str(media / "source.png"), driving=str(media / "drv.mp4"),
        output_dir=str(tmp_path / "out_v2i"),
    )
    wfp, _ = swap_v2i.execute(session, args)
    assert osp.exists(wfp) and os.path.getsize(wfp) > 0
    cap = cv2.VideoCapture(wfp)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3


def test_streaming_pipeline(session, media, tmp_path):
    from canonswap_tpu.pipelines import streaming

    args = ArgumentConfig(
        source=str(media / "source.png"), driving=str(media / "drv.mp4"),
        output_dir=str(tmp_path / "out_stream"),
    )
    wfp = streaming.execute(session, args)
    assert osp.exists(wfp) and os.path.getsize(wfp) > 0
    cap = cv2.VideoCapture(wfp)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3


def test_swap_e2e_square_noncrop_blend_path(session, media, tmp_path):
    """Square driving video without forced crop exercises the blend_images
    (non-pasteback) branch (reference can_swap_pipeline_e2e.py:269)."""
    rng = np.random.default_rng(3)
    sq = media / "drv_sq.mp4"
    w = cv2.VideoWriter(str(sq), cv2.VideoWriter_fourcc(*"mp4v"), 25, (96, 96))
    for _ in range(2):
        w.write(rng.integers(0, 255, (96, 96, 3), np.uint8))
    w.release()
    old = session.inference_cfg.flag_crop_driving_video
    session.inference_cfg.flag_crop_driving_video = False
    try:
        args = ArgumentConfig(
            source=str(media / "source.png"), driving=str(sq),
            output_dir=str(tmp_path / "out_sq"),
        )
        wfp, _ = swap_e2e.execute(session, args)
        assert osp.exists(wfp)
    finally:
        session.inference_cfg.flag_crop_driving_video = old


def test_swap_e2e_smooth_motion(session, media, tmp_path):
    """flag_smooth_motion forces the two-pass template path and runs the
    Kalman RTS smoother over the motion template (reference filter.py:8-19
    analogue) before the swap pass."""
    rng = np.random.default_rng(5)
    drv = media / "drv_smooth.mp4"
    w = cv2.VideoWriter(str(drv), cv2.VideoWriter_fourcc(*"mp4v"), 25, (160, 120))
    for _ in range(4):
        w.write(rng.integers(0, 255, (120, 160, 3), np.uint8))
    w.release()
    old = session.inference_cfg.flag_smooth_motion
    session.inference_cfg.flag_smooth_motion = True
    try:
        args = ArgumentConfig(
            source=str(media / "source.png"), driving=str(drv),
            output_dir=str(tmp_path / "out_smooth"),
        )
        wfp, _ = swap_e2e.execute(session, args)
        assert osp.exists(wfp) and os.path.getsize(wfp) > 0
        cap = cv2.VideoCapture(wfp)
        n = 0
        while cap.read()[0]:
            n += 1
        assert n == 4
    finally:
        session.inference_cfg.flag_smooth_motion = old


def test_swap_e2e_stitching_retargeting_halfres(media, tmp_path):
    """flag_stitching + eye/lip retargeting + dense_motion_scale=2 all
    wired: the session builds the stitching nets (models/stitching.py),
    the swap dispatch routes x_t through adjust_driving_kp
    (runtime/core.py), and the dense deformation field is estimated at
    half resolution.  Reference semantics: the vestigial retarget path
    can_swap_e2e.py:258-282."""
    session = FaceSwapSession(
        InferenceConfig(
            batch_size=2, flag_stitching=True, flag_eye_retargeting=True,
            flag_lip_retargeting=True, flag_normalize_lip=True,
            dense_motion_scale=2, flag_int8=True,
        ),
        CropConfig(),
        TINY,
        det_size=(128, 128),
        arcface_layers=(1, 1, 1, 1),
        parsing_cfg=SegformerConfig(
            hidden_sizes=(8, 12, 20, 32), depths=(1, 1, 1, 1),
            num_heads=(1, 2, 5, 8), decoder_hidden=32,
        ),
        landmark_widths=(8, 12, 16, 24),
        landmark_trunk="residual",
    )
    assert session.stitching_params is not None
    assert session.model_cfg.warping.dense_motion_scale == 2
    args = ArgumentConfig(
        source=str(media / "source.png"), driving=str(media / "drv.mp4"),
        output_dir=str(tmp_path / "out_stitch"),
    )
    wfp, _ = swap_e2e.execute(session, args)
    assert osp.exists(wfp) and os.path.getsize(wfp) > 0
    cap = cv2.VideoCapture(wfp)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3


def test_relative_motion_flag_rejected():
    with pytest.raises(ValueError, match="flag_relative_motion"):
        FaceSwapSession(
            InferenceConfig(flag_relative_motion=True), CropConfig(), TINY,
            fast_init=True, det_size=(128, 128),
            arcface_layers=(1, 1, 1, 1),
            parsing_cfg=SegformerConfig(
                hidden_sizes=(8, 12, 20, 32), depths=(1, 1, 1, 1),
                num_heads=(1, 2, 5, 8), decoder_hidden=32,
            ),
            landmark_widths=(8, 12, 16, 24),
            landmark_trunk="residual",
        )


def test_swap_multi_two_faces(session, media, tmp_path, monkeypatch):
    """Multi-face pipeline: two tracked faces, per-face crop/swap/paste into
    the SAME canvas, one encoded video (pipelines/swap_multi.py; reference
    multi-face loop inference_canswap.py's sort_by_direction + per-face
    swap).  Detection is stubbed with two synthetic faces — random-weight
    SCRFD on noise frames detects nothing, and the detector has its own
    parity tests; this test owns tracking/batching/paste-back."""
    from canonswap_tpu.pipelines import swap_multi
    from canonswap_tpu.runtime.face_analysis import Face

    def fake_get(img, **kw):
        h, w = img.shape[:2]
        faces = []
        for cx, cy in ((w * 0.3, h * 0.5), (w * 0.7, h * 0.5)):
            r = min(h, w) * 0.18
            gx, gy = np.meshgrid(np.linspace(-r, r, 11)[:10],
                                 np.linspace(-r, r, 11)[:10])
            lmk = np.stack([cx + gx.ravel(), cy + gy.ravel()], -1)[:106]
            lmk = np.concatenate(
                [lmk, np.tile(lmk[-1:], (106 - len(lmk), 1))])
            faces.append(Face(
                bbox=np.array([cx - r, cy - r, cx + r, cy + r], np.float32),
                kps=lmk[:5].astype(np.float32), det_score=0.9,
                landmark_2d_106=lmk.astype(np.float32),
            ))
        return faces[: kw.get("max_face_num", 4)]

    monkeypatch.setattr(session.face_analysis, "get", fake_get)
    args = ArgumentConfig(
        source=str(media / "source.png"), driving=str(media / "drv.mp4"),
        output_dir=str(tmp_path / "out_multi"),
    )
    wfp = swap_multi.execute(session, args)
    assert osp.exists(wfp) and os.path.getsize(wfp) > 0
    cap = cv2.VideoCapture(wfp)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 3


def test_cli_parser_all_modes():
    """All four product surfaces are reachable from the CLI (swap/v2i from
    the reference's two scripts; multi/stream are this framework's
    additions)."""
    from canonswap_tpu.cli.main import build_parser

    p = build_parser()
    for mode in ("swap", "v2i", "multi", "stream"):
        ns = p.parse_args([mode, "-s", "a.png", "-t", "b.mp4", "-o", "out"])
        assert ns.mode == mode and ns.source == "a.png"
