"""Real-.onnx sidecar path: executable NCHW fixture graphs run through
runtime/onnx_sidecars + the generic executor, driving the SAME runner
interfaces (FaceAnalysis.detect / Landmark .get/.run) as the flax sidecars.
"""

from __future__ import annotations

import numpy as np
import pytest

from canonswap_tpu.runtime import onnx_import as O


def _det_fixture(tmp_path):
    """Executable det_10g-shaped graph: 9 outputs (score/bbox/kps x strides
    8/16/32) from an NCHW input, with the real outputs' (B, rows, k) form."""
    rng = np.random.default_rng(0)
    nodes, inits = [], {}
    outputs = []
    for kind, ch, k in (("score", 2, 1), ("bbox", 8, 4), ("kps", 20, 10)):
        for s in (8, 16, 32):
            pool = f"p{s}_{kind}"
            nodes.append(O.build_node(
                "AveragePool", ["img"], [pool], f"ap_{kind}{s}",
                attrs={"kernel_shape": [s, s], "strides": [s, s]}))
            wname = f"w_{kind}{s}"
            inits[wname] = rng.standard_normal((ch, 3, 1, 1),
                                               np.float32) * 0.3
            conv = f"c{s}_{kind}"
            nodes.append(O.build_node("Conv", [pool, wname], [conv],
                                      f"conv_{kind}{s}",
                                      attrs={"kernel_shape": [1, 1]}))
            tr = conv + "_t"
            nodes.append(O.build_node("Transpose", [conv], [tr],
                                      attrs={"perm": [0, 2, 3, 1]}))
            shp = f"shape_{kind}{s}"
            inits[shp] = np.asarray([1, -1, k], np.int64)
            out = f"{kind}_{s}"
            nodes.append(O.build_node("Reshape", [tr, shp], [out]))
            outputs.append(out)
    # interleave output declarations in the real fmc order:
    # score_8, score_16, score_32, bbox_8, ..., kps_32
    blob = O.build_onnx(nodes, inits, ["img"], outputs)
    p = tmp_path / "det.onnx"
    p.write_bytes(blob)
    return str(p)


def test_face_analysis_with_det_onnx(tmp_path):
    from canonswap_tpu.runtime.face_analysis import FaceAnalysis

    path = _det_fixture(tmp_path)
    fa = FaceAnalysis(det_size=(64, 64), det_thresh=0.0, det_onnx=path)
    img = np.random.default_rng(1).integers(0, 255, (64, 64, 3), np.uint8)
    boxes, kps = fa.detect(img, max_num=4)
    assert boxes.shape[1] == 5
    assert kps.shape[1:] == (5, 2)
    assert len(boxes) <= 4


def _lmk_fixture(tmp_path, n_out, name):
    rng = np.random.default_rng(2)
    nodes = [
        O.build_node("GlobalAveragePool", ["img"], ["g"]),
        O.build_node("Flatten", ["g"], ["f"], attrs={"axis": 1}),
        O.build_node("Gemm", ["f", "W", "B"], ["pts"],
                     attrs={"transB": 1}),
    ]
    inits = {"W": rng.standard_normal((n_out, 3), np.float32) * 0.01,
             "B": rng.standard_normal((n_out,), np.float32) * 0.1}
    p = tmp_path / name
    p.write_bytes(O.build_onnx(nodes, inits, ["img"], ["pts"]))
    return str(p)


def test_onnx_landmark_runners(tmp_path):
    from canonswap_tpu.runtime.onnx_sidecars import (
        OnnxLandmark106Runner, OnnxLandmark203Runner)

    img = np.random.default_rng(3).integers(0, 255, (240, 320, 3), np.uint8)

    r106 = OnnxLandmark106Runner(_lmk_fixture(tmp_path, 212, "l106.onnx"))
    pts = r106.get(img, [60, 40, 200, 190])
    assert pts.shape == (106, 2)

    r203 = OnnxLandmark203Runner(_lmk_fixture(tmp_path, 406, "l203.onnx"))
    lmk0 = np.stack([np.linspace(80, 240, 203),
                     np.linspace(60, 200, 203)], axis=1).astype(np.float32)
    pts = r203.run(img, lmk0)
    assert pts.shape == (203, 2)
    # tracking from the previous result works (the Cropper's contract)
    pts2 = r203.run(img, pts)
    assert pts2.shape == (203, 2)


def test_onnx_arcface_runner(tmp_path):
    from canonswap_tpu.runtime.onnx_sidecars import OnnxArcFaceRunner

    rng = np.random.default_rng(4)
    nodes = [
        O.build_node("GlobalAveragePool", ["img"], ["g"]),
        O.build_node("Flatten", ["g"], ["f"], attrs={"axis": 1}),
        O.build_node("Gemm", ["f", "W"], ["emb"], attrs={"transB": 1}),
    ]
    inits = {"W": rng.standard_normal((512, 3), np.float32) * 0.02}
    p = tmp_path / "arc.onnx"
    p.write_bytes(O.build_onnx(nodes, inits, ["img"], ["emb"]))
    r = OnnxArcFaceRunner(str(p))
    crop = rng.integers(0, 255, (112, 112, 3), np.uint8)
    emb = r.get_feat(crop)
    assert emb.shape == (1, 512)


def test_onnx_inswapper_runner(tmp_path):
    """INSwapper decode math (latent = L2(emb @ emap), forward, feathered
    paste-back) on an executable two-input fixture graph."""
    from canonswap_tpu.runtime.onnx_sidecars import OnnxINSwapperRunner

    rng = np.random.default_rng(5)
    # graph: conv(img) + broadcast(latent via Gemm -> reshape) -> sigmoid
    nodes = [
        O.build_node("Conv", ["img", "Wc"], ["c"],
                     attrs={"kernel_shape": [1, 1]}),
        O.build_node("Gemm", ["latent", "Wl", "Bl"], ["l"],
                     attrs={"transB": 1}),
        O.build_node("Reshape", ["l", "shp"], ["l4"]),
        O.build_node("Add", ["c", "l4"], ["a"]),
        O.build_node("Sigmoid", ["a"], ["out"]),
    ]
    inits = {
        "Wc": rng.standard_normal((3, 3, 1, 1), np.float32) * 0.3,
        "Wl": rng.standard_normal((3, 512), np.float32) * 0.05,
        "Bl": np.zeros((3,), np.float32),
        "shp": np.asarray([1, 3, 1, 1], np.int64),
        # emap MUST be last: insightface reads graph.initializer[-1]
        "emap": rng.standard_normal((512, 512), np.float32) * 0.05,
    }
    p = tmp_path / "insw.onnx"
    p.write_bytes(O.build_onnx(nodes, inits, ["img", "latent"], ["out"]))
    r = OnnxINSwapperRunner(str(p))
    assert r.emap.shape == (512, 512)

    emb = rng.standard_normal((512,), np.float32)
    emb /= np.linalg.norm(emb)
    lat = r.latent(emb)
    np.testing.assert_allclose(np.linalg.norm(lat), 1.0, rtol=1e-5)

    crop = rng.integers(0, 255, (128, 128, 3), np.uint8)
    out = r.forward(crop, lat)
    assert out.shape == (1, 128, 128, 3)
    assert out.min() >= 0 and out.max() <= 1

    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    kps = np.array([[120, 90], [160, 90], [140, 115], [125, 140],
                    [155, 140]], np.float32)
    blended = r.get(img, kps, emb)
    assert blended.shape == img.shape and blended.dtype == np.uint8


def test_onnx_attribute_runner(tmp_path):
    from canonswap_tpu.runtime.onnx_sidecars import OnnxAttributeRunner

    rng = np.random.default_rng(6)
    nodes = [
        O.build_node("GlobalAveragePool", ["img"], ["g"]),
        O.build_node("Flatten", ["g"], ["f"], attrs={"axis": 1}),
        O.build_node("Gemm", ["f", "W", "B"], ["out"], attrs={"transB": 1}),
    ]
    inits = {"W": rng.standard_normal((3, 3), np.float32),
             "B": np.asarray([0.1, 0.9, 0.3], np.float32)}
    p = tmp_path / "genderage.onnx"
    p.write_bytes(O.build_onnx(nodes, inits, ["img"], ["out"]))
    r = OnnxAttributeRunner(str(p))
    img = rng.integers(0, 255, (240, 320, 3), np.uint8)
    gender, age = r.get(img, [60, 40, 200, 190])
    assert gender in (0, 1)
    assert isinstance(age, int)
