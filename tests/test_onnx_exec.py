"""ONNX graph-executor tests: parity vs torch oracles on the op families the
insightface / LivePortrait sidecars use (SURVEY.md §2b), plus jit-ability of
shape-math subgraphs.

Fixtures are built with runtime/onnx_import's writer (no onnx package in this
environment) and executed by runtime/onnx_exec.OnnxExecutor.
"""

from __future__ import annotations

import numpy as np
import pytest

from canonswap_tpu.runtime import onnx_exec as X
from canonswap_tpu.runtime import onnx_import as O

torch = pytest.importorskip("torch")


def _run(nodes, inits, inputs, outputs, feeds):
    graph = O.load_onnx(O.build_onnx(nodes, inits, inputs, outputs))
    ex = X.OnnxExecutor(graph)
    return ex(*feeds)


def test_conv_bn_prelu_pool_vs_torch():
    """Conv(stride/pad) -> BN -> PReLU -> MaxPool(ceil) — the insightface
    backbone op diet (model_zoo/scrfd.py wraps exactly such graphs)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 17, 17), np.float32)
    w = rng.standard_normal((8, 3, 3, 3), np.float32) * 0.2
    b = rng.standard_normal((8,), np.float32)
    scale = rng.uniform(0.5, 1.5, (8,)).astype(np.float32)
    bias = rng.standard_normal((8,), np.float32)
    mean = rng.standard_normal((8,), np.float32) * 0.1
    var = rng.uniform(0.5, 2.0, (8,)).astype(np.float32)
    slope = rng.uniform(0.1, 0.3, (8, 1, 1)).astype(np.float32)

    nodes = [
        O.build_node("Conv", ["x", "w", "b"], ["c"], attrs={
            "kernel_shape": [3, 3], "strides": [2, 2],
            "pads": [1, 1, 1, 1]}),
        O.build_node("BatchNormalization",
                     ["c", "g", "be", "m", "v"], ["n"],
                     attrs={"epsilon": 1e-5}),
        O.build_node("PRelu", ["n", "s"], ["p"]),
        O.build_node("MaxPool", ["p"], ["y"], attrs={
            "kernel_shape": [3, 3], "strides": [2, 2],
            "pads": [1, 1, 1, 1], "ceil_mode": 1}),
    ]
    inits = {"w": w, "b": b, "g": scale, "be": bias, "m": mean, "v": var,
             "s": slope}
    (out,) = _run(nodes, inits, ["x"], ["y"], [x])

    with torch.no_grad():
        t = torch.from_numpy(x)
        conv = torch.nn.functional.conv2d(
            t, torch.from_numpy(w), torch.from_numpy(b), 2, 1)
        bn = torch.nn.functional.batch_norm(
            conv, torch.from_numpy(mean), torch.from_numpy(var),
            torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-5)
        pr = torch.nn.functional.prelu(bn, torch.from_numpy(slope.ravel()))
        ref = torch.nn.functional.max_pool2d(pr, 3, 2, 1, ceil_mode=True)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_depthwise_group_conv_vs_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 10, 10), np.float32)
    w = rng.standard_normal((8, 1, 3, 3), np.float32)
    nodes = [O.build_node("Conv", ["x", "w"], ["y"], attrs={
        "kernel_shape": [3, 3], "group": 8, "pads": [1, 1, 1, 1]})]
    (out,) = _run(nodes, {"w": w}, ["x"], ["y"], [x])
    with torch.no_grad():
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), padding=1, groups=8)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_gemm_gap_flatten_vs_torch():
    """GlobalAveragePool -> Flatten -> Gemm (classifier tail, arcface-style)."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 7, 7), np.float32)
    w = rng.standard_normal((5, 16), np.float32)
    b = rng.standard_normal((5,), np.float32)
    nodes = [
        O.build_node("GlobalAveragePool", ["x"], ["g"]),
        O.build_node("Flatten", ["g"], ["f"], attrs={"axis": 1}),
        O.build_node("Gemm", ["f", "w", "b"], ["y"],
                     attrs={"transB": 1, "alpha": 1.0, "beta": 1.0}),
    ]
    (out,) = _run(nodes, {"w": w, "b": b}, ["x"], ["y"], [x])
    ref = x.mean((2, 3)) @ w.T + b
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mode,coord", [
    ("nearest", "asymmetric"),
    ("linear", "half_pixel"),
    ("linear", "align_corners"),
])
def test_resize_vs_torch(mode, coord):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 4, 9, 9), np.float32)
    nodes = [O.build_node("Resize", ["x", "", "scales"], ["y"], attrs={
        "mode": mode, "coordinate_transformation_mode": coord,
        "nearest_mode": "floor"})]
    scales = np.asarray([1.0, 1.0, 2.0, 2.0], np.float32)
    (out,) = _run(nodes, {"scales": scales}, ["x"], ["y"], [x])
    with torch.no_grad():
        t = torch.from_numpy(x)
        if mode == "nearest":
            ref = torch.nn.functional.interpolate(t, scale_factor=2,
                                                  mode="nearest")
        else:
            ref = torch.nn.functional.interpolate(
                t, scale_factor=2, mode="bilinear",
                align_corners=(coord == "align_corners"))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(),
                               rtol=2e-5, atol=2e-5)


def test_shape_math_stays_static_under_jit():
    """Shape -> Gather -> Concat -> Reshape feeding a Conv: the shape
    subgraph must fold to host constants so jit tracing sees static shapes
    (the standard onnx-export reshape idiom)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 6, 4, 4), np.float32)
    nodes = [
        O.build_node("Shape", ["x"], ["sh"]),
        O.build_node("Gather", ["sh", "zero"], ["n"], attrs={"axis": 0}),
        O.build_node("Unsqueeze", ["n"], ["n1"], attrs={"axes": [0]}),
        O.build_node("Concat", ["n1", "minus1"], ["tgt"], attrs={"axis": 0}),
        O.build_node("Reshape", ["x", "tgt"], ["y"]),
    ]
    inits = {"zero": np.asarray(0, np.int64),
             "minus1": np.asarray([-1], np.int64)}
    graph = O.load_onnx(O.build_onnx(nodes, inits, ["x"], ["y"]))
    ex = X.OnnxExecutor(graph)

    @jax.jit
    def run(t):
        return ex(t)[0]

    out = run(jnp.asarray(x))
    assert out.shape == (2, 96)
    np.testing.assert_allclose(np.asarray(out), x.reshape(2, -1), rtol=1e-6)


def test_elementwise_and_reduce_ops():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 8), np.float32)
    nodes = [
        O.build_node("ReduceL2", ["x"], ["n"], attrs={"axes": [1],
                                                      "keepdims": 1}),
        O.build_node("Clip", ["n"], ["nc"], attrs={"min": 1e-6}),
        O.build_node("Div", ["x", "nc"], ["y"]),
        O.build_node("Softmax", ["y"], ["s"], attrs={"axis": 1}),
        O.build_node("Sigmoid", ["y"], ["g"]),
        O.build_node("Concat", ["s", "g"], ["out"], attrs={"axis": 1}),
    ]
    (out,) = _run(nodes, {}, ["x"], ["out"], [x])
    norm = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-6)
    ex = np.exp(norm - norm.max(1, keepdims=True))
    ref = np.concatenate([ex / ex.sum(1, keepdims=True),
                          1 / (1 + np.exp(-norm))], axis=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_unsupported_op_reports_clearly():
    nodes = [O.build_node("FancyNewOp", ["x"], ["y"])]
    graph = O.load_onnx(O.build_onnx(nodes, {}, ["x"], ["y"]))
    with pytest.raises(NotImplementedError, match="FancyNewOp"):
        X.OnnxExecutor(graph)
