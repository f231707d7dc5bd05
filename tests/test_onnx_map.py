"""ONNX -> flax weight mapping, locked with synthetic ONNX fixtures.

The real insightface files (det_10g.onnx, 2d106det.onnx, landmark.onnx,
glintr100.onnx) do not ship with the reference, so the fixtures are built
from our own modules via runtime/onnx_map.py::export_onnx_fixture (which
writes real ONNX protobuf bytes through runtime/onnx_import's writer).  This
proves the full path: protobuf write -> parse -> topological weight sequence
-> ordered assignment with shape checks -> identical forward outputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonswap_tpu.runtime import onnx_import as OI
from canonswap_tpu.runtime.onnx_map import (
    assign_onnx_weights,
    export_onnx_fixture,
    flax_param_slots,
    module_call_order,
    onnx_weight_sequence,
)


def _roundtrip(module, *args):
    """init twice with different seeds; port weights via ONNX bytes; compare."""
    v_src = module.init(jax.random.PRNGKey(0), *args)
    v_dst = module.init(jax.random.PRNGKey(1), *args)
    order = module_call_order(module, *args)
    blob = export_onnx_fixture(jax.tree.map(np.asarray, dict(v_src)), order)
    graph = OI.load_onnx(blob)
    v_out = assign_onnx_weights(dict(v_dst), graph, order)
    a = module.apply(v_src, *args)
    b = module.apply(v_out, *args)
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6,
                                   atol=1e-6)
    return graph, v_src, v_out


def test_scrfd_roundtrip():
    from canonswap_tpu.models.scrfd import SCRFD

    m = SCRFD()  # canonical widths; tiny input keeps the trace cheap
    x = jnp.zeros((1, 64, 64, 3))
    graph, v_src, v_out = _roundtrip(m, x)
    # every param leaf was ported
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(dict(v_src)),
        jax.tree_util.tree_leaves_with_path(v_out),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7,
                                   err_msg=str(pa))


def test_landmark_roundtrip():
    from canonswap_tpu.models.landmark import LandmarkNet

    m = LandmarkNet(num_points=106, widths=(8, 12, 16, 24))
    x = jnp.zeros((1, 192, 192, 3))
    _roundtrip(m, x)


def test_arcface_roundtrip():
    from canonswap_tpu.models.arcface import ArcFaceResNet

    m = ArcFaceResNet(layers=(1, 1, 1, 1))
    x = jnp.zeros((1, 112, 112, 3))
    _roundtrip(m, x)


def test_shape_mismatch_raises():
    from canonswap_tpu.models.landmark import LandmarkNet

    m = LandmarkNet(num_points=106, widths=(8, 12, 16, 24))
    m2 = LandmarkNet(num_points=106, widths=(8, 12, 16, 32))
    x = jnp.zeros((1, 192, 192, 3))
    v1 = m.init(jax.random.PRNGKey(0), x)
    v2 = m2.init(jax.random.PRNGKey(0), x)
    order = module_call_order(m, x)
    blob = export_onnx_fixture(jax.tree.map(np.asarray, dict(v1)), order)
    with pytest.raises(ValueError):
        assign_onnx_weights(dict(v2), OI.load_onnx(blob),
                            module_call_order(m2, x))


def test_sequence_kinds_and_order():
    from canonswap_tpu.models.scrfd import ConvBNReLU

    m = ConvBNReLU(6)
    x = jnp.zeros((1, 8, 8, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    order = module_call_order(m, x)
    slots = flax_param_slots(jax.tree.map(np.asarray, dict(v)), order)
    assert [s.kind for s in slots] == ["conv", "bn"]
    blob = export_onnx_fixture(jax.tree.map(np.asarray, dict(v)), order)
    ops = onnx_weight_sequence(OI.load_onnx(blob))
    assert [o.kind for o in ops] == ["conv", "bn"]
    # conv weight went through OIHW -> HWIO and back
    k = np.asarray(v["params"]["conv"]["kernel"])
    np.testing.assert_allclose(ops[0].arrays["kernel"], k)


def test_scrfd_fused_bn_export_maps_back():
    """The det_10g-realistic fixture: insightface exports fold every BN into
    its conv (Conv-with-bias nodes, zero BatchNormalization nodes).  The
    mapper's fused branch must zip that stream onto our conv+BN module and
    reproduce the original forward numerically."""
    from canonswap_tpu.models.scrfd import SCRFD

    m = SCRFD()
    x = jax.random.normal(jax.random.PRNGKey(7), (1, 64, 64, 3))
    v_src = m.init(jax.random.PRNGKey(0), x)
    v_dst = m.init(jax.random.PRNGKey(1), x)
    order = module_call_order(m, x)
    blob = export_onnx_fixture(
        jax.tree.map(np.asarray, dict(v_src)), order, fuse_bn=True)
    graph = OI.load_onnx(blob)
    # the fixture really is in exported form: no BN nodes survive
    assert not graph.by_op("BatchNormalization")
    assert all(len(n.inputs) == 3 for n in graph.by_op("Conv"))
    v_out = assign_onnx_weights(dict(v_dst), graph, order)
    a = m.apply(v_src, x)
    b = m.apply(v_out, x)
    for s in (8, 16, 32):
        for k in ("score", "bbox", "kps"):
            np.testing.assert_allclose(
                np.asarray(a[s][k]), np.asarray(b[s][k]),
                rtol=2e-4, atol=2e-4, err_msg=f"{s}/{k}")


def test_shared_head_initializers_dedupe():
    """Real det_10g references the stride-shared head weights from one Conv
    node PER FPN level; the weight sequence must emit each initializer once
    (first use) so it zips against the single shared flax slot."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 3, 3, 3), np.float32)
    b = rng.standard_normal((4,), np.float32)
    nodes = [
        OI.build_node("Conv", ["in8", "head_W", "head_B"], ["s8"], "c8"),
        OI.build_node("Conv", ["in16", "head_W", "head_B"], ["s16"], "c16"),
        OI.build_node("Conv", ["in32", "head_W", "head_B"], ["s32"], "c32"),
    ]
    graph = OI.load_onnx(OI.build_onnx(nodes, {"head_W": w, "head_B": b}))
    ops = onnx_weight_sequence(graph)
    assert len(ops) == 1 and ops[0].kind == "conv"
    np.testing.assert_allclose(
        ops[0].arrays["kernel"], np.transpose(w, (2, 3, 1, 0)))


def test_convert_cli_onnx(tmp_path):
    """cli/convert.py accepts an ONNX sidecar file (synthetic fixture)."""
    from canonswap_tpu.cli.convert import main as convert_main
    from canonswap_tpu.models.landmark import LandmarkNet

    m = LandmarkNet(num_points=106)
    x = jnp.zeros((1, 192, 192, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    order = module_call_order(m, x)
    blob = export_onnx_fixture(jax.tree.map(np.asarray, dict(v)), order)
    src = tmp_path / "lmk.onnx"
    src.write_bytes(blob)
    dst = tmp_path / "lmk.npz"
    convert_main(["lmk106_onnx", str(src), str(dst)])
    from canonswap_tpu.runtime import checkpoint as CK

    tree = CK.load_npz(str(dst))
    got = m.apply(tree, x)
    want = m.apply(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)
