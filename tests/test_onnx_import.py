"""Round-trip test for the pure-Python ONNX parser: hand-encode a minimal
ModelProto with a protobuf wire encoder and decode it back."""

import struct

import numpy as np

from canonswap_tpu.runtime import onnx_import as O


def varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def field(num: int, wtype: int, payload: bytes) -> bytes:
    return varint((num << 3) | wtype) + payload


def ld(num: int, payload: bytes) -> bytes:  # length-delimited
    return field(num, 2, varint(len(payload)) + payload)


def encode_tensor(name: str, arr: np.ndarray, use_raw=True) -> bytes:
    msg = b""
    for d in arr.shape:
        msg += field(1, 0, varint(d))
    dtype_code = {np.float32: 1, np.int64: 7}[arr.dtype.type]
    msg += field(2, 0, varint(dtype_code))
    msg += ld(8, name.encode())
    if use_raw:
        msg += ld(9, arr.tobytes())
    else:
        packed = struct.pack(f"<{arr.size}f", *arr.flatten().tolist())
        msg += ld(4, packed)
    return msg


def encode_node(op, name, inputs, outputs) -> bytes:
    msg = b""
    for i in inputs:
        msg += ld(1, i.encode())
    for o in outputs:
        msg += ld(2, o.encode())
    msg += ld(3, name.encode())
    msg += ld(4, op.encode())
    return msg


def test_roundtrip():
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    b = np.asarray([1, 2, 3], np.int64)
    w2 = np.asarray([[0.5, -1.5]], np.float32)

    graph = (
        ld(5, encode_tensor("conv.weight", w))
        + ld(5, encode_tensor("conv.steps", b))
        + ld(5, encode_tensor("fc.weight", w2, use_raw=False))
        + ld(1, encode_node("Conv", "conv0", ["x", "conv.weight"], ["y"]))
        + ld(1, encode_node("Relu", "relu0", ["y"], ["z"]))
    )
    model = ld(7, graph)

    g = O.load_onnx(model)
    assert set(g.initializers) == {"conv.weight", "conv.steps", "fc.weight"}
    np.testing.assert_array_equal(g.initializers["conv.weight"], w)
    np.testing.assert_array_equal(g.initializers["conv.steps"], b)
    np.testing.assert_allclose(g.initializers["fc.weight"], w2)
    assert [n.op_type for n in g.nodes] == ["Conv", "Relu"]
    assert g.by_op("Conv")[0].inputs == ["x", "conv.weight"]
