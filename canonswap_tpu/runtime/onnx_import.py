"""Minimal pure-Python ONNX weight extractor.

This environment ships neither ``onnx`` nor ``onnxruntime``, but the
reference's sidecar checkpoints (det_10g.onnx, 2d106det.onnx, landmark.onnx,
glintr100.onnx — readme.md:32-48) are ONNX files.  This module parses the
protobuf wire format directly and extracts:

  - ``initializers``: {name: np.ndarray} — the weights,
  - ``nodes``: [(op_type, name, inputs, outputs)] — the graph topology,

which is all a weight converter needs to map ONNX tensors onto our flax
modules.  No external dependencies; the protobuf wire format (varints +
length-delimited fields) is stable and tiny to implement.

ONNX schema fields used (onnx.proto3):
  ModelProto.graph = 7 (GraphProto)
  GraphProto.node = 1 (NodeProto), .initializer = 5 (TensorProto)
  TensorProto: dims=1, data_type=2, float_data=4, int32_data=5, string_data=6,
               int64_data=7, name=8, raw_data=9, double_data=10, uint64_data=11
  NodeProto: input=1, output=2, name=3, op_type=4
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

# ONNX TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16, 5: np.int16,
    6: np.int32, 7: np.int64, 9: np.bool_, 10: np.float16, 11: np.float64,
    12: np.uint32, 13: np.uint64,
}


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _iter_fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wtype = tag >> 3, tag & 7
        if wtype == 0:  # varint
            val, pos = _read_varint(buf, pos)
        elif wtype == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wtype == 2:  # length-delimited
            ln, pos = _read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wtype == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wtype}")
        yield field, wtype, val


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    dims: list[int] = []
    dtype_code = 1
    name = ""
    raw = None
    float_data: list[float] = []
    int32_data: list[int] = []
    int64_data: list[int] = []
    double_data: list[float] = []
    for field, wtype, val in _iter_fields(buf):
        if field == 1:
            if wtype == 0:
                dims.append(val)
            else:  # packed
                pos = 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    dims.append(v)
        elif field == 2 and wtype == 0:
            dtype_code = val
        elif field == 4:
            if wtype == 2:
                float_data.extend(struct.unpack(f"<{len(val) // 4}f", val))
            else:
                float_data.append(struct.unpack("<f", val)[0])
        elif field == 5:
            if wtype == 2:
                pos = 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    int32_data.append(v)
            else:
                int32_data.append(val)
        elif field == 7:
            if wtype == 2:
                pos = 0
                while pos < len(val):
                    v, pos = _read_varint(val, pos)
                    int64_data.append(v)
            else:
                int64_data.append(val)
        elif field == 8 and wtype == 2:
            name = val.decode("utf-8")
        elif field == 9 and wtype == 2:
            raw = val
        elif field == 10:
            if wtype == 2:
                double_data.extend(struct.unpack(f"<{len(val) // 8}d", val))
            else:
                double_data.append(struct.unpack("<d", val)[0])

    dtype = _DTYPES.get(dtype_code, np.float32)
    shape = tuple(dims)
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype).reshape(shape).copy()
    elif float_data:
        arr = np.asarray(float_data, np.float32).reshape(shape)
    elif double_data:
        arr = np.asarray(double_data, np.float64).reshape(shape)
    elif int64_data:
        arr = np.asarray(int64_data, np.int64).reshape(shape)
    elif int32_data:
        arr = np.asarray(int32_data, dtype).reshape(shape)
    else:
        arr = np.zeros(shape, dtype)
    return name, arr


@dataclasses.dataclass
class OnnxNode:
    op_type: str
    name: str
    inputs: list[str]
    outputs: list[str]
    attrs: dict = dataclasses.field(default_factory=dict)


@dataclasses.dataclass
class OnnxGraph:
    initializers: dict[str, np.ndarray]
    nodes: list[OnnxNode]
    inputs: list[str] = dataclasses.field(default_factory=list)
    outputs: list[str] = dataclasses.field(default_factory=list)

    def by_op(self, op_type: str) -> list[OnnxNode]:
        return [n for n in self.nodes if n.op_type == op_type]


def _parse_attr(buf: bytes) -> tuple[str, object]:
    """AttributeProto -> (name, python value).  Handles the fields the
    insightface/LivePortrait model families use: f=2, i=3, s=4, t=5,
    floats=7, ints=8, strings=9 (onnx.proto3)."""
    name = ""
    val = None
    floats: list[float] = []
    ints: list[int] = []
    strings: list[bytes] = []
    for field, wtype, v in _iter_fields(buf):
        if field == 1 and wtype == 2:
            name = v.decode("utf-8")
        elif field == 2 and wtype == 5:
            val = struct.unpack("<f", v)[0]
        elif field == 3 and wtype == 0:
            # protobuf encodes negative int64 as 10-byte varints (two's
            # complement); fold back into a signed value
            val = v - (1 << 64) if v >= (1 << 63) else v
        elif field == 4 and wtype == 2:
            val = v.decode("utf-8", "replace")
        elif field == 5 and wtype == 2:
            val = _parse_tensor(v)[1]
        elif field == 7:
            if wtype == 2:
                floats.extend(struct.unpack(f"<{len(v) // 4}f", v))
            else:
                floats.append(struct.unpack("<f", v)[0])
        elif field == 8:
            if wtype == 2:
                pos = 0
                while pos < len(v):
                    x, pos = _read_varint(v, pos)
                    ints.append(x - (1 << 64) if x >= (1 << 63) else x)
            else:
                ints.append(v - (1 << 64) if v >= (1 << 63) else v)
        elif field == 9 and wtype == 2:
            strings.append(v)
    if val is None:
        if ints:
            val = ints
        elif floats:
            val = floats
        elif strings:
            val = [s.decode("utf-8", "replace") for s in strings]
    return name, val


def _parse_node(buf: bytes) -> OnnxNode:
    inputs, outputs = [], []
    name = ""
    op_type = ""
    attrs: dict = {}
    for field, wtype, val in _iter_fields(buf):
        if field == 1 and wtype == 2:
            inputs.append(val.decode("utf-8"))
        elif field == 2 and wtype == 2:
            outputs.append(val.decode("utf-8"))
        elif field == 3 and wtype == 2:
            name = val.decode("utf-8")
        elif field == 4 and wtype == 2:
            op_type = val.decode("utf-8")
        elif field == 5 and wtype == 2:
            k, v = _parse_attr(val)
            attrs[k] = v
    return OnnxNode(op_type, name, inputs, outputs, attrs)


def _parse_value_info_name(buf: bytes) -> str:
    for field, wtype, val in _iter_fields(buf):
        if field == 1 and wtype == 2:
            return val.decode("utf-8")
    return ""


def _parse_graph(buf: bytes) -> OnnxGraph:
    inits: dict[str, np.ndarray] = {}
    nodes: list[OnnxNode] = []
    gin: list[str] = []
    gout: list[str] = []
    for field, wtype, val in _iter_fields(buf):
        if field == 5 and wtype == 2:
            name, arr = _parse_tensor(val)
            inits[name] = arr
        elif field == 1 and wtype == 2:
            nodes.append(_parse_node(val))
        elif field == 11 and wtype == 2:
            gin.append(_parse_value_info_name(val))
        elif field == 12 and wtype == 2:
            gout.append(_parse_value_info_name(val))
    # graph "inputs" include initializers in some exporters; keep only the
    # true runtime inputs
    gin = [n for n in gin if n not in inits]
    return OnnxGraph(inits, nodes, gin, gout)


def load_onnx(path_or_bytes) -> OnnxGraph:
    """Parse an ONNX file (ModelProto) -> OnnxGraph."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    for field, wtype, val in _iter_fields(data):
        if field == 7 and wtype == 2:  # ModelProto.graph
            return _parse_graph(val)
    raise ValueError("no GraphProto found — not an ONNX ModelProto?")


# ---------------------------------------------------------------------------
# Minimal writer (inverse of the parser).  Used to build synthetic ONNX
# fixtures in tests (no real insightface .onnx ships with the reference) and
# to round-trip-check the parser itself.
# ---------------------------------------------------------------------------

_NP_TO_ONNX = {np.dtype(v): k for k, v in _DTYPES.items()}


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_ld(field: int, payload: bytes) -> bytes:
    return _enc_varint((field << 3) | 2) + _enc_varint(len(payload)) + payload


def _enc_int(field: int, val: int) -> bytes:
    return _enc_varint((field << 3) | 0) + _enc_varint(val)


def build_tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.asarray(arr)
    shape = arr.shape  # np.ascontiguousarray would promote 0-d to 1-d
    arr = np.ascontiguousarray(arr)
    out = b"".join(_enc_int(1, d) for d in shape)
    out += _enc_int(2, _NP_TO_ONNX[arr.dtype])
    out += _enc_ld(8, name.encode("utf-8"))
    out += _enc_ld(9, arr.tobytes())
    return out


def _enc_sint64(field: int, val: int) -> bytes:
    return _enc_varint((field << 3) | 0) + _enc_varint(val & ((1 << 64) - 1))


def build_attr(name: str, value) -> bytes:
    """Encode one AttributeProto (int / float / str / int-list / float-list /
    tensor), including the ``type`` discriminator onnxruntime expects."""
    out = _enc_ld(1, name.encode("utf-8"))
    if isinstance(value, bool):
        value = int(value)
    if isinstance(value, int):
        out += _enc_sint64(3, value) + _enc_int(20, 2)  # INT
    elif isinstance(value, float):
        out += _enc_varint((2 << 3) | 5) + struct.pack("<f", value)
        out += _enc_int(20, 1)  # FLOAT
    elif isinstance(value, str):
        out += _enc_ld(4, value.encode("utf-8")) + _enc_int(20, 3)  # STRING
    elif isinstance(value, np.ndarray):
        out += _enc_ld(5, build_tensor("", value)) + _enc_int(20, 4)  # TENSOR
    elif isinstance(value, (list, tuple)) and value and isinstance(
            value[0], float):
        for v in value:
            out += _enc_varint((7 << 3) | 5) + struct.pack("<f", v)
        out += _enc_int(20, 6)  # FLOATS
    elif isinstance(value, (list, tuple)):
        for v in value:
            out += _enc_sint64(8, int(v))
        out += _enc_int(20, 7)  # INTS
    else:
        raise TypeError(f"unsupported attribute value: {value!r}")
    return out


def build_node(op_type: str, inputs, outputs, name: str = "",
               attrs: dict | None = None) -> bytes:
    out = b"".join(_enc_ld(1, i.encode("utf-8")) for i in inputs)
    out += b"".join(_enc_ld(2, o.encode("utf-8")) for o in outputs)
    if name:
        out += _enc_ld(3, name.encode("utf-8"))
    out += _enc_ld(4, op_type.encode("utf-8"))
    for k, v in (attrs or {}).items():
        out += _enc_ld(5, build_attr(k, v))
    return out


def _build_value_info(name: str) -> bytes:
    return _enc_ld(1, name.encode("utf-8"))


def build_onnx(nodes: list[bytes], initializers: dict[str, np.ndarray],
               inputs: list[str] = (), outputs: list[str] = ()) -> bytes:
    """Assemble a ModelProto byte string from encoded nodes + initializers."""
    graph = b"".join(_enc_ld(1, n) for n in nodes)
    graph += b"".join(
        _enc_ld(5, build_tensor(k, v)) for k, v in initializers.items()
    )
    graph += b"".join(_enc_ld(11, _build_value_info(n)) for n in inputs)
    graph += b"".join(_enc_ld(12, _build_value_info(n)) for n in outputs)
    return _enc_ld(7, graph)
