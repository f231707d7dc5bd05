"""Generic ONNX graph executor on JAX — sidecar nets with zero topology
assumptions.

The reference runs its perception sidecars (det_10g.onnx, 2d106det.onnx,
landmark.onnx, glintr100.onnx — readme.md:32-48) through onnxruntime
sessions.  ``runtime/onnx_map.py`` zips those weights onto our native flax
re-implementations when the op sequence matches; THIS module is the safety
net that removes the topology risk entirely: it interprets any ONNX graph
node-by-node with jnp ops, so a real user-supplied .onnx file runs compiled
by XLA on TPU even if its exact op sequence differs from our rebuilds.

Scope: the op set used by the insightface / LivePortrait model families
(Conv/BN/PRelu/pool/Gemm/Resize/Slice/... — inference only).  Shape-carrying
values (Shape/Constant/initializer products) are kept as host numpy arrays so
Reshape/Resize/Slice stay static under jit tracing; tensor math runs in jnp.

Layout note: ONNX graphs are NCHW.  The executor keeps NCHW semantics and
lets XLA choose device layouts; the hand-built flax sidecars remain the fast
path, this is the compatibility path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from canonswap_tpu.runtime.onnx_import import OnnxGraph, OnnxNode, load_onnx

_HOST_TYPES = (np.ndarray, np.generic, int, float, bool)


def _is_host(x) -> bool:
    return isinstance(x, _HOST_TYPES)


def _xp(*args):
    """numpy when every operand is host data (keeps shape math concrete),
    jnp otherwise."""
    return np if all(_is_host(a) for a in args if a is not None) else jnp


def _ints(v):
    return [int(x) for x in np.asarray(v).reshape(-1)]


# ---------------------------------------------------------------------------
# op implementations — each takes (node, *inputs) and returns output(s)
# ---------------------------------------------------------------------------

_OPS = {}


def op(name):
    def deco(fn):
        _OPS[name] = fn
        return fn
    return deco


def _conv_padding(node, x_shape, k_shape, strides, dilations):
    spatial = len(k_shape) - 2
    auto = node.attrs.get("auto_pad", "NOTSET")
    if auto in ("NOTSET", ""):
        pads = node.attrs.get("pads", [0] * (2 * spatial))
        return [(int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]
    if auto == "VALID":
        return [(0, 0)] * spatial
    out = []
    for i in range(spatial):
        in_dim = x_shape[2 + i]
        eff_k = (k_shape[2 + i] - 1) * dilations[i] + 1
        out_dim = -(-in_dim // strides[i])
        total = max(0, (out_dim - 1) * strides[i] + eff_k - in_dim)
        lo, hi = total // 2, total - total // 2
        out.append((hi, lo) if auto == "SAME_LOWER" else (lo, hi))
    return out


@op("Conv")
def _conv(node, x, w, b=None):
    spatial = w.ndim - 2
    strides = [int(s) for s in node.attrs.get("strides", [1] * spatial)]
    dil = [int(d) for d in node.attrs.get("dilations", [1] * spatial)]
    group = int(node.attrs.get("group", 1))
    pad = _conv_padding(node, x.shape, w.shape, strides, dil)
    lhs_spec = "NC" + "DHW"[3 - spatial:]
    dn = (lhs_spec, "OI" + "DHW"[3 - spatial:], lhs_spec)
    y = lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), strides, pad, rhs_dilation=dil,
        feature_group_count=group, dimension_numbers=dn,
    )
    if b is not None:
        y = y + jnp.asarray(b).reshape((1, -1) + (1,) * spatial)
    return y


@op("BatchNormalization")
def _bn(node, x, scale, bias, mean, var):
    eps = float(node.attrs.get("epsilon", 1e-5))
    shape = (1, -1) + (1,) * (x.ndim - 2)
    scale, bias, mean, var = (jnp.asarray(v).reshape(shape)
                              for v in (scale, bias, mean, var))
    return (jnp.asarray(x) - mean) * (scale * lax.rsqrt(var + eps)) + bias


@op("InstanceNormalization")
def _in_norm(node, x, scale, bias):
    eps = float(node.attrs.get("epsilon", 1e-5))
    axes = tuple(range(2, x.ndim))
    m = jnp.mean(x, axis=axes, keepdims=True)
    v = jnp.var(x, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return (x - m) * lax.rsqrt(v + eps) * jnp.asarray(scale).reshape(shape) \
        + jnp.asarray(bias).reshape(shape)


@op("PRelu")
def _prelu(node, x, slope):
    slope = jnp.asarray(slope)
    if slope.ndim == 1 and x.ndim > 2 and slope.shape[0] == x.shape[1]:
        slope = slope.reshape((1, -1) + (1,) * (x.ndim - 2))
    return jnp.where(x >= 0, x, x * slope)


for _name, _fn in {
    "Relu": lambda x: jnp.maximum(x, 0) if not _is_host(x) else np.maximum(x, 0),
    "Sigmoid": jax.nn.sigmoid, "Tanh": jnp.tanh, "Exp": jnp.exp,
    "Log": jnp.log, "Sqrt": jnp.sqrt, "Neg": lambda x: -x,
    "Abs": jnp.abs, "Floor": jnp.floor, "Ceil": jnp.ceil,
    "Erf": jax.scipy.special.erf, "Softplus": jax.nn.softplus,
    "Identity": lambda x: x,
}.items():
    _OPS[_name] = (lambda f: lambda node, x: f(x))(_fn)


@op("LeakyRelu")
def _leaky(node, x):
    return jnp.where(x >= 0, x, x * float(node.attrs.get("alpha", 0.01)))


@op("HardSigmoid")
def _hard_sigmoid(node, x):
    a = float(node.attrs.get("alpha", 0.2))
    b = float(node.attrs.get("beta", 0.5))
    return jnp.clip(a * x + b, 0.0, 1.0)


@op("Clip")
def _clip(node, x, lo=None, hi=None):
    if lo is None:
        lo = node.attrs.get("min")
    if hi is None:
        hi = node.attrs.get("max")
    xp = _xp(x)
    if lo is not None:
        x = xp.maximum(x, lo)
    if hi is not None:
        x = xp.minimum(x, hi)
    return x


@op("Softmax")
def _softmax(node, x):
    return jax.nn.softmax(x, axis=int(node.attrs.get("axis", -1)))


def _binop(fn_np, fn_jnp):
    def run(node, a, b):
        return (fn_np if _xp(a, b) is np else fn_jnp)(a, b)
    return run


_OPS["Add"] = _binop(np.add, jnp.add)
_OPS["Sub"] = _binop(np.subtract, jnp.subtract)
_OPS["Mul"] = _binop(np.multiply, jnp.multiply)
_OPS["Div"] = _binop(
    lambda a, b: np.asarray(a) / b
    if np.issubdtype(np.asarray(a).dtype, np.floating)
    or np.issubdtype(np.asarray(b).dtype, np.floating)
    else np.asarray(a) // b,
    jnp.divide)
_OPS["Pow"] = _binop(np.power, jnp.power)
_OPS["Min"] = _binop(np.minimum, jnp.minimum)
_OPS["Max"] = _binop(np.maximum, jnp.maximum)
_OPS["Equal"] = _binop(np.equal, jnp.equal)
_OPS["Greater"] = _binop(np.greater, jnp.greater)
_OPS["Less"] = _binop(np.less, jnp.less)
_OPS["And"] = _binop(np.logical_and, jnp.logical_and)
_OPS["Or"] = _binop(np.logical_or, jnp.logical_or)


@op("Where")
def _where(node, c, a, b):
    return _xp(c, a, b).where(c, a, b)


@op("MatMul")
def _matmul(node, a, b):
    return jnp.matmul(a, b)


@op("Gemm")
def _gemm(node, a, b, c=None):
    alpha = float(node.attrs.get("alpha", 1.0))
    beta = float(node.attrs.get("beta", 1.0))
    if int(node.attrs.get("transA", 0)):
        a = jnp.swapaxes(a, -1, -2)
    if int(node.attrs.get("transB", 0)):
        b = jnp.swapaxes(b, -1, -2)
    y = alpha * jnp.matmul(a, b)
    if c is not None:
        y = y + beta * jnp.asarray(c)
    return y


@op("Reshape")
def _reshape(node, x, shape=None):
    tgt = _ints(shape if shape is not None else node.attrs["shape"])
    out = []
    for i, s in enumerate(tgt):
        out.append(int(x.shape[i]) if s == 0 else s)
    return _xp(x).reshape(x, out) if _is_host(x) else jnp.reshape(x, out)


@op("Flatten")
def _flatten(node, x):
    ax = int(node.attrs.get("axis", 1))
    lead = int(np.prod(x.shape[:ax])) if ax else 1
    return jnp.reshape(x, (lead, -1)) if not _is_host(x) else \
        np.reshape(x, (lead, -1))


@op("Transpose")
def _transpose(node, x):
    perm = node.attrs.get("perm")
    if perm is None:
        perm = list(range(x.ndim))[::-1]
    return _xp(x).transpose(x, [int(p) for p in perm])


@op("Squeeze")
def _squeeze(node, x, axes=None):
    ax = axes if axes is not None else node.attrs.get("axes")
    if ax is None:
        ax = [i for i, s in enumerate(x.shape) if s == 1]
    ax = tuple(a % x.ndim for a in _ints(ax))
    return _xp(x).squeeze(x, ax)


@op("Unsqueeze")
def _unsqueeze(node, x, axes=None):
    ax = sorted(_ints(axes if axes is not None else node.attrs["axes"]))
    xp = _xp(x)
    for a in ax:
        x = xp.expand_dims(x, a if a >= 0 else a + x.ndim + 1)
    return x


@op("Concat")
def _concat(node, *xs):
    ax = int(node.attrs["axis"])
    return _xp(*xs).concatenate(xs, axis=ax)


@op("Split")
def _split(node, x, split=None):
    ax = int(node.attrs.get("axis", 0))
    sp = split if split is not None else node.attrs.get("split")
    if sp is None:
        n = len(node.outputs)
        sp = [x.shape[ax] // n] * n
    idx = np.cumsum(_ints(sp))[:-1]
    return tuple(_xp(x).split(x, idx, axis=ax))


@op("Slice")
def _slice(node, x, starts=None, ends=None, axes=None, steps=None):
    if starts is None:
        starts = node.attrs["starts"]
        ends = node.attrs["ends"]
        axes = node.attrs.get("axes")
    starts, ends = _ints(starts), _ints(ends)
    axes = _ints(axes) if axes is not None else list(range(len(starts)))
    steps = _ints(steps) if steps is not None else [1] * len(starts)
    sl = [slice(None)] * x.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        a = a % x.ndim
        sl[a] = slice(s, e, st)
    return x[tuple(sl)]


@op("Gather")
def _gather(node, x, idx):
    ax = int(node.attrs.get("axis", 0))
    if _xp(x, idx) is np:
        return np.take(x, np.asarray(idx, np.int64), axis=ax)
    return jnp.take(x, jnp.asarray(idx), axis=ax)


@op("Shape")
def _shape(node, x):
    return np.asarray(x.shape, np.int64)


@op("Size")
def _size(node, x):
    return np.asarray(int(np.prod(x.shape)), np.int64)


@op("Cast")
def _cast(node, x):
    to = int(node.attrs["to"])
    from canonswap_tpu.runtime.onnx_import import _DTYPES
    dt = _DTYPES.get(to, np.float32)
    return x.astype(dt)


@op("Constant")
def _constant(node):
    for key in ("value", "value_float", "value_int", "value_floats",
                "value_ints"):
        if key in node.attrs:
            return np.asarray(node.attrs[key])
    raise ValueError("Constant node without value")


@op("ConstantOfShape")
def _const_of_shape(node, shape):
    val = node.attrs.get("value")
    val = np.asarray(val).reshape(-1) if val is not None else \
        np.zeros(1, np.float32)
    return np.full(_ints(shape), val[0], val.dtype)


@op("Range")
def _range(node, start, limit, delta):
    return np.arange(int(np.asarray(start)), int(np.asarray(limit)),
                     int(np.asarray(delta)), np.int64)


@op("Expand")
def _expand(node, x, shape):
    tgt = _ints(shape)
    # ONNX Expand = numpy broadcast with max(dim, tgt)
    full = list(np.broadcast_shapes(tuple(x.shape), tuple(tgt)))
    return _xp(x).broadcast_to(x, full)


@op("Tile")
def _tile(node, x, reps):
    return _xp(x).tile(x, _ints(reps))


def _reduce(fn_jnp):
    def run(node, x, axes=None):
        ax = axes if axes is not None else node.attrs.get("axes")
        ax = tuple(_ints(ax)) if ax is not None else None
        keep = bool(node.attrs.get("keepdims", 1))
        return fn_jnp(x, axis=ax, keepdims=keep)
    return run


_OPS["ReduceMean"] = _reduce(jnp.mean)
_OPS["ReduceSum"] = _reduce(jnp.sum)
_OPS["ReduceMax"] = _reduce(jnp.max)
_OPS["ReduceMin"] = _reduce(jnp.min)
_OPS["ReduceL2"] = _reduce(
    lambda x, axis, keepdims: jnp.sqrt(
        jnp.sum(jnp.square(x), axis=axis, keepdims=keepdims)))


@op("ArgMax")
def _argmax(node, x):
    ax = int(node.attrs.get("axis", 0))
    keep = bool(node.attrs.get("keepdims", 1))
    y = jnp.argmax(x, axis=ax)
    return jnp.expand_dims(y, ax) if keep else y


def _pool(node, x, reducer, init, is_avg):
    k = [int(v) for v in node.attrs["kernel_shape"]]
    spatial = len(k)
    strides = [int(s) for s in node.attrs.get("strides", [1] * spatial)]
    pads = node.attrs.get("pads", [0] * 2 * spatial)
    pad = [(0, 0), (0, 0)] + [
        (int(pads[i]), int(pads[i + spatial])) for i in range(spatial)]
    if int(node.attrs.get("ceil_mode", 0)):
        # extend the end-padding so the last partial window is included
        pad = list(pad)
        for i in range(spatial):
            in_dim = x.shape[2 + i] + pad[2 + i][0] + pad[2 + i][1]
            rem = (in_dim - k[i]) % strides[i]
            if rem:
                pad[2 + i] = (pad[2 + i][0], pad[2 + i][1] + strides[i] - rem)
    dims = (1, 1, *k)
    strd = (1, 1, *strides)
    y = lax.reduce_window(jnp.asarray(x), init, reducer, dims, strd, pad)
    if is_avg:
        if int(node.attrs.get("count_include_pad", 0)):
            y = y / float(np.prod(k))
        else:
            ones = jnp.ones(x.shape[2:], x.dtype)[None, None]
            cnt = lax.reduce_window(ones, 0.0, lax.add, dims, strd, pad)
            y = y / cnt
    return y


@op("MaxPool")
def _maxpool(node, x):
    return _pool(node, x, lax.max, -jnp.inf, False)


@op("AveragePool")
def _avgpool(node, x):
    return _pool(node, x, lax.add, 0.0, True)


@op("GlobalAveragePool")
def _gap(node, x):
    return jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)


@op("Pad")
def _pad(node, x, pads=None, value=None):
    mode = node.attrs.get("mode", "constant")
    p = _ints(pads if pads is not None else node.attrs["pads"])
    n = x.ndim
    cfg = [(p[i], p[i + n]) for i in range(n)]
    if mode == "constant":
        cv = float(np.asarray(value)) if value is not None else \
            float(node.attrs.get("value", 0.0))
        return jnp.pad(x, cfg, constant_values=cv)
    return jnp.pad(x, cfg, mode={"reflect": "reflect", "edge": "edge"}[mode])


@op("Dropout")
def _dropout(node, x, *rest):
    return x


def _resize_axis(x, axis, out_size, mode, coord_mode, nearest_mode):
    """Separable 1-axis resample with explicit ONNX coordinate semantics."""
    in_size = x.shape[axis]
    if out_size == in_size:
        return x
    o = jnp.arange(out_size, dtype=jnp.float32)
    scale = in_size / out_size
    if coord_mode == "align_corners":
        src = o * ((in_size - 1) / max(out_size - 1, 1))
    elif coord_mode == "asymmetric":
        src = o * scale
    elif coord_mode == "pytorch_half_pixel":
        src = (o + 0.5) * scale - 0.5 if out_size > 1 else jnp.zeros_like(o)
    else:  # half_pixel
        src = (o + 0.5) * scale - 0.5
    if mode == "nearest":
        if nearest_mode == "floor":
            idx = jnp.floor(src)
        elif nearest_mode == "ceil":
            idx = jnp.ceil(src)
        elif nearest_mode == "round_prefer_ceil":
            idx = jnp.floor(src + 0.5)
        else:  # round_prefer_floor
            idx = jnp.ceil(src - 0.5)
        idx = jnp.clip(idx, 0, in_size - 1).astype(jnp.int32)
        return jnp.take(x, idx, axis=axis)
    lo = jnp.clip(jnp.floor(src), 0, in_size - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    f = jnp.clip(src - lo.astype(jnp.float32), 0.0, 1.0)
    shape = [1] * x.ndim
    shape[axis] = out_size
    f = f.reshape(shape).astype(x.dtype)
    return jnp.take(x, lo, axis=axis) * (1 - f) + jnp.take(x, hi, axis=axis) * f


def _resize_common(node, x, out_sizes):
    mode = node.attrs.get("mode", "nearest")
    coord = node.attrs.get("coordinate_transformation_mode", "half_pixel")
    nearest_mode = node.attrs.get("nearest_mode", "round_prefer_floor")
    y = jnp.asarray(x)
    for ax, out_s in enumerate(out_sizes):
        y = _resize_axis(y, ax, int(out_s), mode, coord, nearest_mode)
    return y


@op("Resize")
def _resize(node, x, roi=None, scales=None, sizes=None):
    if sizes is not None and np.asarray(sizes).size:
        out_sizes = _ints(sizes)
    else:
        sc = np.asarray(scales, np.float64).reshape(-1)
        out_sizes = [int(np.floor(s * d)) for s, d in zip(sc, x.shape)]
    return _resize_common(node, x, out_sizes)


@op("Upsample")
def _upsample(node, x, scales=None):
    sc = np.asarray(
        scales if scales is not None else node.attrs["scales"], np.float64
    ).reshape(-1)
    out_sizes = [int(np.floor(s * d)) for s, d in zip(sc, x.shape)]
    # legacy Upsample used asymmetric coordinates
    node = OnnxNode(node.op_type, node.name, node.inputs, node.outputs,
                    dict(node.attrs,
                         coordinate_transformation_mode="asymmetric",
                         nearest_mode="floor"))
    return _resize_common(node, x, out_sizes)


# ---------------------------------------------------------------------------


class OnnxExecutor:
    """Interpret an OnnxGraph.  Construct once, call with input arrays in
    graph-input order (or a {name: array} dict).  jit-compatible."""

    def __init__(self, graph: OnnxGraph):
        self.graph = graph
        missing = sorted({n.op_type for n in graph.nodes} - set(_OPS))
        if missing:
            raise NotImplementedError(
                f"ONNX ops not implemented: {missing} — extend "
                "canonswap_tpu/runtime/onnx_exec.py")

    @property
    def input_names(self):
        return list(self.graph.inputs)

    @property
    def output_names(self):
        return list(self.graph.outputs)

    def __call__(self, *args, **feeds):
        env: dict[str, object] = dict(self.graph.initializers)
        names = self.graph.inputs
        if args:
            if len(args) != len(names):
                raise ValueError(
                    f"expected {len(names)} inputs {names}, got {len(args)}")
            env.update(zip(names, args))
        env.update(feeds)
        for node in self.graph.nodes:
            fn = _OPS[node.op_type]
            ins = [env[i] if i else None for i in node.inputs]
            try:
                outs = fn(node, *ins)
            except Exception as e:
                raise RuntimeError(
                    f"ONNX node {node.op_type}({node.name}) failed: {e}"
                ) from e
            if not isinstance(outs, tuple):
                outs = (outs,)
            for name, val in zip(node.outputs, outs):
                if name:
                    env[name] = val
        return [env[o] for o in self.graph.outputs]


@functools.lru_cache(maxsize=8)
def _load_executor(path: str) -> OnnxExecutor:
    return OnnxExecutor(load_onnx(path))


def make_jit_runner(path_or_graph):
    """Load an .onnx file (or OnnxGraph) and return a jitted callable
    ``f(*inputs) -> [outputs]``."""
    if isinstance(path_or_graph, OnnxGraph):
        ex = OnnxExecutor(path_or_graph)
    else:
        ex = _load_executor(str(path_or_graph))

    @jax.jit
    def run(*inputs):
        return ex(*inputs)

    return run, ex
