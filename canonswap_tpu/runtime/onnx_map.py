"""Topology-driven ONNX -> flax weight mapping for the sidecar networks.

The reference loads det_10g.onnx / 2d106det.onnx / landmark.onnx /
glintr100.onnx as opaque onnxruntime sessions
(src/utils/dependencies/insightface/model_zoo/scrfd.py:72-110,
model_zoo/landmark.py:31-49, model_zoo/arcface_onnx.py:14-38).  Here the
sidecars are real flax networks (models/scrfd.py, models/landmark.py,
models/arcface.py) and this module assigns ONNX initializers onto them.

Strategy: ONNX stores nodes in topological (execution) order, and flax's
``init`` builds the param tree in first-call order — so the parameterized ops
of both representations enumerate in the same sequence.  We extract the ONNX
weight sequence (Conv / BatchNormalization / Gemm / MatMul / PRelu), convert
each to flax layout, and zip it against the flax param slots with hard shape
checks.  Any divergence (fused BN, reordered branch, depthwise group) raises
with full context instead of silently mis-assigning.

The machinery is locked by tests/test_onnx_map.py with synthetic ONNX
fixtures (the real insightface files do not ship with the reference).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from canonswap_tpu.runtime.onnx_import import OnnxGraph, load_onnx

# ---------------------------------------------------------------------------
# ONNX side: ordered weight sequence
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class WeightOp:
    kind: str  # "conv" | "bn" | "dense" | "prelu"
    name: str  # node name (diagnostics)
    arrays: dict[str, np.ndarray]  # flax-layout arrays


def onnx_weight_sequence(graph: OnnxGraph) -> list[WeightOp]:
    """Parameterized ops in node (execution) order, arrays in flax layout.

    A weight initializer referenced by multiple nodes (stride-shared SCRFD
    heads: the same cls/reg/kps weights feed one Conv node per FPN level)
    is emitted once, at its first use — matching the single flax param slot
    of the shared module."""
    init = graph.initializers
    seq: list[WeightOp] = []
    consumed: set[str] = set()
    for node in graph.nodes:
        ins = [i for i in node.inputs]
        if any(i in consumed for i in ins[1:]):
            continue
        consumed.update(i for i in ins[1:] if i in init)
        if node.op_type == "Conv" and len(ins) >= 2 and ins[1] in init:
            w = init[ins[1]]  # (O, I/g, kh, kw)
            arrays = {"kernel": np.transpose(w, (2, 3, 1, 0))}
            if len(ins) >= 3 and ins[2] in init:
                arrays["bias"] = init[ins[2]]
            seq.append(WeightOp("conv", node.name or ins[1], arrays))
        elif node.op_type == "ConvTranspose" and ins[1] in init:
            w = init[ins[1]]  # (I, O/g, kh, kw)
            arrays = {"kernel": np.transpose(w, (2, 3, 0, 1))}
            if len(ins) >= 3 and ins[2] in init:
                arrays["bias"] = init[ins[2]]
            seq.append(WeightOp("conv_transpose", node.name or ins[1], arrays))
        elif node.op_type == "BatchNormalization" and len(ins) >= 5:
            seq.append(
                WeightOp(
                    "bn",
                    node.name or ins[1],
                    {
                        "scale": init[ins[1]],
                        "bias": init[ins[2]],
                        "mean": init[ins[3]],
                        "var": init[ins[4]],
                    },
                )
            )
        elif node.op_type in ("Gemm", "MatMul") and any(i in init for i in ins[1:]):
            w_name = ins[1] if ins[1] in init else ins[0]
            w = init[w_name]
            arrays = {"kernel": w}  # orientation fixed at assignment time
            if node.op_type == "Gemm" and len(ins) >= 3 and ins[2] in init:
                arrays["bias"] = init[ins[2]]
            seq.append(WeightOp("dense", node.name or w_name, arrays))
        elif node.op_type == "PRelu" and len(ins) >= 2 and ins[1] in init:
            seq.append(
                WeightOp("prelu", node.name or ins[1],
                         {"slope": init[ins[1]].reshape(-1)})
            )
        elif node.op_type in ("Mul", "Add") and len(ins) >= 2 and (
            ins[1] in init or ins[0] in init
        ):
            # affine-decomposed GroupNorm/LayerNorm (scale Mul + bias Add)
            w_name = ins[1] if ins[1] in init else ins[0]
            seq.append(
                WeightOp(node.op_type.lower(), node.name or w_name,
                         {"value": init[w_name]})
            )
    return seq


# ---------------------------------------------------------------------------
# flax side: ordered parameter slots
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class ParamSlot:
    kind: str
    path: tuple[str, ...]  # path inside variables["params"]
    shapes: dict[str, tuple]


def _walk(tree: dict, path: tuple[str, ...], stats: dict, out: list):
    keys = list(tree.keys())
    leaf_arrays = {
        k: v for k, v in tree.items() if not isinstance(v, dict)
    }
    if leaf_arrays:
        if "kernel" in leaf_arrays:
            kind = "conv" if np.ndim(tree["kernel"]) >= 3 else "dense"
            out.append(
                ParamSlot(kind, path,
                          {k: np.shape(v) for k, v in leaf_arrays.items()})
            )
        elif {"scale", "bias"} <= set(leaf_arrays):
            st = stats
            for p in path:
                st = st.get(p, {}) if isinstance(st, dict) else {}
            if {"mean", "var"} <= set(st.keys()):
                out.append(
                    ParamSlot(
                        "bn", path,
                        {"scale": np.shape(tree["scale"]),
                         "bias": np.shape(tree["bias"]),
                         "mean": np.shape(st["mean"]),
                         "var": np.shape(st["var"])},
                    )
                )
            else:  # GroupNorm / LayerNorm — no ONNX initializer-op analogue
                out.append(
                    ParamSlot("norm", path,
                              {k: np.shape(v) for k, v in leaf_arrays.items()})
                )
        elif "alpha" in leaf_arrays:  # models.arcface.PReLU
            out.append(ParamSlot("prelu", path,
                                 {"alpha": np.shape(leaf_arrays["alpha"])}))
    for k in keys:
        v = tree[k]
        if isinstance(v, dict):
            _walk(v, path + (k,), stats, out)


def flax_param_slots(
    variables: dict, call_order: list[tuple] | None = None
) -> list[ParamSlot]:
    """Parameter slots in execution order.

    flax canonicalizes param dicts to SORTED key order, which destroys
    creation order (e.g. BatchNorm_0 sorts before Conv_0) — so the dict walk
    alone cannot recover execution order.  Pass ``call_order`` (from
    :func:`module_call_order`) to reorder slots by the module call sequence
    of an actual trace; without it, slots come back in sorted-path order.
    """
    out: list[ParamSlot] = []
    _walk(dict(variables["params"]), (), dict(variables.get("batch_stats", {})),
          out)
    if call_order is not None:
        pos = {tuple(p): i for i, p in enumerate(call_order)}

        def key(slot: ParamSlot):
            # longest recorded prefix (the slot path IS a module path for
            # standard layers; fall back to the parent for inline params)
            for ln in range(len(slot.path), -1, -1):
                p = tuple(slot.path[:ln])
                if p in pos:
                    return (pos[p], slot.path)
            return (len(pos), slot.path)

        out.sort(key=key)
    return out


def module_call_order(module, *init_args, **init_kwargs) -> list[tuple]:
    """Record the module-path call sequence of one ``init`` trace."""
    from flax import linen as nn

    order: list[tuple] = []
    seen = set()

    def interceptor(next_fn, args, kwargs, context):
        p = tuple(context.module.path)
        if p not in seen:
            seen.add(p)
            order.append(p)
        return next_fn(*args, **kwargs)

    import jax as _jax

    with nn.intercept_methods(interceptor):
        _ = module.init(_jax.random.PRNGKey(0), *init_args, **init_kwargs)
    return order


# ---------------------------------------------------------------------------
# Assignment
# ---------------------------------------------------------------------------


def _set(tree: dict, path: tuple[str, ...], key: str, val: np.ndarray):
    node = tree
    for p in path:
        node = node[p]
    old = node[key]
    if np.shape(old) != np.shape(val):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}/{key}: "
            f"flax {np.shape(old)} vs onnx {np.shape(val)}"
        )
    node[key] = np.asarray(val, np.asarray(old).dtype)


def assign_onnx_weights(
    variables: dict, graph: OnnxGraph, call_order: list[tuple] | None = None
) -> dict:
    """Return a copy of ``variables`` with ONNX weights assigned in order.

    Raises ValueError with slot/op context on any kind or shape divergence.
    """
    import jax

    variables = jax.tree.map(np.asarray, dict(variables))
    slots = flax_param_slots(variables, call_order)
    ops = onnx_weight_sequence(graph)
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    oi = 0
    fused_bn_paths: list[tuple] = []
    for si, slot in enumerate(slots):
        if oi >= len(ops):
            raise ValueError(
                f"onnx graph ran out of parameterized ops at flax slot "
                f"{'/'.join(slot.path)} ({si + 1}/{len(slots)})"
            )
        op = ops[oi]

        # Real insightface exports fold BatchNorm into the preceding conv
        # (conv gains a bias, the BN node disappears).  When the flax module
        # expects conv(no bias) + BN but the stream offers conv-with-bias and
        # no BN next, assign the kernel and synthesize an identity BN that
        # carries the exported bias: (x - 0) * s / sqrt(1 + eps) + b with
        # s = sqrt(1 + eps) is exactly x + b.
        if (
            slot.kind == "conv"
            and op.kind == "conv"
            and "bias" not in slot.shapes
            and si + 1 < len(slots)
            and slots[si + 1].kind == "bn"
            and not (oi + 1 < len(ops) and ops[oi + 1].kind == "bn")
        ):
            # the folded bias may itself have been optimized away when zero
            # (torch exporter's constant folding does this inconsistently) —
            # synthesize a zero bias then
            _set(params, slot.path, "kernel", op.arrays["kernel"])
            bn_slot = slots[si + 1]
            c = np.asarray(op.arrays["kernel"]).shape[-1]
            bias = op.arrays.get("bias", np.zeros((c,), np.float32))
            eps = 1e-5  # every BatchNorm in this repo uses epsilon=1e-5
            _set(params, bn_slot.path, "scale",
                 np.full((c,), np.sqrt(1.0 + eps), np.float32))
            _set(params, bn_slot.path, "bias", bias)
            _set(stats, bn_slot.path, "mean", np.zeros((c,), np.float32))
            _set(stats, bn_slot.path, "var", np.ones((c,), np.float32))
            fused_bn_paths.append(bn_slot.path)
            oi += 1
            continue
        if slot.kind == "bn" and tuple(slot.path) in (
            tuple(p) for p in fused_bn_paths
        ):
            continue  # already filled by the fused-conv branch

        oi += 1
        kind = "conv" if op.kind == "conv_transpose" else op.kind
        if slot.kind == "norm":
            # affine GroupNorm/LayerNorm == scale Mul + bias Add pair
            op2 = ops[oi]
            oi += 1
            if (op.kind, op2.kind) != ("mul", "add"):
                raise ValueError(
                    f"norm slot {'/'.join(slot.path)} expects Mul+Add, got "
                    f"{op.kind}+{op2.kind} ({op.name}, {op2.name})"
                )
            _set(params, slot.path, "scale",
                 op.arrays["value"].reshape(slot.shapes["scale"]))
            _set(params, slot.path, "bias",
                 op2.arrays["value"].reshape(slot.shapes["bias"]))
        elif slot.kind != kind:
            raise ValueError(
                f"kind mismatch: flax slot {'/'.join(slot.path)} is "
                f"{slot.kind}, onnx op {op.name} is {op.kind}"
            )
        elif op.kind == "bn":
            _set(params, slot.path, "scale", op.arrays["scale"])
            _set(params, slot.path, "bias", op.arrays["bias"])
            _set(stats, slot.path, "mean", op.arrays["mean"])
            _set(stats, slot.path, "var", op.arrays["var"])
        elif op.kind == "dense":
            w = op.arrays["kernel"]
            want = slot.shapes["kernel"]
            if w.shape != want and w.T.shape == want:
                w = w.T  # Gemm transB=1 (insightface default)
            _set(params, slot.path, "kernel", w)
            if "bias" in op.arrays:
                _set(params, slot.path, "bias", op.arrays["bias"])
        elif op.kind == "prelu":
            _set(params, slot.path, "alpha",
                 op.arrays["slope"].reshape(slot.shapes["alpha"]))
        else:  # conv
            _set(params, slot.path, "kernel", op.arrays["kernel"])
            if "bias" in op.arrays:
                if "bias" not in slot.shapes:
                    raise ValueError(
                        f"onnx conv {op.name} has bias but flax slot "
                        f"{'/'.join(slot.path)} does not"
                    )
                _set(params, slot.path, "bias", op.arrays["bias"])
    if oi != len(ops):
        raise ValueError(
            f"onnx graph has {len(ops) - oi} unconsumed parameterized ops "
            f"after filling all {len(slots)} flax slots "
            f"(next: {[(o.kind, o.name) for o in ops[oi:oi + 4]]})"
        )
    return variables


def convert_onnx(
    path_or_bytes, variables: dict, call_order: list[tuple] | None = None
) -> dict:
    """Load an ONNX file and assign its weights onto ``variables``."""
    return assign_onnx_weights(variables, load_onnx(path_or_bytes), call_order)


def convert_onnx_for(module, path_or_bytes, *example_args) -> dict:
    """One-call import: init ``module``, record its call order, assign the
    ONNX weights onto it.  Returns the populated variables."""
    import jax

    variables = module.init(jax.random.PRNGKey(0), *example_args)
    order = module_call_order(module, *example_args)
    return assign_onnx_weights(dict(variables), load_onnx(path_or_bytes),
                               order)


# ---------------------------------------------------------------------------
# Fixture helper: emit a synthetic ONNX stream from a flax param tree (used
# by tests; also handy to snapshot our weights into an interchange format).
# ---------------------------------------------------------------------------


def export_onnx_fixture(
    variables: dict, call_order: list[tuple] | None = None,
    fuse_bn: bool = False,
) -> bytes:
    """Serialize a param tree to ONNX bytes with the matching op sequence.

    ``fuse_bn=True`` reproduces what real insightface exports look like:
    each conv + following BatchNorm collapses into ONE Conv node with the
    BN folded into kernel/bias (W' = W * s/sqrt(v+eps), b' = b - m*s/
    sqrt(v+eps)) and no BatchNormalization nodes remain — the det_10g /
    2d106det op-diet that assign_onnx_weights' fused branch must zip."""
    from canonswap_tpu.runtime import onnx_import as OI

    slots = flax_param_slots(variables, call_order)
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def get(tree, path, key):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node[key])

    nodes: list[bytes] = []
    inits: dict[str, np.ndarray] = {}
    prev = "input"
    skip = set()
    for i, s in enumerate(slots):
        if i in skip:
            continue
        base = f"w{i}"
        out_name = f"t{i}"
        if s.kind == "conv":
            k = get(params, s.path, "kernel")
            bias = get(params, s.path, "bias") if "bias" in s.shapes else None
            if (
                fuse_bn and i + 1 < len(slots) and slots[i + 1].kind == "bn"
            ):
                bs = slots[i + 1]
                scale = get(params, bs.path, "scale")
                bbias = get(params, bs.path, "bias")
                mean = get(stats, bs.path, "mean")
                var = get(stats, bs.path, "var")
                f = scale / np.sqrt(var + 1e-5)
                k = k * f  # (kh,kw,in,out) * (out,)
                bias = (bias if bias is not None else 0.0) * f + bbias \
                    - mean * f
                skip.add(i + 1)
            inits[base + "_W"] = np.transpose(k, (3, 2, 0, 1))
            ins = [prev, base + "_W"]
            if bias is not None:
                inits[base + "_B"] = np.asarray(bias, np.float32)
                ins.append(base + "_B")
            nodes.append(OI.build_node("Conv", ins, [out_name], base))
        elif s.kind == "dense":
            k = get(params, s.path, "kernel")
            inits[base + "_W"] = k.T  # Gemm transB layout
            ins = [prev, base + "_W"]
            if "bias" in s.shapes:
                inits[base + "_B"] = get(params, s.path, "bias")
                ins.append(base + "_B")
            nodes.append(OI.build_node("Gemm", ins, [out_name], base))
        elif s.kind == "bn":
            for suffix, tree, key in (
                ("_scale", params, "scale"), ("_B", params, "bias"),
                ("_mean", stats, "mean"), ("_var", stats, "var"),
            ):
                inits[base + suffix] = get(tree, s.path, key)
            nodes.append(
                OI.build_node(
                    "BatchNormalization",
                    [prev, base + "_scale", base + "_B", base + "_mean",
                     base + "_var"],
                    [out_name], base,
                )
            )
        elif s.kind == "prelu":
            inits[base + "_slope"] = get(params, s.path, "alpha").reshape(1)
            nodes.append(OI.build_node("PRelu", [prev, base + "_slope"],
                                       [out_name], base))
        elif s.kind == "norm":
            inits[base + "_scale"] = get(params, s.path, "scale")
            inits[base + "_bias"] = get(params, s.path, "bias")
            mid = out_name + "_m"
            nodes.append(OI.build_node("Mul", [prev, base + "_scale"],
                                       [mid], base + "_mul"))
            nodes.append(OI.build_node("Add", [mid, base + "_bias"],
                                       [out_name], base + "_add"))
        prev = out_name
    return OI.build_onnx(nodes, inits)
