"""Import scaffolding for the reference XPose/UniPose torch model (TEST
ORACLE ONLY): stubs the absent torchvision / CUDA-extension imports and
patches the one hardcoded .to('cuda') so the reference model builds and runs
on CPU with random weights (reference
src/utils/dependencies/XPose/models/UniPose/*)."""

from __future__ import annotations

import sys
import types

import torch


def _mkmod(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def load_reference_unipose():
    """Returns (unipose_module, build_fn, Config)."""
    if "torchvision" not in sys.modules:
        def _nms(*a, **k):
            raise NotImplementedError

        class _ILG:
            def __init__(self, *a, **k):
                raise NotImplementedError

        tv = _mkmod("torchvision", __version__="0.15.0", __path__=[],
                    _is_tracing=lambda: False)
        _mkmod("torchvision.ops", nms=_nms)
        _mkmod("torchvision.ops.boxes", batched_nms=_nms)
        _mkmod("torchvision.models", __path__=[])
        _mkmod("torchvision.models._utils", IntermediateLayerGetter=_ILG)
        tv.ops = sys.modules["torchvision.ops"]
        _mkmod("MultiScaleDeformableAttention",
               ms_deform_attn_forward=None, ms_deform_attn_backward=None)
    for p in ("/root/reference", "/root/reference/src/utils/dependencies/XPose"):
        if p not in sys.path:
            sys.path.insert(0, p)
    import importlib

    # other oracle tests may have bound the name 'models' to the reference
    # repo's top-level models/ (ArcFace scaffolding) — or 'util' to something
    # else; purge stale bindings so XPose's own packages resolve
    xpose_root = "/root/reference/src/utils/dependencies/XPose"
    for name in list(sys.modules):
        if name == "models" or name.startswith("models."):
            mod = sys.modules[name]
            path = list(getattr(mod, "__path__", [])) or [
                getattr(mod, "__file__", "") or ""]
            if not any(str(p).startswith(xpose_root) for p in path):
                del sys.modules[name]

    unipose = importlib.import_module("models.UniPose.unipose")

    def prepare_for_mask_cpu(kpt_mask):
        # reference mask_generate.prepare_for_mask with device-correct alloc
        # (the original hardcodes .to('cuda'), mask_generate.py:8)
        tgt_size2 = 50 * 69
        attn_mask2 = torch.zeros(
            kpt_mask.shape[0], 8, tgt_size2, tgt_size2,
            dtype=torch.bool, device=kpt_mask.device)
        group = 69
        for g in range(50):
            attn_mask2[:, :, g * group:(g + 1) * group, : g * group] = True
            attn_mask2[:, :, g * group:(g + 1) * group, (g + 1) * group:] = True
        bs, length = kpt_mask.shape
        equal = (kpt_mask[:, :, None] == kpt_mask[:, None, :])[:, None].repeat(
            1, 8, 1, 1)
        for idx in range(50):
            s, e = idx * length, (idx + 1) * length
            blk = attn_mask2[:, :, s:e, s:e]
            blk[equal] = False
            blk[~equal] = True
            attn_mask2[:, :, s:e, s:e] = blk
        return None, None, None, attn_mask2.flatten(0, 1), None

    unipose.prepare_for_mask = prepare_for_mask_cpu

    # route the native deformable-attention op to the reference's own pure
    # PyTorch fallback (ms_deform_attn_func.py:41-71); the CUDA extension is
    # stubbed out above
    import importlib

    f = importlib.import_module("models.UniPose.ops.functions.ms_deform_attn_func")

    class _PyTorchMSDA:
        @staticmethod
        def apply(value, shapes, level_start_index, loc, weights, step):
            return f.ms_deform_attn_core_pytorch(value, shapes, loc, weights)

    m1 = importlib.import_module("models.UniPose.ops.modules.ms_deform_attn")
    m1.MSDeformAttnFunction = _PyTorchMSDA
    m2 = importlib.import_module(
        "models.UniPose.ops.modules.ms_deform_attn_key_aware")
    for attr in ("MSDeformAttnFunction",):
        if hasattr(m2, attr):
            setattr(m2, attr, _PyTorchMSDA)

    from models.registry import MODULE_BUILD_FUNCS
    from util.config import Config

    return unipose, MODULE_BUILD_FUNCS.get("UniPose"), Config


def tiny_args(Config):
    args = Config.fromfile(
        "/root/reference/src/utils/dependencies/XPose/config_model/UniPose_SwinT.py")
    args.device = "cpu"
    # hidden_dim must stay 256: the text pos-embed dims are hardcoded
    # (deformable_transformer.py:643, get_sine_pos_embed num_pos_feats=256)
    args.enc_layers = 2
    args.dec_layers = 3
    args.num_queries = 64  # decoder hardcodes 50 group selections
    args.dim_feedforward = 256
    return args
