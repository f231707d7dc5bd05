"""Torch -> JAX weight conversion for the CanonSwap checkpoint family.

Converts the reference's ``combined_weights.pth`` layout (a dict of six torch
state_dicts keyed appearance_feature_extractor / motion_extractor /
warping_module / spade_generator / transfer / refine, can_swap_e2e.py:93-98)
plus the pickled ArcFace module into our flax variable trees.

Conventions handled here:
  - conv kernels:   torch (O, I, *k) -> (*k, I, O)  (HWIO / DHWIO)
  - depthwise conv: torch (C, 1, kh, kw) -> (kh, kw, 1, C)
  - linear:         torch (O, I) -> (I, O)
  - batch norm:     weight/bias -> scale/bias; running stats -> batch_stats
  - spectral norm:  weight = weight_orig / sigma with sigma = u @ W_mat @ v
                    (baked at conversion; eval-mode torch does the same with
                    the stored u/v vectors)
  - channel order for depth-flattened 2D convs matches via the
    volume_to_2d convention (flat channel = c*D + d), so no permutes needed.

Inputs are flat ``{key: np.ndarray}`` dicts — ``load_torch_state_dict`` turns
a ``.pth`` file into that form without needing torch at runtime elsewhere.
"""

from __future__ import annotations

from typing import Any

import numpy as np

Array = np.ndarray
StateDict = dict[str, Array]


# --------------------------------------------------------------------------
# primitive converters
# --------------------------------------------------------------------------


def _conv(sd: StateDict, key: str, bias: bool = True) -> dict:
    w = sd[f"{key}.weight"]
    ndim = w.ndim
    perm = (*range(2, ndim), 1, 0)
    out = {"kernel": np.ascontiguousarray(w.transpose(perm))}
    if bias:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _conv_dw(sd: StateDict, key: str) -> dict:
    """Depthwise conv: torch (C, 1, kh, kw) -> (kh, kw, 1, C)."""
    w = sd[f"{key}.weight"]
    out = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _conv_spectral(sd: StateDict, key: str, bias: bool = True) -> dict:
    """Spectral-normalized conv: bake W / sigma(W)."""
    if f"{key}.weight_orig" not in sd:
        return _conv(sd, key, bias)
    w = sd[f"{key}.weight_orig"]
    u = sd[f"{key}.weight_u"]
    v = sd[f"{key}.weight_v"]
    wmat = w.reshape(w.shape[0], -1)
    sigma = float(u @ (wmat @ v))
    w = w / sigma
    ndim = w.ndim
    out = {"kernel": np.ascontiguousarray(w.transpose(*range(2, ndim), 1, 0))}
    if bias and f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _dense(sd: StateDict, key: str, bias: bool = True) -> dict:
    out = {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T)}
    if bias:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _bn(sd: StateDict, key: str) -> tuple[dict, dict]:
    params = {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}
    stats = {
        "mean": sd[f"{key}.running_mean"],
        "var": sd[f"{key}.running_var"],
    }
    return params, stats


def _ln(sd: StateDict, key: str) -> dict:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _gn(sd: StateDict, key: str) -> dict:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _prelu(sd: StateDict, key: str) -> dict:
    return {"alpha": np.asarray(sd[f"{key}.weight"]).reshape(())}


class _TreeBuilder:
    """Accumulates params / batch_stats at nested paths."""

    def __init__(self):
        self.params: dict = {}
        self.stats: dict = {}

    def _set(self, root: dict, path: str, leaf: dict):
        node = root
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf

    def put(self, path: str, leaf: dict):
        self._set(self.params, path, leaf)

    def put_bn(self, path: str, sd: StateDict, key: str):
        p, s = _bn(sd, key)
        self._set(self.params, path, p)
        self._set(self.stats, path, s)

    def variables(self) -> dict:
        out = {"params": self.params}
        if self.stats:
            out["batch_stats"] = self.stats
        return out


# --------------------------------------------------------------------------
# block converters (names match canonswap_tpu.nn.blocks auto/explicit naming)
# --------------------------------------------------------------------------


def _same_block(tb, path, sd, tkey):
    tb.put(f"{path}/Conv_0", _conv(sd, f"{tkey}.conv"))
    tb.put_bn(f"{path}/BatchNorm_0", sd, f"{tkey}.norm")


def _down_block(tb, path, sd, tkey):
    _same_block(tb, path, sd, tkey)


def _up_block(tb, path, sd, tkey):
    _same_block(tb, path, sd, tkey)


def _res_block(tb, path, sd, tkey):
    """ResBlock2d/3d: BatchNorm_0, Conv_0, BatchNorm_1, Conv_1."""
    tb.put_bn(f"{path}/BatchNorm_0", sd, f"{tkey}.norm1")
    tb.put(f"{path}/Conv_0", _conv(sd, f"{tkey}.conv1"))
    tb.put_bn(f"{path}/BatchNorm_1", sd, f"{tkey}.norm2")
    tb.put(f"{path}/Conv_1", _conv(sd, f"{tkey}.conv2"))


def _res_block_leak_gn(tb, path, sd, tkey):
    tb.put(f"{path}/conv1", _conv(sd, f"{tkey}.conv1"))
    tb.put(f"{path}/gn1", _gn(sd, f"{tkey}.gn1"))
    tb.put(f"{path}/conv2", _conv(sd, f"{tkey}.conv2"))
    tb.put(f"{path}/gn2", _gn(sd, f"{tkey}.gn2"))
    if f"{tkey}.shortcut.weight" in sd:
        tb.put(f"{path}/shortcut", _conv(sd, f"{tkey}.shortcut"))


def _hourglass(tb, path, sd, tkey, num_blocks):
    for i in range(num_blocks):
        _down_block(tb, f"{path}/encoder/down{i}", sd, f"{tkey}.encoder.down_blocks.{i}")
    for j in range(num_blocks):
        _up_block(tb, f"{path}/decoder/up{j}", sd, f"{tkey}.decoder.up_blocks.{j}")
    tb.put(f"{path}/decoder/Conv_0", _conv(sd, f"{tkey}.decoder.conv"))
    tb.put_bn(f"{path}/decoder/BatchNorm_0", sd, f"{tkey}.decoder.norm")


def _spade(tb, path, sd, tkey):
    tb.put(f"{path}/mlp_shared", _conv(sd, f"{tkey}.mlp_shared.0"))
    tb.put(f"{path}/mlp_gamma", _conv(sd, f"{tkey}.mlp_gamma"))
    tb.put(f"{path}/mlp_beta", _conv(sd, f"{tkey}.mlp_beta"))


def _spade_resblock(tb, path, sd, tkey, learned_shortcut):
    _spade(tb, f"{path}/norm_0", sd, f"{tkey}.norm_0")
    tb.put(f"{path}/conv_0", _conv_spectral(sd, f"{tkey}.conv_0"))
    _spade(tb, f"{path}/norm_1", sd, f"{tkey}.norm_1")
    tb.put(f"{path}/conv_1", _conv_spectral(sd, f"{tkey}.conv_1"))
    if learned_shortcut:
        _spade(tb, f"{path}/norm_s", sd, f"{tkey}.norm_s")
        tb.put(f"{path}/conv_s", _conv_spectral(sd, f"{tkey}.conv_s", bias=False))


def _adaptive_conv(tb, path, sd, tkey):
    """AdaptiveSharedWeightConv2d -> AdaptiveConv2d."""
    w = sd[f"{tkey}.weight"]  # (O, I, kh, kw)
    tb.put(path + "/~", {})  # ensure node exists
    node = {
        "weight": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "bias": sd[f"{tkey}.bias_param"],
    }
    # place leaf params directly under the module path
    parent = tb.params
    for p in path.split("/"):
        parent = parent.setdefault(p, {})
    parent.pop("~", None)
    parent.update(node)
    tb.put(f"{path}/style_fc0", _dense(sd, f"{tkey}.style_fc.0"))
    tb.put(f"{path}/style_fc1", _dense(sd, f"{tkey}.style_fc.2"))
    tb.put(f"{path}/mask_conv", _conv(sd, f"{tkey}.mask_conv.0"))


# --------------------------------------------------------------------------
# per-network converters
# --------------------------------------------------------------------------


def _count(sd: StateDict, fmt: str) -> int:
    """Count consecutive indices i for which fmt.format(i) is a key."""
    i = 0
    while fmt.format(i) in sd:
        i += 1
    return i


def convert_appearance(sd: StateDict, num_down_blocks=None, num_resblocks=None) -> dict:
    if num_down_blocks is None:
        num_down_blocks = _count(sd, "down_blocks.{}.conv.weight")
    if num_resblocks is None:
        num_resblocks = _count(sd, "resblocks_3d.3dr{}.conv1.weight")
    tb = _TreeBuilder()
    _same_block(tb, "first", sd, "first")
    for i in range(num_down_blocks):
        _down_block(tb, f"down{i}", sd, f"down_blocks.{i}")
    tb.put("second", _conv(sd, "second"))
    for i in range(num_resblocks):
        _res_block(tb, f"res3d_{i}", sd, f"resblocks_3d.3dr{i}")
    return tb.variables()


def convert_motion(sd: StateDict, depths=None) -> dict:
    if depths is None:
        depths = tuple(
            _count(sd, "detector.stages." + str(i) + ".{}.dwconv.weight")
            for i in range(4)
        )
    tb = _TreeBuilder()
    d = "detector/"
    tb.put(d + "stem_conv", _conv(sd, "detector.downsample_layers.0.0"))
    tb.put(d + "stem_norm", _ln(sd, "detector.downsample_layers.0.1"))
    for i in range(1, 4):
        tb.put(d + f"down{i}_norm", _ln(sd, f"detector.downsample_layers.{i}.0"))
        tb.put(d + f"down{i}_conv", _conv(sd, f"detector.downsample_layers.{i}.1"))
    for i in range(4):
        for j in range(depths[i]):
            b = d + f"stage{i}_block{j}"
            t = f"detector.stages.{i}.{j}"
            tb.put(f"{b}/dwconv", _conv_dw(sd, f"{t}.dwconv"))
            tb.put(f"{b}/norm", _ln(sd, f"{t}.norm"))
            tb.put(f"{b}/pwconv1", _dense(sd, f"{t}.pwconv1"))
            tb.put(
                f"{b}/grn",
                {
                    "gamma": sd[f"{t}.grn.gamma"].reshape(-1),
                    "beta": sd[f"{t}.grn.beta"].reshape(-1),
                },
            )
            tb.put(f"{b}/pwconv2", _dense(sd, f"{t}.pwconv2"))
    tb.put(d + "head_norm", _ln(sd, "detector.norm"))
    for head in ("fc_kp", "fc_pitch", "fc_yaw", "fc_roll", "fc_t", "fc_exp", "fc_scale"):
        tb.put(d + head, _dense(sd, f"detector.{head}"))
    return tb.variables()


def convert_warping(sd: StateDict, num_hourglass_blocks=None) -> dict:
    if num_hourglass_blocks is None:
        num_hourglass_blocks = _count(
            sd, "dense_motion_network.hourglass.encoder.down_blocks.{}.conv.weight"
        )
    tb = _TreeBuilder()
    dm = "dense_motion_network"
    tb.put(f"{dm}/compress", _conv(sd, f"{dm}.compress"))
    tb.put_bn(f"{dm}/norm", sd, f"{dm}.norm")
    _hourglass(tb, f"{dm}/hourglass", sd, f"{dm}.hourglass", num_hourglass_blocks)
    tb.put(f"{dm}/mask", _conv(sd, f"{dm}.mask"))
    if f"{dm}.occlusion.weight" in sd:
        tb.put(f"{dm}/occlusion", _conv(sd, f"{dm}.occlusion"))
    _same_block(tb, "third", sd, "third")
    tb.put("fourth", _conv(sd, "fourth"))
    return tb.variables()


def convert_spade(sd: StateDict) -> dict:
    tb = _TreeBuilder()
    tb.put("fc", _conv(sd, "fc"))
    for i in range(6):
        _spade_resblock(tb, f"G_middle_{i}", sd, f"G_middle_{i}", False)
    _spade_resblock(tb, "up_0", sd, "up_0", True)
    _spade_resblock(tb, "up_1", sd, "up_1", True)
    if "conv_img.0.weight" in sd:
        tb.put("conv_img", _conv(sd, "conv_img.0"))
    else:
        tb.put("conv_img", _conv(sd, "conv_img"))
    return tb.variables()


def convert_transfer(sd: StateDict, n_blocks=None, n_res3d=None) -> dict:
    if n_blocks is None:
        n_blocks = _count(sd, "BottleNeck_2d.{}.conv1.weight")
    if n_res3d is None:
        n_res3d = _count(sd, "resblocks_3d.3dr{}.conv1.weight")
    tb = _TreeBuilder()
    for i in range(n_blocks):
        t = f"BottleNeck_2d.{i}"
        _adaptive_conv(tb, f"bottleneck2d_{i}/conv1", sd, f"{t}.conv1")
        _adaptive_conv(tb, f"bottleneck2d_{i}/conv2", sd, f"{t}.conv2")
    for i in range(n_res3d):
        _res_block(tb, f"res3d_{i}", sd, f"resblocks_3d.3dr{i}")
    return tb.variables()


def convert_refine(sd: StateDict) -> dict:
    tb = _TreeBuilder()
    for i in range(3):
        _res_block_leak_gn(tb, f"res3d_in_{i}", sd, f"resblocks1.{i}")
        _res_block(tb, f"res2d_{i}", sd, f"resblocks2.{i}")
        _res_block_leak_gn(tb, f"res3d_out_{i}", sd, f"resblocks3.{i}")
    return tb.variables()


def convert_arcface(sd: StateDict, layers=None) -> dict:
    if layers is None:
        layers = tuple(
            _count(sd, "layer" + str(li) + ".{}.conv1.weight")
            for li in range(1, 5)
        )
    tb = _TreeBuilder()
    tb.put("conv1", _conv(sd, "conv1", bias=False))
    tb.put_bn("bn1", sd, "bn1")
    tb.put("prelu", _prelu(sd, "prelu"))
    for li in range(4):
        for bi in range(layers[li]):
            p = f"layer{li + 1}_{bi}"
            t = f"layer{li + 1}.{bi}"
            tb.put_bn(f"{p}/bn0", sd, f"{t}.bn0")
            tb.put(f"{p}/conv1", _conv(sd, f"{t}.conv1", bias=False))
            tb.put_bn(f"{p}/bn1", sd, f"{t}.bn1")
            tb.put(f"{p}/prelu", _prelu(sd, f"{t}.prelu"))
            tb.put(f"{p}/conv2", _conv(sd, f"{t}.conv2", bias=False))
            tb.put_bn(f"{p}/bn2", sd, f"{t}.bn2")
            if f"{t}.se.fc.0.weight" in sd:
                tb.put(f"{p}/se/fc0", _dense(sd, f"{t}.se.fc.0"))
                tb.put(f"{p}/se/prelu", _prelu(sd, f"{t}.se.fc.1"))
                tb.put(f"{p}/se/fc1", _dense(sd, f"{t}.se.fc.2"))
            if f"{t}.downsample.0.weight" in sd:
                tb.put(f"{p}/ds_conv", _conv(sd, f"{t}.downsample.0", bias=False))
                tb.put_bn(f"{p}/ds_bn", sd, f"{t}.downsample.1")
    tb.put_bn("bn2", sd, "bn2")
    tb.put("fc", _dense(sd, "fc"))
    tb.put_bn("bn3", sd, "bn3")
    return tb.variables()


def convert_stitching(sd: StateDict, num_hidden: int) -> dict:
    """StitchingRetargetingNetwork: torch Sequential 'mlp' of Linear+ReLU
    pairs (stitching_retargeting_network.py:18-29)."""
    tb = _TreeBuilder()
    for i in range(num_hidden):
        tb.put(f"fc{i}", _dense(sd, f"mlp.{2 * i}"))
    tb.put("out", _dense(sd, f"mlp.{2 * num_hidden}"))
    return tb.variables()


def convert_stitching_checkpoint(ckpt: dict[str, StateDict]) -> dict:
    """Full stitching checkpoint (keys retarget_shoulder / retarget_mouth /
    retarget_eye, helper.py:157-181) -> StitchingModule variables."""
    hidden = {"stitching": 3, "lip": 3, "eye": 5}
    name_map = {
        "stitching": "retarget_shoulder",
        "lip": "retarget_mouth",
        "eye": "retarget_eye",
    }
    params = {}
    for ours, theirs in name_map.items():
        sub = convert_stitching(strip_prefixes(ckpt[theirs]), hidden[ours])
        params[ours] = sub["params"]
    return {"params": params}


# --------------------------------------------------------------------------
# top-level entry
# --------------------------------------------------------------------------

_CONVERTERS = {
    "appearance_feature_extractor": convert_appearance,
    "motion_extractor": convert_motion,
    "warping_module": convert_warping,
    "spade_generator": convert_spade,
    "transfer": convert_transfer,
    "refine": convert_refine,
}


def strip_prefixes(sd: StateDict) -> StateDict:
    """Remove DDP 'module.' / compile '_orig_mod.' prefixes (the reference's
    remove_ddp_dumplicate_key equivalent, helper.py:124-144)."""
    out = {}
    for k, v in sd.items():
        for pre in ("module.", "_orig_mod."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def to_numpy_state_dict(torch_state_dict) -> StateDict:
    """torch state_dict -> flat numpy dict."""
    return {
        k: np.asarray(v.detach().cpu().numpy())
        for k, v in torch_state_dict.items()
    }


def convert_combined_checkpoint(combined: dict[str, StateDict]) -> dict[str, Any]:
    """combined_weights.pth (dict of six torch state_dicts) -> dict of flax
    variable trees keyed like the checkpoint."""
    out = {}
    for key, conv_fn in _CONVERTERS.items():
        if key in combined:
            out[key] = conv_fn(strip_prefixes(combined[key]))
    return out


def load_torch_checkpoint(path: str) -> dict[str, Any]:
    """Load + convert a .pth checkpoint file (requires torch)."""
    import torch

    combined = torch.load(path, map_location="cpu", weights_only=False)
    combined = {
        k: to_numpy_state_dict(v) if not isinstance(v, dict) else {
            kk: np.asarray(vv.detach().cpu().numpy()) for kk, vv in v.items()
        }
        for k, v in combined.items()
    }
    return convert_combined_checkpoint(combined)
