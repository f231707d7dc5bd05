"""torch UniPose state_dict -> flax param tree for models.xpose.UniPose.

Mirrors the reference checkpoint layout (xpose.pth 'model' dict, loaded at
src/utils/animal_landmark_runner.py:42-49 via clean_state_dict).  The
decoder/pose heads are weight-shared lists in torch (bbox_embed.0 ==
bbox_embed.k, unipose.py:170-200); only index 0 is read.  label_enc /
pos_proj / padding only contribute exact zeros at inference
(unipose.py:405-409) and are skipped.
"""

from __future__ import annotations

import numpy as np

from canonswap_tpu.runtime.weights import _conv, _dense, _gn, _ln

StateDict = dict


def _mlp(sd: StateDict, key: str, n: int) -> dict:
    return {f"layers_{i}": _dense(sd, f"{key}.layers.{i}") for i in range(n)}


def _mha(sd: StateDict, key: str) -> dict:
    return {
        "in_proj_weight": np.asarray(sd[f"{key}.in_proj_weight"]),
        "in_proj_bias": np.asarray(sd[f"{key}.in_proj_bias"]),
        "out_proj": _dense(sd, f"{key}.out_proj"),
    }


def _msda(sd: StateDict, key: str) -> dict:
    return {
        "sampling_offsets": _dense(sd, f"{key}.sampling_offsets"),
        "attention_weights": _dense(sd, f"{key}.attention_weights"),
        "value_proj": _dense(sd, f"{key}.value_proj"),
        "output_proj": _dense(sd, f"{key}.output_proj"),
    }


def _swin(sd: StateDict, depths, out_indices) -> dict:
    p: dict = {
        "patch_embed": _conv(sd, "backbone.0.patch_embed.proj"),
        "patch_norm": _ln(sd, "backbone.0.patch_embed.norm"),
    }
    for i, depth in enumerate(depths):
        for j in range(depth):
            base = f"backbone.0.layers.{i}.blocks.{j}"
            p[f"stage{i}_block{j}"] = {
                "norm1": _ln(sd, f"{base}.norm1"),
                "norm2": _ln(sd, f"{base}.norm2"),
                "attn": {
                    "relative_position_bias_table": np.asarray(
                        sd[f"{base}.attn.relative_position_bias_table"]),
                    "qkv": _dense(sd, f"{base}.attn.qkv"),
                    "proj": _dense(sd, f"{base}.attn.proj"),
                },
                "fc1": _dense(sd, f"{base}.mlp.fc1"),
                "fc2": _dense(sd, f"{base}.mlp.fc2"),
            }
        if i < len(depths) - 1:
            p[f"merge{i}"] = {
                "norm": _ln(sd, f"backbone.0.layers.{i}.downsample.norm"),
                "reduction": _dense(
                    sd, f"backbone.0.layers.{i}.downsample.reduction",
                    bias=False),
            }
    for i in out_indices:
        p[f"out_norm{i}"] = _ln(sd, f"backbone.0.norm{i}")
    return p


def convert_unipose(sd: StateDict, cfg) -> dict:
    """cfg: UniPoseConfig.  Returns {'params': tree}."""
    t = "transformer"
    p: dict = {
        "backbone": _swin(sd, cfg.swin.depths, cfg.swin.out_indices),
        "projection": _mlp(sd, "projection", 3),
        "projection_kpt": _mlp(sd, "projection_kpt", 3),
        "level_embed": np.asarray(sd[f"{t}.level_embed"]),
        "enc_output": _dense(sd, f"{t}.enc_output"),
        "enc_output_norm": _ln(sd, f"{t}.enc_output_norm"),
        "tgt_embed": np.asarray(sd[f"{t}.tgt_embed.weight"]),
        "enc_out_bbox_embed": _mlp(sd, f"{t}.enc_out_bbox_embed", 3),
        "decoder_norm": _ln(sd, f"{t}.decoder.norm"),
        "ref_point_head": _mlp(sd, f"{t}.decoder.ref_point_head", 2),
        "hw": np.asarray(sd[f"{t}.decoder.hw.weight"]),
        "hw_append": np.asarray(sd[f"{t}.decoder.hw_append.weight"]),
        "bbox_embed": _mlp(sd, "bbox_embed.0", 3),
        "pose_embed": _mlp(sd, "pose_embed.0", 3),
        "pose_hw_embed": _mlp(sd, "pose_hw_embed.0", 3),
    }
    for li in range(4):
        p[f"input_proj_{li}_conv"] = _conv(sd, f"input_proj.{li}.0")
        p[f"input_proj_{li}_gn"] = _gn(sd, f"input_proj.{li}.1")
    for i in range(cfg.enc_layers):
        e = f"{t}.encoder.layers.{i}"
        p[f"enc_{i}"] = {
            "self_attn": _msda(sd, f"{e}.self_attn"),
            "norm1": _ln(sd, f"{e}.norm1"),
            "linear1": _dense(sd, f"{e}.linear1"),
            "linear2": _dense(sd, f"{e}.linear2"),
            "norm2": _ln(sd, f"{e}.norm2"),
        }
        x = f"{t}.encoder.text_layers.{i}"
        p[f"text_{i}"] = {
            "self_attn": _mha(sd, f"{x}.self_attn"),
            "linear1": _dense(sd, f"{x}.linear1"),
            "linear2": _dense(sd, f"{x}.linear2"),
            "norm1": _ln(sd, f"{x}.norm1"),
            "norm2": _ln(sd, f"{x}.norm2"),
        }
        f = f"{t}.encoder.fusion_layers.{i}"
        p[f"fusion_{i}"] = {
            "layer_norm_v": _ln(sd, f"{f}.layer_norm_v"),
            "layer_norm_l": _ln(sd, f"{f}.layer_norm_l"),
            "gamma_v": np.asarray(sd[f"{f}.gamma_v"]),
            "gamma_l": np.asarray(sd[f"{f}.gamma_l"]),
            "attn": {
                name: _dense(sd, f"{f}.attn.{name}")
                for name in ("v_proj", "l_proj", "values_v_proj",
                             "values_l_proj", "out_v_proj", "out_l_proj")
            },
        }
    for i in range(cfg.dec_layers):
        dk = f"{t}.decoder.layers.{i}"
        p[f"dec_{i}"] = {
            "cross_attn": _msda(sd, f"{dk}.cross_attn"),
            "norm1": _ln(sd, f"{dk}.norm1"),
            "ca_text": _mha(sd, f"{dk}.ca_text"),
            "catext_norm": _ln(sd, f"{dk}.catext_norm"),
            "self_attn": _mha(sd, f"{dk}.self_attn"),
            "norm2": _ln(sd, f"{dk}.norm2"),
            "linear1": _dense(sd, f"{dk}.linear1"),
            "linear2": _dense(sd, f"{dk}.linear2"),
            "norm3": _ln(sd, f"{dk}.norm3"),
        }
    return {"params": p}
