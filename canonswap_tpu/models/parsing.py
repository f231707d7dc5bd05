"""Segformer semantic face parsing in JAX.

The reference calls HuggingFace's torch SegformerForSemanticSegmentation
("jonathandinu/face-parsing", 19 classes) per frame
(can_swap_pipeline_e2e.py:51-54, 177-191).  This is a native flax
re-implementation of the Segformer architecture (MiT encoder: overlapping
patch embeddings, efficient attention with spatial reduction, Mix-FFN with
depthwise conv; all-MLP decode head), batched over frames and jitted.

``convert_hf_segformer`` maps the HF torch state_dict onto these modules, so
the real face-parsing checkpoint drops in; parity is tested against a
locally-constructed random-weight HF model (tests/test_parsing_parity.py).

``face_mask_from_logits`` reproduces the pipeline's post-processing: bilinear
upsample to 512, argmax, keep classes {1,2,4,5,6,7,10,11,12}.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from canonswap_tpu.ops.resize import bilinear_resize

# face-swap region classes (skin/brows/eyes/ears/nose/mouth),
# can_swap_pipeline_e2e.py:53
VALID_CLASSES = (1, 2, 4, 5, 6, 7, 10, 11, 12)


@dataclasses.dataclass(frozen=True)
class SegformerConfig:
    hidden_sizes: tuple[int, ...] = (64, 128, 320, 512)  # MiT-B1 (face-parsing)
    depths: tuple[int, ...] = (2, 2, 2, 2)
    num_heads: tuple[int, ...] = (1, 2, 5, 8)
    sr_ratios: tuple[int, ...] = (8, 4, 2, 1)
    patch_sizes: tuple[int, ...] = (7, 3, 3, 3)
    strides: tuple[int, ...] = (4, 2, 2, 2)
    mlp_ratio: int = 4
    decoder_hidden: int = 256
    num_labels: int = 19


class EfficientAttention(nn.Module):
    dim: int
    heads: int
    sr_ratio: int

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, C) -> (B, H, W, C)."""
        b, h, w, c = x.shape
        hd = self.dim // self.heads
        q = nn.Dense(self.dim, name="query")(x.reshape(b, h * w, c))
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                self.dim, (self.sr_ratio,) * 2, strides=(self.sr_ratio,) * 2,
                name="sr",
            )(x)
            kv_in = kv_in.reshape(b, -1, c)
            kv_in = nn.LayerNorm(epsilon=1e-5, name="sr_norm")(kv_in)
        else:
            kv_in = x.reshape(b, h * w, c)
        k = nn.Dense(self.dim, name="key")(kv_in)
        v = nn.Dense(self.dim, name="value")(kv_in)

        def split(t):
            return t.reshape(b, -1, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / jnp.sqrt(hd).astype(x.dtype)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, h * w, self.dim)
        out = nn.Dense(self.dim, name="out")(out)
        return out.reshape(b, h, w, self.dim)


class MixFFN(nn.Module):
    dim: int
    ratio: int

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hidden = self.dim * self.ratio
        y = nn.Dense(hidden, name="dense1")(x)
        y = nn.Conv(
            hidden, (3, 3), padding="SAME", feature_group_count=hidden,
            name="dwconv",
        )(y)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(self.dim, name="dense2")(y)


class SegformerBlock(nn.Module):
    dim: int
    heads: int
    sr_ratio: int
    mlp_ratio: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        x = x + EfficientAttention(
            self.dim, self.heads, self.sr_ratio, name="attn"
        )(h)
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        return x + MixFFN(self.dim, self.mlp_ratio, name="ffn")(h)


class Segformer(nn.Module):
    cfg: SegformerConfig = SegformerConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, 3) preprocessed -> logits (B, H/4, W/4, num_labels)."""
        c = self.cfg
        feats = []
        for i in range(4):
            p = c.patch_sizes[i]
            x = nn.Conv(
                c.hidden_sizes[i], (p, p), strides=(c.strides[i],) * 2,
                padding=[(p // 2, p // 2)] * 2, name=f"patch_embed{i}",
            )(x)
            x = nn.LayerNorm(epsilon=1e-5, name=f"patch_norm{i}")(x)
            for j in range(c.depths[i]):
                x = SegformerBlock(
                    c.hidden_sizes[i], c.num_heads[i], c.sr_ratios[i],
                    c.mlp_ratio, name=f"stage{i}_block{j}",
                )(x)
            x = nn.LayerNorm(epsilon=1e-6, name=f"stage_norm{i}")(x)
            feats.append(x)

        # all-MLP decode head: project each stage to decoder_hidden, upsample
        # to 1/4 scale, concat REVERSED (HF order), fuse, classify.
        target_hw = feats[0].shape[1:3]
        projected = []
        for i, f in enumerate(feats):
            p = nn.Dense(c.decoder_hidden, name=f"linear_c{i}")(f)
            if p.shape[1:3] != target_hw:
                p = bilinear_resize(p, target_hw)
            projected.append(p)
        y = jnp.concatenate(projected[::-1], axis=-1)
        y = nn.Conv(
            c.decoder_hidden, (1, 1), use_bias=False, name="linear_fuse"
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            name="bn",
        )(y)
        y = nn.relu(y)
        return nn.Conv(c.num_labels, (1, 1), name="classifier")(y)


# HF SegformerImageProcessor default: rescale 1/255 then normalize with
# ImageNet mean/std.
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess(frames_uint8: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8 RGB -> normalized float input."""
    x = frames_uint8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def face_mask_from_logits(
    logits: jax.Array, out_size: tuple[int, int] = (512, 512)
) -> jax.Array:
    """logits (B, h, w, 19) -> (B, H, W, 1) float mask of swap-region classes
    (pipeline post-processing, can_swap_pipeline_e2e.py:177-191)."""
    up = bilinear_resize(logits, out_size)
    labels = jnp.argmax(up, axis=-1)
    valid = jnp.asarray(VALID_CLASSES)
    mask = jnp.isin(labels, valid)
    return mask.astype(jnp.float32)[..., None]


# ---------------------------------------------------------------------------
# HF torch -> flax conversion
# ---------------------------------------------------------------------------


def convert_hf_segformer(sd: dict[str, np.ndarray], cfg: SegformerConfig) -> dict:
    """HF SegformerForSemanticSegmentation state_dict -> flax variables."""
    from canonswap_tpu.runtime.weights import (
        _TreeBuilder, _conv, _conv_dw, _dense, _ln,
    )

    tb = _TreeBuilder()
    e = "segformer.encoder"
    for i in range(4):
        tb.put(f"patch_embed{i}", _conv(sd, f"{e}.patch_embeddings.{i}.proj"))
        tb.put(f"patch_norm{i}", _ln(sd, f"{e}.patch_embeddings.{i}.layer_norm"))
        for j in range(cfg.depths[i]):
            b = f"stage{i}_block{j}"
            t = f"{e}.block.{i}.{j}"
            tb.put(f"{b}/norm1", _ln(sd, f"{t}.layer_norm_1"))
            tb.put(f"{b}/attn/query", _dense(sd, f"{t}.attention.self.query"))
            tb.put(f"{b}/attn/key", _dense(sd, f"{t}.attention.self.key"))
            tb.put(f"{b}/attn/value", _dense(sd, f"{t}.attention.self.value"))
            if cfg.sr_ratios[i] > 1:
                tb.put(f"{b}/attn/sr", _conv(sd, f"{t}.attention.self.sr"))
                tb.put(f"{b}/attn/sr_norm", _ln(sd, f"{t}.attention.self.layer_norm"))
            tb.put(f"{b}/attn/out", _dense(sd, f"{t}.attention.output.dense"))
            tb.put(f"{b}/norm2", _ln(sd, f"{t}.layer_norm_2"))
            tb.put(f"{b}/ffn/dense1", _dense(sd, f"{t}.mlp.dense1"))
            tb.put(f"{b}/ffn/dwconv", _conv_dw(sd, f"{t}.mlp.dwconv.dwconv"))
            tb.put(f"{b}/ffn/dense2", _dense(sd, f"{t}.mlp.dense2"))
        tb.put(f"stage_norm{i}", _ln(sd, f"{e}.layer_norm.{i}"))

    for i in range(4):
        tb.put(f"linear_c{i}", _dense(sd, f"decode_head.linear_c.{i}.proj"))
    tb.put("linear_fuse", {"kernel": np.ascontiguousarray(
        sd["decode_head.linear_fuse.weight"].transpose(2, 3, 1, 0))})
    tb.put_bn("bn", sd, "decode_head.batch_norm")
    tb.put("classifier", _conv(sd, "decode_head.classifier"))
    return tb.variables()
