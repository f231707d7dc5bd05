"""Deformable transformer with vision<->text fusion for UniPose.

TPU-native re-expression of the reference's ED-Pose transformer
(src/utils/dependencies/XPose/models/UniPose/deformable_transformer.py,
fuse_modules.py, transformer_vanilla.py, ops/modules/ms_deform_attn.py):

  encoder layer  = BiAttention(v<->text) -> text self-attn -> deformable
                   self-attn -> FFN                      (encoder x6)
  two-stage      = proposals from memory -> contrastive topk -> 900 queries
  decoder layer  = group-masked self-attn -> text cross-attn -> deformable
                   cross-attn -> FFN                      (decoder x6)
  keypoint stage = after 2 box layers: top-50 groups expand to
                   (1 box + K keypoint) queries from the CLIP keypoint text
                   embeddings, with a block-diagonal group attention mask.

All shapes are static under jit (fixed image canvas + padding masks, text
padded to max_text_len); multiscale deformable attention reuses
ops.ms_deform_attn (jnp reference + Pallas kernel, parity-tested vs the
reference CUDA op's own fallback).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from canonswap_tpu.ops.ms_deform_attn import ms_deform_attn_ref


def inverse_sigmoid(x, eps: float = 1e-3):
    """util/misc.py:689-693 semantics (independent clamps)."""
    x = jnp.clip(x, 0, 1)
    x1 = jnp.maximum(x, eps)
    x2 = jnp.maximum(1 - x, eps)
    return jnp.log(x1 / x2)


class MLP(nn.Module):
    """utils.py:162-174: n-layer perceptron, relu between layers."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        return x


class MultiheadAttention(nn.Module):
    """torch nn.MultiheadAttention-compatible (packed in-proj + out-proj).

    Inputs (B, L, E); ``attn_mask`` True = masked, shape (L_q, L_k) or
    (B*H, L_q, L_k); ``key_padding_mask`` True = masked, (B, L_k)."""

    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, q, k, v, attn_mask=None, key_padding_mask=None):
        e, h = self.embed_dim, self.num_heads
        hd = e // h
        in_w = self.param("in_proj_weight",
                          nn.initializers.xavier_uniform(), (3 * e, e))
        in_b = self.param("in_proj_bias", nn.initializers.zeros, (3 * e,))
        qp = q @ in_w[:e].T + in_b[:e]
        kp = k @ in_w[e:2 * e].T + in_b[e:2 * e]
        vp = v @ in_w[2 * e:].T + in_b[2 * e:]
        b, lq, _ = qp.shape
        lk = kp.shape[1]
        qp = qp.reshape(b, lq, h, hd)
        kp = kp.reshape(b, lk, h, hd)
        vp = vp.reshape(b, lk, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", qp * (hd**-0.5), kp)
        neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        if attn_mask is not None:
            if attn_mask.ndim == 2:
                m = attn_mask[None, None]
            else:  # (B*H, Lq, Lk)
                m = attn_mask.reshape(b, h, lq, lk)
            logits = jnp.where(m, neg, logits)
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], neg, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vp).reshape(b, lq, e)
        return nn.Dense(e, name="out_proj")(out)


class MSDeformAttn(nn.Module):
    """ops/modules/ms_deform_attn.py:40-140, channels-last flax."""

    d_model: int
    n_levels: int
    n_heads: int
    n_points: int

    def _offset_bias_init(self, key, shape):
        # grid bias init (ms_deform_attn.py:67-74); overwritten by converted
        # checkpoints but keeps from-scratch behavior faithful
        thetas = np.arange(self.n_heads) * (2.0 * np.pi / self.n_heads)
        grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
        grid = grid / np.abs(grid).max(-1, keepdims=True)
        grid = np.tile(grid[:, None, None, :],
                       (1, self.n_levels, self.n_points, 1))
        for i in range(self.n_points):
            grid[:, :, i, :] *= i + 1
        return jnp.asarray(grid.reshape(-1), jnp.float32).astype(jnp.float32)

    @nn.compact
    def __call__(self, query, reference_points, input_flatten,
                 spatial_shapes: tuple[tuple[int, int], ...],
                 input_padding_mask=None):
        """query (B, Lq, C); reference_points (B, Lq, L, 2|4) in [0,1];
        input_flatten (B, sum(HW), C)."""
        n, lq, _ = query.shape
        m, L, p = self.n_heads, self.n_levels, self.n_points
        value = nn.Dense(self.d_model, name="value_proj")(input_flatten)
        if input_padding_mask is not None:
            value = jnp.where(input_padding_mask[..., None], 0.0, value)
        value = value.reshape(n, -1, m, self.d_model // m)
        off = nn.Dense(
            m * L * p * 2, name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda k, s, d=None: self._offset_bias_init(k, s),
        )(query).reshape(n, lq, m, L, p, 2)
        w = nn.Dense(m * L * p, name="attention_weights",
                     kernel_init=nn.initializers.zeros)(query)
        w = jax.nn.softmax(w.reshape(n, lq, m, L * p), axis=-1)
        w = w.reshape(n, lq, m, L, p)
        shapes_wh = jnp.asarray(
            [(ww, hh) for hh, ww in spatial_shapes], off.dtype)
        if reference_points.shape[-1] == 2:
            loc = reference_points[:, :, None, :, None, :] \
                + off / shapes_wh[None, None, None, :, None, :]
        else:
            loc = reference_points[:, :, None, :, None, :2] \
                + off / p * reference_points[:, :, None, :, None, 2:] * 0.5
        out = ms_deform_attn_ref(value, spatial_shapes, loc, w)
        return nn.Dense(self.d_model, name="output_proj")(out)


class BiMultiHeadAttention(nn.Module):
    """fuse_modules.py:98-240: bidirectional vision<->language attention."""

    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, v, l, attention_mask_v=None, attention_mask_l=None):
        b, nv, _ = v.shape
        nl = l.shape[1]
        h = self.num_heads
        hd = self.embed_dim // h
        scale = hd ** (-0.5)
        q = nn.Dense(self.embed_dim, name="v_proj")(v) * scale
        k = nn.Dense(self.embed_dim, name="l_proj")(l)
        vv = nn.Dense(self.embed_dim, name="values_v_proj")(v)
        vl = nn.Dense(self.embed_dim, name="values_l_proj")(l)

        q = q.reshape(b, nv, h, hd)
        k = k.reshape(b, nl, h, hd)
        vv = vv.reshape(b, nv, h, hd)
        vl = vl.reshape(b, nl, h, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)  # (B, H, Nv, Nl)
        # stable_softmax_2d (fuse_modules.py:179-180): global-max shift
        logits = logits - jnp.max(logits)
        logits = jnp.clip(logits, -50000, 50000)

        lt = jnp.swapaxes(logits, 2, 3)  # (B, H, Nl, Nv)
        lt = lt - jnp.max(lt, axis=-1, keepdims=True)
        lt = jnp.clip(lt, -50000, 50000)
        neg = jnp.asarray(jnp.finfo(logits.dtype).min, logits.dtype)
        if attention_mask_v is not None:
            lt = jnp.where(attention_mask_v[:, None, None, :], neg, lt)
        attn_l = jax.nn.softmax(lt, axis=-1)
        if attention_mask_l is not None:
            logits = jnp.where(attention_mask_l[:, None, None, :], neg, logits)
        attn_v = jax.nn.softmax(logits, axis=-1)

        out_v = jnp.einsum("bhqk,bkhd->bqhd", attn_v, vl).reshape(
            b, nv, self.embed_dim)
        out_l = jnp.einsum("bhqk,bkhd->bqhd", attn_l, vv).reshape(
            b, nl, self.embed_dim)
        return (nn.Dense(self.v_dim, name="out_v_proj")(out_v),
                nn.Dense(self.l_dim, name="out_l_proj")(out_l))


class BiAttentionBlock(nn.Module):
    """fuse_modules.py:244-274 (pre-LN, frozen layer-scale gammas)."""

    v_dim: int
    l_dim: int
    embed_dim: int
    num_heads: int
    init_values: float = 1e-4

    @nn.compact
    def __call__(self, v, l, attention_mask_v=None, attention_mask_l=None):
        vn = nn.LayerNorm(epsilon=1e-5, name="layer_norm_v")(v)
        ln = nn.LayerNorm(epsilon=1e-5, name="layer_norm_l")(l)
        dv, dl = BiMultiHeadAttention(
            self.v_dim, self.l_dim, self.embed_dim, self.num_heads,
            name="attn")(vn, ln, attention_mask_v, attention_mask_l)
        gamma_v = self.param(
            "gamma_v",
            lambda k, s: jnp.full(s, self.init_values), (self.v_dim,))
        gamma_l = self.param(
            "gamma_l",
            lambda k, s: jnp.full(s, self.init_values), (self.l_dim,))
        return vn + gamma_v * dv, ln + gamma_l * dl


class TextEncoderLayer(nn.Module):
    """transformer_vanilla.py TransformerEncoderLayer (post-norm)."""

    d_model: int
    nhead: int
    dim_feedforward: int

    @nn.compact
    def __call__(self, src, src_mask=None, pos=None):
        """src (B, L, C); src_mask True = masked (B, L, L) or (L, L)."""
        q = src if pos is None else src + pos
        if src_mask is not None and src_mask.ndim == 3:
            b, lq, lk = src_mask.shape
            src_mask = jnp.repeat(src_mask, self.nhead, axis=0)
        src2 = MultiheadAttention(self.d_model, self.nhead, name="self_attn")(
            q, q, src, attn_mask=src_mask)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + src2)
        y = nn.Dense(self.dim_feedforward, name="linear1")(src)
        y = nn.Dense(self.d_model, name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + y)


class EncoderLayer(nn.Module):
    """DeformableTransformerEncoderLayer (deformable_transformer.py:938-993)."""

    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes,
                 key_padding_mask=None):
        src2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, name="self_attn")(
            src + pos, reference_points, src, spatial_shapes,
            key_padding_mask)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + src2)
        y = nn.Dense(self.d_ffn, name="linear1")(src)
        y = nn.Dense(self.d_model, name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm2")(src + y)


class DecoderLayer(nn.Module):
    """DeformableTransformerDecoderLayer (deformable_transformer.py:996-1133):
    masked self-attn -> text cross-attn -> deformable cross-attn -> FFN."""

    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, memory,
                 spatial_shapes, memory_key_padding_mask,
                 memory_text, text_attention_mask, self_attn_mask=None):
        """All (B, L, C); reference_points (B, Lq, n_levels, 4)."""
        q = tgt + query_pos
        tgt2 = MultiheadAttention(self.d_model, self.n_heads,
                                  name="self_attn")(
            q, q, tgt, attn_mask=self_attn_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2")(tgt + tgt2)

        tgt2 = MultiheadAttention(self.d_model, self.n_heads, name="ca_text")(
            tgt + query_pos, memory_text, memory_text,
            key_padding_mask=text_attention_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, name="catext_norm")(tgt + tgt2)

        tgt2 = MSDeformAttn(self.d_model, self.n_levels, self.n_heads,
                            self.n_points, name="cross_attn")(
            tgt + query_pos, reference_points, memory, spatial_shapes,
            memory_key_padding_mask)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1")(tgt + tgt2)

        y = nn.Dense(self.d_ffn, name="linear1")(tgt)
        y = nn.Dense(self.d_model, name="linear2")(nn.relu(y))
        return nn.LayerNorm(epsilon=1e-5, name="norm3")(tgt + y)


def get_sine_pos_embed(pos, num_pos_feats=256, temperature=10000,
                       exchange_xy=True):
    """utils.py:26-55."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / num_pos_feats)

    def sine(x):  # x (..., 1)
        sx = x * scale / dim_t
        return jnp.stack(
            [jnp.sin(sx[..., 0::2]), jnp.cos(sx[..., 1::2])], axis=-1
        ).reshape(*sx.shape[:-1], -1)

    parts = [sine(pos[..., i: i + 1]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


def gen_sineembed_for_position(pos):
    """utils.py:193-219; pos (..., 2|4) -> (..., 256|512)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(128, dtype=jnp.float32)
    dim_t = 10000 ** (2 * (dim_t // 2) / 128)

    def emb(x):
        px = x[..., None] * scale / dim_t
        return jnp.stack(
            [jnp.sin(px[..., 0::2]), jnp.cos(px[..., 1::2])], axis=-1
        ).reshape(*px.shape[:-1], -1)

    pos_y = emb(pos[..., 1])
    pos_x = emb(pos[..., 0])
    if pos.shape[-1] == 2:
        return jnp.concatenate([pos_y, pos_x], axis=-1)
    pos_w = emb(pos[..., 2])
    pos_h = emb(pos[..., 3])
    return jnp.concatenate([pos_y, pos_x, pos_w, pos_h], axis=-1)


def gen_encoder_output_proposals(memory, memory_padding_mask, spatial_shapes):
    """utils.py:58-114 (two-stage proposal grid, learnedwh=None)."""
    n = memory.shape[0]
    proposals = []
    cur = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        mask = memory_padding_mask[:, cur: cur + h * w].reshape(n, h, w)
        valid_h = jnp.sum(~mask[:, :, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~mask[:, 0, :], axis=1).astype(jnp.float32)
        gy, gx = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32), indexing="ij")
        grid = jnp.stack([gx, gy], -1)  # (H, W, 2)
        scale = jnp.stack([valid_w, valid_h], -1).reshape(n, 1, 1, 2)
        grid = (grid[None] + 0.5) / scale
        wh = jnp.ones_like(grid) * 0.05 * (2.0 ** lvl)
        proposals.append(
            jnp.concatenate([grid, wh], -1).reshape(n, -1, 4))
        cur += h * w
    props = jnp.concatenate(proposals, axis=1)
    valid = jnp.all((props > 0.01) & (props < 0.99), axis=-1, keepdims=True)
    props = jnp.log(props / (1 - props))
    inf = jnp.asarray(jnp.inf, props.dtype)
    props = jnp.where(memory_padding_mask[..., None], inf, props)
    props = jnp.where(~valid, inf, props)
    out_mem = jnp.where(memory_padding_mask[..., None], 0.0, memory)
    out_mem = jnp.where(~valid, 0.0, out_mem)
    return out_mem, props


def contrastive_logits(x, text, text_token_mask):
    """ContrastiveAssign (unipose.py:573-621): x @ text^T with -inf padding."""
    res = jnp.einsum("bqc,btc->bqt", x, text)
    neg = jnp.asarray(-jnp.inf, res.dtype)
    return jnp.where(text_token_mask[:, None, :], res, neg)


def encoder_reference_points(spatial_shapes, valid_ratios):
    """TransformerEncoder.get_reference_points (deformable_transformer.py:
    579-590). valid_ratios (B, L, 2) -> (B, sum(HW), L, 2)."""
    refs = []
    for lvl, (h, w) in enumerate(spatial_shapes):
        ry, rx = jnp.meshgrid(
            jnp.linspace(0.5, h - 0.5, h, dtype=jnp.float32),
            jnp.linspace(0.5, w - 0.5, w, dtype=jnp.float32), indexing="ij")
        ry = ry.reshape(-1)[None] / (valid_ratios[:, None, lvl, 1] * h)
        rx = rx.reshape(-1)[None] / (valid_ratios[:, None, lvl, 0] * w)
        refs.append(jnp.stack([rx, ry], -1))  # (B, HW, 2)
    ref = jnp.concatenate(refs, axis=1)  # (B, sum, 2)
    return ref[:, :, None] * valid_ratios[:, None]
