"""Swin Transformer backbone (channels-last flax).

Faithful re-expression of the reference's vendored Swin
(src/utils/dependencies/XPose/models/UniPose/swin_transformer.py:431-700,
'swin_T_224_1k': embed 96, depths 2/2/6/2, heads 3/6/12/24, window 7):
patch embed -> 4 stages of [window attention with relative position bias,
shifted windows] -> per-stage LayerNorm outputs.  Padding to window
multiples matches the reference's F.pad (pad at bottom/right with zeros).

TPU notes: all window partitioning is static reshape/transpose; the
attention is einsum MHA over 49-token windows batched across (B x windows),
which XLA maps onto the MXU directly.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    embed_dim: int = 96
    depths: tuple[int, ...] = (2, 2, 6, 2)
    num_heads: tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    patch_size: int = 4
    out_indices: tuple[int, ...] = (1, 2, 3)

    @property
    def num_features(self) -> tuple[int, ...]:
        return tuple(int(self.embed_dim * 2**i) for i in range(len(self.depths)))


def _rel_pos_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) relative-position bias index (swin_transformer.py:78-90)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[:, :, 0] * (2 * ws - 1) + rel[:, :, 1]).astype(np.int32)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (swin_transformer.py:95-160)."""

    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW*B, ws*ws, C); mask: (nW, ws*ws, ws*ws) or None."""
        bnw, n, c = x.shape
        h = self.num_heads
        hd = c // h
        qkv = nn.Dense(3 * c, name="qkv")(x).reshape(bnw, n, 3, h, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (bnw, n, h, hd)
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (hd**-0.5), k)

        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, h),
        )
        idx = jnp.asarray(_rel_pos_index(self.window_size)).reshape(-1)
        bias = bias_table[idx].reshape(n, n, h).transpose(2, 0, 1)
        attn = attn + bias[None]

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bnw // nw, nw, h, n, n) + mask[None, :, None]
            attn = attn.reshape(bnw, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(bnw, n, c)
        return nn.Dense(c, name="proj")(out)


def window_partition(x, ws):
    """(B, H, W, C) -> (B*nW, ws*ws, C); H, W multiples of ws."""
    b, hh, ww, c = x.shape
    x = x.reshape(b, hh // ws, ws, ww // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, c)


def window_reverse(wins, ws, hh, ww):
    b = wins.shape[0] // ((hh // ws) * (ww // ws))
    x = wins.reshape(b, hh // ws, ww // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, hh, ww, -1)


def _shift_attn_mask(hp: int, wp: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows (swin_transformer.py:232-247);
    pure numpy so it stays a compile-time constant under jit."""
    img = np.zeros((hp, wp), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for vs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, vs] = cnt
            cnt += 1
    wins = img.reshape(hp // ws, ws, wp // ws, ws).transpose(0, 2, 1, 3)
    wins = wins.reshape(-1, ws * ws)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift_size: int
    mlp_ratio: float

    @nn.compact
    def __call__(self, x, hh, ww):
        """x: (B, H*W, C)."""
        b, _, c = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        x = x.reshape(b, hh, ww, c)

        pad_b = (ws - hh % ws) % ws
        pad_r = (ws - ww % ws) % ws
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = hh + pad_b, ww + pad_r

        shift = self.shift_size
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None

        wins = window_partition(x, ws)
        wins = WindowAttention(c, ws, self.num_heads, name="attn")(wins, mask)
        x = window_reverse(wins, ws, hp, wp)

        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :hh, :ww].reshape(b, hh * ww, c)
        x = shortcut + x

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(c, name="fc2")(y)
        return x + y


class PatchMerging(nn.Module):
    """2x2 patch merge (swin_transformer.py:163-199): concat (x0 x1 x2 x3)
    with x{i} = x[i%2::2, i//2::2] order matching torch, LN, linear 4C->2C."""

    dim: int

    @nn.compact
    def __call__(self, x, hh, ww):
        b, _, c = x.shape
        x = x.reshape(b, hh, ww, c)
        x = jnp.pad(x, ((0, 0), (0, hh % 2), (0, ww % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        hh2, ww2 = (hh + 1) // 2, (ww + 1) // 2
        x = x.reshape(b, hh2 * ww2, 4 * c)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * c, use_bias=False, name="reduction")(x), hh2, ww2


class SwinTransformer(nn.Module):
    """Returns {stage_index: (B, Hi, Wi, Ci)} for cfg.out_indices."""

    cfg: SwinConfig = SwinConfig()

    @nn.compact
    def __call__(self, image):
        c = self.cfg
        ps = c.patch_size
        b, h, w, _ = image.shape
        # patch embed: conv k4 s4 + LN (swin_transformer.py:360-393)
        x = nn.Conv(c.embed_dim, (ps, ps), strides=(ps, ps), padding="VALID",
                    name="patch_embed")(image)
        hh, ww = x.shape[1], x.shape[2]
        x = x.reshape(b, hh * ww, c.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)

        outs = {}
        for i, depth in enumerate(c.depths):
            dim = c.num_features[i]
            for j in range(depth):
                x = SwinBlock(
                    dim, c.num_heads[i], c.window_size,
                    shift_size=0 if j % 2 == 0 else c.window_size // 2,
                    mlp_ratio=c.mlp_ratio, name=f"stage{i}_block{j}",
                )(x, hh, ww)
            if i in c.out_indices:
                y = nn.LayerNorm(epsilon=1e-5, name=f"out_norm{i}")(x)
                outs[i] = y.reshape(b, hh, ww, dim)
            if i < len(c.depths) - 1:
                x, hh, ww = PatchMerging(dim, name=f"merge{i}")(x, hh, ww)
        return outs
