"""Round-5 attack candidates for the dense-motion stages (VERDICT r4 #1).

profile_r5.jsonl attribution of dm_full (82.3 ms/16f exact):
  hourglass ~35, mask 7^3 conv ~21, softmax+combine ~9.6, occl head 9.2,
  hg_in 4.2, compress+glue ~3.
The occl head is ~7x over roofline (1 output channel = 1/128 MXU fill);
softmax+combine is layout-bound (22- and 3-channel minor dims); the
hourglass runs at ~43% MXU with its per-level conv impl untuned.

Each stage here is a measurable rewrite candidate; exact math only.

Run:  python tools/exp_r5b_perf.py [stage ...]  -> appends profile_r5.jsonl
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax import lax

from ubench import scan_slope_time

DT = jnp.bfloat16
B = 16
_DN = ("NHWC", "HWIO", "NHWC")


def stages():
    from canonswap_tpu.nn.blocks import Hourglass, HourglassDecoder
    from canonswap_tpu.nn.conv3d import Conv3D
    from canonswap_tpu.ops.heatmap import make_coordinate_grid_3d

    rng = jax.random.PRNGKey(1)
    pred_in = jax.random.normal(rng, (B, 16, 64, 64, 142), DT)
    kp1 = jax.random.normal(rng, (B, 21, 3), DT) * 0.1
    kp2 = kp1 + jax.random.normal(jax.random.PRNGKey(9), (B, 21, 3), DT) * 0.05

    # ---- occlusion head rewrites: 7x7 conv (2272 -> 1) at 64^2 ----------
    x2d = jax.random.normal(rng, (B, 64, 64, 2272), DT)
    k7 = jax.random.normal(jax.random.PRNGKey(2), (7, 7, 2272, 1), DT) * 0.01

    def occl_direct(x, k):
        return jax.nn.sigmoid(lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=_DN))

    yield "occl_direct", (occl_direct, (x2d, k7))

    def occl_outstacked(x, k):
        # (7,7,Cin,1) -> pointwise (1,1,Cin,49) matmul, then the 49 taps
        # re-assemble by spatial shift: out[p] = sum_t y[p+delta_t, t].
        # The shift-sum is a 0/1-weight 7x7 conv over 49 channels -> 1
        # (46x fewer MACs than the original, and the big matmul is a
        # full-fill (HW, 2272) @ (2272, 49)).
        kh, kw, cin, _ = k.shape
        kp = k.transpose(2, 0, 1, 3).reshape(1, 1, cin, kh * kw)
        y = lax.conv_general_dilated(
            x, kp, (1, 1), "VALID", dimension_numbers=_DN)
        sel = jnp.eye(kh * kw, dtype=x.dtype).reshape(kh, kw, kh * kw, 1)
        out = lax.conv_general_dilated(
            y, sel, (1, 1), "SAME", dimension_numbers=_DN)
        return jax.nn.sigmoid(out)

    yield "occl_outstacked", (occl_outstacked, (x2d, k7))

    def occl_shiftsum(x, k):
        kh, kw, cin, _ = k.shape
        kp = k.transpose(2, 0, 1, 3).reshape(1, 1, cin, kh * kw)
        y = lax.conv_general_dilated(
            x, kp, (1, 1), "VALID", dimension_numbers=_DN)
        yp = jnp.pad(y, ((0, 0), (3, 3), (3, 3), (0, 0)))
        h, w = x.shape[1], x.shape[2]
        out = 0.0
        for t in range(kh * kw):
            dy, dx = t // kw, t % kw
            out = out + yp[:, dy:dy + h, dx:dx + w, t]
        return jax.nn.sigmoid(out)[..., None]

    yield "occl_shiftsum", (occl_shiftsum, (x2d, k7))

    # ---- softmax + combine rewrites (after the 7^3 mask conv) -----------
    grid = make_coordinate_grid_3d((16, 64, 64), DT)
    logits = jax.random.normal(rng, (B, 16, 64, 64, 22), DT)

    def combine_v1(lg, kd, ks):
        mask = jax.nn.softmax(lg, axis=-1)
        shifts = (ks - kd).astype(mask.dtype)
        return grid[None] * jnp.sum(mask, -1, keepdims=True) + jnp.einsum(
            "bdhwk,bkc->bdhwc", mask[..., 1:], shifts)

    yield "combine_v1", (combine_v1, (logits, kp1, kp2))

    def combine_fold(lg, kd, ks):
        # fold the softmax denominator into the combine: with
        # e = exp(lg - max), sum(softmax)=1 exactly, so
        #   deformation = grid + (e[...,1:] @ shifts) / sum(e)
        # one exp pass, no separate normalize pass, and the (..,22)
        # minor-dim tensor is read once by ONE fused contraction.
        e = jnp.exp(lg - jnp.max(lg, axis=-1, keepdims=True))
        s = jnp.sum(e, axis=-1, keepdims=True)
        shifts = (ks - kd).astype(lg.dtype)
        num = jnp.einsum("bdhwk,bkc->bdhwc", e[..., 1:], shifts)
        return grid[None] + num / s

    yield "combine_fold", (combine_fold, (logits, kp1, kp2))

    def combine_fold_planes(lg, kd, ks):
        # same fold, but emit three (B,D,H,W) planes (no 3-minor-dim
        # tensor); consumers (the Pallas warp) want split planes anyway
        e = jnp.exp(lg - jnp.max(lg, axis=-1, keepdims=True))
        s = jnp.sum(e, axis=-1)
        shifts = (ks - kd).astype(lg.dtype)
        num = jnp.einsum("bdhwk,bkc->bdhwc", e[..., 1:], shifts)
        return tuple(grid[None, ..., c] + num[..., c] / s for c in range(3))

    yield "combine_fold_planes", (combine_fold_planes, (logits, kp1, kp2))

    # ---- hourglass impl variants ----------------------------------------
    hg_in = jax.random.normal(rng, (B, 16, 64, 64, 110), DT)
    for tag, impl in (("hg_stacked", "stacked"), ("hg_auto", "auto")):
        m = Hourglass(block_expansion=32, in_features=110, num_blocks=5,
                      max_features=1024, conv_impl=impl)
        p = _zeros_init(m, hg_in)
        yield tag, (lambda p, x, m=m: m.apply(p, x), (p, hg_in))

    # decoder alone (the encoder was 8.25 contended, likely ~6 clean;
    # decoder = hourglass - encoder ~ 27-29 ms)
    feats = []
    ch = [110, 64, 128, 256, 512, 1024]
    hw = [64, 32, 16, 8, 4, 2]
    for c, s in zip(ch, hw):
        feats.append(jax.random.normal(rng, (B, 16, s, s, c), DT))
    for tag, impl in (("hg_decoder_direct", "direct"),
                      ("hg_decoder_stacked", "stacked"),
                      ("hg_decoder_auto", "auto")):
        m = HourglassDecoder(block_expansion=32, in_features=110,
                             num_blocks=5, max_features=1024, conv_impl=impl)
        p = _zeros_init(m, feats)
        yield tag, (lambda p, x, m=m: m.apply(p, x), (p, feats))

    # the decoder's final 142->142 conv variants at 64^2
    for tag, impl in (("hgc0_direct", "direct"), ("hgc0_stacked", "stacked"),
                      ("hgc0_outstacked", "outstacked")):
        m = Conv3D(142, (3, 3, 3), impl=impl)
        p = _zeros_init(m, pred_in)
        yield tag, (lambda p, x, m=m: m.apply(p, x), (p, pred_in))

    # mask 7^3 conv impl variants
    for tag, impl in (("mask7_outstacked", "outstacked"),
                      ("mask7_direct", "direct"),
                      ("mask7_decomposed", "decomposed")):
        m = Conv3D(22, (7, 7, 7), impl=impl)
        p = _zeros_init(m, pred_in)
        yield tag, (lambda p, x, m=m: m.apply(p, x), (p, pred_in))


def _zeros_init(module, *args, **kwargs):
    f32 = [jax.tree.map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a, x)
        for x in args]
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *f32, **kwargs))
    dev = jax.devices()[0]
    return jax.tree.map(
        lambda s: jax.device_put(
            jnp.zeros(s.shape, DT if jnp.issubdtype(s.dtype, jnp.floating)
                      else s.dtype), dev), shapes)


def main():
    sel = sys.argv[1:]
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_r5.jsonl")
    with open(out_path, "a") as out:
        for name, (fn, inputs) in stages():
            if sel and name not in sel:
                continue
            try:
                dt = scan_slope_time(jax.jit(fn), inputs)
                rec = {"stage": name, "ms_per_step": round(dt * 1000, 2),
                       "batch": B}
            except Exception as e:  # noqa: BLE001
                rec = {"stage": name, "error": repr(e)[:300]}
            line = json.dumps(rec)
            print(line, flush=True)
            out.write(line + "\n")
            out.flush()


if __name__ == "__main__":
    main()
