"""Round-3 perf experiments (scan-slope timed on the real chip).

Targets, from the round-2 budget (ROADMAP.md / memory):
  - packed 32ch resblock chains: ~38 ms for 6 blocks of which convs ~15 —
    where does the other ~23 ms go? (M-series)
  - dense-motion hg_in glue ~15 ms x2: einsum-chain rebuild (G-series)
  - warp gather 36 ms x2: mixture-of-translates reformulation (W-series)

Usage: python tools/exp_r3.py [name ...]   (default: all)
Appends JSON lines to tools/profile_r3.jsonl.
"""

from __future__ import annotations

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from ubench import scan_slope_time

DT = jnp.bfloat16
B = 16
K1 = 22  # num_kp + 1


def _rng(i):
    return jax.random.PRNGKey(i)


# ---------------------------------------------------------------------------
# M-series: packed 32ch resblock chain overhead isolation
# chain input: (B, 16, 32, 32, 128)  (pack_hw2 of (B,16,64,64,32))
# ---------------------------------------------------------------------------

def _chain_params(n_blocks=6, c=32):
    ks, bs, bn = [], [], []
    for i in range(2 * n_blocks):
        ks.append(jax.random.normal(_rng(i), (3, 3, 3, c, c), DT) * 0.05)
        bs.append(jnp.zeros((c,), DT))
        bn.append((jnp.ones((c,), DT) * 1.02, jnp.zeros((c,), DT) + 0.01))
    return {"k": ks, "b": bs, "bn": bn}


def _mk_chain(variant, n_blocks=6, c=32):
    from canonswap_tpu.nn.conv3d import conv3d_packed

    def bn_view(h, s, t):
        hh = h.reshape(*h.shape[:-1], 4, c)
        hh = hh * s + t
        return hh.reshape(h.shape)

    def bn_tile(h, s, t):
        return h * jnp.tile(s, 4) + jnp.tile(t, 4)

    def chain(x, p):
        for i in range(n_blocks):
            k0, k1 = p["k"][2 * i], p["k"][2 * i + 1]
            b0, b1 = p["b"][2 * i], p["b"][2 * i + 1]
            (s0, t0), (s1, t1) = p["bn"][2 * i], p["bn"][2 * i + 1]
            h = x
            if variant == "view":
                h = bn_view(h, s0, t0)
            elif variant in ("tile", "fold"):
                h = bn_tile(h, s0, t0)
            h = jax.nn.relu(h)
            if variant == "fold":
                # BN_1 folded into conv_0's kernel/bias (eval exact)
                h = conv3d_packed(h, k0 * s1[None, None, None, None, :],
                                  b0 * s1 + t1)
                h = jax.nn.relu(h)
            else:
                h = conv3d_packed(h, k0, b0)
                if variant == "view":
                    h = bn_view(h, s1, t1)
                elif variant == "tile":
                    h = bn_tile(h, s1, t1)
                h = jax.nn.relu(h)
            h = conv3d_packed(h, k1, b1)
            x = x + h
        return x

    return chain


def m_series():
    x = jax.random.normal(_rng(99), (B, 16, 32, 32, 128), DT)
    p = _chain_params()
    for v in ("conv_only", "view", "tile", "fold"):
        yield f"chain6_{v}", (_mk_chain(v if v != "conv_only" else "none"),
                             (x, p))


# ---------------------------------------------------------------------------
# G-series: dense-motion hg_in build
# ---------------------------------------------------------------------------

def _axis_mats(size, shift_1d):
    from canonswap_tpu.ops.grid_sample import _axis_resample_matrix
    return jax.vmap(jax.vmap(
        lambda s: _axis_resample_matrix(size, s, DT)))(shift_1d)


def _heat_diff_last(kp_d, kp_s, dhw):
    """(B,K,3) x2 -> (B,D,H,W,K+1) heatmap difference, kp axis LAST."""
    from canonswap_tpu.ops.heatmap import make_coordinate_grid_3d
    d, h, w = dhw
    grid = make_coordinate_grid_3d(dhw, DT)  # (D,H,W,3)

    def g(kp):
        diff = grid[None, :, :, :, None, :] - kp[:, None, None, None, :, :]
        return jnp.exp(-0.5 * jnp.sum(diff * diff, -1) / 0.01)

    heat = g(kp_d) - g(kp_s)  # (B,D,H,W,K)
    return jnp.concatenate([jnp.zeros_like(heat[..., :1]), heat], -1)


def build_hg_in_current(xc, kp_d, kp_s):
    from canonswap_tpu.models.dense_motion import (
        create_deformed_feature_translated)
    from canonswap_tpu.ops.heatmap import kp2gaussian
    b, d, h, w, c = xc.shape
    deformed = create_deformed_feature_translated(xc, kp_d, kp_s)
    g_drv = kp2gaussian(kp_d, (d, h, w), 0.01)
    g_src = kp2gaussian(kp_s, (d, h, w), 0.01)
    heat = g_drv - g_src
    heat = jnp.concatenate([jnp.zeros_like(heat[:, :1]), heat], axis=1)
    heat_last = heat.transpose(0, 2, 3, 4, 1)[..., None]
    def_last = jnp.moveaxis(deformed, 1, 4)
    stacked = jnp.concatenate([heat_last, def_last], axis=-1)
    return stacked.reshape(b, d, h, w, -1)


def build_hg_in_v1(xc, kp_d, kp_s):
    """kp axis created in-place by the first contraction; no broadcast of
    the compressed volume, no moveaxis of a tiny-channel tensor."""
    b, d, h, w, c = xc.shape
    shifts = jnp.concatenate(
        [jnp.zeros((b, 1, 3), DT), (kp_s - kp_d).astype(DT)], axis=1)
    wz = _axis_mats(d, shifts[..., 2])
    wy = _axis_mats(h, shifts[..., 1])
    wx = _axis_mats(w, shifts[..., 0])
    t = jnp.einsum("bkad,bdhwc->bkahwc", wz, xc)
    t = jnp.einsum("bkah,bkdhwc->bkdawc", wy, t)
    t = jnp.einsum("bkaw,bkdhwc->bkdhac", wx, t)
    t = t.transpose(0, 2, 3, 4, 1, 5)  # (B,D,H,W,K1,C)
    heat = _heat_diff_last(kp_d, kp_s, (d, h, w))
    stacked = jnp.concatenate([heat[..., None], t], axis=-1)
    return stacked.reshape(b, d, h, w, -1)


def build_hg_in_v2(xc, kp_d, kp_s):
    """x-contraction emits the transposed layout directly (einsum output
    spec carries the transpose into the dot)."""
    b, d, h, w, c = xc.shape
    shifts = jnp.concatenate(
        [jnp.zeros((b, 1, 3), DT), (kp_s - kp_d).astype(DT)], axis=1)
    wz = _axis_mats(d, shifts[..., 2])
    wy = _axis_mats(h, shifts[..., 1])
    wx = _axis_mats(w, shifts[..., 0])
    t = jnp.einsum("bkad,bdhwc->bkahwc", wz, xc)
    t = jnp.einsum("bkah,bkdhwc->bkdawc", wy, t)
    t = jnp.einsum("bkaw,bkdhwc->bdhakc", wx, t)  # (B,D,H,W,K1,C)
    heat = _heat_diff_last(kp_d, kp_s, (d, h, w))
    stacked = jnp.concatenate([heat[..., None], t], axis=-1)
    return stacked.reshape(b, d, h, w, -1)


def g_series():
    xc = jax.random.normal(_rng(5), (B, 16, 64, 64, 4), DT)
    kp1 = jax.random.normal(_rng(6), (B, 21, 3), DT) * 0.1
    kp2 = kp1 + jax.random.normal(_rng(7), (B, 21, 3), DT) * 0.05
    yield "hg_in_current", (build_hg_in_current, (xc, kp1, kp2))
    yield "hg_in_v1", (build_hg_in_v1, (xc, kp1, kp2))
    yield "hg_in_v2", (build_hg_in_v2, (xc, kp1, kp2))


# ---------------------------------------------------------------------------
# W-series: warp formulations
# ---------------------------------------------------------------------------

def warp_mixture_scan(vol, mask, shifts, chunk=2):
    """sum_k mask_k * translate(vol, shift_k): gather-free mixture warp.
    Scanned over kp chunks to bound the k-expanded intermediate."""
    from canonswap_tpu.ops.grid_sample import translate_volume_trilinear
    b, d, h, w, c = vol.shape
    k1 = mask.shape[-1]
    assert k1 % chunk == 0
    sh = shifts.reshape(b, k1 // chunk, chunk, 3).transpose(1, 0, 2, 3)
    mk = mask.reshape(b, d, h, w, k1 // chunk, chunk).transpose(4, 0, 1, 2, 3, 5)

    def body(acc, sm):
        s, m = sm  # (B,chunk,3), (B,D,H,W,chunk)
        rep = jnp.broadcast_to(vol[:, None], (b, chunk, d, h, w, c))
        t = translate_volume_trilinear(
            rep.reshape(b * chunk, d, h, w, c), s.reshape(-1, 3)
        ).reshape(b, chunk, d, h, w, c)
        acc = acc + jnp.einsum("bkdhwc,bdhwk->bdhwc", t, m)
        return acc, 0.0

    acc0 = jnp.zeros_like(vol)
    acc, _ = jax.lax.scan(body, acc0, (sh, mk))
    return acc


def warp_mixture_einsum(vol, mask, shifts):
    """Mixture warp with the kp axis created by the z-contraction and folded
    away by the final mask contraction (no scan; XLA schedules freely)."""
    b, d, h, w, c = vol.shape
    wz = _axis_mats(d, shifts[..., 2])
    wy = _axis_mats(h, shifts[..., 1])
    wx = _axis_mats(w, shifts[..., 0])
    t = jnp.einsum("bkad,bdhwc->bkahwc", wz, vol)
    t = jnp.einsum("bkah,bkdhwc->bkdawc", wy, t)
    # fold mask into the x-contraction: sum over k AND w' in one go
    return jnp.einsum("bkaw,bkdhwc,bdhak->bdhac", wx, t, mask)


def w_series():
    from canonswap_tpu.ops.grid_sample import grid_sample_3d_packed
    from canonswap_tpu.ops.heatmap import make_coordinate_grid_3d
    vol = jax.random.normal(_rng(10), (B, 16, 64, 64, 32), DT)
    mask = jax.nn.softmax(
        jax.random.normal(_rng(11), (B, 16, 64, 64, K1), DT), axis=-1)
    shifts = jnp.concatenate(
        [jnp.zeros((B, 1, 3), DT),
         jax.random.normal(_rng(12), (B, K1 - 1, 3), DT) * 0.1], axis=1)
    grid = make_coordinate_grid_3d((16, 64, 64), DT)
    deform = grid[None] + jnp.einsum(
        "bdhwk,bkc->bdhwc", mask, shifts).astype(DT)

    yield "warp_gather_packed", (
        lambda v, g: grid_sample_3d_packed(v, g), (vol, deform))
    for ch in (1, 2):
        yield f"warp_mixture_scan{ch}", (
            functools.partial(warp_mixture_scan, chunk=ch),
            (vol, mask, shifts))
    yield "warp_mixture_einsum", (
        warp_mixture_einsum, (vol, mask, shifts))


def main():
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.environ.get("CANONSWAP_PROFILE_LOG", "profile_r4.jsonl"))
    gens = (m_series(), g_series(), w_series())
    with open(out_path, "a") as fh:
        for gen in gens:
            for name, (fn, inputs) in gen:
                if only and name not in only:
                    continue
                try:
                    dt = scan_slope_time(fn, inputs)
                    rec = {"stage": name,
                           "ms_per_step": round(dt * 1000, 2), "batch": B}
                except Exception as e:
                    rec = {"stage": name, "error": repr(e)[:300]}
                print(json.dumps(rec), flush=True)
                fh.write(json.dumps(rec) + "\n")
                fh.flush()


if __name__ == "__main__":
    main()
