"""Round-5 wave 6: depth-in-channels (z-dense) form for the 3D resblock
chains.

The packed (pack_hw2) 3D chains run 3 halo-summed 128-ch convs over a tiny
32^2 grid per conv3d — measured ~3.5 ms/conv (refine chain 44 ms/16f).  The
z-dense form (nn/conv3d.py::conv3d_zdense) folds depth into channels and
runs ONE dense (3,3,512,512) block-banded conv over the 64^2 grid: ~5.6x
the true MACs but in the shape class XLA maps onto the MXU at >100 TFLOP/s
(q_gb_64_128_1024: 141 TFLOP/s).  If the measured rate holds, the 12-conv
refine chain drops to ~20 ms and the swap 3D stacks by a similar factor.

Run:  python tools/exp_r5f_zdense.py [stage ...]  -> appends profile_r5.jsonl
"""

from __future__ import annotations

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
D, H, W, C = 16, 64, 64, 32  # CANONICAL volume geometry


def gn_zslab(h, depth, scale, bias, eps=1e-5):
    """Per-original-channel GroupNorm (groups == C) on the zslab layout:
    stats per (b, c) over (H, W, D) — same element set as the packed form."""
    b, hh, ww, dc = h.shape
    c = dc // depth
    v = h.reshape(b, hh, ww, depth, c).astype(jnp.float32)
    mu = jnp.mean(v, axis=(1, 2, 3), keepdims=True)
    var = jnp.mean((v - mu) ** 2, axis=(1, 2, 3), keepdims=True)
    v = (v - mu) * jax.lax.rsqrt(var + eps) * scale + bias
    return v.reshape(b, hh, ww, dc).astype(h.dtype)


def make_chain_params(n_blocks, c, rng):
    ks = jax.random.split(rng, n_blocks * 2)
    blocks = []
    for i in range(n_blocks):
        blocks.append({
            "k1": jax.random.normal(ks[2 * i], (3, 3, 3, c, c), DT) * 0.05,
            "b1": jnp.zeros((c,), DT),
            "k2": jax.random.normal(ks[2 * i + 1], (3, 3, 3, c, c), DT) * 0.05,
            "b2": jnp.zeros((c,), DT),
            "g1s": jnp.ones((c,), jnp.float32),
            "g1b": jnp.zeros((c,), jnp.float32),
            "g2s": jnp.ones((c,), jnp.float32),
            "g2b": jnp.zeros((c,), jnp.float32),
        })
    return blocks


def chain_zslab(xs, blocks, int8=False):
    from canonswap_tpu.nn.conv3d import conv3d_zdense

    for p in blocks:
        h = conv3d_zdense(xs, p["k1"], p["b1"], int8=int8)
        h = gn_zslab(h, D, p["g1s"], p["g1b"])
        h = jax.nn.leaky_relu(h, 0.01)
        h = conv3d_zdense(h, p["k2"], p["b2"], int8=int8)
        h = gn_zslab(h, D, p["g2s"], p["g2b"])
        xs = jax.nn.leaky_relu(h + xs, 0.01)
    return xs


def chain_packed(xp, blocks, int8=False):
    from canonswap_tpu.nn.conv3d import conv3d_packed

    def gn(h, scale, bias, eps=1e-5):
        b, d, hh, wh, c4 = h.shape
        v = h.reshape(b, d, hh, wh, 4, c4 // 4).astype(jnp.float32)
        mu = jnp.mean(v, axis=(1, 2, 3, 4), keepdims=True)
        var = jnp.mean((v - mu) ** 2, axis=(1, 2, 3, 4), keepdims=True)
        v = (v - mu) * jax.lax.rsqrt(var + eps) * scale + bias
        return v.reshape(h.shape).astype(h.dtype)

    for p in blocks:
        h = conv3d_packed(xp, p["k1"], p["b1"], int8=int8)
        h = gn(h, p["g1s"], p["g1b"])
        h = jax.nn.leaky_relu(h, 0.01)
        h = conv3d_packed(h, p["k2"], p["b2"], int8=int8)
        h = gn(h, p["g2s"], p["g2b"])
        xp = jax.nn.leaky_relu(h + xp, 0.01)
    return xp


def stages():
    sel = set(sys.argv[1:])

    def want(*names):
        return not sel or any(n in sel for n in names)

    from canonswap_tpu.nn.conv3d import conv3d_packed, conv3d_zdense, \
        pack_hw2, to_zslab

    rng = jax.random.PRNGKey(1)
    vol = jax.random.normal(rng, (B, D, H, W, C), DT)
    kern = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 3, C, C), DT) * .05
    xp = pack_hw2(vol)
    xs = to_zslab(vol)

    if want("zd_conv_packed"):
        yield "zd_conv_packed", (
            lambda a, k: conv3d_packed(a, k), (xp, kern))
    if want("zd_conv_zdense"):
        yield "zd_conv_zdense", (
            lambda a, k: conv3d_zdense(a, k), (xs, kern))
    if want("zd_conv_zdense_int8"):
        yield "zd_conv_zdense_int8", (
            lambda a, k: conv3d_zdense(a, k, int8=True), (xs, kern))

    blocks = make_chain_params(6, C, jax.random.PRNGKey(3))
    if want("zd_chain_packed"):
        yield "zd_chain_packed", (
            lambda a, bl: chain_packed(a, bl), (xp, blocks))
    if want("zd_chain_packed_int8"):
        yield "zd_chain_packed_int8", (
            lambda a, bl: chain_packed(a, bl, int8=True), (xp, blocks))
    if want("zd_chain_zslab"):
        yield "zd_chain_zslab", (
            lambda a, bl: chain_zslab(a, bl), (xs, blocks))
    if want("zd_chain_zslab_int8"):
        yield "zd_chain_zslab_int8", (
            lambda a, bl: chain_zslab(a, bl, int8=True), (xs, blocks))


def main():
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_r5.jsonl")
    with open(out_path, "a") as out:
        for name, (fn, inputs) in stages():
            try:
                dtv = scan_slope_time(jax.jit(fn), inputs)
                rec = {"stage": name,
                       "ms_per_step": round(dtv * 1000, 2), "batch": B}
            except Exception as e:  # noqa: BLE001
                rec = {"stage": name, "error": repr(e)[:300]}
            line = json.dumps(rec)
            print(line, flush=True)
            out.write(line + "\n")
            out.flush()


if __name__ == "__main__":
    main()
