"""Round-3 probes: Pallas fused W8A8 conv + one-hot-matmul warp vs XLA forms.

Writes JSON lines to stdout and appends to tools/profile_r3.jsonl.
Run on the TPU:  python tools/exp_pallas_r3.py [probe ...]
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

B = 16
DT = jnp.bfloat16


def probes():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 8)

    # --- fused W8A8 conv at the adaptive-conv shape (stacked 2N batch) ---
    x64 = jax.random.normal(ks[0], (2 * B, 64, 64, 512), DT)
    w64 = jax.random.normal(ks[1], (3, 3, 512, 512), DT) * 0.02
    bias = jnp.zeros((512,), jnp.float32)

    from canonswap_tpu.ops.pallas.qconv import qconv2d_pallas
    from canonswap_tpu.ops.qconv import conv2d_w8a8

    yield "qc_xla_w8a8_2N", (lambda a, w: conv2d_w8a8(a, w), (x64, w64))
    yield "qc_pallas_2N", (lambda a, w: qconv2d_pallas(a, w), (x64, w64))

    # SPADE gamma/beta shape: 128 -> 1024 at 64^2
    xg = jax.random.normal(ks[2], (B, 64, 64, 128), DT)
    wg = jax.random.normal(ks[3], (3, 3, 128, 1024), DT) * 0.02
    yield "qc_xla_gb", (lambda a, w: conv2d_w8a8(a, w), (xg, wg))
    yield "qc_pallas_gb", (lambda a, w: qconv2d_pallas(a, w), (xg, wg))
    from jax import lax as _lax

    yield "qc_bf16_gb", (
        lambda a, w: _lax.conv_general_dilated(
            a, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (xg, wg),
    )
    # the middle-block gb shape: 128 -> 1024 at 64^2 happens at c=512
    xg2 = jax.random.normal(ks[2], (B, 128, 128, 128), DT)
    wg2 = jax.random.normal(ks[3], (3, 3, 128, 512), DT) * 0.02
    yield "qc_pallas_gb128", (lambda a, w: qconv2d_pallas(a, w), (xg2, wg2))
    yield "qc_xla_gb128", (lambda a, w: conv2d_w8a8(a, w), (xg2, wg2))
    yield "qc_bf16_gb128", (
        lambda a, w: _lax.conv_general_dilated(
            a, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (xg2, wg2),
    )

    # 256^2 shape (up_1) where XLA w8a8 was a wash vs bf16
    x256 = jax.random.normal(ks[4], (B, 256, 256, 128), DT)
    w256 = jax.random.normal(ks[5], (3, 3, 128, 128), DT) * 0.02
    from jax import lax

    yield "qc_bf16_256", (
        lambda a, w: lax.conv_general_dilated(
            a, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (x256, w256),
    )
    yield "qc_pallas_256", (lambda a, w: qconv2d_pallas(a, w), (x256, w256))

    # --- warp: one-hot matmul vs packed gather at CANONICAL shapes ---
    from canonswap_tpu.ops.grid_sample import grid_sample_3d_packed
    from canonswap_tpu.ops.pallas.warp import grid_sample_3d_onehot

    vol = jax.random.normal(ks[6], (B, 16, 64, 64, 32), DT)
    grid = jax.random.uniform(
        ks[7], (B, 16, 64, 64, 3), minval=-1.0, maxval=1.0
    ).astype(DT)
    yield "warp_packed_gather", (
        lambda v, g: grid_sample_3d_packed(v, g), (vol, grid))
    yield "warp_onehot_pallas", (
        lambda v, g: grid_sample_3d_onehot(v, g), (vol, grid))
    yield "warp_onehot_pblk1024", (
        lambda v, g: grid_sample_3d_onehot(v, g, pblk=1024), (vol, grid))
    yield "warp_onehot_pblk256", (
        lambda v, g: grid_sample_3d_onehot(v, g, pblk=256), (vol, grid))
    yield "warp_onehot_quant", (
        lambda v, g: grid_sample_3d_onehot(v, g, quant=True), (vol, grid))
    yield "warp_onehot_quant256", (
        lambda v, g: grid_sample_3d_onehot(v, g, quant=True, pblk=256),
        (vol, grid))
    yield "warp_onehot_quant128", (
        lambda v, g: grid_sample_3d_onehot(v, g, quant=True, pblk=128),
        (vol, grid))
    yield "warp_onehot_pblk128", (
        lambda v, g: grid_sample_3d_onehot(v, g, pblk=128), (vol, grid))

    # windowed path: identity + small smooth displacement (the realistic
    # dense-motion regime); the full-table fallback compiles too (lax.cond)
    dd, hh, ww = 16, 64, 64
    zz, yy, xx = jnp.meshgrid(
        (jnp.arange(dd) + 0.5) / dd * 2 - 1,
        (jnp.arange(hh) + 0.5) / hh * 2 - 1,
        (jnp.arange(ww) + 0.5) / ww * 2 - 1,
        indexing="ij",
    )
    ident = jnp.stack([xx, yy, zz], -1)[None]
    disp = (jax.random.normal(ks[7], (B, dd, hh, ww, 3)) * 0.02).astype(
        jnp.float32)
    grid_small = (ident + disp).astype(DT)
    yield "warp_onehot_win", (
        lambda v, g: grid_sample_3d_onehot(v, g), (vol, grid_small))
    yield "warp_packed_smallmotion", (
        lambda v, g: grid_sample_3d_packed(v, g), (vol, grid_small))


def main():
    want = sys.argv[1:]
    out = open(os.path.join(os.path.dirname(__file__), os.environ.get("CANONSWAP_PROFILE_LOG", "profile_r4.jsonl")), "a")
    for name, (fn, inputs) in probes():
        if want and name not in want:
            continue
        try:
            sec = scan_slope_time(fn, inputs)
            rec = {"stage": name, "ms_per_step": round(sec * 1000, 2),
                   "batch": B}
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"stage": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()


if __name__ == "__main__":
    main()
