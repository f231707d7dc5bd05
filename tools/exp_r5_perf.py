"""Round-5 stage isolations: split the warp site (VERDICT r4 next #1).

warp_site_exact measures 105.7 ms/16-frame step (x2 sites) and nobody knows
how much is the dense-motion hourglass vs the 7^3 mask head vs the trilinear
warp vs the occlusion head.  This tool gives each sub-stage an address, plus
the int8 variants of the heavy ones (DenseMotionConfig.int8_conv exists but
has never been measured or bundled).

Zero-weight eval_shape init, scan-slope timing (ubench).

Run:  python tools/exp_r5_perf.py [stage ...]   -> appends tools/profile_r5.jsonl
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


def _zeros_init(module, *args, **kwargs):
    f32 = [a.astype(jnp.float32) if hasattr(a, "astype") else a
           for a in args]
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *f32, **kwargs))
    dev = jax.devices()[0]
    return jax.tree.map(
        lambda s: jax.device_put(
            jnp.zeros(s.shape, DT if jnp.issubdtype(s.dtype, jnp.floating)
                      else s.dtype), dev), shapes)


def stages():
    import dataclasses as dc

    from flax import linen as nn

    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.models.dense_motion import (
        DenseMotionNetwork, build_hourglass_input,
    )
    from canonswap_tpu.nn.blocks import Hourglass, HourglassEncoder
    from canonswap_tpu.nn.conv3d import Conv3D
    from canonswap_tpu.ops.heatmap import make_coordinate_grid_3d
    from canonswap_tpu.ops.resize import volume_to_2d

    cfg = CANONICAL
    dmc = cfg.warping.dense_motion
    rng = jax.random.PRNGKey(1)
    vol = jax.random.normal(rng, (B, 16, 64, 64, 32), DT)
    kp1 = jax.random.normal(rng, (B, 21, 3), DT) * 0.1
    kp2 = kp1 + jax.random.normal(jax.random.PRNGKey(9), (B, 21, 3), DT) * 0.05

    # ---- full dense-motion network: exact / int8 / half-res variants ----
    for tag, q, fs in (("dm_full", False, 1), ("dm_full_int8", True, 1),
                       ("dm_full_fs2", False, 2), ("dm_full_fs2_int8", True, 2)):
        m = DenseMotionNetwork(cfg=dc.replace(dmc, int8_conv=q), num_kp=21,
                               field_scale=fs)
        p = _zeros_init(m, vol, kp_driving=kp1, kp_source=kp2)
        yield tag, (lambda p, v, a, b, m=m: m.apply(
            p, v, kp_driving=a, kp_source=b), (p, vol, kp1, kp2))

    # ---- hg_in build: compress output (4ch) + translated warps + heatmaps
    x4 = jax.random.normal(rng, (B, 16, 64, 64, 4), DT)
    yield "dm_hgin", (build_hourglass_input, (x4, kp1, kp2))

    # ---- the 3D hourglass alone (110 -> 142 ch at 16x64x64) -------------
    hg_in = jax.random.normal(rng, (B, 16, 64, 64, 110), DT)
    for tag, q in (("dm_hourglass", False), ("dm_hourglass_int8", True)):
        m = Hourglass(block_expansion=dmc.block_expansion, in_features=110,
                      num_blocks=dmc.num_blocks,
                      max_features=dmc.max_features, int8=q)
        p = _zeros_init(m, hg_in)
        yield tag, (lambda p, x, m=m: m.apply(p, x), (p, hg_in))

    # encoder alone (decoder = hourglass - encoder)
    enc = HourglassEncoder(dmc.block_expansion, dmc.num_blocks,
                           dmc.max_features, conv_impl="direct")
    p = _zeros_init(enc, hg_in)
    yield "dm_hg_encoder", (lambda p, x, m=enc: m.apply(p, x), (p, hg_in))

    # the decoder's final 142->142 3x3x3 conv at 64^2 (the biggest single
    # conv in the network: 71 GFLOP/frame)
    pred_in = jax.random.normal(rng, (B, 16, 64, 64, 142), DT)
    for tag, q in (("dm_hg_conv0", False), ("dm_hg_conv0_int8", True)):
        m = Conv3D(142, (3, 3, 3), int8=q)
        p = _zeros_init(m, pred_in)
        yield tag, (lambda p, x, m=m: m.apply(p, x), (p, pred_in))

    # first encoder conv at full 64^2 (110 -> 64)
    for tag, q in (("dm_hg_down0", False), ("dm_hg_down0_int8", True)):
        m = Conv3D(64, (3, 3, 3), int8=q)
        p = _zeros_init(m, hg_in)
        yield tag, (lambda p, x, m=m: m.apply(p, x), (p, hg_in))

    # ---- mask head: 7^3 conv (142 -> 22) + softmax + combine ------------
    grid = make_coordinate_grid_3d((16, 64, 64), DT)

    class MaskHead(nn.Module):
        int8: bool = False

        @nn.compact
        def __call__(self, pred, kp_d, kp_s):
            mask = Conv3D(22, (7, 7, 7), name="mask",
                          int8=self.int8)(pred)
            mask = jax.nn.softmax(mask, axis=-1)
            shifts = (kp_s - kp_d).astype(mask.dtype)
            return grid[None] * jnp.sum(mask, -1, keepdims=True) + jnp.einsum(
                "bdhwk,bkc->bdhwc", mask[..., 1:], shifts)

    for tag, q in (("dm_mask7", False), ("dm_mask7_int8", True)):
        m = MaskHead(int8=q)
        p = _zeros_init(m, pred_in, kp1, kp2)
        yield tag, (lambda p, x, a, b, m=m: m.apply(p, x, a, b),
                    (p, pred_in, kp1, kp2))

    # ---- occlusion head: flatten + 7x7 conv over 2272 ch ----------------
    class OcclHead(nn.Module):
        @nn.compact
        def __call__(self, pred):
            x = volume_to_2d(pred)
            return jax.nn.sigmoid(nn.Conv(1, (7, 7), padding="SAME")(x))

    m = OcclHead()
    p = _zeros_init(m, pred_in)
    yield "dm_occl", (lambda p, x, m=m: m.apply(p, x), (p, pred_in))

    # ---- trilinear warp alone (identity + noise deformation) ------------
    on_tpu = jax.default_backend() in ("tpu", "axon")
    defo = (grid[None] + jax.random.normal(
        jax.random.PRNGKey(3), (B, 16, 64, 64, 3), DT) * 0.02)
    if on_tpu:
        from canonswap_tpu.ops.pallas.warp import grid_sample_3d_onehot_sharded

        yield "warp_only_pallas", (
            lambda v, g: grid_sample_3d_onehot_sharded(v, g, pblk=256),
            (vol, defo))
        yield "warp_only_quant", (
            lambda v, g: grid_sample_3d_onehot_sharded(
                v, g, pblk=256, quant=True), (vol, defo))
    from canonswap_tpu.ops.grid_sample import grid_sample_3d_packed

    yield "warp_only_packed", (grid_sample_3d_packed, (vol, defo))

    # ---- motion extractor (never isolated before) ------------------------
    from canonswap_tpu.models.motion import MotionExtractor

    frames = jnp.full((B, 256, 256, 3), 0.5, DT)
    m = MotionExtractor(cfg.motion)
    p = _zeros_init(m, frames)
    yield "motion_extract", (lambda p, f, m=m: m.apply(p, f), (p, frames))


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
