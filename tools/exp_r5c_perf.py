"""Round-5 probes, wave 3: integrated dense-motion wins + the fast bundle's
remaining fat (SPADE up_1, adaptive-conv quantize traffic, windowed-quant
warp, refine boundary glue).

Run:  python tools/exp_r5c_perf.py [stage ...]  -> appends profile_r5.jsonl
"""

from __future__ import annotations

import dataclasses as dc
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


def stages():
    sel = set(sys.argv[1:])

    def want(*names):
        return not sel or any(n in sel for n in names)

    from canonswap_tpu.configs.model_config import CANONICAL

    cfg = CANONICAL
    rng = jax.random.PRNGKey(1)

    # ---- dense motion with the round-5 occl/combine rewrites ------------
    if want("dm_full_v2", "dm_full_v2_fs2"):
        from canonswap_tpu.models.dense_motion import DenseMotionNetwork

        vol = jax.random.normal(rng, (B, 16, 64, 64, 32), DT)
        kp1 = jax.random.normal(rng, (B, 21, 3), DT) * 0.1
        kp2 = kp1 + jax.random.normal(
            jax.random.PRNGKey(9), (B, 21, 3), DT) * 0.05
        for tag, fs in (("dm_full_v2", 1), ("dm_full_v2_fs2", 2)):
            if not want(tag):
                continue
            m = DenseMotionNetwork(cfg=cfg.warping.dense_motion, num_kp=21,
                                   field_scale=fs)
            p = _zeros_init(m, vol, kp_driving=kp1, kp_source=kp2)
            yield tag, (lambda p, v, a, b, m=m: m.apply(
                p, v, kp_driving=a, kp_source=b), (p, vol, kp1, kp2))

    # ---- windowed warp: bf16 vs the new W8A8 windowed branch ------------
    if want("warp_win_bf16", "warp_win_quant"):
        from canonswap_tpu.ops.heatmap import make_coordinate_grid_3d
        from canonswap_tpu.ops.pallas.warp import (
            grid_sample_3d_onehot_sharded)

        vol = jax.random.normal(rng, (B, 16, 64, 64, 32), DT)
        grid = make_coordinate_grid_3d((16, 64, 64), DT)
        defo = (grid[None] + jax.random.normal(
            jax.random.PRNGKey(3), (B, 16, 64, 64, 3), DT) * 0.02)
        if want("warp_win_bf16"):
            yield "warp_win_bf16", (
                lambda v, g: grid_sample_3d_onehot_sharded(v, g, pblk=256),
                (vol, defo))
        if want("warp_win_quant"):
            yield "warp_win_quant", (
                lambda v, g: grid_sample_3d_onehot_sharded(
                    v, g, pblk=256, quant=True), (vol, defo))

    # ---- SPADE up_1 internals at 256^2 -----------------------------------
    seg = jax.random.normal(rng, (B, 64, 64, 256), DT)
    x256 = jax.random.normal(rng, (B, 256, 256, 256), DT)
    if want("spade_up1_bf16", "spade_up1_int8"):
        from canonswap_tpu.nn.blocks import SPADEResnetBlock

        for tag, q in (("spade_up1_bf16", False), ("spade_up1_int8", True)):
            if not want(tag):
                continue
            m = SPADEResnetBlock(256, 64, int8=q)
            p = _zeros_init(m, x256, seg)
            yield tag, (lambda p, x, s, m=m: m.apply(p, x, s), (p, x256, seg))

    # the two gamma/beta convs (128 -> 512) at 256^2 — the up_1 FLOP bulk
    actv = jax.random.normal(rng, (B, 256, 256, 128), DT)
    kgb = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 128, 512), DT) * .02
    if want("up1_gb_bf16"):
        yield "up1_gb_bf16", (
            lambda a, k: lax.conv_general_dilated(
                a, k, (1, 1), "SAME", dimension_numbers=_DN), (actv, kgb))
    if want("up1_gb_pallasq"):
        from canonswap_tpu.ops.pallas.qconv import qconv2d_pallas

        yield "up1_gb_pallasq", (
            lambda a, k: qconv2d_pallas(a, k, None), (actv, kgb))
    if want("up1_gb_xlaq"):
        from canonswap_tpu.ops.qconv import conv2d_w8a8

        yield "up1_gb_xlaq", (
            lambda a, k: conv2d_w8a8(a, k, None), (actv, kgb))

    # conv_0 of up_1: 256 -> 64 at 256^2 (cout 64 = half MXU fill)
    if want("up1_c0_bf16", "up1_c0_tapstack"):
        k0 = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 256, 64), DT) * .02
        if want("up1_c0_bf16"):
            yield "up1_c0_bf16", (
                lambda x, k: lax.conv_general_dilated(
                    x, k, (1, 1), "SAME", dimension_numbers=_DN), (x256, k0))

        def c0_tapstack(x, k):
            # taps into OUT channels: (1,3,256,192) column conv then a
            # 3-row shifted sum — fills 192/256 lanes instead of 64/128
            kh, kw, cin, cout = k.shape
            kp = k.transpose(0, 3, 1, 2).reshape(kh * cout, kw, cin)
            kp = kp.transpose(1, 2, 0).reshape(1, kw, cin, kh * cout)
            y = lax.conv_general_dilated(
                x, kp, (1, 1), [(0, 0), (kw // 2, kw // 2)],
                dimension_numbers=_DN)
            h = x.shape[1]
            yp = jnp.pad(y, ((0, 0), (1, 1), (0, 0), (0, 0)))
            out = None
            for t in range(kh):
                term = yp[:, t:t + h, :, t * cout:(t + 1) * cout]
                out = term if out is None else out + term
            return out

        if want("up1_c0_tapstack"):
            yield "up1_c0_tapstack", (c0_tapstack, (x256, k0))

    # ---- adaptive conv: f32 vs bf16 quantize arithmetic ------------------
    if want("adaptive_q_f32", "adaptive_q_bf16"):
        x512 = jax.random.normal(rng, (B, 64, 64, 512), DT)
        kw_ = jax.random.normal(
            jax.random.PRNGKey(6), (3, 3, 512, 512), DT) * 0.01
        style = jax.random.normal(jax.random.PRNGKey(7), (B, 512), DT)

        def stack(x, s):
            return jnp.concatenate([x, x * s[:, None, None, :]], axis=0)

        def q_f32(x, s, k):
            from canonswap_tpu.ops.qconv import conv2d_w8a8

            return conv2d_w8a8(stack(x, s), k)

        def q_bf16(x, s, k):
            xs = stack(x, s)
            sx = (jnp.max(jnp.abs(xs), axis=(1, 2, 3))
                  .astype(jnp.float32) / 127.0 + 1e-12)
            xq = jnp.clip(
                jnp.round(xs / sx[:, None, None, None].astype(xs.dtype)),
                -127, 127).astype(jnp.int8)
            k32 = k.astype(jnp.float32)
            sw = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0 + 1e-12
            kq = jnp.clip(jnp.round(k32 / sw), -127, 127).astype(jnp.int8)
            acc = lax.conv_general_dilated(
                xq, kq, (1, 1), "SAME", dimension_numbers=_DN,
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (
                sx[:, None, None, None] * sw[None, None, None, :])
            return y.astype(xs.dtype)

        if want("adaptive_q_f32"):
            yield "adaptive_q_f32", (q_f32, (x512, style, kw_))
        if want("adaptive_q_bf16"):
            yield "adaptive_q_bf16", (q_bf16, (x512, style, kw_))

    # ---- refine module boundary glue (clean re-measures) -----------------
    if want("refine_bf16_v2", "refine_int8_v2"):
        from canonswap_tpu.models.refine import RefineModule

        volr = jax.random.normal(rng, (B, 16, 64, 64, 32), DT)
        for tag, q in (("refine_bf16_v2", False), ("refine_int8_v2", True)):
            if not want(tag):
                continue
            m = RefineModule(int8=q)
            p = _zeros_init(m, volr)
            yield tag, (lambda p, v, m=m: m.apply(p, v), (p, volr))


def main():
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_r5.jsonl")
    with open(out_path, "a") as out:
        for name, (fn, inputs) in stages():
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
