"""Per-stage device profile of the CanonSwap-TPU generator (scan-slope).

Writes one JSON line per stage to stdout and tools/profile_r2.jsonl.
Run:  python tools/profile_stages.py [stage ...]   (default: all)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from ubench import cast_tree, scan_slope_time

DT = jnp.bfloat16
B = 16


def _init_cpu(module, *args, **kwargs):
    with jax.default_device(jax.devices("cpu")[0]):
        f32 = [a.astype(jnp.float32) if hasattr(a, "astype") else a
               for a in args]
        p = module.init(jax.random.PRNGKey(0), *f32, **kwargs)
    return jax.device_put(cast_tree(p, DT), jax.devices()[0])


def stages():
    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.runtime import core as C

    cfg = CANONICAL
    core = C.CanonSwapCore(cfg)
    rng = jax.random.PRNGKey(1)
    with jax.default_device(jax.devices("cpu")[0]):
        params_f32 = core.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(cast_tree(params_f32, DT), jax.devices()[0])
    del params_f32

    s = cfg.input_size
    k = cfg.motion.num_kp
    frames = jnp.full((B, s, s, 3), 0.5, DT)
    sid = jnp.ones((B, cfg.swap.latent_dim), DT)
    vol = jax.random.normal(rng, (B, 16, 64, 64, 32), DT)
    kp1 = jax.random.normal(rng, (B, k, 3), DT) * 0.1
    kp2 = kp1 + jax.random.normal(jax.random.PRNGKey(2), (B, k, 3), DT) * 0.05
    feat2d = jax.random.normal(rng, (B, 64, 64, 256), DT)

    yield "e2e_swap_with_motion", (
        lambda p, f, i: C.swap_with_motion(core, p, f, i)[0]["out"],
        (params, frames, sid),
    )
    import dataclasses as _dcw

    # in-range synthetic motion: the regime trained extractors emit (and
    # the one the windowed warp fast path keys on); extract_motion is still
    # executed and folded into the output so its cost is counted
    m_xt = jax.random.normal(jax.random.PRNGKey(5), (B, k, 3)) * 0.25
    m_syn = {"kp": (m_xt + jax.random.normal(
        jax.random.PRNGKey(6), (B, k, 3)) * 0.1).astype(DT),
        "scale": jnp.ones((B, 1), DT), "x_t": m_xt.astype(DT)}

    def _e2e_syn(which):
        def fn(p, f, i, m):
            minfo = C.extract_motion(which, p, f)
            out = C.swap_step(which, p, f, i, m)
            return out["out"] + jnp.mean(minfo["x_t"]).astype(out["out"].dtype)
        return fn

    core_pw = C.CanonSwapCore(_dcw.replace(
        cfg, warping=_dcw.replace(cfg.warping, warp_impl="pallas")))
    yield "e2e_exact_pallaswarp", (
        lambda p, f, i: C.swap_with_motion(core_pw, p, f, i)[0]["out"],
        (params, frames, sid),
    )
    yield "e2e_exact_pallaswarp_inrange", (
        _e2e_syn(core_pw), (params, frames, sid, m_syn))
    core_fb = C.CanonSwapCore(_dcw.replace(
        cfg,
        warping=_dcw.replace(cfg.warping, dense_motion_scale=2,
                             warp_impl="pallas_quant"),
        appearance=_dcw.replace(cfg.appearance, int8_conv=True),
        swap=_dcw.replace(cfg.swap, int8_conv=True),
        spade=_dcw.replace(cfg.spade, int8_conv=True),
    ))
    yield "e2e_fast_bundle", (
        lambda p, f, i: C.swap_with_motion(core_fb, p, f, i)[0]["out"],
        (params, frames, sid),
    )
    yield "e2e_fast_bundle_inrange", (
        _e2e_syn(core_fb), (params, frames, sid, m_syn))
    yield "motion_extract", (
        lambda p, f: C.extract_motion(core, p, f), (params, frames))
    yield "appearance", (
        lambda p, f: C.appearance_features(core, p, f), (params, frames))
    yield "warp_full", (
        lambda p, v, a, b2: core.warping.apply(
            p["warping_module"], v, kp_driving=a, kp_source=b2),
        (params, vol, kp1, kp2),
    )
    yield "swap_module", (
        lambda p, v, i: core.swap.apply(p["transfer"], v, i),
        (params, vol, sid),
    )
    import dataclasses as _dc

    from canonswap_tpu.models.swap import SwapModule
    swap_i8 = SwapModule(_dc.replace(cfg.swap, int8_conv=True))
    yield "swap_module_int8", (
        lambda p, v, i: swap_i8.apply(p["transfer"], v, i),
        (params, vol, sid),
    )
    from canonswap_tpu.models.spade_decoder import SPADEDecoder
    spade_i8 = SPADEDecoder(_dc.replace(cfg.spade, int8_conv=True))
    yield "spade_int8", (
        lambda p, f: spade_i8.apply(p["spade_generator"], f),
        (params, feat2d),
    )
    spade_ns = SPADEDecoder(_dc.replace(cfg.spade, int8_conv=True,
                                        norm_scale=2))
    yield "spade_int8_ns2", (
        lambda p, f: spade_ns.apply(p["spade_generator"], f),
        (params, feat2d),
    )
    from canonswap_tpu.models.appearance import AppearanceFeatureExtractor
    app_i8 = AppearanceFeatureExtractor(
        _dc.replace(cfg.appearance, int8_conv=True))
    yield "appearance_int8", (
        lambda p, f: app_i8.apply(p["appearance_feature_extractor"], f),
        (params, frames),
    )
    from canonswap_tpu.models.refine import RefineModule
    ref_i8 = RefineModule(int8=True)
    yield "refine_int8", (
        lambda p, v: ref_i8.apply(p["refine"], v), (params, vol))
    yield "refine", (
        lambda p, v: core.refine.apply(p["refine"], v), (params, vol))
    yield "spade", (
        lambda p, f: core.spade.apply(p["spade_generator"], f),
        (params, feat2d),
    )

    # --- warp sub-stages ----------------------------------------------------
    from canonswap_tpu.models.dense_motion import (
        DenseMotionNetwork, create_deformed_feature_translated)
    from canonswap_tpu.nn.blocks import Hourglass
    from canonswap_tpu.nn.conv3d import Conv3D
    from canonswap_tpu.ops.grid_sample import grid_sample_3d_packed
    from canonswap_tpu.ops.heatmap import kp2gaussian, make_coordinate_grid_3d

    dm = DenseMotionNetwork(cfg=cfg.warping.dense_motion, num_kp=k)
    dm_p = _init_cpu(dm, vol[:1], kp1[:1], kp2[:1])
    yield "dense_motion", (
        lambda p, v, a, b2: dm.apply(p, v, a, b2), (dm_p, vol, kp1, kp2))

    dm2 = DenseMotionNetwork(cfg=cfg.warping.dense_motion, num_kp=k,
                             field_scale=2)
    yield "dense_motion_half", (
        lambda p, v, a, b2: dm2.apply(p, v, a, b2), (dm_p, vol, kp1, kp2))

    import dataclasses as _dc2
    dm3 = DenseMotionNetwork(
        cfg=_dc2.replace(cfg.warping.dense_motion, int8_conv=True),
        num_kp=k, field_scale=2)
    yield "dense_motion_half_int8", (
        lambda p, v, a, b2: dm3.apply(p, v, a, b2), (dm_p, vol, kp1, kp2))
    dm4 = DenseMotionNetwork(
        cfg=_dc2.replace(cfg.warping.dense_motion, int8_conv=True),
        num_kp=k)
    yield "dense_motion_int8", (
        lambda p, v, a, b2: dm4.apply(p, v, a, b2), (dm_p, vol, kp1, kp2))

    hg_in_ch = (k + 1) * (cfg.warping.dense_motion.compress + 1)  # 110
    hg = Hourglass(block_expansion=32, in_features=hg_in_ch, num_blocks=5,
                   max_features=1024)
    hg_x = jax.random.normal(rng, (B, 16, 64, 64, hg_in_ch), DT)
    hg_p = _init_cpu(hg, hg_x[:1])
    yield "hourglass", (lambda p, x: hg.apply(p, x), (hg_p, hg_x))

    mask_in = jax.random.normal(rng, (B, 16, 64, 64, hg_in_ch + 32), DT)
    mk = Conv3D(k + 1, (7, 7, 7))
    mk_p = _init_cpu(mk, mask_in[:1])
    yield "mask_conv_k7", (lambda p, x: mk.apply(p, x), (mk_p, mask_in))

    grid = make_coordinate_grid_3d((16, 64, 64), DT)
    deform = (grid[None] + jax.random.normal(rng, (B, 16, 64, 64, 3), DT) * 0.05)
    yield "gather_packed_c32", (
        lambda v, g: grid_sample_3d_packed(v, g), (vol, deform))

    volc = jax.random.normal(rng, (B, 16, 64, 64, 4), DT)
    yield "translate_warps_k22", (
        lambda v, a, b2: create_deformed_feature_translated(v, a, b2),
        (volc, kp1, kp2),
    )
    yield "kp2gaussian_x2", (
        lambda a, b2: kp2gaussian(a, (16, 64, 64), 0.01)
        - kp2gaussian(b2, (16, 64, 64), 0.01),
        (kp1, kp2),
    )

    # --- conv-3d formulation shootout on the hourglass L1 shape -------------
    cv_x = jax.random.normal(rng, (B, 16, 64, 64, hg_in_ch), DT)
    for impl in ("stacked", "decomposed", "outstacked", "direct"):
        cv = Conv3D(64, (3, 3, 3), impl=impl)
        cv_p = _init_cpu(cv, cv_x[:1])
        yield f"conv3d_110_64_{impl}", (
            lambda p, x, cv=cv: cv.apply(p, x), (cv_p, cv_x))

    # raw 2D conv reference: same macs as one depth tap
    from jax import lax
    k2d = jax.random.normal(rng, (3, 3, hg_in_ch, 64), DT) * 0.02
    x2d = cv_x.reshape(B * 16, 64, 64, hg_in_ch)
    yield "conv2d_raw_110_64", (
        lambda x, kk: lax.conv_general_dilated(
            x, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (x2d, k2d),
    )
    # 32->32 volume resblock conv shape
    cv2 = Conv3D(32, (3, 3, 3), impl="stacked")
    cv2_p = _init_cpu(cv2, vol[:1])
    yield "conv3d_32_32_stacked", (
        lambda p, x: cv2.apply(p, x), (vol, cv2_p) and (cv2_p, vol))


def main():
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_r2.jsonl")
    with open(out_path, "a") as fh:
        for name, (fn, inputs) in stages():
            if only and name not in only:
                continue
            try:
                dt = scan_slope_time(fn, inputs)
                rec = {"stage": name, "ms_per_step": round(dt * 1000, 2),
                       "batch": B}
            except Exception as e:  # keep going; record the failure
                rec = {"stage": name, "error": repr(e)[:300]}
            print(json.dumps(rec), flush=True)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()


if __name__ == "__main__":
    main()
