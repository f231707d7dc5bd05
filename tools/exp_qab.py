"""A/B: Pallas fused W8A8 conv routing ON vs OFF, measured IN CONTEXT.

Standalone micro-probes of the qconv kernel are unreliable on this relay
(sub-ms ops drown in round-trip noise; the same probe has returned 11.8 ms
and -0.42 ms an hour apart).  The honest comparison is the full SPADE-int8
stage and the full fast-bundle e2e step, A/B'd in ONE process with the
dispatcher env var toggled between traces, interleaved to cancel drift.

Run on the TPU:  python tools/exp_qab.py
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


def main():
    import dataclasses as _dc

    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.models.spade_decoder import SPADEDecoder
    from canonswap_tpu.runtime import core as C

    cfg = CANONICAL
    core = C.CanonSwapCore(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params_f32 = core.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(cast_tree(params_f32, DT), jax.devices()[0])
    del params_f32

    s = cfg.input_size
    k = cfg.motion.num_kp
    frames = jnp.full((B, s, s, 3), 0.5, DT)
    sid = jnp.ones((B, cfg.swap.latent_dim), DT)
    feat2d = jax.random.normal(jax.random.PRNGKey(1), (B, 64, 64, 256), DT)

    spade_i8 = SPADEDecoder(_dc.replace(cfg.spade, int8_conv=True))

    m_xt = jax.random.normal(jax.random.PRNGKey(5), (B, k, 3)) * 0.25
    m_syn = {"kp": (m_xt + jax.random.normal(
        jax.random.PRNGKey(6), (B, k, 3)) * 0.1).astype(DT),
        "scale": jnp.ones((B, 1), DT), "x_t": m_xt.astype(DT)}
    core_fb = C.CanonSwapCore(_dc.replace(
        cfg,
        warping=_dc.replace(cfg.warping, dense_motion_scale=2,
                            warp_impl="pallas_quant"),
        appearance=_dc.replace(cfg.appearance, int8_conv=True),
        swap=_dc.replace(cfg.swap, int8_conv=True),
        spade=_dc.replace(cfg.spade, int8_conv=True),
    ))

    def e2e_fb(p, f, i, m):
        minfo = C.extract_motion(core_fb, p, f)
        out = C.swap_step(core_fb, p, f, i, m)
        return out["out"] + jnp.mean(minfo["x_t"]).astype(out["out"].dtype)

    probes = {
        "spade_int8": (
            lambda p, f: spade_i8.apply(p["spade_generator"], f),
            (params, feat2d)),
        "e2e_fast_inrange": (e2e_fb, (params, frames, sid, m_syn)),
    }

    out = open(os.path.join(os.path.dirname(__file__), os.environ.get("CANONSWAP_PROFILE_LOG", "profile_r4.jsonl")),
               "a")
    want = sys.argv[1:] or list(probes)
    for name in want:
        fn, inputs = probes[name]
        for rnd in range(2):
            for pq in ("0", "1"):
                os.environ["CANONSWAP_PALLAS_QCONV"] = pq
                tag = f"{name}_pq{pq}_r{rnd}"
                try:
                    sec = scan_slope_time(fn, inputs)
                    rec = {"stage": tag, "ms_per_step": round(sec * 1000, 2),
                           "batch": B}
                except Exception as e:  # noqa: BLE001 — record and continue
                    rec = {"stage": tag,
                           "error": f"{type(e).__name__}: {e}"[:300]}
                print(json.dumps(rec), flush=True)
                out.write(json.dumps(rec) + "\n")
                out.flush()


if __name__ == "__main__":
    main()
