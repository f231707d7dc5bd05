"""Trained-weights quality probe (VERDICT r3 item 4).

The bench's fast-vs-exact SSIM and window-hit-rate gates run on RANDOM
weights — the worst case for the half-res dense-motion lever (an untrained
hourglass emits high-frequency noise) and meaningless for the raw-kp window
hit rate (untrained keypoints are unbounded).  This tool:

  1. trains CANONICAL for --steps self-reconstruction steps on synthetic
     smooth video (runtime/train.py objective; kp prior bounds keypoints),
  2. re-measures on the TRAINED weights:
       - window_hit_rate under raw extract_motion output,
       - fast-vs-exact vol relerr + SSIM (identical weights/inputs),
  3. appends one JSON line per metric to tools/profile_r4.jsonl and saves
     the weights to /tmp/canonswap_trained_probe.npz for reuse.

Run:  python tools/train_probe_r4.py [--steps 300] [--batch 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/canonswap_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DT = jnp.bfloat16


def synth_frames(rng, batch, size, t0=0.0):
    """Smooth moving-blob 'video' frames in [0,1]: a few gaussian blobs with
    per-frame drifting centers over a static gradient background — smooth
    content, bounded motion, enough structure for self-recon."""
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, size), jnp.linspace(0, 1, size),
                          indexing="ij")
    t = t0 + jnp.arange(batch, dtype=jnp.float32)[:, None, None]
    base = jnp.stack([xx, yy, 0.5 * (xx + yy)], -1)[None]
    img = jnp.broadcast_to(base, (batch, size, size, 3))
    k1, k2 = jax.random.split(rng)
    phases = jax.random.uniform(k1, (5,), minval=0, maxval=6.28)
    for i in range(5):
        cx = 0.5 + 0.3 * jnp.sin(0.13 * t + phases[i])
        cy = 0.5 + 0.3 * jnp.cos(0.11 * t + phases[i] * 1.7)
        blob = jnp.exp(-(((xx[None] - cx) ** 2 + (yy[None] - cy) ** 2)
                         / 0.01))
        col = jax.random.uniform(k2, (3,), minval=0.2, maxval=1.0)
        img = img * (1 - 0.6 * blob[..., None]) \
            + 0.6 * blob[..., None] * col
    return jnp.clip(img, 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-4)
    ns = ap.parse_args()

    import dataclasses as dc
    import time

    import numpy as np

    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.runtime import core as C
    from canonswap_tpu.runtime import train as T
    from canonswap_tpu.utils.metrics import ssim

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_r4.jsonl")

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        with open(out_path, "a") as f:
            f.write(line + "\n")

    core = C.CanonSwapCore(CANONICAL)  # packed warp: trainable everywhere
    with jax.default_device(jax.devices("cpu")[0]):
        params = core.init_params_host(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    tx = T.make_optimizer(ns.lr)
    state = T.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(lambda s, f, i: T.train_step(core, tx, s, f, i),
                      donate_argnums=(0,))

    sid = jnp.zeros((ns.batch, 512), jnp.float32)
    sid = sid.at[:, 0].set(1.0)  # fixed unit ID latent for self-recon
    t0 = time.perf_counter()
    for i in range(ns.steps):
        frames = synth_frames(jax.random.PRNGKey(i % 7), ns.batch, 256,
                              t0=float(i))
        state, metrics = step_fn(state, frames.astype(jnp.float32), sid)
        if (i + 1) % 50 == 0 or i == 0:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            emit({"stage": "train_probe_step", "step": i + 1, **m,
                  "wall_s": round(time.perf_counter() - t0, 1)})
    params = state.params
    flat = {"/".join(map(str, p)): np.asarray(v)
            for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    np.savez("/tmp/canonswap_trained_probe.npz",
             **{k: v for k, v in flat.items()})

    # ---- probes on trained weights ------------------------------------
    qb = 4
    params_bf = jax.tree.map(
        lambda a: a.astype(DT) if jnp.issubdtype(a.dtype, jnp.floating)
        else a, params)
    frames = synth_frames(jax.random.PRNGKey(123), qb, 256).astype(DT)

    from canonswap_tpu.ops.pallas.warp import window_fit_fraction

    exact_cfg = dc.replace(
        CANONICAL, warping=dc.replace(CANONICAL.warping, warp_impl="pallas"))
    fast_cfg = dc.replace(
        CANONICAL,
        warping=dc.replace(CANONICAL.warping, dense_motion_scale=2,
                           warp_impl="pallas_quant"),
        appearance=dc.replace(CANONICAL.appearance, int8_conv=True),
        swap=dc.replace(CANONICAL.swap, int8_conv=True),
        spade=dc.replace(CANONICAL.spade, int8_conv=True),
    )
    core_e = C.CanonSwapCore(exact_cfg)
    core_f = C.CanonSwapCore(fast_cfg)

    @jax.jit
    def hit_rate(p, f):
        minfo = C.extract_motion(core_e, p, f)
        x_t = minfo["x_t"].astype(DT)
        x_can = (minfo["scale"][..., None] * minfo["kp"]).astype(DT)
        f_s = C.appearance_features(core_e, p, f)
        _, _, dense = core_e.warping.apply(
            p["warping_module"], f_s, kp_driving=x_can, kp_source=x_t,
            method="warp")
        return window_fit_fraction(f_s.shape, dense["deformation"])

    emit({"stage": "train_probe_window_hit_rawkp",
          "value": round(float(hit_rate(params_bf, frames)), 3),
          "steps": ns.steps})

    @jax.jit
    def outputs(p, f):
        sid_q = jnp.zeros((qb, 512), DT).at[:, 0].set(1.0)
        me = C.extract_motion(core_e, p, f)
        oe = C.swap_step(core_e, p, f, sid_q, me)["out"]
        mf = C.extract_motion(core_f, p, f)
        of = C.swap_step(core_f, p, f, sid_q, mf)["out"]
        return oe, of

    oe, of = outputs(params_bf, frames)
    a = np.clip(np.asarray(oe, np.float32), 0, 1)
    b = np.clip(np.asarray(of, np.float32), 0, 1)
    emit({"stage": "train_probe_fast_ssim_vs_exact",
          "value": round(float(np.mean([ssim(a[i], b[i], data_range=1.0)
                                        for i in range(qb)])), 4),
          "steps": ns.steps})
    rel = float(np.linalg.norm(a - b) / (np.linalg.norm(a) + 1e-9))
    emit({"stage": "train_probe_fast_relerr", "value": round(rel, 4),
          "steps": ns.steps})


if __name__ == "__main__":
    main()
