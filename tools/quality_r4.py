"""Quality gates on TRAINED weights (VERDICT r3 weak #3 / next-round #4).

Random-weight SSIM proves little: the fast bundle's levers (half-res dense
motion, windowed warp) depend on trained deformation-field smoothness.  This
tool runs a few hundred self-reconstruction train steps on synthetic video
at CANONICAL scale on the TPU, then measures on the TRAINED weights:

  - fast-vs-exact SSIM / volume relerr with REAL extract_motion output
    (not pinned synthetic keypoints)
  - the Pallas warp window-hit rate on the REAL dense deformation field

Appends JSON records to tools/profile_r5.jsonl (stage quality_trained_*)
AND writes the flattened summary to tools/quality_trained.json, which
bench.py merges into the official record's extra (trained_* keys).

Run:  python tools/quality_r4.py [n_steps]  (default 300)
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/canonswap_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from canonswap_tpu.configs.model_config import CANONICAL
from canonswap_tpu.runtime import core as C, train as T
from canonswap_tpu.utils.metrics import ssim

LOG = os.path.join(os.path.dirname(__file__), "profile_r5.jsonl")
SUMMARY = os.path.join(os.path.dirname(__file__), "quality_trained.json")


def synth_frames(step: int, batch: int, s: int) -> jax.Array:
    """Deterministic moving pattern: a bright face-like blob translating and
    scaling over a textured background — enough structure for self-recon to
    learn smooth, bounded deformation fields."""
    t = step * 0.1
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, s), jnp.linspace(0, 1, s),
                          indexing="ij")
    out = []
    for b in range(batch):
        ph = t + b * 0.7
        cx = 0.5 + 0.15 * jnp.sin(ph)
        cy = 0.5 + 0.12 * jnp.cos(0.8 * ph)
        r2 = (xx - cx) ** 2 + (yy - cy) ** 2
        blob = jnp.exp(-r2 / (0.02 + 0.005 * jnp.sin(ph)))
        tex = 0.25 + 0.15 * jnp.sin(24 * xx + ph) * jnp.cos(20 * yy - ph)
        img = jnp.stack([tex + 0.6 * blob,
                         tex + 0.5 * blob * jnp.cos(ph),
                         tex + 0.4 * blob], -1)
        out.append(jnp.clip(img, 0, 1))
    return jnp.stack(out)


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    batch = int(os.environ.get("CANONSWAP_QTRAIN_BATCH", "4"))
    lr = float(os.environ.get("CANONSWAP_QTRAIN_LR", "2e-4"))
    s = CANONICAL.input_size
    log = open(LOG, "a")

    summary = {}

    def rec(stage, **kw):
        row = {"stage": stage, **kw}
        print(json.dumps(row), flush=True)
        log.write(json.dumps(row) + "\n")
        log.flush()
        short = stage.removeprefix("quality_trained_")
        for k, v in kw.items():
            summary[f"{short}_{k}"] = v
        with open(SUMMARY, "w") as f:
            json.dump(summary, f, indent=1)

    core = C.CanonSwapCore(CANONICAL)  # exact, packed warp (grad-safe)
    params = core.init_params_host(jax.random.PRNGKey(0))
    params = jax.device_put(params, jax.devices()[0])
    tx = T.make_optimizer(lr=lr)
    state = T.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    step_fn = jax.jit(functools.partial(T.train_step, core, tx))
    sid = jnp.ones((batch, CANONICAL.swap.latent_dim), jnp.float32)

    import time

    t0 = time.time()
    for i in range(n_steps):
        frames = synth_frames(i, batch, s)
        state, metrics = step_fn(state, frames, sid)
        if i % 50 == 0 or i == n_steps - 1:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            print(f"# step {i}: {m} ({time.time() - t0:.0f}s)", flush=True)
    rec("quality_trained_train", n_steps=n_steps, batch=batch,
        final_loss=round(float(metrics["loss"]), 4),
        final_l1=round(float(metrics["l1"]), 4),
        wall_s=round(time.time() - t0, 1))

    params = state.params
    eval_frames = synth_frames(10_000, batch, s)  # held-out phase

    # ---- real motion from the trained extractor ----
    minfo = jax.jit(C.extract_motion, static_argnums=0)(core, params,
                                                        eval_frames)
    x_t = minfo["x_t"]
    x_can = minfo["scale"][..., None] * minfo["kp"]
    rec("quality_trained_kp_range",
        xt_absmax=round(float(jnp.max(jnp.abs(x_t))), 3),
        xcan_absmax=round(float(jnp.max(jnp.abs(x_can))), 3))

    # ---- window hit rate on the REAL dense deformation field ----
    from canonswap_tpu.ops.pallas.warp import window_fit_fraction

    @functools.partial(jax.jit, static_argnums=0)
    def hit_rate(which, p, f, xt, xc):
        f_s = C.appearance_features(which, p, f)
        _, _, dense = which.warping.apply(
            p["warping_module"], f_s, kp_driving=xc, kp_source=xt,
            method="warp")
        return window_fit_fraction(f_s.shape, dense["deformation"])

    rec("quality_trained_window_hit",
        rate=round(float(hit_rate(core, params, eval_frames, x_t, x_can)),
                   3))

    # ---- fast-vs-exact on trained weights, REAL motion ----
    @functools.partial(jax.jit, static_argnums=0)
    def probe(which, p, f, i, xt, xc):
        f_s = C.appearance_features(which, p, f)
        f_can, _ = C.warp_to_canonical(which, p, f_s, xt, xc)
        f_sw = C.inject_identity(which, p, f_can, i.astype(f.dtype))
        vol = C.refine_volume(which, p, f_sw)
        out = C.warp_decode(which, p, vol, xc, xt)
        return vol, out

    fast_cfg = dataclasses.replace(
        CANONICAL,
        warping=dataclasses.replace(CANONICAL.warping, dense_motion_scale=2,
                                    warp_impl="pallas_quant"),
        appearance=dataclasses.replace(CANONICAL.appearance, int8_conv=True),
        swap=dataclasses.replace(CANONICAL.swap, int8_conv=True),
        spade=dataclasses.replace(CANONICAL.spade, int8_conv=True),
    )
    halfres_cfg = dataclasses.replace(
        CANONICAL,
        warping=dataclasses.replace(CANONICAL.warping, dense_motion_scale=2))
    va, oa = probe(core, params, eval_frames, sid, x_t, x_can)
    va = np.asarray(va, np.float32)
    a = np.clip(np.asarray(oa, np.float32), 0, 1)
    for tag, cfg in [("fast", fast_cfg), ("halfres", halfres_cfg)]:
        which = C.CanonSwapCore(cfg)
        vb, ob = probe(which, params, eval_frames, sid, x_t, x_can)
        vb = np.asarray(vb, np.float32)
        b = np.clip(np.asarray(ob, np.float32), 0, 1)
        rec(f"quality_trained_{tag}",
            vol_relerr=round(float(np.linalg.norm(va - vb)
                                   / (np.linalg.norm(va) + 1e-9)), 4),
            ssim_vs_exact=round(float(np.mean(
                [ssim(a[i], b[i], data_range=1.0)
                 for i in range(a.shape[0])])), 4))


if __name__ == "__main__":
    main()
