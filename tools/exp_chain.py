"""Probe: fused VMEM-resident W8A8 block chains vs the per-block int8 path.

Measures the SAME flax modules with cfg.fused_chain toggled (identical
param trees), at CANONICAL shapes, via scan-slope timing.

Run on the TPU:  python tools/exp_chain.py [probe ...]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from ubench import probe_timeout, scan_slope_time

B = 16
DT = jnp.bfloat16


def _cast(tree, dt):
    return jax.tree.map(
        lambda a: a.astype(dt) if jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree)


def _cached_init(name, init_fn):
    """CPU init of a CANONICAL-scale module costs minutes on this host and
    flax init EXECUTES the forward — so (a) init must use the Pallas-free
    module variant (the int8/fused variants lower pallas_calls, which the
    CPU backend rejects — the BENCH_r03-class bug), and (b) the result is
    cached to /tmp across probe runs."""
    import pickle

    path = f"/tmp/exp_chain_init_{name}.pkl"
    if os.path.exists(path):
        with open(path, "rb") as f:
            return pickle.load(f)
    with jax.default_device(jax.devices("cpu")[0]):
        params = init_fn()
    params = jax.tree.map(lambda a: __import__("numpy").asarray(a), params)
    with open(path, "wb") as f:
        pickle.dump(params, f)
    return params


def probes():
    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.models.spade_decoder import SPADEDecoder
    from canonswap_tpu.models.swap import SwapModule

    dev = jax.devices()[0]
    k = jax.random.PRNGKey(0)

    # ---- swap module: 7 adaptive blocks + 6 packed res3d ----
    sw_i8 = SwapModule(dataclasses.replace(CANONICAL.swap, int8_conv=True))
    sw_fc = SwapModule(dataclasses.replace(CANONICAL.swap, fused_chain=True))
    sw_ks = SwapModule(dataclasses.replace(
        CANONICAL.swap, fused_chain=True, chain_ksplit=True))
    sw_plain = SwapModule(CANONICAL.swap)  # Pallas-free init twin
    vol = jax.random.normal(k, (B, 16, 64, 64, 32), DT)
    lat = jax.random.normal(jax.random.fold_in(k, 1), (B, 512), DT)
    swp = _cached_init("swap", lambda: sw_plain.init(
        jax.random.fold_in(k, 2),
        jnp.zeros((1, 16, 64, 64, 32)), jnp.zeros((1, 512))))
    swp = jax.device_put(_cast(swp, DT), dev)

    # ---- SPADE decoder: 6 fused middle blocks vs int8 per-block ----
    sp_i8 = SPADEDecoder(dataclasses.replace(CANONICAL.spade, int8_conv=True))
    sp_fc = SPADEDecoder(dataclasses.replace(
        CANONICAL.spade, int8_conv=True, fused_chain=True))
    sp_ks = SPADEDecoder(dataclasses.replace(
        CANONICAL.spade, int8_conv=True, fused_chain=True,
        chain_ksplit=True))
    sp_plain = SPADEDecoder(CANONICAL.spade)  # Pallas-free init twin
    feat = jax.random.normal(jax.random.fold_in(k, 3), (B, 64, 64, 256), DT)
    spp = _cached_init("spade", lambda: sp_plain.init(
        jax.random.fold_in(k, 4), jnp.zeros((1, 64, 64, 256))))
    spp = jax.device_put(_cast(spp, DT), dev)

    # ---- phase-folded up_1 gamma/beta (exact) on top of int8 / bf16 ----
    sp_pf8 = SPADEDecoder(dataclasses.replace(
        CANONICAL.spade, int8_conv=True, phase_fold=True))
    sp_pf = SPADEDecoder(dataclasses.replace(
        CANONICAL.spade, phase_fold=True))
    sp_bf = SPADEDecoder(CANONICAL.spade)

    # ---- appearance / refine packed-3D chains ----
    from canonswap_tpu.models.appearance import AppearanceFeatureExtractor
    from canonswap_tpu.models.refine import RefineModule

    ap_i8 = AppearanceFeatureExtractor(dataclasses.replace(
        CANONICAL.appearance, int8_conv=True))
    ap_fc = AppearanceFeatureExtractor(dataclasses.replace(
        CANONICAL.appearance, fused_chain=True))
    ap_plain = AppearanceFeatureExtractor(CANONICAL.appearance)
    img = jax.random.uniform(jax.random.fold_in(k, 5), (B, 256, 256, 3), DT)
    app = _cached_init("appearance", lambda: ap_plain.init(
        jax.random.fold_in(k, 6), jnp.zeros((1, 256, 256, 3)), train=False))
    app = jax.device_put(_cast(app, DT), dev)

    rf_i8 = RefineModule(int8=True)
    rf_fc = RefineModule(fused_chain=True)
    rf_plain = RefineModule()
    vol2 = jax.random.normal(jax.random.fold_in(k, 8),
                             (B, 16, 64, 64, 32), DT)
    rfp = _cached_init("refine", lambda: rf_plain.init(
        jax.random.fold_in(k, 7),
        jnp.zeros((1, 16, 64, 64, 32)), train=False))
    rfp = jax.device_put(_cast(rfp, DT), dev)

    # XLA-only probes FIRST (bank the baselines before any Pallas chain
    # probe can wedge the relay)
    yield "swap_int8_blocks", (
        lambda v, l: sw_i8.apply(swp, v, l), (vol, lat))
    yield "spade_int8_blocks", (lambda f: sp_i8.apply(spp, f), (feat,))
    yield "spade_bf16", (lambda f: sp_bf.apply(spp, f), (feat,))
    yield "spade_int8_phasefold", (lambda f: sp_pf8.apply(spp, f), (feat,))
    yield "spade_phasefold", (lambda f: sp_pf.apply(spp, f), (feat,))
    # Pallas chain probes (full body, then the half-body k-split fallback)
    yield "swap_fused_chain", (
        lambda v, l: sw_fc.apply(swp, v, l), (vol, lat))
    yield "spade_fused_chain", (lambda f: sp_fc.apply(spp, f), (feat,))
    yield "swap_fused_chain_ks", (
        lambda v, l: sw_ks.apply(swp, v, l), (vol, lat))
    yield "spade_fused_chain_ks", (lambda f: sp_ks.apply(spp, f), (feat,))
    yield "appearance_int8", (
        lambda im: ap_i8.apply(app, im, train=False), (img,))
    yield "appearance_fused_chain", (
        lambda im: ap_fc.apply(app, im, train=False), (img,))
    yield "refine_int8", (
        lambda v: rf_i8.apply(rfp, v, train=False), (vol2,))
    yield "refine_fused_chain", (
        lambda v: rf_fc.apply(rfp, v, train=False), (vol2,))


def main():
    want = sys.argv[1:]
    out = open(os.path.join(os.path.dirname(__file__), os.environ.get("CANONSWAP_PROFILE_LOG", "profile_r4.jsonl")), "a")
    for name, (fn, inputs) in probes():
        if want and name not in want:
            continue
        try:
            with probe_timeout(int(os.environ.get(
                    "CANONSWAP_PROBE_TIMEOUT", "900"))):
                sec = scan_slope_time(fn, inputs)
            rec = {"stage": name, "ms_per_step": round(sec * 1000, 2),
                   "batch": B}
        except BaseException as e:  # noqa: BLE001 — record and continue
            rec = {"stage": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()


if __name__ == "__main__":
    main()


