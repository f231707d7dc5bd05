"""Round-5 wave 7: module-level cost of the new levers on real shapes.

  - refine / swap / appearance with conv3d_impl = packed vs zdense
    (nn/conv3d.conv3d_zdense — exact block-banded dense form)
  - SPADE decoder with the round-5 qconv re-route (Pallas qconv off,
    up_0 int8 on) vs the round-4 int8-tuned config

Run:  python tools/exp_r5g_modules.py [stage ...]  -> appends profile_r5.jsonl
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

jax.config.update("jax_compilation_cache_dir", "/tmp/canonswap_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ubench import scan_slope_time

from canonswap_tpu.configs.model_config import CANONICAL
from canonswap_tpu.models.appearance import AppearanceFeatureExtractor
from canonswap_tpu.models.refine import RefineModule
from canonswap_tpu.models.spade_decoder import SPADEDecoder
from canonswap_tpu.models.swap import SwapModule

DT = jnp.bfloat16
B = 16
D, H, W, C = 16, 64, 64, 32


def _cast(tree):
    return jax.tree.map(
        lambda x: x.astype(DT) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree)


def stages():
    sel = set(sys.argv[1:])

    def want(*names):
        return not sel or any(n in sel for n in names)

    rng = jax.random.PRNGKey(0)
    vol = jax.random.normal(rng, (B, D, H, W, C), DT)
    with jax.default_device(jax.devices("cpu")[0]):
        ref_p = _cast(RefineModule().init(
            jax.random.PRNGKey(1), jnp.zeros((1, D, H, W, C))))

    if want("refine_packed"):
        m = RefineModule()
        yield "refine_packed_v3", (
            lambda p, v: m.apply(p, v), (ref_p, vol))
    if want("refine_zdense"):
        m = RefineModule(conv3d_impl="zdense", slab_channels=C)
        yield "refine_zdense", (
            lambda p, v: m.apply(p, v), (ref_p, vol))
    if want("refine_zdense_int8"):
        m = RefineModule(conv3d_impl="zdense", slab_channels=C, int8=True)
        yield "refine_zdense_int8", (
            lambda p, v: m.apply(p, v), (ref_p, vol))
    if want("refine_packed_int8"):
        m = RefineModule(int8=True)
        yield "refine_packed_int8", (
            lambda p, v: m.apply(p, v), (ref_p, vol))

    lat = jnp.ones((B, CANONICAL.swap.latent_dim), DT)
    with jax.default_device(jax.devices("cpu")[0]):
        sw_p = _cast(SwapModule(CANONICAL.swap).init(
            jax.random.PRNGKey(2), jnp.zeros((1, D, H, W, C)),
            jnp.zeros((1, CANONICAL.swap.latent_dim))))
    sw_int8 = dataclasses.replace(CANONICAL.swap, int8_conv=True)
    if want("swap_packed"):
        m = SwapModule(sw_int8)
        yield "swap_int8_v4", (
            lambda p, v, l: m.apply(p, v, l), (sw_p, vol, lat))
    if want("swap_zdense"):
        m = SwapModule(dataclasses.replace(sw_int8, conv3d_impl="zdense"))
        yield "swap_int8_zdense", (
            lambda p, v, l: m.apply(p, v, l), (sw_p, vol, lat))
    if want("swap_zdense_bf16"):
        m = SwapModule(dataclasses.replace(CANONICAL.swap,
                                           conv3d_impl="zdense"))
        yield "swap_bf16_zdense", (
            lambda p, v, l: m.apply(p, v, l), (sw_p, vol, lat))

    img = jax.random.uniform(jax.random.PRNGKey(3), (B, 256, 256, 3)).astype(DT)
    with jax.default_device(jax.devices("cpu")[0]):
        ap_p = _cast(AppearanceFeatureExtractor(CANONICAL.appearance).init(
            jax.random.PRNGKey(4), jnp.zeros((1, 256, 256, 3))))
    ap_int8 = dataclasses.replace(CANONICAL.appearance, int8_conv=True)
    if want("appearance_packed"):
        m = AppearanceFeatureExtractor(ap_int8)
        yield "appearance_int8_v2", (
            lambda p, i: m.apply(p, i), (ap_p, img))
    if want("appearance_zdense"):
        m = AppearanceFeatureExtractor(
            dataclasses.replace(ap_int8, conv3d_impl="zdense"))
        yield "appearance_int8_zdense", (
            lambda p, i: m.apply(p, i), (ap_p, img))
    if want("appearance_bf16"):
        m = AppearanceFeatureExtractor(CANONICAL.appearance)
        yield "appearance_bf16_v2", (
            lambda p, i: m.apply(p, i), (ap_p, img))
    if want("appearance_bf16_zdense"):
        m = AppearanceFeatureExtractor(
            dataclasses.replace(CANONICAL.appearance, conv3d_impl="zdense"))
        yield "appearance_bf16_zdense", (
            lambda p, i: m.apply(p, i), (ap_p, img))
    if want("swap_packed_bf16"):
        m = SwapModule(CANONICAL.swap)
        yield "swap_bf16_v2", (
            lambda p, v, l: m.apply(p, v, l), (sw_p, vol, lat))

    feat = jax.random.normal(jax.random.PRNGKey(5), (B, 64, 64, 256), DT)
    with jax.default_device(jax.devices("cpu")[0]):
        sp_p = _cast(SPADEDecoder(CANONICAL.spade).init(
            jax.random.PRNGKey(6), jnp.zeros((1, 64, 64, 256))))
    if want("spade_bf16"):
        m = SPADEDecoder(CANONICAL.spade)
        yield "spade_bf16_v3", (
            lambda p, f: m.apply(p, f), (sp_p, feat))
    if want("spade_int8"):
        # round-5 route: pallas qconv off by default, up_0 int8 via xlaq
        m = SPADEDecoder(dataclasses.replace(CANONICAL.spade, int8_conv=True))
        yield "spade_int8_r5", (
            lambda p, f: m.apply(p, f), (sp_p, feat))
    if want("spade_int8_pallasq"):
        os.environ["CANONSWAP_PALLAS_QCONV"] = "1"
        m = SPADEDecoder(dataclasses.replace(CANONICAL.spade, int8_conv=True))
        yield "spade_int8_pallasq", (
            lambda p, f: m.apply(p, f), (sp_p, feat))


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
