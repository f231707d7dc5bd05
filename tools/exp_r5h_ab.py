"""Round-5 wave 8: interleaved A/B timing for the zdense-vs-packed decision.

Separate-process timings of the same stage drift by 2-5x on this relay
(tools/profile_r5.jsonl shows refine_packed 31.4/52.8/72.7 across runs), so
pairwise conclusions from independent runs are worthless.  This tool times
the candidate forms INTERLEAVED in one process — A, B, A, B, ... — taking
the per-form minimum over rounds, so slow drift hits both arms equally.

Run:  python tools/exp_r5h_ab.py <group> [rounds]
      groups: refine | swap | appearance
Appends records {"stage": "ab_<name>", "ms": [...], "ms_min": m} to
profile_r5.jsonl.
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
from canonswap_tpu.models.swap import SwapModule

DT = jnp.bfloat16
B = 16
D, H, W, C = 16, 64, 64, 32
LOG = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "profile_r5.jsonl")


def _cast(tree):
    return jax.tree.map(
        lambda x: x.astype(DT) if jnp.issubdtype(x.dtype, jnp.floating)
        else x, tree)


def group_refine():
    vol = jax.random.normal(jax.random.PRNGKey(0), (B, D, H, W, C), DT)
    with jax.default_device(jax.devices("cpu")[0]):
        p = _cast(RefineModule().init(
            jax.random.PRNGKey(1), jnp.zeros((1, D, H, W, C))))
    forms = {
        "refine_packed": RefineModule(),
        "refine_zdense": RefineModule(conv3d_impl="zdense", slab_channels=C),
        "refine_packed_int8": RefineModule(int8=True),
        "refine_zdense_int8": RefineModule(conv3d_impl="zdense",
                                           slab_channels=C, int8=True),
    }
    return {k: (lambda pp, v, m=m: m.apply(pp, v), (p, vol))
            for k, m in forms.items()}


def group_swap():
    vol = jax.random.normal(jax.random.PRNGKey(0), (B, D, H, W, C), DT)
    lat = jnp.ones((B, CANONICAL.swap.latent_dim), DT)
    with jax.default_device(jax.devices("cpu")[0]):
        p = _cast(SwapModule(CANONICAL.swap).init(
            jax.random.PRNGKey(2), jnp.zeros((1, D, H, W, C)),
            jnp.zeros((1, CANONICAL.swap.latent_dim))))
    i8 = dataclasses.replace(CANONICAL.swap, int8_conv=True)
    forms = {
        "swap_bf16_packed": SwapModule(CANONICAL.swap),
        "swap_bf16_zdense": SwapModule(dataclasses.replace(
            CANONICAL.swap, conv3d_impl="zdense")),
        "swap_int8_packed": SwapModule(i8),
        "swap_int8_zdense": SwapModule(dataclasses.replace(
            i8, conv3d_impl="zdense")),
    }
    return {k: (lambda pp, v, l, m=m: m.apply(pp, v, l), (p, vol, lat))
            for k, m in forms.items()}


def group_appearance():
    img = jax.random.uniform(
        jax.random.PRNGKey(3), (B, 256, 256, 3)).astype(DT)
    with jax.default_device(jax.devices("cpu")[0]):
        p = _cast(AppearanceFeatureExtractor(CANONICAL.appearance).init(
            jax.random.PRNGKey(4), jnp.zeros((1, 256, 256, 3))))
    i8 = dataclasses.replace(CANONICAL.appearance, int8_conv=True)
    forms = {
        "app_bf16_packed": AppearanceFeatureExtractor(CANONICAL.appearance),
        "app_bf16_zdense": AppearanceFeatureExtractor(
            dataclasses.replace(CANONICAL.appearance, conv3d_impl="zdense")),
        "app_int8_packed": AppearanceFeatureExtractor(i8),
        "app_int8_zdense": AppearanceFeatureExtractor(
            dataclasses.replace(i8, conv3d_impl="zdense")),
    }
    return {k: (lambda pp, i, m=m: m.apply(pp, i), (p, img))
            for k, m in forms.items()}


def main():
    group = sys.argv[1]
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    forms = {"refine": group_refine, "swap": group_swap,
             "appearance": group_appearance}[group]()
    jitted = {k: (jax.jit(fn), inputs) for k, (fn, inputs) in forms.items()}
    times: dict[str, list[float]] = {k: [] for k in jitted}
    for r in range(rounds):
        for k, (fn, inputs) in jitted.items():
            dt = scan_slope_time(fn, inputs) * 1000
            times[k].append(round(dt, 2))
            print(f"# round {r} {k}: {dt:.2f} ms", file=sys.stderr)
    with open(LOG, "a") as out:
        for k, ms in times.items():
            rec = {"stage": f"ab_{k}", "ms": ms,
                   "ms_min": min(m for m in ms if m > 0) if any(
                       m > 0 for m in ms) else None}
            line = json.dumps(rec)
            print(line, flush=True)
            out.write(line + "\n")


if __name__ == "__main__":
    main()
