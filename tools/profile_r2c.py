"""Round 3 measurements: packed-chain gains, fixed-harness re-measures,
Pallas-on-relay feasibility.  Appends to tools/profile_r2.jsonl."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax import lax

from ubench import cast_tree, scan_slope_time

DT = jnp.bfloat16
B = 16
R = jax.random


def _init_cpu(module, *args, **kwargs):
    with jax.default_device(jax.devices("cpu")[0]):
        f32 = [a.astype(jnp.float32) if hasattr(a, "astype") else a
               for a in args]
        p = module.init(jax.random.PRNGKey(0), *f32, **kwargs)
    return jax.device_put(cast_tree(p, DT), jax.devices()[0])


def stages():
    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.runtime import core as C

    rng = R.PRNGKey(0)
    cfg = CANONICAL
    core = C.CanonSwapCore(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params_f32 = core.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(cast_tree(params_f32, DT), jax.devices()[0])
    del params_f32

    s = cfg.input_size
    frames = jnp.full((B, s, s, 3), 0.5, DT)
    sid = jnp.ones((B, cfg.swap.latent_dim), DT)
    vol = R.normal(rng, (B, 16, 64, 64, 32), DT)

    # ---- Pallas feasibility on the relay ------------------------------------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dbl_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] * 2.0

    def dbl(x):
        return pl.pallas_call(
            dbl_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    xs = R.normal(rng, (256, 512), jnp.float32)
    yield "pallas_simple_vpu", (dbl, (xs,))

    def mm_kernel(a_ref, b_ref, o_ref):
        o_ref[:] = jnp.dot(a_ref[:], b_ref[:],
                           preferred_element_type=jnp.float32)

    def mm(a, b):
        return pl.pallas_call(
            mm_kernel,
            out_shape=jax.ShapeDtypeStruct((a.shape[0], b.shape[1]),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    yield "pallas_simple_mxu", (
        mm, (R.normal(rng, (512, 512), jnp.float32),
             R.normal(rng, (512, 512), jnp.float32)))

    # ---- re-measures with the fixed (unfoldable) harness ---------------------
    yield "e2e_swap_with_motion", (
        lambda p, f, i: C.swap_with_motion(core, p, f, i)[0]["out"],
        (params, frames, sid),
    )
    yield "appearance", (
        lambda p, f: C.appearance_features(core, p, f), (params, frames))
    yield "swap_module", (
        lambda p, v, i: core.swap.apply(p["transfer"], v, i),
        (params, vol, sid),
    )
    yield "refine", (
        lambda p, v: core.refine.apply(p["refine"], v), (params, vol))

    from canonswap_tpu.nn.conv3d import (Conv3D, conv3d_packed, conv3d_stacked,
                                         pack_hw2)

    k333 = R.normal(rng, (3, 3, 3, 32, 32), DT) * 0.05
    yield "conv3d_32_32_stacked_v2", (
        lambda x, k: conv3d_stacked(x, k), (vol, k333))
    volp = pack_hw2(vol)
    yield "conv3d_32_32_packedexec", (
        lambda x, k: conv3d_packed(x, k), (volp, k333))

    from canonswap_tpu.nn.blocks import instance_norm
    xm = R.normal(rng, (B, 64, 64, 512), DT)
    yield "instance_norm_512_64sq_v2", (lambda x: instance_norm(x), (xm,))

    # hourglass with direct convs, re-measured
    from canonswap_tpu.nn import conv3d as C3
    from canonswap_tpu.nn.blocks import Hourglass

    hg = Hourglass(block_expansion=32, in_features=110, num_blocks=5,
                   max_features=1024)
    hg_x = R.normal(rng, (B, 16, 64, 64, 110), DT)
    hg_p = _init_cpu(hg, hg_x[:1])
    yield "hourglass_stacked_v2", (lambda p, x: hg.apply(p, x), (hg_p, hg_x))
    C3.set_impl_override("direct")
    yield "hourglass_direct_v2", (lambda p, x: hg.apply(p, x), (hg_p, hg_x))
    yield "_clear_override", (lambda x: C3.set_impl_override(None) or x, (xs,))


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
            except Exception as e:
                rec = {"stage": name, "error": repr(e)[:300]}
            print(json.dumps(rec), flush=True)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()


if __name__ == "__main__":
    main()
