"""Benchmark: swapped 512p frames/sec/chip for the CanonSwap-TPU core.

Measures the full per-frame generator program (motion extraction + appearance
encode + warp-to-canonical + identity injection + refine + warp-back + SPADE
decode to 512x512) on the attached TPU chip, batched over frames, bf16
compute (the TPU-native inference precision; fp32 params are cast once).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 60 (the BASELINE.md target of >=60 frames/sec/chip).

Env knobs:
  CANONSWAP_BENCH_BATCH  frame batch size (default autotuned over 4/8/16)
  CANONSWAP_BENCH_DTYPE  bf16 (default) | f32
  CANONSWAP_BENCH_ITERS  timed iterations (default 20)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp


def _cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def bench_batch(core, params, batch, dtype, iters):
    from canonswap_tpu.runtime import core as C

    s = core.cfg.input_size
    frames = jnp.full((batch, s, s, 3), 0.5, dtype)
    source_id = jnp.ones((batch, core.cfg.swap.latent_dim), dtype)

    @jax.jit
    def step(params, frames, source_id):
        motion = C.extract_motion(core, params, frames)
        return C.swap_step(core, params, frames, source_id, motion)["out"]

    out = step(params, frames, source_id)
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(params, frames, source_id)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.runtime import core as C

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        os.environ.get("CANONSWAP_BENCH_DTYPE", "bf16")
    ]
    iters = int(os.environ.get("CANONSWAP_BENCH_ITERS", "20"))

    core = C.CanonSwapCore(CANONICAL)
    with jax.default_device(jax.devices("cpu")[0]):
        params_f32 = core.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(_cast(params_f32, dtype), jax.devices()[0])
    del params_f32

    env_batch = os.environ.get("CANONSWAP_BENCH_BATCH")
    batches = [int(env_batch)] if env_batch else [4, 8, 16]
    best = 0.0
    for b in batches:
        fps = bench_batch(core, params, b, dtype, iters)
        print(f"# batch={b}: {fps:.2f} frames/s", file=sys.stderr)
        best = max(best, fps)

    print(
        json.dumps(
            {
                "metric": "swapped_512p_frames_per_sec_per_chip(core_generator)",
                "value": round(best, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(best / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
