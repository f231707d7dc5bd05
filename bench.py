"""Benchmark: swapped 512p frames/sec/chip for the CanonSwap-TPU core.

Measures the full per-frame generator program (motion extraction + appearance
encode + warp-to-canonical + identity injection + refine + warp-back + SPADE
decode to 512x512), batched over frames, bf16 compute.

Methodology: the remote-TPU relay in this environment makes per-call wall
timing unreliable (dispatch acks before execution).  So we run N chained
steps INSIDE one jitted lax.scan — each iteration's input depends on the
previous output — and time until a scalar derived from all outputs is
fetched to host.  Two scan lengths difference out fixed per-call overhead.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline = value / 60 (BASELINE.md target: >=60 frames/sec/chip).

Env knobs:
  CANONSWAP_BENCH_BATCH  frame batch size (default 16)
  CANONSWAP_BENCH_DTYPE  bf16 (default) | f32
  CANONSWAP_BENCH_N      long scan length (default 4; short = 1). Long
                         single programs can trip the TPU watchdog; keep <= 8.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/canonswap_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def make_scan_fn(core, n_steps: int):
    from canonswap_tpu.runtime import core as C

    @jax.jit
    def run(params, frames, source_id):
        def body(carry, _):
            f = carry
            motion = C.extract_motion(core, params, f)
            out = C.swap_step(core, params, f, source_id, motion)["out"]
            chk = jnp.mean(out.astype(jnp.float32))
            # feed a zero-scaled checksum back in: forces serialization
            f = f + (0.0 * chk).astype(f.dtype)
            return f, chk
        _, chks = jax.lax.scan(body, frames, None, length=n_steps)
        return jnp.sum(chks)

    return run


def timed(run, params, frames, sid) -> float:
    t0 = time.perf_counter()
    val = float(run(params, frames, sid))  # fetch forces full execution
    assert val == val, "NaN checksum"
    return time.perf_counter() - t0


def main():
    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.runtime import core as C

    dtype = {"bf16": jnp.bfloat16, "f32": jnp.float32}[
        os.environ.get("CANONSWAP_BENCH_DTYPE", "bf16")
    ]
    batch = int(os.environ.get("CANONSWAP_BENCH_BATCH", "16"))
    n_long = int(os.environ.get("CANONSWAP_BENCH_N", "4"))
    n_short = 1

    core = C.CanonSwapCore(CANONICAL)
    with jax.default_device(jax.devices("cpu")[0]):
        params_f32 = core.init_params(jax.random.PRNGKey(0))
    params = jax.device_put(_cast(params_f32, dtype), jax.devices()[0])
    del params_f32

    s = core.cfg.input_size
    frames = jnp.full((batch, s, s, 3), 0.5, dtype)
    sid = jnp.ones((batch, core.cfg.swap.latent_dim), dtype)

    run_long = make_scan_fn(core, n_long)
    run_short = make_scan_fn(core, n_short)

    # warmup / compile both
    timed(run_short, params, frames, sid)
    timed(run_long, params, frames, sid)

    t_short = min(timed(run_short, params, frames, sid) for _ in range(2))
    t_long = min(timed(run_long, params, frames, sid) for _ in range(2))
    step_time = (t_long - t_short) / (n_long - n_short)
    fps = batch / step_time
    print(
        f"# batch={batch} dtype={dtype.__name__} t_short={t_short:.3f}s "
        f"t_long={t_long:.3f}s step={step_time * 1000:.2f}ms",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "swapped_512p_frames_per_sec_per_chip(core_generator)",
                "value": round(fps, 2),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / 60.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
