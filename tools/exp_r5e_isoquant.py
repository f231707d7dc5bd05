"""Round-5 wave 5: isolate the bf16-quant _quantize_act effect on the XLA
W8A8 conv at 256^2 (wave-3 measured up1_gb_xlaq 1.58 ms; wave-4 with the
bf16-quant edit measured the identical shape q_gb_256_128_512_xlaq 5.64).

Measures both variants in one process, interleaved twice, to split the
edit's effect from chip/session noise.

Run:  python tools/exp_r5e_isoquant.py  -> appends profile_r5.jsonl
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax import lax

from ubench import scan_slope_time

DT = jnp.bfloat16
B = 16


def _quantize_weight(kernel):
    k32 = kernel.astype(jnp.float32)
    sw = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0 + 1e-12
    kq = jnp.clip(jnp.round(k32 / sw), -127, 127).astype(jnp.int8)
    return kq, sw


def _quant_act_f32(x):
    x32 = x.astype(jnp.float32)
    red = tuple(range(1, x.ndim))
    sx = jnp.max(jnp.abs(x32), axis=red) / 127.0 + 1e-12
    sb = sx.reshape((-1,) + (1,) * (x.ndim - 1))
    xq = jnp.clip(jnp.round(x32 / sb), -127, 127).astype(jnp.int8)
    return xq, sx


def _quant_act_bf16(x):
    red = tuple(range(1, x.ndim))
    sx = jnp.max(jnp.abs(x), axis=red).astype(jnp.float32) / 127.0 + 1e-12
    sb = sx.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
    xq = jnp.clip(jnp.round(x / sb), -127, 127).astype(jnp.int8)
    return xq, sx


def _w8a8(qact):
    def f(x, kernel):
        kq, sw = _quantize_weight(kernel)
        xq, sx = qact(x)
        acc = lax.conv_general_dilated(
            xq, kq, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        scale = sx[:, None, None, None] * sw[None, None, None, :]
        return (acc.astype(jnp.float32) * scale).astype(x.dtype)
    return f


def main():
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_r5.jsonl")
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (B, 256, 256, 128), DT)
    kern = jax.random.normal(jax.random.PRNGKey(2), (3, 3, 128, 512), DT) * 0.02

    variants = {
        "isoq_f32": jax.jit(_w8a8(_quant_act_f32)),
        "isoq_bf16": jax.jit(_w8a8(_quant_act_bf16)),
    }
    with open(out_path, "a") as out:
        for rep in (1, 2):
            for name, fn in variants.items():
                dtv = scan_slope_time(fn, (x, kern))
                rec = {"stage": f"{name}_rep{rep}",
                       "ms_per_step": round(dtv * 1000, 2), "batch": B}
                line = json.dumps(rec)
                print(line, flush=True)
                out.write(line + "\n")
                out.flush()


if __name__ == "__main__":
    main()
