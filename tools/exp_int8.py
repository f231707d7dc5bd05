"""Int8 conv feasibility on the v5e relay: does XLA lower s8xs8->s32 convs
to the MXU at ~2x the bf16 rate for our hot shapes?

Shapes probed:
  - 512->512 3x3 @ 64^2 (swap/SPADE middle blocks)
  - 256->64 3x3 @ 256^2 (SPADE up_1)
  - packed 128->128 3x3 @ (16x32x32) (32ch volume chains, s2d packed)

Each probe: bf16 baseline, raw int8 conv, and the full W8A8 path with
dynamic activation scale + dequant epilogue (what production would run).

Usage: python tools/exp_int8.py [name ...]
Appends to tools/profile_r3.jsonl.
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
_DN = ("NHWC", "HWIO", "NHWC")


def conv_bf16(x, k, b):
    y = lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=_DN)
    return y + b


def conv_int8_raw(xq, kq):
    """Pre-quantized int8 operands -> int32 accumulators (pure MXU probe)."""
    return lax.conv_general_dilated(
        xq, kq, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )


def conv_w8a8(x, k, b):
    """Production W8A8: per-tensor dynamic activation scale, per-output-
    channel weight scale, int32 accum, fused dequant epilogue."""
    sx = jnp.max(jnp.abs(x)).astype(jnp.float32) / 127.0 + 1e-12
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127, 127
                  ).astype(jnp.int8)
    sw = jnp.max(jnp.abs(k).astype(jnp.float32), axis=(0, 1, 2)) / 127.0 + 1e-12
    kq = jnp.clip(jnp.round(k.astype(jnp.float32) / sw), -127, 127
                  ).astype(jnp.int8)
    acc = lax.conv_general_dilated(
        xq, kq, (1, 1), "SAME", dimension_numbers=_DN,
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (sx * sw) + b.astype(jnp.float32)
            ).astype(x.dtype)


def probes():
    shapes = {
        "s512_64": ((B, 64, 64, 512), (3, 3, 512, 512)),
        "s256_256": ((B, 256, 256, 256), (3, 3, 256, 64)),
        "pack128": ((B * 16, 32, 32, 128), (3, 3, 128, 128)),
    }
    for tag, (xs, ks) in shapes.items():
        x = jax.random.normal(jax.random.PRNGKey(0), xs, DT)
        k = jax.random.normal(jax.random.PRNGKey(1), ks, DT) * 0.05
        b = jnp.zeros((ks[-1],), DT)
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 8), -127, 127
                      ).astype(jnp.int8)
        kq = jnp.clip(jnp.round(k.astype(jnp.float32) * 256), -127, 127
                      ).astype(jnp.int8)
        yield f"conv_bf16_{tag}", (conv_bf16, (x, k, b))
        yield f"conv_i8raw_{tag}", (conv_int8_raw, (xq, kq))
        yield f"conv_w8a8_{tag}", (conv_w8a8, (x, k, b))


def main():
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.environ.get("CANONSWAP_PROFILE_LOG", "profile_r4.jsonl"))
    with open(out_path, "a") as fh:
        for name, (fn, inputs) in probes():
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
