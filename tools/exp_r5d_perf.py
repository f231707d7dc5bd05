"""Round-5 wave 4: re-tune the int8 conv routing.

Wave-3 found the router inverted at 256^2: the XLA W8A8 conv runs the
up_1 gamma/beta shape at 1.58 ms where the Pallas fused qconv takes 9.01
and bf16 7.64 (profile_r5.jsonl up1_gb_*) — `_pallas_qconv_ok` has been
sending every >=128^2 aligned conv to the slow kernel, which is why SPADE
up-block int8 "regressed" in r4 and the up blocks run bf16 today.

Probes every SPADE/up conv shape across {bf16, xlaq, pallasq} and then the
integrated decoder/swap with the corrected routing.

Run:  python tools/exp_r5d_perf.py [stage ...]  -> appends profile_r5.jsonl
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


def _zeros_init(module, *args, **kwargs):
    f32 = [jax.tree.map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "astype") else a, x)
        for x in args]
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *f32, **kwargs))
    dev = jax.devices()[0]
    return jax.tree.map(
        lambda s: jax.device_put(
            jnp.zeros(s.shape, DT if jnp.issubdtype(s.dtype, jnp.floating)
                      else s.dtype), dev), shapes)


def stages():
    sel = set(sys.argv[1:])

    def want(*names):
        return not sel or any(n in sel for n in names)

    from canonswap_tpu.ops.qconv import conv2d_w8a8

    rng = jax.random.PRNGKey(1)

    # ---- shape sweep: every big conv in the SPADE decoder ---------------
    shapes = {
        # (tag, H, Cin, Cout, k)
        "gb_256_128_512": (256, 128, 512, 3),   # up_1 norm_s/norm_0 gamma+beta
        "gb_256_128_128": (256, 128, 128, 3),   # up_1 norm_1 gamma+beta
        "c0_256_256_64": (256, 256, 64, 3),     # up_1 conv_0
        "c1_256_64_64": (256, 64, 64, 3),       # up_1 conv_1
        "gb_128_128_1024": (128, 128, 1024, 3),  # up_0 norm gb
        "c0_128_512_256": (128, 512, 256, 3),   # up_0 conv_0
        "gb_64_128_1024": (64, 128, 1024, 3),   # middle norm gb
        "img_256_64_12": (256, 64, 12, 3),      # conv_img head
    }
    for tag, (h, cin, cout, k) in shapes.items():
        if not want(f"q_{tag}_bf16", f"q_{tag}_xlaq", f"q_{tag}_pallasq"):
            continue
        x = jax.random.normal(rng, (B, h, h, cin), DT)
        kern = jax.random.normal(
            jax.random.PRNGKey(2), (k, k, cin, cout), DT) * 0.02
        if want(f"q_{tag}_bf16"):
            yield f"q_{tag}_bf16", (
                lambda a, kk: lax.conv_general_dilated(
                    a, kk, (1, 1), "SAME", dimension_numbers=_DN), (x, kern))
        if want(f"q_{tag}_xlaq"):
            yield f"q_{tag}_xlaq", (
                lambda a, kk: conv2d_w8a8(a, kk), (x, kern))
        if want(f"q_{tag}_pallasq") and h >= 128 and cin % 128 == 0 \
                and cout % 128 == 0:
            from canonswap_tpu.ops.pallas.qconv import qconv2d_pallas

            yield f"q_{tag}_pallasq", (
                lambda a, kk: qconv2d_pallas(a, kk, None), (x, kern))

    # ---- integrated: SPADE decoder with corrected routing ---------------
    if want("spade_int8_tuned", "spade_int8_tuned_up", "spade_bf16_v2"):
        import canonswap_tpu.ops.qconv as Q
        from canonswap_tpu.configs.model_config import CANONICAL
        from canonswap_tpu.models.spade_decoder import SPADEDecoder

        feat = jax.random.normal(rng, (B, 64, 64, 256), DT)

        def tuned(x):
            return x.shape[-1] >= 128  # xlaq wherever channels fill lanes

        def run_variant(tag, int8, up_int8, worthwhile, pallas):
            import dataclasses as dc

            os.environ["CANONSWAP_PALLAS_QCONV"] = "1" if pallas else "0"
            old = Q.int8_worthwhile
            Q.int8_worthwhile = worthwhile
            try:
                cfgs = dc.replace(CANONICAL.spade, int8_conv=int8)
                if up_int8 and hasattr(cfgs, "int8_up"):
                    cfgs = dc.replace(cfgs, int8_up=True)
                m = SPADEDecoder(cfgs)
                p = _zeros_init(m, feat)
                dtv = scan_slope_time(
                    jax.jit(lambda p, f: m.apply(p, f)), (p, feat))
                return {"stage": tag, "ms_per_step": round(dtv * 1000, 2),
                        "batch": B}
            finally:
                Q.int8_worthwhile = old
                os.environ["CANONSWAP_PALLAS_QCONV"] = "1"

        if want("spade_bf16_v2"):
            yield "spade_bf16_v2", run_variant, (
                "spade_bf16_v2", False, False, Q.int8_worthwhile, True)
        if want("spade_int8_tuned"):
            yield "spade_int8_tuned", run_variant, (
                "spade_int8_tuned", True, False, tuned, False)
        if want("spade_int8_tuned_up"):
            yield "spade_int8_tuned_up", run_variant, (
                "spade_int8_tuned_up", True, True, tuned, False)

    # ---- integrated: swap with bf16 quant math (already in qconv) -------
    if want("swap_int8_v3"):
        import dataclasses as dc

        from canonswap_tpu.configs.model_config import CANONICAL
        from canonswap_tpu.models.swap import SwapModule

        vol = jax.random.normal(rng, (B, 16, 64, 64, 32), DT)
        lat = jax.random.normal(jax.random.PRNGKey(8), (B, 512), DT)
        m = SwapModule(dc.replace(CANONICAL.swap, int8_conv=True))
        p = _zeros_init(m, vol, lat)
        yield "swap_int8_v3", (
            lambda p, v, s, m=m: m.apply(p, v, s), (p, vol, lat))


def main():
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_r5.jsonl")
    with open(out_path, "a") as out:
        for item in stages():
            if len(item) == 3:  # deferred runner (env/monkeypatch variants)
                name, runner, args = item
                try:
                    rec = runner(*args)
                except Exception as e:  # noqa: BLE001
                    rec = {"stage": name, "error": repr(e)[:300]}
            else:
                name, (fn, inputs) = item
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
