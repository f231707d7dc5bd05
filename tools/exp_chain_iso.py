"""Isolated bare-kernel probe for the fused W8A8 block chains.

Runs the Pallas chain kernels STANDALONE at CANONICAL shapes with random
prep arrays (no flax module, no CPU init) so a remote-compiler hang can be
attributed to the kernel itself rather than the surrounding program.

Run:  python tools/exp_chain_iso.py [health|spade|adaptive ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from ubench import probe_timeout, scan_slope_time

B = 16
H = W = 64
C = 512
DT = jnp.bfloat16


def probes():
    k = jax.random.PRNGKey(0)
    ks = jax.random.split(k, 16)

    def health():
        a = jnp.ones((256, 256), DT)
        t0 = time.time()
        (a @ a).block_until_ready()
        return time.time() - t0

    yield "relay_health", health

    from canonswap_tpu.ops.pallas.chain import adaptive_chain, spade_chain

    # ---- SPADE middle chain: nb=6, c=512, seg actv 128ch ----
    nb = 6
    x = jax.random.normal(ks[0], (B, H, W, C), DT)
    actv = jax.nn.relu(jax.random.normal(ks[1], (B, nb, 2, H, W, 128), DT))
    kgb = jax.random.randint(ks[2], (nb, 18, 128, 2 * C), -127, 127, jnp.int8)
    sgb = jnp.abs(jax.random.normal(ks[3], (nb, 2, 2 * C))) * 1e-3
    bgb = jax.random.normal(ks[4], (nb, 2, 2 * C)) * 0.05
    kcv = jax.random.randint(ks[5], (nb, 18, C, C), -127, 127, jnp.int8)
    scv = jnp.abs(jax.random.normal(ks[6], (nb, 2, C))) * 1e-3
    bcv = jax.random.normal(ks[7], (nb, 2, C)) * 0.05
    prep_s = (kgb, sgb, bgb, kcv, scv, bcv)

    def run_spade():
        return scan_slope_time(
            lambda xx, aa: spade_chain(xx, aa, prep_s), (x, actv))

    yield "spade_chain_iso", run_spade

    def run_spade_ks():
        return scan_slope_time(
            lambda xx, aa: spade_chain(xx, aa, prep_s, ksplit=True),
            (x, actv))

    yield "spade_chain_iso_ks", run_spade_ks

    # ---- adaptive chain: nb=7, c=512 ----
    na = 7
    style = 1.0 + 0.2 * jax.random.normal(ks[8], (B, na, 2, C))
    demod = jnp.abs(1.0 + 0.1 * jax.random.normal(ks[9], (B, na, 2, C)))
    kq = jax.random.randint(ks[10], (na, 18, C, C + 128), -127, 127, jnp.int8)
    sw = jnp.abs(jax.random.normal(ks[11], (na, 2, C + 128))) * 1e-3
    ba = jax.random.normal(ks[12], (na, 2, C + 128)) * 0.05
    prep_a = (style, demod, kq, sw, ba)

    def run_adaptive():
        return scan_slope_time(lambda xx: adaptive_chain(xx, prep_a), (x,))

    yield "adaptive_chain_iso", run_adaptive

    def run_adaptive_ks():
        return scan_slope_time(
            lambda xx: adaptive_chain(xx, prep_a, ksplit=True), (x,))

    yield "adaptive_chain_iso_ks", run_adaptive_ks


def main():
    want = sys.argv[1:]
    out = open(os.path.join(os.path.dirname(__file__), os.environ.get("CANONSWAP_PROFILE_LOG", "profile_r4.jsonl")), "a")
    for name, fn in probes():
        if want and name not in want:
            continue
        try:
            with probe_timeout(int(os.environ.get(
                    "CANONSWAP_PROBE_TIMEOUT", "900"))):
                sec = fn()
            rec = {"stage": name, "ms_per_step": round(sec * 1000, 2),
                   "batch": B}
        except Exception as e:  # noqa: BLE001 — record and continue
            rec = {"stage": name, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(rec), flush=True)
        out.write(json.dumps(rec) + "\n")
        out.flush()


if __name__ == "__main__":
    main()
