"""Round-4 stage isolations: where do SPADE / swap / refine / appearance
spend their time vs the conv floor?

Targets the VERDICT-r3 gap to >=60 fps: the packed res3d chains measure ~2x
their MXU floor and spade_int8 showed no win over bf16 in the last
profile_stages run — this tool isolates each sub-chain so the overhead has
an address.  Zero-weight eval_shape init (no CPU forward — the single host
core is usually busy), scan-slope timing (ubench).

Run:  python tools/exp_r4_perf.py [stage ...]   -> appends tools/profile_r4.jsonl
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

from ubench import scan_slope_time

DT = jnp.bfloat16
B = 16


def _zeros_init(module, *args, **kwargs):
    """Param tree of device zeros with the right shapes/dtypes — no real
    init forward (data-independent conv timing; quantize scales clamp at
    epsilon)."""
    f32 = [a.astype(jnp.float32) if hasattr(a, "astype") else a
           for a in args]
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *f32, **kwargs))
    dev = jax.devices()[0]
    return jax.tree.map(
        lambda s: jax.device_put(
            jnp.zeros(s.shape, DT if jnp.issubdtype(s.dtype, jnp.floating)
                      else s.dtype), dev), shapes)


def stages():
    import dataclasses as dc

    from flax import linen as nn

    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.models.appearance import AppearanceFeatureExtractor
    from canonswap_tpu.models.refine import RefineModule
    from canonswap_tpu.models.spade_decoder import SPADEDecoder
    from canonswap_tpu.models.swap import AdaptiveResBlock2d, SwapModule
    from canonswap_tpu.nn.blocks import (
        ResBlock2d, ResBlock3d, ResBlock3dLeakGN, SPADEResnetBlock,
    )
    from canonswap_tpu.nn.conv3d import conv3d_packed, pack_hw2, unpack_hw2

    cfg = CANONICAL
    rng = jax.random.PRNGKey(1)
    feat2d = jax.random.normal(rng, (B, 64, 64, 256), DT)
    vol = jax.random.normal(rng, (B, 16, 64, 64, 32), DT)
    volp = pack_hw2(vol)
    sid = jnp.ones((B, 512), DT)

    # ---- conv floor references ---------------------------------------
    k3 = jax.random.normal(rng, (3, 3, 3, 32, 32), DT) * 0.02

    def bare12(xp, k):
        for _ in range(12):
            xp = conv3d_packed(xp, k)
        return xp

    def bare12_int8(xp, k):
        for _ in range(12):
            xp = conv3d_packed(xp, k, int8=True)
        return xp

    yield "c3dp_bare12", (bare12, (volp, k3))
    yield "c3dp_bare12_int8", (bare12_int8, (volp, k3))

    # ---- res3d resblock chains (swap/appearance style: BN-relu) -------
    for tag, q in (("res3d6", False), ("res3d6_int8", True)):
        ch = _Chain(lambda i, q=q: ResBlock3d(
            name=f"b{i}", packed=True, int8=q), 6)
        p = _zeros_init(ch, volp)
        yield tag, (lambda p, x, ch=ch: ch.apply(p, x), (p, volp))

    # ---- refine-style GN chains ---------------------------------------
    for tag, q in (("res3dgn6", False), ("res3dgn6_int8", True)):
        ch = _Chain(lambda i, q=q: ResBlock3dLeakGN(
            32, name=f"b{i}", packed=True, int8=q), 6)
        p = _zeros_init(ch, volp)
        yield tag, (lambda p, x, ch=ch: ch.apply(p, x), (p, volp))

    # ---- refine 2D middle (3 x ResBlock2d at 64^2 x 512) --------------
    x512 = jax.random.normal(rng, (B, 64, 64, 512), DT)
    for tag, q in (("res2d3_512", False), ("res2d3_512_int8", True)):
        ch = _Chain(lambda i, q=q: ResBlock2d(name=f"b{i}", int8=q), 3)
        p = _zeros_init(ch, x512)
        yield tag, (lambda p, x, ch=ch: ch.apply(p, x), (p, x512))

    # ---- full modules (re-measure in THIS process for comparability) --
    for tag, q in (("refine_bf16", False), ("refine_int8", True)):
        m = RefineModule(int8=q)
        p = _zeros_init(m, vol)
        yield tag, (lambda p, v, m=m: m.apply(p, v), (p, vol))

    for tag, q in (("appearance_bf16", False), ("appearance_int8", True)):
        m = AppearanceFeatureExtractor(dc.replace(cfg.appearance, int8_conv=q))
        frames = jnp.full((B, 256, 256, 3), 0.5, DT)
        p = _zeros_init(m, frames)
        yield tag, (lambda p, f, m=m: m.apply(p, f), (p, frames))

    for tag, q in (("swap_bf16", False), ("swap_int8", True)):
        m = SwapModule(dc.replace(cfg.swap, int8_conv=q))
        p = _zeros_init(m, vol, sid)
        yield tag, (lambda p, v, i, m=m: m.apply(p, v, i), (p, vol, sid))

    # swap sub-chains: 7 adaptive 2D blocks at 64^2 x 512 / 6 res3d packed
    for tag, q in (("adaptive7", False), ("adaptive7_int8", True)):
        ch = _ChainL(lambda i, q=q: AdaptiveResBlock2d(
            512, 512, int8=q, name=f"b{i}"), 7)
        p = _zeros_init(ch, x512, sid)
        yield tag, (lambda p, x, s, ch=ch: ch.apply(p, x, s), (p, x512, sid))

    # ---- SPADE decoder + isolations ------------------------------------
    for tag, scfg in (
        ("spade_bf16", cfg.spade),
        ("spade_int8", dc.replace(cfg.spade, int8_conv=True)),
        ("spade_int8_ns2", dc.replace(cfg.spade, int8_conv=True,
                                      norm_scale=2)),
        ("spade_bf16_ns2", dc.replace(cfg.spade, norm_scale=2)),
    ):
        m = SPADEDecoder(scfg)
        p = _zeros_init(m, feat2d)
        yield tag, (lambda p, f, m=m: m.apply(p, f), (p, feat2d))

    # fc + 6 middles only (64^2)
    for tag, q in (("spade_mid6", False), ("spade_mid6_int8", True)):
        m = _SpadeMid(int8=q)
        p = _zeros_init(m, feat2d)
        yield tag, (lambda p, f, m=m: m.apply(p, f), (p, feat2d))

    # up_0 only: input 128^2 x 512, seg 64^2 x 256
    x_up0 = jax.random.normal(rng, (B, 128, 128, 512), DT)
    for tag, q, ns in (("spade_up0", False, 1), ("spade_up0_int8", True, 1),
                       ("spade_up0_int8_ns2", True, 2)):
        m = SPADEResnetBlock(512, 256, int8=q, norm_scale=ns)
        p = _zeros_init(m, x_up0, feat2d)
        yield tag, (lambda p, x, s, m=m: m.apply(p, x, s),
                    (p, x_up0, feat2d))

    # up_1 only: input 256^2 x 256
    x_up1 = jax.random.normal(rng, (B, 256, 256, 256), DT)
    for tag, q, ns in (("spade_up1", False, 1), ("spade_up1_int8", True, 1),
                       ("spade_up1_int8_ns2", True, 2)):
        m = SPADEResnetBlock(256, 64, int8=q, norm_scale=ns)
        p = _zeros_init(m, x_up1, feat2d)
        yield tag, (lambda p, x, s, m=m: m.apply(p, x, s),
                    (p, x_up1, feat2d))

    # img head: leaky + conv_img + pixel-shuffle + sigmoid at 256^2 x 64
    x_img = jax.random.normal(rng, (B, 256, 256, 64), DT)
    ki = jax.random.normal(rng, (3, 3, 64, 12), DT) * 0.02

    def img_head(x, k):
        from canonswap_tpu.ops.resize import pixel_shuffle

        y = jax.lax.conv_general_dilated(
            nn.leaky_relu(x, 0.2), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jax.nn.sigmoid(pixel_shuffle(y, 2))

    yield "spade_img_head", (img_head, (x_img, ki))

    # ---- v2 re-measurements (fused boundary converters, res-aware SPADE
    # int8) + the whole swap->refine packed handoff --------------------
    m = SPADEDecoder(dc.replace(cfg.spade, int8_conv=True))
    p = _zeros_init(m, feat2d)
    yield "spade_int8_v2", (lambda p, f, m=m: m.apply(p, f), (p, feat2d))

    sw = SwapModule(dc.replace(cfg.swap, int8_conv=True))
    rf = RefineModule(int8=True)
    psw = _zeros_init(sw, vol, sid)
    prf = _zeros_init(rf, vol)

    yield "swap_int8_v2", (
        lambda p, v, i, sw=sw: sw.apply(p, v, i), (psw, vol, sid))

    def swapref(psw, prf, v, i):
        x = sw.apply(psw, v, i, packed_out=True)
        return rf.apply(prf, x, packed_in=True)

    yield "swapref_int8_packed", (swapref, (psw, prf, vol, sid))

    # ---- can the Pallas fused W8A8 kernel win at 64^2 too? ------------
    from canonswap_tpu.ops.pallas.qconv import qconv2d_pallas
    from canonswap_tpu.ops.qconv import conv2d_w8a8

    x64a = jax.random.normal(rng, (32, 64, 64, 512), DT)  # adaptive stacked
    k64a = jax.random.normal(rng, (3, 3, 512, 512), DT) * 0.02
    x64m = jax.random.normal(rng, (B, 64, 64, 128), DT)  # middle gamma/beta
    k64m = jax.random.normal(rng, (3, 3, 128, 1024), DT) * 0.02
    from jax import lax as _lax

    def bf16c(x, k):
        return _lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    for tag, xx, kk in (("qc64_adaptive", x64a, k64a),
                        ("qc64_midgb", x64m, k64m)):
        yield f"{tag}_bf16", (bf16c, (xx, kk))
        yield f"{tag}_w8a8", (conv2d_w8a8, (xx, kk))
        yield f"{tag}_pallas", (qconv2d_pallas, (xx, kk))

    # ---- one warping pass at fast / exact settings ----------------------
    from canonswap_tpu.models.warping import WarpingNetwork

    kp1 = jax.random.normal(rng, (B, 21, 3), DT) * 0.1
    kp2 = kp1 + jax.random.normal(jax.random.PRNGKey(9), (B, 21, 3),
                                  DT) * 0.05
    for tag, wi, fsc in (("warp_site_fast", "pallas_quant", 2),
                         ("warp_site_exact", "pallas", 1),
                         ("warp_site_packedgather", "packed", 1)):
        wn = WarpingNetwork(dc.replace(cfg.warping, warp_impl=wi,
                                       dense_motion_scale=fsc))
        pw = _zeros_init(wn, vol, kp_driving=kp1, kp_source=kp2)
        yield tag, (
            lambda p, v, a, b2, wn=wn: wn.apply(
                p, v, kp_driving=a, kp_source=b2), (pw, vol, kp1, kp2))

    # ---- sidecar split: 203-landmark trunk vs Segformer parse ----------
    from canonswap_tpu.models.landmark import Landmark203Runner
    from canonswap_tpu.models.parsing import (
        Segformer, SegformerConfig, preprocess,
    )

    lmk = Landmark203Runner(rng=jax.random.PRNGKey(2))
    crop224 = jnp.full((B, 224, 224, 3), 127.0, DT)
    lp = jax.tree.map(lambda a: a.astype(DT) if hasattr(a, "astype") else a,
                      lmk.params)
    yield "lmk203_224", (
        lambda p, x: lmk.net.apply(p, x), (lp, crop224))

    seg = Segformer(SegformerConfig())
    for res in (512, 256):
        big = jnp.full((B, res, res, 3), 0.5, DT)
        sp = _zeros_init(seg, preprocess(big.astype(jnp.float32)))
        yield f"segformer_{res}", (
            lambda p, x, seg=seg: seg.apply(p, preprocess(x)), (sp, big))


class _Chain:
    """N copies of a single-arg block as one flax module."""

    def __init__(self, mk, n):
        from flax import linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, x):
                for i in range(n):
                    x = mk(i)(x)
                return x

        self._m = M()

    def __getattr__(self, a):
        return getattr(self._m, a)


class _ChainL:
    """N copies of an (x, latent) block as one flax module."""

    def __init__(self, mk, n):
        from flax import linen as nn

        class M(nn.Module):
            @nn.compact
            def __call__(self, x, lat):
                for i in range(n):
                    x, _ = mk(i)(x, lat)
                return x

        self._m = M()

    def __getattr__(self, a):
        return getattr(self._m, a)


def _spade_mid():
    from flax import linen as nn

    from canonswap_tpu.nn.blocks import SPADEResnetBlock

    class M(nn.Module):
        int8: bool = False

        @nn.compact
        def __call__(self, feature):
            x = nn.Conv(512, (3, 3), padding="SAME", name="fc")(feature)
            for i in range(6):
                x = SPADEResnetBlock(512, 512, int8=self.int8,
                                     name=f"G_middle_{i}")(x, feature)
            return x

    return M


_SpadeMid = _spade_mid()


def main():
    sel = sys.argv[1:]
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_r4.jsonl")
    with open(out_path, "a") as out:
        for name, (fn, inputs) in stages():
            if sel and name not in sel:
                continue
            try:
                dt = scan_slope_time(jax.jit(fn), inputs)
                rec = {"stage": name, "ms_per_step": round(dt * 1000, 2),
                       "batch": B}
            except Exception as e:  # noqa: BLE001
                rec = {"stage": name, "error": repr(e)[:300]}
            line = json.dumps(rec)
            print(line, flush=True)
            out.write(line + "\n")
            out.flush()


if __name__ == "__main__":
    main()
