"""Fused VMEM-resident W8A8 chains for the packed 3D resblock stacks.

The 32-channel volume chains (appearance extractor res3d_0..5, swap module
res3d_0..5 — reference src/modules/appearance_feature_extractor.py:36-44,
adaptive_modulate.py:520-531 — and the refine module's GroupNorm-leak
blocks, adaptive_modulate.py:706-720) run space-to-depth packed
(nn/conv3d.pack_hw2: (B, D, H/2, W/2, 4C), exact) because 32-channel convs
underfill the MXU.  As separate XLA ops each block round-trips its packed
volume through HBM ~6 times (norm, relu, quantize, conv x2, residual), and
the measured int8 win was only ~10%: the quantize/dequant elementwise
around a 0.5 ms conv dominates.

These kernels keep ONE sample's packed volume (D x H/2 x W/2 x 4C bf16 =
4 MB at canonical shapes) resident in VMEM scratch across the whole chain:
grid = (sample, block, conv) — one 3x3x3 packed conv per program (27
shifted int8 (DHW x 4C)@(4C x 4C) MXU matmuls, the proven
ops/pallas/qconv.py form), with all norms (inference BatchNorm as a
precomputed affine; GroupNorm stats computed in-kernel), activations,
quantize/dequantize and residuals on the VPU — zero intermediate HBM
traffic.  Quantization matches nn/conv3d.conv3d_packed(int8=True) exactly:
symmetric per-packed-out-channel weight scales, dynamic per-sample
per-tensor activation scales, s32 accumulation.

``*_ref`` functions are the jnp specifications; the kernels match them in
interpret mode and the flax blocks to int8 tolerance (tests/test_chain3d.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _quant_w27(kp):
    """(3, 3, 3, C, C) packed kernel -> ((27, C, C) int8, (C,) f32 scales);
    per-packed-out-channel, as nn/conv3d.conv3d_packed(int8=True)."""
    k32 = kp.astype(jnp.float32)
    sw = jnp.max(jnp.abs(k32), axis=(0, 1, 2, 3)) / 127.0 + 1e-12
    kq = jnp.clip(jnp.round(k32 / sw), -127, 127).astype(jnp.int8)
    c1, c2 = kp.shape[-2], kp.shape[-1]
    return kq.reshape(27, c1, c2), sw


def _quant_act3(v32):
    """(D, H, W, C) f32 -> (int8, scalar f32 scale); per-tensor symmetric."""
    sx = jnp.max(jnp.abs(v32)) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(v32 / sx), -127, 127).astype(jnp.int8)
    return q, sx


def _conv27(qpad, kq_ref, d, hh, wh, c, cout):
    """3x3x3 SAME conv as 27 shifted int8 matmuls.

    qpad: (d+2, hh+2, wh+2, c) int8 zero-padded packed volume.
    kq_ref: ref with [0, tap] -> (c, cout) int8, tap = t*9 + dy*3 + dx.
    Returns (d*hh*wh, cout) int32.
    """
    acc = jnp.zeros((d * hh * wh, cout), jnp.int32)
    for t in range(3):
        for dy in range(3):
            for dx in range(3):
                sl = qpad[t : t + d, dy : dy + hh, dx : dx + wh]
                acc = acc + jax.lax.dot_general(
                    sl.reshape(d * hh * wh, c),
                    kq_ref[0, t * 9 + dy * 3 + dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
    return acc


def _pad3(q):
    return jnp.pad(q, ((1, 1), (1, 1), (1, 1), (0, 0)))


# --------------------------------------------------------------------------
# Pre-activation BatchNorm chain: nb x [bn-relu-conv x2, residual]
# (nn/blocks.ResBlock3d at inference; appearance res3d_*, swap res3d_*)
# --------------------------------------------------------------------------


def _bn_kernel(
    bns_ref, bnt_ref, kq_ref, sw_ref, b_ref,
    x_hbm, out_hbm, xs, hs, sem_in, sem_out, *, d, hh, wh, c, nb,
):
    """One (sample, block, conv) per program.

    bns_ref/bnt_ref: (1, C) f32 folded BN scale/shift (packed-tiled).
    kq_ref: (1, 27, C, C) int8; sw_ref/b_ref: (1, C) f32.
    xs: (d, hh, wh, C) bf16 residual state; hs: same, f32 inter-conv.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((j == 0) & (k == 0))
    def _load():
        cp = pltpu.make_async_copy(x_hbm.at[i], xs, sem_in)
        cp.start()
        cp.wait()

    src = jnp.where(k == 0, xs[:].astype(jnp.float32), hs[:])
    t = jnp.maximum(src * bns_ref[0] + bnt_ref[0], 0.0)
    q, sa = _quant_act3(t)
    acc = _conv27(_pad3(q), kq_ref, d, hh, wh, c, c)
    h = (acc.astype(jnp.float32) * (sa * sw_ref[0])
         + b_ref[0]).reshape(d, hh, wh, c)

    @pl.when(k == 0)
    def _stash():
        hs[:] = h

    @pl.when(k == 1)
    def _residual():
        xs[:] = (xs[:].astype(jnp.float32) + h).astype(xs.dtype)

    @pl.when((j == nb - 1) & (k == 1))
    def _store():
        cp = pltpu.make_async_copy(xs, out_hbm.at[i], sem_out)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bn_run(x, bns, bnt, kq, sw, b, interpret=False):
    n, d, hh, wh, c = x.shape
    nb = kq.shape[0]
    kern = functools.partial(_bn_kernel, d=d, hh=hh, wh=wh, c=c, nb=nb)
    bns2 = bns.reshape(nb * 2, c)
    bnt2 = bnt.reshape(nb * 2, c)
    kq2 = kq.reshape(nb * 2, 27, c, c)
    sw2 = sw.reshape(nb * 2, c)
    b2 = b.reshape(nb * 2, c)
    return pl.pallas_call(
        kern,
        grid=(n, nb, 2),
        in_specs=[
            pl.BlockSpec((1, c), lambda i, j, k: (j * 2 + k, 0)),
            pl.BlockSpec((1, c), lambda i, j, k: (j * 2 + k, 0)),
            pl.BlockSpec((1, 27, c, c),
                         lambda i, j, k: (j * 2 + k, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j, k: (j * 2 + k, 0)),
            pl.BlockSpec((1, c), lambda i, j, k: (j * 2 + k, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, hh, wh, c), x.dtype),
            pltpu.VMEM((d, hh, wh, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(bns2, bnt2, kq2, sw2, b2, x)


def res3d_bn_chain_params(blocks, eps=1e-5):
    """XLA-side prep from per-block raw params.

    blocks: list of nb dicts with keys (ORIGINAL checkpoint layouts)
      bn_scale/bn_bias/bn_mean/bn_var — (2, C) BatchNorm stats (C original)
      kernel — (2, 3, 3, 3, C, C); bias — (2, C)
    Returns (bns, bnt, kq, sw, b) packed-tiled for res3d_bn_chain.
    """
    from canonswap_tpu.nn.conv3d import pack_kernel_hw2

    nb = len(blocks)
    bns, bnt, kqs, sws, bs = [], [], [], [], []
    for blk in blocks:
        g = blk["bn_scale"].astype(jnp.float32)
        be = blk["bn_bias"].astype(jnp.float32)
        mu = blk["bn_mean"].astype(jnp.float32)
        var = blk["bn_var"].astype(jnp.float32)
        s = g * jax.lax.rsqrt(var + eps)            # (2, C)
        t = be - mu * s
        bns.append(jnp.tile(s, (1, 4)))             # packed: p*C + c
        bnt.append(jnp.tile(t, (1, 4)))
        kq2, sw2, b2 = [], [], []
        for k in (0, 1):
            kp = pack_kernel_hw2(blk["kernel"][k])
            kq, sw = _quant_w27(kp)
            kq2.append(kq)
            sw2.append(sw)
            b2.append(jnp.tile(blk["bias"][k].astype(jnp.float32), 4))
        kqs.append(jnp.stack(kq2))
        sws.append(jnp.stack(sw2))
        bs.append(jnp.stack(b2))
    return (jnp.stack(bns), jnp.stack(bnt), jnp.stack(kqs),
            jnp.stack(sws).astype(jnp.float32), jnp.stack(bs))


def res3d_bn_chain(xp, prep, *, interpret=False):
    """Fused pre-act BN resblock chain on a pack_hw2 volume.

    xp: (N, D, H/2, W/2, 4C) bf16; prep: res3d_bn_chain_params output.
    """
    from canonswap_tpu.ops.pallas.spmd import batch_partitioned

    def fn(xx, *pp):
        return _bn_run(xx, *pp, interpret=interpret)

    return batch_partitioned(
        fn, (True,) + (False,) * len(prep), xp.ndim)(xp, *prep)


def res3d_bn_chain_ref(xp, blocks, eps=1e-5):
    """jnp specification (identical math and dtype order)."""
    bns, bnt, kq, sw, b = res3d_bn_chain_params(blocks, eps)
    n, d, hh, wh, c = xp.shape
    outs = []
    for s in range(n):
        xs = xp[s]
        for j in range(len(blocks)):
            hcur = None
            for k in (0, 1):
                src = (xs.astype(jnp.float32) if k == 0 else hcur)
                t = jnp.maximum(src * bns[j, k] + bnt[j, k], 0.0)
                q, sa = _quant_act3(t)
                qp = _pad3(q)
                acc = jnp.zeros((d * hh * wh, c), jnp.int32)
                for tap in range(27):
                    tt, dy, dx = tap // 9, (tap // 3) % 3, tap % 3
                    sl = qp[tt : tt + d, dy : dy + hh, dx : dx + wh]
                    acc = acc + jax.lax.dot_general(
                        sl.reshape(d * hh * wh, c), kq[j, k, tap],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                hcur = (acc.astype(jnp.float32) * (sa * sw[j, k])
                        + b[j, k]).reshape(d, hh, wh, c)
            xs = (xs.astype(jnp.float32) + hcur).astype(xp.dtype)
        outs.append(xs)
    return jnp.stack(outs)


# --------------------------------------------------------------------------
# Post-activation GroupNorm-leak chain: nb x [conv-gn-lrelu x2 + residual]
# (nn/blocks.ResBlock3dLeakGN with identity shortcut; refine res3d_in/out)
# --------------------------------------------------------------------------


def _gn_kernel(
    kq_ref, sw_ref, b_ref, gmap_ref, gam_ref, bet_ref,
    x_hbm, out_hbm, xs, hs, sem_in, sem_out,
    *, d, hh, wh, c, nb, groups, eps, slope,
):
    """One (sample, block, conv) per program.

    gmap_ref: (1, C, G) f32 constant 0/1 packed-channel -> group matrix.
    gam_ref/bet_ref: (1, C) f32 GN affine (packed-tiled).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((j == 0) & (k == 0))
    def _load():
        cp = pltpu.make_async_copy(x_hbm.at[i], xs, sem_in)
        cp.start()
        cp.wait()

    src = jnp.where(k == 0, xs[:].astype(jnp.float32), hs[:])
    q, sa = _quant_act3(src)
    acc = _conv27(_pad3(q), kq_ref, d, hh, wh, c, c)
    h = (acc.astype(jnp.float32) * (sa * sw_ref[0])
         + b_ref[0])  # (rows, C)
    # GroupNorm over (D, H, W, phases) per original-channel group: column
    # sums via one reduce, grouped through the 0/1 matrix (elements per
    # group = rows * C/G because packing only moves spatial phases into
    # channels — same element set as the unpacked norm)
    gmap = gmap_ref[0]
    cnt = (d * hh * wh) * (c // groups)
    gsum = jnp.dot(jnp.sum(h, axis=0, keepdims=True), gmap)      # (1, G)
    gsq = jnp.dot(jnp.sum(h * h, axis=0, keepdims=True), gmap)   # (1, G)
    mean = gsum / cnt
    var = gsq / cnt - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    # broadcast group stats back to packed channels
    mean_c = jnp.dot(mean, gmap.T)   # (1, C)
    inv_c = jnp.dot(inv, gmap.T)
    h = (h - mean_c) * (inv_c * gam_ref[0]) + bet_ref[0]
    h = h.reshape(d, hh, wh, c)

    @pl.when(k == 0)
    def _stash():
        hs[:] = jnp.where(h >= 0, h, slope * h)

    @pl.when(k == 1)
    def _residual():
        y = xs[:].astype(jnp.float32) + h
        xs[:] = jnp.where(y >= 0, y, slope * y).astype(xs.dtype)

    @pl.when((j == nb - 1) & (k == 1))
    def _store():
        cp = pltpu.make_async_copy(xs, out_hbm.at[i], sem_out)
        cp.start()
        cp.wait()


@functools.partial(jax.jit,
                   static_argnames=("groups", "eps", "slope", "interpret"))
def _gn_run(x, kq, sw, b, gmap, gam, bet, groups, eps, slope,
            interpret=False):
    n, d, hh, wh, c = x.shape
    nb = kq.shape[0]
    kern = functools.partial(
        _gn_kernel, d=d, hh=hh, wh=wh, c=c, nb=nb, groups=groups, eps=eps,
        slope=slope)
    kq2 = kq.reshape(nb * 2, 27, c, c)
    sw2 = sw.reshape(nb * 2, c)
    b2 = b.reshape(nb * 2, c)
    gam2 = gam.reshape(nb * 2, c)
    bet2 = bet.reshape(nb * 2, c)
    return pl.pallas_call(
        kern,
        grid=(n, nb, 2),
        in_specs=[
            pl.BlockSpec((1, 27, c, c),
                         lambda i, j, k: (j * 2 + k, 0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j, k: (j * 2 + k, 0)),
            pl.BlockSpec((1, c), lambda i, j, k: (j * 2 + k, 0)),
            pl.BlockSpec((1, c, groups), lambda i, j, k: (0, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j, k: (j * 2 + k, 0)),
            pl.BlockSpec((1, c), lambda i, j, k: (j * 2 + k, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((d, hh, wh, c), x.dtype),
            pltpu.VMEM((d, hh, wh, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kq2, sw2, b2, gmap, gam2, bet2, x)


def _group_map(c_orig: int, groups: int) -> jnp.ndarray:
    """(4*C, G) 0/1: packed channel p*C + c -> group c // (C/G)."""
    gsize = c_orig // groups
    m = jnp.zeros((4 * c_orig, groups), jnp.float32)
    idx = jnp.arange(4 * c_orig)
    return m.at[idx, (idx % c_orig) // gsize].set(1.0)


def res3d_gn_chain_params(blocks, groups):
    """blocks: nb dicts with keys kernel (2,3,3,3,C,C), bias (2,C),
    gn_scale/gn_bias (2,C).  Returns prep for res3d_gn_chain."""
    from canonswap_tpu.nn.conv3d import pack_kernel_hw2

    kqs, sws, bs, gams, bets = [], [], [], [], []
    for blk in blocks:
        kq2, sw2 = [], []
        for k in (0, 1):
            kq, sw = _quant_w27(pack_kernel_hw2(blk["kernel"][k]))
            kq2.append(kq)
            sw2.append(sw)
        kqs.append(jnp.stack(kq2))
        sws.append(jnp.stack(sw2))
        bs.append(jnp.tile(blk["bias"].astype(jnp.float32), (1, 4)))
        gams.append(jnp.tile(blk["gn_scale"].astype(jnp.float32), (1, 4)))
        bets.append(jnp.tile(blk["gn_bias"].astype(jnp.float32), (1, 4)))
    c_orig = blocks[0]["kernel"].shape[-1]
    gmap = _group_map(c_orig, groups)[None]
    return (jnp.stack(kqs), jnp.stack(sws).astype(jnp.float32),
            jnp.stack(bs), gmap, jnp.stack(gams), jnp.stack(bets))


def res3d_gn_chain(xp, prep, *, groups, eps=1e-5, slope=0.01,
                   interpret=False):
    """Fused post-act GroupNorm-leak resblock chain (identity shortcut)
    on a pack_hw2 volume.  xp: (N, D, H/2, W/2, 4C) bf16."""
    from canonswap_tpu.ops.pallas.spmd import batch_partitioned

    def fn(xx, *pp):
        return _gn_run(xx, *pp, groups=groups, eps=eps, slope=slope,
                       interpret=interpret)

    return batch_partitioned(
        fn, (True,) + (False,) * len(prep), xp.ndim)(xp, *prep)


def res3d_gn_chain_ref(xp, blocks, groups, eps=1e-5, slope=0.01):
    """jnp specification (identical math and dtype order)."""
    kq, sw, b, gmap, gam, bet = res3d_gn_chain_params(blocks, groups)
    gmap = gmap[0]
    n, d, hh, wh, c = xp.shape
    cnt = (d * hh * wh) * (c // groups)
    outs = []
    for s in range(n):
        xs = xp[s]
        for j in range(len(blocks)):
            hcur = None
            for k in (0, 1):
                src = (xs.astype(jnp.float32) if k == 0 else hcur)
                q, sa = _quant_act3(src)
                qp = _pad3(q)
                acc = jnp.zeros((d * hh * wh, c), jnp.int32)
                for tap in range(27):
                    tt, dy, dx = tap // 9, (tap // 3) % 3, tap % 3
                    sl = qp[tt : tt + d, dy : dy + hh, dx : dx + wh]
                    acc = acc + jax.lax.dot_general(
                        sl.reshape(d * hh * wh, c), kq[j, k, tap],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                h = acc.astype(jnp.float32) * (sa * sw[j, k]) + b[j, k]
                gsum = jnp.dot(jnp.sum(h, axis=0, keepdims=True), gmap)
                gsq = jnp.dot(jnp.sum(h * h, axis=0, keepdims=True), gmap)
                mean = gsum / cnt
                var = gsq / cnt - mean * mean
                inv = jax.lax.rsqrt(var + eps)
                h = ((h - jnp.dot(mean, gmap.T))
                     * (jnp.dot(inv, gmap.T) * gam[j, k]) + bet[j, k])
                h = h.reshape(d, hh, wh, c)
                if k == 0:
                    hcur = jnp.where(h >= 0, h, slope * h)
                else:
                    y = xs.astype(jnp.float32) + h
                    xs = jnp.where(y >= 0, y, slope * y).astype(xp.dtype)
        outs.append(xs)
    return jnp.stack(outs)
