"""Fused VMEM-resident W8A8 block-chain kernels (SPADE middle / adaptive).

The two dominant stages of the swap step are per-sample conv chains at
64x64/512ch: the SPADE decoder's six G_middle blocks (reference
src/modules/spade_generator.py:30-36) and the swap module's seven adaptive
resblocks (src/modules/adaptive_modulate.py:485-554).  As separate XLA
convs, every block round-trips its activations through HBM several times
(norm -> modulation conv -> affine -> quantize -> conv -> dequantize ->
residual), and the int8 win is mostly eaten by the quantize traffic
(measured: conv 0.49 ms raw s8 vs 1.17 ms with XLA quant/dequant around it).

These kernels keep ONE sample's 64x64x512 activation resident in VMEM
scratch across the whole chain:

  grid = (sample, block); the activation is DMA'd from HBM once at block 0
  and written back once after the last block.  Per-block weights (int8,
  quantized in XLA at apply time from the SAME bf16 param tree) stream in
  through BlockSpec pipelining.  All elementwise work (instance norm,
  SPADE affine, leaky/relu, StyleGAN2 modulate/demodulate, mask blending,
  residuals, quantize/dequantize) happens on the VPU between the MXU
  int8 matmuls — zero intermediate HBM traffic.

Convs are stride-1 SAME 3x3, realized as 9 shifted (HW x Cin)@(Cin x Cout)
int8 matmuls with int32 accumulation (the proven ops/pallas/qconv.py form).
Quantization scheme matches ops/qconv.py exactly: symmetric per-out-channel
weight scales, dynamic per-sample-per-tensor activation scales.

``*_ref`` functions are the jnp specifications (identical math and dtype
ordering); the kernels match them in interpret mode (tests/test_chain.py)
and the flax per-block int8 path to bf16 tolerance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LEAK = 0.2


def _quant_w(kernel):
    """(..., Cout) f32/bf16 -> (int8, (Cout,) f32 scales), as ops.qconv."""
    k32 = kernel.astype(jnp.float32)
    red = tuple(range(k32.ndim - 1))
    sw = jnp.max(jnp.abs(k32), axis=red) / 127.0 + 1e-12
    kq = jnp.clip(jnp.round(k32 / sw), -127, 127).astype(jnp.int8)
    return kq, sw


def _quant_act(v32):
    """(H, W, C) f32 -> (int8, scalar f32 scale); per-tensor symmetric."""
    sx = jnp.max(jnp.abs(v32)) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(v32 / sx), -127, 127).astype(jnp.int8)
    return q, sx


def _inorm(v32, eps=1e-5):
    """Instance norm over (H, W, C) f32 -> f32 (stats per channel)."""
    m = jnp.mean(v32, axis=(0, 1), keepdims=True)
    var = jnp.mean((v32 - m) ** 2, axis=(0, 1), keepdims=True)
    return (v32 - m) * jax.lax.rsqrt(var + eps)


def _conv9(qpad, kq_ref, tsel, h, w, cin, cout):
    """SAME 3x3 conv as 9 shifted int8 matmuls.

    qpad: (h+2, w+2, cin) int8 zero-padded input.
    kq_ref[tsel(dy, dx)] -> (cin, cout) int8 tap matrix.
    Returns (h*w, cout) int32.
    """
    acc = jnp.zeros((h * w, cout), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            sl = qpad[dy : dy + h, dx : dx + w].reshape(h * w, cin)
            acc = acc + jax.lax.dot_general(
                sl, tsel(dy, dx),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    return acc


def _pad_hw(q):
    return jnp.pad(q, ((1, 1), (1, 1), (0, 0)))


# --------------------------------------------------------------------------
# SPADE middle chain: nb x [norm_0 -> conv_0 -> norm_1 -> conv_1, residual]
# --------------------------------------------------------------------------


def _spade_kernel(
    actv_ref, kgb_ref, sgb_ref, bgb_ref, kcv_ref, scv_ref, bcv_ref,
    x_hbm, out_hbm, xs, sem_in, sem_out, *, h, w, c, nb,
):
    """One (sample, block) per program; xs carries x across blocks.

    actv_ref: (1, 1, 2*h, w, 128) bf16 — the two relu(mlp_shared) maps.
    kgb_ref:  (1, 18, 128, 2c) int8 — per-SPADE [gamma|beta] tap matrices.
    sgb_ref/bgb_ref: (1, 2, 2c) f32 weight-scale / bias.
    kcv_ref:  (1, 18, c, c) int8 — conv_0/conv_1 taps.
    scv_ref/bcv_ref: (1, 2, c) f32.
    x_hbm/out_hbm: (N, h, w, c) bf16, ANY space.
    xs: (h, w, c) bf16 VMEM scratch (persists across the block dim).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _load():
        cp = pltpu.make_async_copy(x_hbm.at[i], xs, sem_in)
        cp.start()
        cp.wait()

    hcur = xs[:].astype(jnp.float32)
    for k in (0, 1):
        base = _inorm(hcur)
        a = actv_ref[0, 0, k * h : (k + 1) * h].astype(jnp.float32)
        qa, sa = _quant_act(a)
        qa = _pad_hw(qa)
        # gamma then beta as two 512-wide dot groups (halves peak VMEM)
        gacc = _conv9(qa, kgb_ref, lambda dy, dx: kgb_ref[0, k * 9 + dy * 3 + dx, :, :c], h, w, 128, c)
        bacc = _conv9(qa, kgb_ref, lambda dy, dx: kgb_ref[0, k * 9 + dy * 3 + dx, :, c:], h, w, 128, c)
        gamma = (gacc.astype(jnp.float32) * (sa * sgb_ref[0, k, :c])
                 + bgb_ref[0, k, :c]).reshape(h, w, c)
        beta = (bacc.astype(jnp.float32) * (sa * sgb_ref[0, k, c:])
                + bgb_ref[0, k, c:]).reshape(h, w, c)
        t = base * (1.0 + gamma) + beta
        t = jnp.where(t >= 0, t, _LEAK * t)
        qt, st = _quant_act(t)
        qt = _pad_hw(qt)
        acc = _conv9(qt, kcv_ref, lambda dy, dx: kcv_ref[0, k * 9 + dy * 3 + dx], h, w, c, c)
        hcur = (acc.astype(jnp.float32) * (st * scv_ref[0, k])
                + bcv_ref[0, k]).reshape(h, w, c)
    xs[:] = (xs[:].astype(jnp.float32) + hcur).astype(xs.dtype)

    @pl.when(j == nb - 1)
    def _store():
        cp = pltpu.make_async_copy(xs, out_hbm.at[i], sem_out)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spade_run(x, actv, kgb, sgb, bgb, kcv, scv, bcv, interpret=False):
    n, h, w, c = x.shape
    nb = kgb.shape[0]
    kern = functools.partial(_spade_kernel, h=h, w=w, c=c, nb=nb)
    return pl.pallas_call(
        kern,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 2 * h, w, 128), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, 18, 128, 2 * c), lambda i, j: (j, 0, 0, 0)),
            pl.BlockSpec((1, 2, 2 * c), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 2, 2 * c), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 18, c, c), lambda i, j: (j, 0, 0, 0)),
            pl.BlockSpec((1, 2, c), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 2, c), lambda i, j: (j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, w, c), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(actv, kgb, sgb, bgb, kcv, scv, bcv, x)


def _spade_kernel_ks(
    actv_ref, kgb_ref, sgb_ref, bgb_ref, kcv_ref, scv_ref, bcv_ref,
    x_hbm, out_hbm, xs, hs, sem_in, sem_out, *, h, w, c, nb,
):
    """k-split form of :func:`_spade_kernel`: grid (sample, block, sub),
    ONE norm+conv pair per program — half the kernel body (27 MXU matmuls
    instead of 54), for remote compilers that stall on the full body.
    ``hs`` (f32 scratch) carries hcur between the two subs of a block;
    math and op order are identical to the fused form.

    Block shapes differ from _spade_kernel: the (block, sub) pair is
    flattened into one leading dim, so per-program refs carry singleton
    leading dims and HALF the fused kernel's payload —
      actv_ref: (1, 1, h, w, 128) (one relu(mlp_shared) map, not two)
      kgb_ref:  (1, 9, 128, 2c); kcv_ref: (1, 9, c, c)
      sgb_ref/bgb_ref: (1, 1, 2c); scv_ref/bcv_ref: (1, 1, c) — the extra
      singleton middle dim keeps the last-two block dims equal to the
      array dims (Mosaic (8,128)-divisibility rule; see _spade_run_ks).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((j == 0) & (k == 0))
    def _load():
        cp = pltpu.make_async_copy(x_hbm.at[i], xs, sem_in)
        cp.start()
        cp.wait()

    hcur = jnp.where(k == 0, xs[:].astype(jnp.float32), hs[:])
    base = _inorm(hcur)
    a = actv_ref[0, 0].astype(jnp.float32)
    qa, sa = _quant_act(a)
    qa = _pad_hw(qa)
    gacc = _conv9(qa, kgb_ref, lambda dy, dx: kgb_ref[0, dy * 3 + dx, :, :c],
                  h, w, 128, c)
    bacc = _conv9(qa, kgb_ref, lambda dy, dx: kgb_ref[0, dy * 3 + dx, :, c:],
                  h, w, 128, c)
    gamma = (gacc.astype(jnp.float32) * (sa * sgb_ref[0, 0, :c])
             + bgb_ref[0, 0, :c]).reshape(h, w, c)
    beta = (bacc.astype(jnp.float32) * (sa * sgb_ref[0, 0, c:])
            + bgb_ref[0, 0, c:]).reshape(h, w, c)
    t = base * (1.0 + gamma) + beta
    t = jnp.where(t >= 0, t, _LEAK * t)
    qt, st = _quant_act(t)
    qt = _pad_hw(qt)
    acc = _conv9(qt, kcv_ref, lambda dy, dx: kcv_ref[0, dy * 3 + dx],
                 h, w, c, c)
    hnew = (acc.astype(jnp.float32) * (st * scv_ref[0, 0])
            + bcv_ref[0, 0]).reshape(h, w, c)

    @pl.when(k == 0)
    def _stash():
        hs[:] = hnew

    @pl.when(k == 1)
    def _residual():
        xs[:] = (xs[:].astype(jnp.float32) + hnew).astype(xs.dtype)

    @pl.when((j == nb - 1) & (k == 1))
    def _store():
        cp = pltpu.make_async_copy(xs, out_hbm.at[i], sem_out)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _spade_run_ks(x, actv, kgb, sgb, bgb, kcv, scv, bcv, interpret=False):
    n, h, w, c = x.shape
    nb = kgb.shape[0]
    kern = functools.partial(_spade_kernel_ks, h=h, w=w, c=c, nb=nb)
    actv6 = actv.reshape(n, nb * 2, h, w, 128)
    kgb2 = kgb.reshape(nb * 2, 9, 128, 2 * c)
    kcv2 = kcv.reshape(nb * 2, 9, c, c)
    # scale/bias vectors carry a singleton middle dim: Mosaic requires the
    # block's last two dims be (8,128)-divisible OR equal the array dims —
    # (1, 2c) on a (nb*2, 2c) array fails, (1, 1, 2c) on (nb*2, 1, 2c) is ok
    sgb2 = sgb.reshape(nb * 2, 1, 2 * c)
    bgb2 = bgb.reshape(nb * 2, 1, 2 * c)
    scv2 = scv.reshape(nb * 2, 1, c)
    bcv2 = bcv.reshape(nb * 2, 1, c)
    return pl.pallas_call(
        kern,
        grid=(n, nb, 2),
        in_specs=[
            pl.BlockSpec((1, 1, h, w, 128),
                         lambda i, j, k: (i, j * 2 + k, 0, 0, 0)),
            pl.BlockSpec((1, 9, 128, 2 * c),
                         lambda i, j, k: (j * 2 + k, 0, 0, 0)),
            pl.BlockSpec((1, 1, 2 * c), lambda i, j, k: (j * 2 + k, 0, 0)),
            pl.BlockSpec((1, 1, 2 * c), lambda i, j, k: (j * 2 + k, 0, 0)),
            pl.BlockSpec((1, 9, c, c),
                         lambda i, j, k: (j * 2 + k, 0, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j, k: (j * 2 + k, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j, k: (j * 2 + k, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, w, c), x.dtype),
            pltpu.VMEM((h, w, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(actv6, kgb2, sgb2, bgb2, kcv2, scv2, bcv2, x)


def spade_chain_params(blocks):
    """XLA-side prep from per-block raw params.

    blocks: list of nb dicts with keys
      a_kernel/a_bias  — mlp_shared (3,3,Cseg,128) x2 stacked (2,3,3,Cseg,128)
      gb_kernel/gb_bias — merged [gamma|beta] (2,3,3,128,2c)/(2,2c)
      cv_kernel/cv_bias — conv_0/conv_1 (2,3,3,c,c)/(2,c)
    Returns (akq..., quantized stacks) ready for spade_chain.
    """
    gbk = jnp.stack([b["gb_kernel"] for b in blocks])  # (nb,2,3,3,128,2c)
    cvk = jnp.stack([b["cv_kernel"] for b in blocks])  # (nb,2,3,3,c,c)
    nb = gbk.shape[0]
    c2 = gbk.shape[-1]
    c = cvk.shape[-1]
    kgb, sgb = jax.vmap(jax.vmap(_quant_w))(gbk)
    kcv, scv = jax.vmap(jax.vmap(_quant_w))(cvk)
    kgb = kgb.reshape(nb, 18, 128, c2)
    kcv = kcv.reshape(nb, 18, c, c)
    bgb = jnp.stack([b["gb_bias"] for b in blocks]).astype(jnp.float32)
    bcv = jnp.stack([b["cv_bias"] for b in blocks]).astype(jnp.float32)
    return kgb, sgb.astype(jnp.float32), bgb, kcv, scv.astype(jnp.float32), bcv


def spade_chain(x, actv, prep, *, interpret=False, ksplit=False):
    """Fused SPADE middle chain.

    x: (N, H, W, C) bf16; actv: (N, nb, 2, H, W, 128) bf16 (relu'd
    mlp_shared outputs); prep: output of spade_chain_params.
    ``ksplit`` runs the half-body grid form (identical math).
    """
    from canonswap_tpu.ops.pallas.spmd import batch_partitioned

    n, h, w, c = x.shape
    nb = prep[0].shape[0]
    if ksplit:
        def fn(xx, aa, *pp):
            return _spade_run_ks(xx, aa, *pp, interpret=interpret)
    else:
        def fn(xx, aa, *pp):
            return _spade_run(xx, aa.reshape(xx.shape[0], nb, 2 * h, w, 128),
                              *pp, interpret=interpret)
    wrapped = batch_partitioned(
        fn, (True, True) + (False,) * len(prep), x.ndim)
    return wrapped(x, actv, *prep)


def spade_chain_ref(x, actv, blocks):
    """jnp specification of the fused kernel (identical math/dtype order)."""
    n, h, w, c = x.shape
    outs = []
    for s in range(n):
        xs = x[s]
        for j, blk in enumerate(blocks):
            kgb, sgb = jax.vmap(_quant_w)(blk["gb_kernel"])
            kcv, scv = jax.vmap(_quant_w)(blk["cv_kernel"])
            hcur = xs.astype(jnp.float32)
            for k in (0, 1):
                base = _inorm(hcur)
                a = actv[s, j, k].astype(jnp.float32)
                qa, sa = _quant_act(a)
                qa = _pad_hw(qa)

                def conv(qp, kq, cin, cout):
                    acc = jnp.zeros((h * w, cout), jnp.int32)
                    for dy in range(3):
                        for dx in range(3):
                            sl = qp[dy : dy + h, dx : dx + w].reshape(
                                h * w, cin)
                            acc = acc + jax.lax.dot_general(
                                sl, kq[dy * 3 + dx],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                    return acc

                kgb9 = kgb[k].reshape(9, 128, 2 * c)
                gacc = conv(qa, kgb9[..., :c], 128, c)
                bacc = conv(qa, kgb9[..., c:], 128, c)
                gamma = (gacc.astype(jnp.float32)
                         * (sa * sgb[k, :c].astype(jnp.float32))
                         + blk["gb_bias"][k, :c].astype(jnp.float32)
                         ).reshape(h, w, c)
                beta = (bacc.astype(jnp.float32)
                        * (sa * sgb[k, c:].astype(jnp.float32))
                        + blk["gb_bias"][k, c:].astype(jnp.float32)
                        ).reshape(h, w, c)
                t = base * (1.0 + gamma) + beta
                t = jnp.where(t >= 0, t, _LEAK * t)
                qt, st = _quant_act(t)
                qt = _pad_hw(qt)
                acc = conv(qt, kcv[k].reshape(9, c, c), c, c)
                hcur = (acc.astype(jnp.float32)
                        * (st * scv[k].astype(jnp.float32))
                        + blk["cv_bias"][k].astype(jnp.float32)
                        ).reshape(h, w, c)
            xs = (xs.astype(jnp.float32) + hcur).astype(x.dtype)
        outs.append(xs)
    return jnp.stack(outs)


# --------------------------------------------------------------------------
# Adaptive (StyleGAN2-modulated, mask-blended) chain — the swap module's
# seven bottleneck2d blocks.
# --------------------------------------------------------------------------


def _adaptive_kernel(
    style_ref, demod_ref, kq_ref, sw_ref, ba_ref,
    x_hbm, out_hbm, xs, sem_in, sem_out, *, h, w, c, nb,
):
    """One (sample, block) per program.

    style_ref: (1, 1, 2, c) f32 per-conv modulation vectors.
    demod_ref: (1, 1, 2, c) f32 per-conv demod rescales.
    kq_ref: (1, 18, c, c+128) int8 — [shared conv | mask conv | zero pad].
    sw_ref: (1, 2, c+128) f32 weight scales.
    ba_ref: (1, 2, c+128) f32 — [conv bias (mod path) | mask bias | 0].
    """
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _load():
        cp = pltpu.make_async_copy(x_hbm.at[i], xs, sem_in)
        cp.start()
        cp.wait()

    hcur = xs[:].astype(jnp.float32)
    for k in (0, 1):
        qs, ss = _quant_act(hcur)
        qm, sm = _quant_act(hcur * style_ref[0, 0, k])
        qs = _pad_hw(qs)
        qm = _pad_hw(qm)
        acc_s = _conv9(qs, kq_ref, lambda dy, dx: kq_ref[0, k * 9 + dy * 3 + dx, :, :c], h, w, c, c)
        acc_k = _conv9(qs, kq_ref, lambda dy, dx: kq_ref[0, k * 9 + dy * 3 + dx, :, c:], h, w, c, 128)
        acc_m = _conv9(qm, kq_ref, lambda dy, dx: kq_ref[0, k * 9 + dy * 3 + dx, :, :c], h, w, c, c)
        y_std = acc_s.astype(jnp.float32) * (ss * sw_ref[0, k, :c])
        mlog = (acc_k[:, 0:1].astype(jnp.float32) * (ss * sw_ref[0, k, c])
                + ba_ref[0, k, c])
        mask = jax.nn.sigmoid(mlog)  # (h*w, 1)
        y_mod = (acc_m.astype(jnp.float32)
                 * (sm * sw_ref[0, k, :c] * demod_ref[0, 0, k])
                 + ba_ref[0, k, :c])
        y = mask * y_mod + (1.0 - mask) * y_std
        if k == 0:
            y = jnp.maximum(y, 0.0)
        hcur = y.reshape(h, w, c)
    xs[:] = (xs[:].astype(jnp.float32) + hcur).astype(xs.dtype)

    @pl.when(j == nb - 1)
    def _store():
        cp = pltpu.make_async_copy(xs, out_hbm.at[i], sem_out)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _adaptive_run(x, style, demod, kq, sw, ba, interpret=False):
    n, h, w, c = x.shape
    nb = kq.shape[0]
    kern = functools.partial(_adaptive_kernel, h=h, w=w, c=c, nb=nb)
    return pl.pallas_call(
        kern,
        grid=(n, nb),
        in_specs=[
            pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 2, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 18, c, c + 128), lambda i, j: (j, 0, 0, 0)),
            pl.BlockSpec((1, 2, c + 128), lambda i, j: (j, 0, 0)),
            pl.BlockSpec((1, 2, c + 128), lambda i, j: (j, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, w, c), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(style, demod, kq, sw, ba, x)


def _adaptive_kernel_ks(
    style_ref, demod_ref, kq_ref, sw_ref, ba_ref,
    x_hbm, out_hbm, xs, hs, sem_in, sem_out, *, h, w, c, nb,
):
    """k-split form of :func:`_adaptive_kernel` (one conv trio per program;
    see _spade_kernel_ks for the rationale).

    Block shapes differ from _adaptive_kernel: the (block, conv) pair is
    flattened into one leading dim, so per-program refs carry ONE conv's
    slice with singleton-dim padding for the Mosaic last-two-dims rule —
      style_ref/demod_ref: (1, 1, 1, c) (one modulation vector)
      kq_ref: (1, 9, c, c+128); sw_ref/ba_ref: (1, 1, c+128).
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when((j == 0) & (k == 0))
    def _load():
        cp = pltpu.make_async_copy(x_hbm.at[i], xs, sem_in)
        cp.start()
        cp.wait()

    hcur = jnp.where(k == 0, xs[:].astype(jnp.float32), hs[:])
    qs, ss = _quant_act(hcur)
    qm, sm = _quant_act(hcur * style_ref[0, 0, 0])
    qs = _pad_hw(qs)
    qm = _pad_hw(qm)
    acc_s = _conv9(qs, kq_ref, lambda dy, dx: kq_ref[0, dy * 3 + dx, :, :c],
                   h, w, c, c)
    acc_k = _conv9(qs, kq_ref, lambda dy, dx: kq_ref[0, dy * 3 + dx, :, c:],
                   h, w, c, 128)
    acc_m = _conv9(qm, kq_ref, lambda dy, dx: kq_ref[0, dy * 3 + dx, :, :c],
                   h, w, c, c)
    y_std = acc_s.astype(jnp.float32) * (ss * sw_ref[0, 0, :c])
    mlog = (acc_k[:, 0:1].astype(jnp.float32) * (ss * sw_ref[0, 0, c])
            + ba_ref[0, 0, c])
    mask = jax.nn.sigmoid(mlog)
    y_mod = (acc_m.astype(jnp.float32)
             * (sm * sw_ref[0, 0, :c] * demod_ref[0, 0, 0])
             + ba_ref[0, 0, :c])
    y = mask * y_mod + (1.0 - mask) * y_std
    y = jnp.where(k == 0, jnp.maximum(y, 0.0), y)
    hnew = y.reshape(h, w, c)

    @pl.when(k == 0)
    def _stash():
        hs[:] = hnew

    @pl.when(k == 1)
    def _residual():
        xs[:] = (xs[:].astype(jnp.float32) + hnew).astype(xs.dtype)

    @pl.when((j == nb - 1) & (k == 1))
    def _store():
        cp = pltpu.make_async_copy(xs, out_hbm.at[i], sem_out)
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def _adaptive_run_ks(x, style, demod, kq, sw, ba, interpret=False):
    n, h, w, c = x.shape
    nb = kq.shape[0]
    kern = functools.partial(_adaptive_kernel_ks, h=h, w=w, c=c, nb=nb)
    # singleton middle dims keep the block's last-two dims equal to the
    # array dims (Mosaic lowering rule — see _spade_run_ks)
    style2 = style.reshape(n, nb * 2, 1, c)
    demod2 = demod.reshape(n, nb * 2, 1, c)
    kq2 = kq.reshape(nb * 2, 9, c, c + 128)
    sw2 = sw.reshape(nb * 2, 1, c + 128)
    ba2 = ba.reshape(nb * 2, 1, c + 128)
    return pl.pallas_call(
        kern,
        grid=(n, nb, 2),
        in_specs=[
            pl.BlockSpec((1, 1, 1, c), lambda i, j, k: (i, j * 2 + k, 0, 0)),
            pl.BlockSpec((1, 1, 1, c), lambda i, j, k: (i, j * 2 + k, 0, 0)),
            pl.BlockSpec((1, 9, c, c + 128),
                         lambda i, j, k: (j * 2 + k, 0, 0, 0)),
            pl.BlockSpec((1, 1, c + 128), lambda i, j, k: (j * 2 + k, 0, 0)),
            pl.BlockSpec((1, 1, c + 128), lambda i, j, k: (j * 2 + k, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, w, c), x.dtype),
            pltpu.VMEM((h, w, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(style2, demod2, kq2, sw2, ba2, x)


def adaptive_chain_params(blocks, latents_style):
    """Prep for adaptive_chain.

    blocks: nb dicts with keys weight (2,3,3,c,c), bias (2,c),
      mask_kernel (2,3,3,c,1), mask_bias (2,1).
    latents_style: (N, nb, 2, c) styles (the per-block style MLP outputs,
      computed by the caller from the ID latent — tiny dense math).
    Returns (style, demod, kq, sw, ba).
    """
    wk = jnp.stack([b["weight"] for b in blocks])  # (nb,2,3,3,c,c)
    mk = jnp.stack([b["mask_kernel"] for b in blocks])  # (nb,2,3,3,c,1)
    nb, _, _, _, c, _ = wk.shape
    pad = jnp.zeros(mk.shape[:-1] + (127,), wk.dtype)
    comb = jnp.concatenate([wk, mk, pad], axis=-1)  # (nb,2,3,3,c,c+128)
    kq, sw = jax.vmap(jax.vmap(_quant_w))(comb)
    kq = kq.reshape(nb, 18, c, c + 128)
    # demod: rsqrt(sum_i style_i^2 * sum_k w_{oik}^2 + eps)  (N, nb, 2, c)
    w2 = jnp.sum(wk.astype(jnp.float32) ** 2, axis=(2, 3))  # (nb,2,c,c)
    st = latents_style.astype(jnp.float32)
    demod = jax.lax.rsqrt(
        jnp.einsum("nbki,bkio->nbko", st**2, w2) + 1e-8)
    bias = jnp.stack([b["bias"] for b in blocks]).astype(jnp.float32)
    mbias = jnp.stack([b["mask_bias"] for b in blocks]).astype(jnp.float32)
    ba = jnp.concatenate(
        [bias, mbias, jnp.zeros((nb, 2, 127), jnp.float32)], axis=-1)
    return st, demod, kq, sw.astype(jnp.float32), ba


def adaptive_chain(x, prep, *, interpret=False, ksplit=False):
    """Fused adaptive chain. x: (N, H, W, C) bf16.
    ``ksplit`` runs the half-body grid form (identical math)."""
    from canonswap_tpu.ops.pallas.spmd import batch_partitioned

    run = _adaptive_run_ks if ksplit else _adaptive_run

    def fn(xx, st, dm, *pp):
        return run(xx, st, dm, *pp, interpret=interpret)

    # style/demod are per-sample (batched); kq/sw/ba are weights
    wrapped = batch_partitioned(
        fn, (True, True, True) + (False,) * (len(prep) - 2), x.ndim)
    return wrapped(x, *prep)


def adaptive_chain_ref(x, blocks, latents_style):
    """jnp specification of the fused adaptive kernel."""
    n, h, w, c = x.shape
    st, demod, kq, sw, ba = adaptive_chain_params(blocks, latents_style)
    kq = kq.reshape(kq.shape[0], 2, 9, c, c + 128)
    outs = []
    for s in range(n):
        xs = x[s]
        for j in range(len(blocks)):
            hcur = xs.astype(jnp.float32)
            for k in (0, 1):
                qs, ssc = _quant_act(hcur)
                qm, smc = _quant_act(hcur * st[s, j, k])
                qs = _pad_hw(qs)
                qm = _pad_hw(qm)

                def conv(qp, kt, cout):
                    acc = jnp.zeros((h * w, cout), jnp.int32)
                    for dy in range(3):
                        for dx in range(3):
                            sl = qp[dy : dy + h, dx : dx + w].reshape(
                                h * w, c)
                            acc = acc + jax.lax.dot_general(
                                sl, kt[dy * 3 + dx],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
                    return acc

                acc_s = conv(qs, kq[j, k, :, :, :c], c)
                acc_k = conv(qs, kq[j, k, :, :, c:], 128)
                acc_m = conv(qm, kq[j, k, :, :, :c], c)
                y_std = acc_s.astype(jnp.float32) * (ssc * sw[j, k, :c])
                mlog = (acc_k[:, 0:1].astype(jnp.float32)
                        * (ssc * sw[j, k, c]) + ba[j, k, c])
                mask = jax.nn.sigmoid(mlog)
                y_mod = (acc_m.astype(jnp.float32)
                         * (smc * sw[j, k, :c] * demod[s, j, k])
                         + ba[j, k, :c])
                y = mask * y_mod + (1.0 - mask) * y_std
                if k == 0:
                    y = jnp.maximum(y, 0.0)
                hcur = y.reshape(h, w, c)
            xs = (xs.astype(jnp.float32) + hcur).astype(x.dtype)
        outs.append(xs)
    return jnp.stack(outs)
