"""Pallas TPU kernel: fused dynamic W8A8 convolution.

The XLA W8A8 path (``ops/qconv.py``) wins on MXU rate but leaks its gain to
HBM traffic: the activation quantize (read bf16 + write int8), the int32
accumulator materialization, and the dequant epilogue are all separate HBM
round-trips around a 0.5-1 ms conv (measured: raw s8 conv 0.49 ms vs 1.17 ms
with XLA quant/dequant for 512ch@64^2, tools/exp_int8.py).

This kernel keeps the pipeline VMEM-resident: per (sample, row-chunk) it
DMAs the bf16 rows (plus halo) from HBM once, quantizes on the VPU, runs the
kh*kw shifted int8 matmuls on the MXU with int32 accumulation, and dequants
(+bias) straight into the bf16 output rows — ONE read of x and ONE write of
y.  x/out stay in HBM ``ANY`` space with manual ``make_async_copy`` chunks
because whole-image VMEM blocks at 512ch/64^2 overflow VMEM once the
pipeline double-buffers them (measured: N=1 compiles, N>=4 does not).

Per-sample activation scales are computed in XLA (a fused max-reduce over
the bf16 input — bandwidth-trivial) so the scheme stays bit-identical to
``ops.qconv.conv2d_w8a8``: symmetric per-sample activation / per-out-channel
weight scales, int32 accumulation.  See tests/test_qconv_pallas.py.

Reference semantics being accelerated: the adaptive/SPADE conv stacks of
``src/modules/adaptive_modulate.py`` / ``spade_generator.py`` (stride-1 SAME
convs, the flag_int8 speed lever).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    inv_ref, scale_ref, b_ref, kq_ref, x_hbm, out_hbm,
    xbuf, obuf, sem_in, sem_out, *, kh, kw, h, w, chunk,
):
    """One sample per program; row-chunks DMA'd and computed in sequence.

    inv_ref:   (1, 1, 1) f32 per-sample 1/activation-scale.
    scale_ref: (1, 1, Cout) f32 per-sample dequant scale (sx * sw).
    b_ref:     (1, 1, Cout) f32 bias (zeros when absent).
    kq_ref: (kh, kw, Cin, Cout) int8 (VMEM).
    x_hbm:  (N, H, W, Cin) input, HBM.
    out_hbm:(N, H, W, Cout) output, HBM.
    xbuf:   (chunk + 2*ph, W, Cin) bf16 scratch.
    obuf:   (chunk, W, Cout) out-dtype scratch.
    """
    i = pl.program_id(0)
    ph, pw = kh // 2, kw // 2
    cin = x_hbm.shape[-1]
    cout = out_hbm.shape[-1]
    inv = inv_ref[0, 0, 0]
    scale = scale_ref[0, 0]
    bias = b_ref[0, 0]
    for c0 in range(0, h, chunk):
        lo = max(c0 - ph, 0)
        hi = min(c0 + chunk + ph, h)
        top = ph + lo - c0  # zero-pad rows at the image top edge
        cp = pltpu.make_async_copy(
            x_hbm.at[i, lo:hi], xbuf.at[pl.ds(top, hi - lo)], sem_in
        )
        cp.start()
        if c0 + chunk + ph > h or c0 - ph < 0:
            # edge chunks: clear the halo rows the DMA does not fill
            # (scratch persists across chunks/programs — stale otherwise)
            if top > 0:
                xbuf[0:top] = jnp.zeros((top, w, cin), xbuf.dtype)
            bot = (c0 + chunk + ph) - hi
            if bot > 0:
                xbuf[xbuf.shape[0] - bot :] = jnp.zeros(
                    (bot, w, cin), xbuf.dtype
                )
        cp.wait()
        q = jnp.clip(
            jnp.round(xbuf[:].astype(jnp.float32) * inv), -127, 127
        ).astype(jnp.int8)
        q = jnp.pad(q, ((0, 0), (pw, pw), (0, 0)))
        acc = jnp.zeros((chunk * w, cout), jnp.int32)
        for dy in range(kh):
            for dx in range(kw):
                sl = q[dy : dy + chunk, dx : dx + w]
                acc = acc + jax.lax.dot_general(
                    sl.reshape(chunk * w, cin),
                    kq_ref[dy, dx],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        if c0 > 0:
            # reusing obuf: make sure the previous chunk's copy-out is done
            pltpu.make_async_copy(
                obuf, out_hbm.at[i, c0 - chunk : c0], sem_out
            ).wait()
        y = acc.astype(jnp.float32) * scale + bias
        obuf[:] = y.reshape(chunk, w, cout).astype(obuf.dtype)
        pltpu.make_async_copy(
            obuf, out_hbm.at[i, c0 : c0 + chunk], sem_out
        ).start()
    pltpu.make_async_copy(
        obuf, out_hbm.at[i, h - chunk : h], sem_out
    ).wait()


@functools.partial(
    jax.jit, static_argnames=("chunk", "out_dtype", "interpret")
)
def _run(x, inv, scale, bias, kq, chunk, out_dtype, interpret):
    n, h, w, cin = x.shape
    kh, kw, _, cout = kq.shape
    ph, pw = kh // 2, kw // 2
    kern = functools.partial(
        _kernel, kh=kh, kw=kw, h=h, w=w, chunk=chunk
    )
    return pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i: (0, 0, 0)),
            pl.BlockSpec((kh, kw, cin, cout), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((chunk + 2 * ph, w, cin), x.dtype),
            pltpu.VMEM((chunk, w, cout), out_dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(inv, scale, bias, kq, x)


def qconv2d_pallas(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    chunk: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """Fused W8A8 stride-1 SAME conv; drop-in for ``conv2d_w8a8``.

    x: (N, H, W, Cin); kernel: (kh, kw, Cin, Cout) float.  Weight
    quantization (symmetric per-out-channel) and the per-sample activation
    max run in XLA — both are bandwidth-trivial next to the conv.
    """
    k32 = kernel.astype(jnp.float32)
    sw = jnp.max(jnp.abs(k32), axis=(0, 1, 2)) / 127.0 + 1e-12
    kq = jnp.clip(jnp.round(k32 / sw), -127, 127).astype(jnp.int8)
    b = (
        bias.astype(jnp.float32)
        if bias is not None
        else jnp.zeros((kernel.shape[-1],), jnp.float32)
    )
    sx = (
        jnp.max(jnp.abs(x.astype(jnp.float32)), axis=(1, 2, 3)) / 127.0
        + 1e-12
    )  # (N,)
    inv = (1.0 / sx)[:, None, None]
    scale = (sx[:, None] * sw[None, :])[:, None, :]  # (N, 1, Cout)
    n = x.shape[0]
    bias3 = jnp.broadcast_to(b[None, None, :], (1, 1, b.shape[0]))
    h = x.shape[1]
    c = min(chunk, h)
    while h % c:
        c -= 1
    return _run(x, inv, scale, bias3, kq, c, x.dtype, interpret)
