"""Pallas TPU kernel: fused dynamic W8A8 convolution.

The XLA W8A8 path (``ops/qconv.py``) wins on MXU rate but leaks its gain to
HBM traffic: the activation quantize (read bf16 + write int8), the int32
accumulator materialization, and the dequant epilogue are all separate HBM
round-trips around a 0.5-1 ms conv (measured: raw s8 conv 0.49 ms vs 1.17 ms
with XLA quant/dequant for 512ch@64^2, tools/exp_int8.py).

This kernel keeps the pipeline VMEM-resident: per (sample, row-chunk)
program it DMAs the bf16 rows (plus halo) from HBM once, quantizes on the
VPU, runs the kh*kw shifted int8 matmuls on the MXU with int32 accumulation,
and dequants (+bias) straight into the bf16 output rows — ONE read of x and
ONE write of y.  The row chunk is a GRID dimension (not an in-kernel loop),
so the kernel body stays small enough for the relay's remote compiler; the
output writes through a regular BlockSpec while x stays in ``ANY`` space
with a manual halo DMA (whole-image VMEM blocks at these shapes overflow
VMEM once double-buffered).

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
    inv_ref, scale_ref, b_ref, kq_ref, x_hbm, out_ref, xbuf, sem_in,
    *, kh, kw, h, w, chunk,
):
    """One (sample, row-chunk) per program.

    inv_ref:   (1, 1, 1) f32 per-sample 1/activation-scale.
    scale_ref: (1, 1, Cout) f32 per-sample dequant scale (sx * sw).
    b_ref:     (1, 1, Cout) f32 bias (zeros when absent).
    kq_ref: (kh, kw, Cin, Cout) int8 (VMEM).
    x_hbm:  (N, H, W, Cin) input, HBM/ANY.
    out_ref:(1, chunk, W, Cout) output rows (BlockSpec-pipelined).
    xbuf:   (chunk + 2*ph, W, Cin) bf16 scratch.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    ph, pw = kh // 2, kw // 2
    cin = x_hbm.shape[-1]
    cout = out_ref.shape[-1]
    # fixed-size row fetch clamped into the image (Mosaic requires static
    # DMA shapes); edge programs fix the halo up below with static rolls
    src0 = jnp.clip(j * chunk - ph, 0, h - (chunk + 2 * ph))
    cp = pltpu.make_async_copy(
        x_hbm.at[i, pl.ds(src0, chunk + 2 * ph)], xbuf, sem_in
    )
    cp.start()
    cp.wait()
    if ph > 0:
        @pl.when(j == 0)
        def _top_edge():
            # buf holds rows [0, chunk+2ph); want [-ph, chunk+ph) with the
            # out-of-image rows zeroed (slice+concat — scatter/.at[] does
            # not lower in Mosaic)
            v = xbuf[:]
            xbuf[:] = jnp.concatenate(
                [jnp.zeros((ph, w, cin), v.dtype), v[: chunk + ph]], axis=0
            )

        @pl.when((j == nj - 1) & (nj > 1))
        def _bottom_edge():
            v = xbuf[:]
            xbuf[:] = jnp.concatenate(
                [v[ph:], jnp.zeros((ph, w, cin), v.dtype)], axis=0
            )

    inv = inv_ref[0, 0, 0]
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
    y = acc.astype(jnp.float32) * scale_ref[0, 0] + b_ref[0, 0]
    out_ref[0] = y.reshape(chunk, w, cout).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("chunk", "out_dtype", "interpret")
)
def _run(x, inv, scale, bias, kq, chunk, out_dtype, interpret):
    n, h, w, cin = x.shape
    kh, kw, _, cout = kq.shape
    ph = kh // 2
    kern = functools.partial(
        _kernel, kh=kh, kw=kw, h=h, w=w, chunk=chunk
    )
    return pl.pallas_call(
        kern,
        grid=(n, h // chunk),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, cout), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((kh, kw, cin, cout), lambda i, j: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, chunk, w, cout), lambda i, j: (i, j, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((chunk + 2 * ph, w, cin), x.dtype),
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
    bias3 = jnp.broadcast_to(b[None, None, :], (1, 1, b.shape[0]))
    h, w = x.shape[1], x.shape[2]
    cout = kernel.shape[-1]
    ph = kernel.shape[0] // 2
    c = min(chunk, h)
    # stay under Mosaic's 16MB scoped-VMEM stack: the int32 accumulator +
    # f32 epilogue + double-buffered output rows all scale with the chunk
    while c > 1 and (
        h % c or (c + 2 * ph) > h or c * w * cout * 8 > (4 << 20)
    ):
        c -= 1
    if (c + 2 * ph) > h:
        # the fixed-size halo fetch (chunk + 2*ph rows clamped into the
        # image) needs h >= chunk + 2*ph; tiny images can't satisfy it
        raise ValueError(
            f"qconv2d_pallas needs h >= 1 + 2*(kh//2) rows (h={h}, kh="
            f"{kernel.shape[0]}); use conv2d_w8a8 for small images")
    from canonswap_tpu.ops.pallas.spmd import batch_partitioned

    def fn(xx, iv, sc, bb, kk):
        return _run(xx, iv, sc, bb, kk, c, x.dtype, interpret)

    # x/inv/scale carry the sample axis; bias/kernel are replicated
    return batch_partitioned(
        fn, (True, True, True, False, False), x.ndim)(
        x, inv, scale, bias3, kq)
