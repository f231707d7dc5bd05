"""Pallas TPU kernel: trilinear grid sample as MXU one-hot matmuls.

XLA's row gather is row-count-bound (~26-58M rows/s regardless of row
width — tools/exp_warp2.py), which makes the warp the second-largest stage
of the swap step (2 sites x ~39 ms at CANONICAL B=16).  This kernel removes
the gather entirely, the same way ``ops/pallas/ms_deform_attn.py`` does:
turn the data-dependent read into systolic-array work.

Formulation (exact trilinear, zero padding, align_corners=False — the
``F.grid_sample`` semantics of reference ``src/modules/warping_network.py:47``
and ``src/modules/dense_motion.py:50``):

  1. The volume is z-packed once in XLA: slab[b, y*W+x, zi*C+c] — every
     depth slice side by side on the channel axis.
  2. Per (batch, point-block) program, the xy-bilinear one-hot matrix
     (P x H*W; 4 weighted taps per row) is built on the VPU as a product
     of two "tent" functions max(0, 1 - |grid_y - y|) * max(0, 1 - |grid_x
     - x|) against PRECOMPUTED per-column y/x coordinate rows — no iota,
     no divmod, no compare/select chains, and no 3D intermediate (Mosaic
     cannot shape-cast minor dims).  The tent is exactly the bilinear
     weight, and it vanishes for out-of-range taps = grid_sample zero
     padding.
  3. ONE MXU matmul (P x HW) @ (HW x D*C) samples ALL depth slices at the
     point's xy location with full 512-lane MXU fill.  ``quant=True``
     runs it int8 x int8 -> int32 (the MXU's ~4x rate on this chip) with
     a per-sample slab scale — the flag_int8-style speed lever.
  4. The trilinear z-mix is an elementwise tent mask over the (P, D*C)
     samples followed by a (D*C x C) 0/1 group-sum matmul — again no
     reshape, and the second matmul is noise-sized.

Numerics match ``ops.grid_sample.grid_sample_3d_ref`` to the matmul
dtype's tolerance (tests/test_warp_pallas.py, interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unnormalize(coord, size):
    return ((coord + 1.0) * size - 1.0) * 0.5


def _tent(rows, center):
    # rows: (1, N) f32 integer coordinates; center: (P, 1) f32
    return jnp.maximum(0.0, 1.0 - jnp.abs(rows - center))


def _kernel(
    gx_ref, gy_ref, gz_ref, xrow_ref, yrow_ref, zrow_ref, sscale_ref,
    slab_ref, out_ref, *, d, h, w, c, quant,
):
    """gx/gy/gz_ref: (1, 1, P, 1) f32 normalized coords (trailing singleton
    so each block is a native (P, 1) column vector — no transpose needed to
    broadcast per-point scalars across the HW lane axis).
    xrow/yrow_ref: (1, HW) f32 per-column x/y integer coordinates.
    zrow_ref: (1, D*C) f32 per-column z slice index.
    sscale_ref: (1, 1, 1) f32 per-sample slab dequant scale (quant mode).
    slab_ref: (1, HW, D*C) bf16 (or int8 in quant mode).  out_ref: (1, P, C).
    """
    x = _unnormalize(gx_ref[0, 0], w)  # (P, 1) f32
    y = _unnormalize(gy_ref[0, 0], h)
    z = _unnormalize(gz_ref[0, 0], d)
    onehot = _tent(yrow_ref[0][None, :], y) * _tent(xrow_ref[0][None, :], x)

    if quant:
        q = jnp.round(onehot * 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q, slab_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = acc.astype(jnp.float32) * (sscale_ref[0, 0, 0] * (1.0 / 127.0))
    else:
        s = jax.lax.dot_general(
            onehot.astype(slab_ref.dtype), slab_ref[0],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, D*C) xy-bilinear samples at every depth

    # z-mix: tent-mask the two z taps elementwise, then group-sum depth
    # slices with a constant (D*C, C) selector matmul (no reshape)
    sz = s * _tent(zrow_ref[0][None, :], z)
    rowj = jax.lax.broadcasted_iota(jnp.int32, (d * c, c), 0)
    colc = jax.lax.broadcasted_iota(jnp.int32, (d * c, c), 1)
    gsel = (rowj - (rowj // c) * c == colc).astype(jnp.float32)
    out = jax.lax.dot_general(
        sz, gsel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (P, C)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "c", "pblk", "quant", "out_dtype",
                     "interpret"),
)
def _run(gx, gy, gz, slab, sscale, h, w, c, pblk, quant, out_dtype,
         interpret):
    b, ptot = gx.shape
    hw = slab.shape[1]
    dc = slab.shape[2]
    d = dc // c
    nb = ptot // pblk
    kern = functools.partial(_kernel, d=d, h=h, w=w, c=c, quant=quant)
    g4 = lambda a: a.reshape(b, nb, pblk, 1)  # noqa: E731
    yx = jnp.arange(hw, dtype=jnp.float32)
    yrow = (jnp.floor(yx * (1.0 / w)))[None, :]
    xrow = (yx - yrow[0] * w)[None, :]
    zrow = jnp.floor(
        jnp.arange(dc, dtype=jnp.float32) * (1.0 / c)
    )[None, :]
    return pl.pallas_call(
        kern,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 1, pblk, 1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, pblk, 1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, pblk, 1), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hw), lambda i, j: (0, 0)),
            pl.BlockSpec((1, hw), lambda i, j: (0, 0)),
            pl.BlockSpec((1, dc), lambda i, j: (0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, hw, dc), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, pblk, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, ptot, c), out_dtype),
        interpret=interpret,
    )(g4(gx), g4(gy), g4(gz), xrow, yrow, zrow, sscale, slab)


def _kernel_win(
    gx_ref, gy_ref, gz_ref, xrow_ref, yrow0_ref, zrow0_ref, sscale_ref,
    slab_hbm, out_ref, buf, sem, *, d, h, w, c, win_r, win_z, zsnap, rpb,
    quant,
):
    """Windowed variant: the point block is ``rpb`` consecutive output rows
    at ONE output z-slice, and only a (win_r rows x win_z z-slices) window
    of the slab is DMA'd and matmul'd — valid when every in-volume sample
    lands inside the window (the wrapper's bounds check guarantees it).

    yrow0/zrow0 hold the window's LOCAL integer coordinates starting at 0;
    the window origin (a per-program scalar) is added in-kernel.  xrow is
    origin-free: windows start on row boundaries, so the x pattern repeats.
    The z-origin snaps to ``zsnap`` slices so the slab's dynamic channel
    slice stays 128-lane-aligned (Mosaic memref_slice rule).
    """
    i = pl.program_id(0)
    zo = pl.program_id(1)
    jr = pl.program_id(2)
    r0 = jr * rpb
    oy = jnp.clip(r0 - (win_r - rpb) // 2, 0, h - win_r)
    # offset written as oq * (zsnap*c) — a literal multiple of the 128-lane
    # tile, which Mosaic's divisibility analysis can prove (clip(...)*c
    # cannot be)
    oq = jnp.clip(zo // zsnap - 1, 0, (d - win_z) // zsnap)
    oz = oq * zsnap
    cp = pltpu.make_async_copy(
        slab_hbm.at[
            i, pl.ds(oy * w, win_r * w), pl.ds(oq * (zsnap * c), win_z * c)
        ],
        buf, sem,
    )
    cp.start()
    x = _unnormalize(gx_ref[0, 0], w)  # (P, 1) f32
    y = _unnormalize(gy_ref[0, 0], h)
    z = _unnormalize(gz_ref[0, 0], d)
    onehot = _tent(yrow0_ref[0][None, :] + oy.astype(jnp.float32), y) * _tent(
        xrow_ref[0][None, :], x
    )  # (P, win_r*w)
    cp.wait()
    if quant:
        # W8A8 window: int8 onehot weights x int8 slab -> int32 on the MXU
        # (~2x the bf16 rate) with the per-sample slab scale folded into
        # the dequant — the same scheme as the full-table quant kernel.
        q = jnp.round(onehot * 127.0).astype(jnp.int8)
        acc = jax.lax.dot_general(
            q, buf[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        s = acc.astype(jnp.float32) * (sscale_ref[0, 0, 0] * (1.0 / 127.0))
    else:
        s = jax.lax.dot_general(
            onehot.astype(buf.dtype), buf[:, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (P, win_z*C)
    sz = s * _tent(zrow0_ref[0][None, :] + oz.astype(jnp.float32), z)
    rowj = jax.lax.broadcasted_iota(jnp.int32, (win_z * c, c), 0)
    colc = jax.lax.broadcasted_iota(jnp.int32, (win_z * c, c), 1)
    gsel = (rowj - (rowj // c) * c == colc).astype(jnp.float32)
    out = jax.lax.dot_general(
        sz, gsel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("d", "h", "w", "c", "win_r", "win_z", "zsnap", "rpb",
                     "quant", "out_dtype", "interpret"),
)
def _run_win(gx, gy, gz, slab, sscale, d, h, w, c, win_r, win_z, zsnap, rpb,
             quant, out_dtype, interpret):
    b = gx.shape[0]
    nr = h // rpb
    p = rpb * w
    kern = functools.partial(
        _kernel_win, d=d, h=h, w=w, c=c, win_r=win_r, win_z=win_z,
        zsnap=zsnap, rpb=rpb, quant=quant,
    )
    g4 = lambda a: a.reshape(b, d * nr, p, 1)  # noqa: E731
    yx = jnp.arange(win_r * w, dtype=jnp.float32)
    yrow0 = jnp.floor(yx * (1.0 / w))[None, :]
    xrow = (yx - yrow0[0] * w)[None, :]
    zrow0 = jnp.floor(
        jnp.arange(win_z * c, dtype=jnp.float32) * (1.0 / c)
    )[None, :]
    cblk = lambda i, zi, jr: (i, zi * nr + jr, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(b, d, nr),
        in_specs=[
            pl.BlockSpec((1, 1, p, 1), cblk),
            pl.BlockSpec((1, 1, p, 1), cblk),
            pl.BlockSpec((1, 1, p, 1), cblk),
            pl.BlockSpec((1, win_r * w), lambda i, zi, jr: (0, 0)),
            pl.BlockSpec((1, win_r * w), lambda i, zi, jr: (0, 0)),
            pl.BlockSpec((1, win_z * c), lambda i, zi, jr: (0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i, zi, jr: (i, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, p, c), lambda i, zi, jr: (i, zi * nr + jr, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, d * h * w, c), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((win_r * w, win_z * c), slab.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(g4(gx), g4(gy), g4(gz), xrow, yrow0, zrow0, sscale, slab)
    return out


def _axis_ok(s, origin, size, win):
    """Per-sample: every NEEDED tap (nonzero weight AND inside the volume)
    lies inside [origin, origin+win-1].  Out-of-volume taps contribute the
    zero-padding zero either way, so excluding them is exact."""
    t0 = jnp.floor(s)
    f = s - t0
    t1 = t0 + 1
    in_win0 = (t0 >= origin) & (t0 <= origin + win - 1)
    in_win1 = (t1 >= origin) & (t1 <= origin + win - 1)
    need0 = (t0 >= 0) & (t0 <= size - 1)
    need1 = (t1 >= 0) & (t1 <= size - 1) & (f > 0)
    return (~need0 | in_win0) & (~need1 | in_win1)


def _window_fits_per_sample(sx, sy, sz, d, h, w, win_r, win_z, zsnap, rpb):
    """(B,) bool: per SAMPLE, every needed tap of every point lies inside
    its block's slab window — i.e. the windowed kernel would be exact for
    that sample alone."""
    del sx  # x is never windowed — full width is always resident
    rows = jnp.arange(h, dtype=jnp.float32)
    oy_per_row = jnp.clip(
        (jnp.floor(rows / rpb) * rpb) - (win_r - rpb) // 2, 0, h - win_r
    )  # (H,)
    oy = jnp.tile(jnp.repeat(oy_per_row, w), d)[None, :]  # (1, ptot)
    zs = jnp.arange(d)
    oz_per_z = (
        jnp.clip(zs // zsnap - 1, 0, (d - win_z) // zsnap) * zsnap
    ).astype(jnp.float32)
    oz = jnp.repeat(oz_per_z, h * w)[None, :]
    return jnp.all(
        _axis_ok(sy, oy, h, win_r) & _axis_ok(sz, oz, d, win_z), axis=1
    )


def _window_fits(sx, sy, sz, d, h, w, win_r, win_z, zsnap, rpb):
    """True iff the windowed kernel is exact for this deformation: every
    needed tap of every sample lies inside its block's slab window."""
    return jnp.all(
        _window_fits_per_sample(sx, sy, sz, d, h, w, win_r, win_z, zsnap,
                                rpb))


def window_geometry(d: int, h: int, w: int, c: int):
    """The windowed kernel's geometry for a (D, H, W, C) volume —
    (rpb, win_r, zsnap, win_z), matching grid_sample_3d_onehot."""
    import math

    rpb = 8 if h % 8 == 0 else 1
    win_r = min(32, h)
    zsnap = 128 // math.gcd(c, 128)
    win_z = min(d, 3 * zsnap)
    return rpb, win_r, zsnap, win_z


def window_fit_fraction(vol_shape, grid: jax.Array) -> jax.Array:
    """Observability hook: fraction of samples in ``grid`` (B, D, H, W, 3)
    for which the windowed fast path of :func:`grid_sample_3d_onehot`
    would be taken, for a volume of ``vol_shape`` (B, D, H, W, C).

    The kernel itself dispatches per BATCH (one out-of-window sample sends
    the whole batch to the full-table fallback), so real throughput sits
    between the windowed and full-table numbers depending on this rate —
    report it next to any headline fps (VERDICT r3 weak #3)."""
    b, d, h, w, c = vol_shape
    rpb, win_r, zsnap, win_z = window_geometry(d, h, w, c)
    g = grid.reshape(grid.shape[0], -1, 3).astype(jnp.float32)
    fits = _window_fits_per_sample(
        _unnormalize(g[..., 0], w), _unnormalize(g[..., 1], h),
        _unnormalize(g[..., 2], d), d, h, w, win_r, win_z, zsnap, rpb,
    )
    return jnp.mean(fits.astype(jnp.float32))


def grid_sample_3d_onehot_sharded(
    vol: jax.Array,
    grid: jax.Array,
    *,
    pblk: int = 512,
    quant: bool = False,
    window: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """:func:`grid_sample_3d_onehot` wrapped for SPMD: a pallas_call has no
    automatic partitioning rule, so under a jit with sharded inputs this
    registers a custom-partitioned op that shards the BATCH axis (each
    device runs the kernel on its local shard — the per-sample gather
    never crosses samples) and replicates every other dim.  GSPMD inserts
    the reshard if the operands arrive sharded any other way."""
    import functools as _ft

    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    inner = _ft.partial(grid_sample_3d_onehot, pblk=pblk, quant=quant,
                        window=window, interpret=interpret)

    def _batch_spec(mesh, arg_shapes):
        try:
            spec = arg_shapes[0].sharding.spec
            b = spec[0] if len(spec) else None
        except (AttributeError, IndexError):
            b = None
        return NamedSharding(mesh, P(b, None, None, None, None))

    cp = custom_partitioning(lambda v, g: inner(v, g))

    def infer(mesh, arg_shapes, result_shape):
        return _batch_spec(mesh, arg_shapes)

    def partition(mesh, arg_shapes, result_shape):
        s = _batch_spec(mesh, arg_shapes)
        return mesh, (lambda v, g: inner(v, g)), s, (s, s)

    # Shardy drives propagation from the einsum-like rule (batch factor
    # passes through; every other factor must be replicated — the kernel
    # gathers across the whole volume); the GSPMD callbacks keep the op
    # working under the legacy partitioner.
    cp.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b d h w c, b d h w t -> b d h w c",
        need_replication_factors=("d", "h", "w", "c", "t"),
    )
    return cp(vol, grid)


def grid_sample_3d_onehot(
    vol: jax.Array,
    grid: jax.Array,
    *,
    pblk: int = 512,
    quant: bool = False,
    window: bool = True,
    interpret: bool = False,
) -> jax.Array:
    """Trilinear grid sample via one-hot MXU matmuls.

    vol: (B, D, H, W, C); grid: (B, Do, Ho, Wo, 3) with xyz in [-1, 1].
    Returns (B, Do, Ho, Wo, C).  Equivalent to ``grid_sample_3d_ref``;
    exact up to matmul dtype at ``quant=False``, W8A8-quantized sampling
    weights/features at ``quant=True`` (per-sample symmetric scale).

    ``window=True`` (default, needs grid shape == vol shape): when every
    sample lands within a 32-row x 4-z-slice window of its own output
    position — true for the bounded, smooth deformation fields dense
    motion emits — an 8x-smaller windowed matmul runs instead of the full
    table; a device-side bounds check falls back to the full kernel
    otherwise.  At ``quant=False`` both branches compute the same exact
    result.  At ``quant=True`` the slab is quantized once and BOTH
    branches run W8A8 (the windowed W8A8 matmul is ~2x the bf16 windowed
    rate and halves the window DMA; per-sample symmetric scale, same
    scheme either branch, so the cond branches agree up to tap rounding).
    """
    b, d, h, w, c = vol.shape
    out_shape = grid.shape[:-1]
    # z-packed slab: (B, H*W, D*C), built with one transpose (bandwidth)
    slab = vol.transpose(0, 2, 3, 1, 4).reshape(b, h * w, d * c)
    g = grid.reshape(b, -1, 3).astype(jnp.float32)
    ptot = g.shape[1]
    pb = min(pblk, ptot)
    while ptot % pb:
        pb -= 1
    gx, gy, gz = g[..., 0], g[..., 1], g[..., 2]

    def run_full(_):
        # quantize INSIDE the branch: when the windowed fast path is taken
        # (the common case for in-range fields) the full-slab abs-max +
        # round/clip is never executed (lax.cond runs one branch)
        if quant:
            sxq = (
                jnp.max(jnp.abs(slab.astype(jnp.float32)), axis=(1, 2))
                / 127.0 + 1e-12
            )  # (B,)
            sscale = sxq[:, None, None]
            slab_full = jnp.clip(
                jnp.round(slab.astype(jnp.float32) / sscale), -127, 127
            ).astype(jnp.int8)
        else:
            sscale = jnp.ones((b, 1, 1), jnp.float32)
            slab_full = slab
        return _run(gx, gy, gz, slab_full, sscale, h, w, c, pb,
                    quant, vol.dtype, interpret)

    import math

    rpb = 8 if h % 8 == 0 else 1
    win_r = min(32, h)
    # z origin must snap so the slab channel-slice offset (oz*c) is a
    # multiple of 128 lanes; window = 3 snap groups (block + margin each
    # side), or the whole depth when that's smaller
    zsnap = 128 // math.gcd(c, 128)
    win_z = min(d, 3 * zsnap)
    windowable = (
        window and out_shape == (b, d, h, w) and h % rpb == 0
        and w % 8 == 0 and rpb * w >= 8 and d * h * w == ptot
        and (win_z == d
             or ((win_z * c) % 128 == 0 and (d - win_z) % zsnap == 0))
        and win_r * w < h * w  # a window no smaller than the slab is no win
    )
    if not windowable:
        out = run_full(None)
        return out.reshape(*out_shape, c)

    fits = _window_fits(
        _unnormalize(gx, w), _unnormalize(gy, h), _unnormalize(gz, d),
        d, h, w, win_r, win_z, zsnap, rpb,
    )
    if quant:
        # quantize ONCE, outside the cond: both branches consume the int8
        # slab (per-sample symmetric scale), so the windowed fast path gets
        # the MXU's ~2x s8 rate AND half the window DMA traffic (measured
        # 19.8 -> ~13 ms/16f at CANONICAL; tools/profile_r5.jsonl
        # warp_win_quant)
        sxq = (jnp.max(jnp.abs(slab.astype(jnp.float32)), axis=(1, 2))
               / 127.0 + 1e-12)
        sscale = sxq[:, None, None]
        slab_q = jnp.clip(
            jnp.round(slab.astype(jnp.float32) / sscale), -127, 127
        ).astype(jnp.int8)

        def run_win_q(_):
            return _run_win(gx, gy, gz, slab_q, sscale, d, h, w, c, win_r,
                            win_z, zsnap, rpb, True, vol.dtype, interpret)

        def run_full_q(_):
            return _run(gx, gy, gz, slab_q, sscale, h, w, c, pb, True,
                        vol.dtype, interpret)

        out = jax.lax.cond(fits, run_win_q, run_full_q, None)
        return out.reshape(*out_shape, c)

    def run_win(_):
        return _run_win(gx, gy, gz, slab,
                        jnp.ones((b, 1, 1), jnp.float32), d, h, w, c,
                        win_r, win_z, zsnap, rpb, False, vol.dtype,
                        interpret)

    out = jax.lax.cond(fits, run_win, run_full, None)
    return out.reshape(*out_shape, c)
