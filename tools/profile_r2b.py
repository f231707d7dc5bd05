"""Experiment round 2: conv formulations, modulated-conv/SPADE slack,
gather alternatives.  Appends JSON lines to tools/profile_r2.jsonl."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax import lax

from ubench import cast_tree, scan_slope_time

DT = jnp.bfloat16
B = 16
R = jax.random


def _init_cpu(module, *args, **kwargs):
    with jax.default_device(jax.devices("cpu")[0]):
        f32 = [a.astype(jnp.float32) if hasattr(a, "astype") else a
               for a in args]
        p = module.init(jax.random.PRNGKey(0), *f32, **kwargs)
    return jax.device_put(cast_tree(p, DT), jax.devices()[0])


def stages():
    rng = R.PRNGKey(0)

    # ---- big-conv rate probes ----------------------------------------------
    x512 = R.normal(rng, (2 * B, 64, 64, 512), DT)
    k512 = R.normal(rng, (3, 3, 512, 512), DT) * 0.02
    yield "conv2d_raw_512_512", (
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (x512, k512),
    )
    x256 = R.normal(rng, (B, 128, 128, 256), DT)
    k256 = R.normal(rng, (3, 3, 256, 256), DT) * 0.02
    yield "conv2d_raw_256_256_128sq", (
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (x256, k256),
    )
    # mask head: 512 -> 1 channel
    xm = R.normal(rng, (B, 64, 64, 512), DT)
    km = R.normal(rng, (3, 3, 512, 1), DT) * 0.02
    yield "conv2d_mask_512_1", (
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (xm, km),
    )
    # mask head alternative: 9 shifted channel-dots (VPU reduction)
    def mask_stencil(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        out = 0.0
        for dy in range(3):
            for dx in range(3):
                out = out + jnp.einsum(
                    "nhwc,c->nhw", xp[:, dy:dy + 64, dx:dx + 64], k[dy, dx, :, 0]
                )
        return out
    yield "mask_stencil_512_1", (mask_stencil, (xm, km))

    # ---- modulated conv / swap sub-parts ------------------------------------
    from canonswap_tpu.ops.modulated_conv import adaptive_blend_conv

    style = R.normal(rng, (B, 512), DT)
    mask = jax.nn.sigmoid(R.normal(rng, (B, 64, 64, 1), DT))
    bias = jnp.zeros((512,), DT)
    yield "adaptive_blend_conv", (
        lambda x, k, s, m: adaptive_blend_conv(x, k, s, m, bias),
        (xm, k512, style, mask),
    )
    from canonswap_tpu.models.swap import AdaptiveConv2d
    ac = AdaptiveConv2d(512, 512)
    ac_p = _init_cpu(ac, xm[:1], style[:1])
    yield "adaptive_conv2d_full", (
        lambda p, x, s: ac.apply(p, x, s), (ac_p, xm, style))

    # ---- SPADE sub-parts -----------------------------------------------------
    from canonswap_tpu.nn.blocks import SPADEResnetBlock, instance_norm
    yield "instance_norm_512_64sq", (lambda x: instance_norm(x), (xm,))
    seg = R.normal(rng, (B, 64, 64, 256), DT)
    sb = SPADEResnetBlock(512, 512)
    sb_p = _init_cpu(sb, xm[:1], seg[:1])
    yield "spade_block_512", (
        lambda p, x, s: sb.apply(p, x, s), (sb_p, xm, seg))
    sb2 = SPADEResnetBlock(256, 64)
    x256b = R.normal(rng, (B, 256, 256, 256), DT)
    sb2_p = _init_cpu(sb2, x256b[:1], seg[:1])
    yield "spade_block_up1_256", (
        lambda p, x, s: sb2.apply(p, x, s), (sb2_p, x256b, seg))

    # ---- 32-channel conv3d alternatives -------------------------------------
    vol = R.normal(rng, (B, 16, 64, 64, 32), DT)
    k333 = R.normal(rng, (3, 3, 3, 32, 32), DT) * 0.05
    yield "conv3d_32_32_direct", (
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")),
        (vol, k333),
    )
    yield "conv3d_32_32_f32", (
        lambda x, k: lax.conv_general_dilated(
            x.astype(jnp.float32), k.astype(jnp.float32), (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")).astype(DT),
        (vol, k333),
    )
    # space-to-depth packed rate probe (4x flops, 128 channels)
    volp = R.normal(rng, (B, 16, 32, 32, 128), DT)
    kp = R.normal(rng, (3, 3, 3, 128, 128), DT) * 0.02
    yield "conv3d_packed128_rate", (
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC")),
        (volp, kp),
    )
    # 2D 32->32 probe (one depth tap equivalent)
    x2d32 = vol.reshape(B * 16, 64, 64, 32)
    k2d32 = R.normal(rng, (3, 3, 32, 32), DT) * 0.05
    yield "conv2d_raw_32_32", (
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (x2d32, k2d32),
    )
    # im2col matmul: 27-tap stacked dot (materializes (B,16,64,64,864))
    def im2col_dot(x, k):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [xp[:, dz:dz + 16, dy:dy + 64, dx:dx + 64]
             for dz in range(3) for dy in range(3) for dx in range(3)],
            axis=-1,
        )
        return jnp.einsum("bdhwk,ko->bdhwo", cols,
                          k.reshape(27 * 32, 32),
                          preferred_element_type=jnp.float32).astype(x.dtype)
    yield "conv3d_32_32_im2col", (im2col_dot, (vol, k333))

    # ---- gather alternatives -------------------------------------------------
    from canonswap_tpu.ops.heatmap import make_coordinate_grid_3d

    grid = make_coordinate_grid_3d((16, 64, 64), DT)
    deform = grid[None] + R.normal(rng, (B, 16, 64, 64, 3), DT) * 0.05
    # fat-row 2D gather: all 16 z-slices + 4 xy-corners packed into channels
    def gather_fat(vol, deform):
        b, d, h, w, c = vol.shape
        x = (deform[..., 0] + 1.0) * (w / 2) - 0.5
        y = (deform[..., 1] + 1.0) * (h / 2) - 0.5
        z = (deform[..., 2] + 1.0) * (d / 2) - 0.5
        x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
        fx = (x - x0).astype(vol.dtype); fy = (y - y0).astype(vol.dtype)
        fz = (z - z0).astype(vol.dtype)
        # pack: (B, H+1, W+1, 4*D*C) with 4 xy corners
        vp = jnp.pad(vol, ((0, 0), (0, 0), (1, 1), (1, 1), (0, 0)))
        vp = jnp.moveaxis(vp, 1, 3)  # (B, H+2, W+2, D, C)
        vp = vp.reshape(b, h + 2, w + 2, d * c)
        corners = [vp[:, dy:dy + h + 1, dx:dx + w + 1]
                   for dy in (0, 1) for dx in (0, 1)]
        packed = jnp.concatenate(corners, axis=-1)  # (B,H+1,W+1,4DC)
        packed = packed.reshape(b, (h + 1) * (w + 1), 4 * d * c)
        yc = jnp.clip(y0.astype(jnp.int32) + 1, 0, h)
        xc = jnp.clip(x0.astype(jnp.int32) + 1, 0, w)
        flat = (yc * (w + 1) + xc).reshape(b, -1)
        rows = jnp.take_along_axis(packed, flat[..., None], axis=1)
        rows = rows.reshape(b, d, h, w, 2, 2, d, c)  # dy,dx,zslice
        wy = jnp.stack([1 - fy, fy], -1)
        wx = jnp.stack([1 - fx, fx], -1)
        z0i = z0.astype(jnp.int32)
        zsel = jax.nn.one_hot(z0i, d, dtype=vol.dtype) * (1 - fz)[..., None] \
            + jax.nn.one_hot(z0i + 1, d, dtype=vol.dtype) * fz[..., None]
        return jnp.einsum("bdhwyxsc,bdhwy,bdhwx,bdhws->bdhwc",
                          rows, wy, wx, zsel)
    yield "gather_fat_rows_z_dense", (gather_fat, (vol, deform))

    # Pallas dynamic_gather probe: per-lane sublane gather on (1024, 2048)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def dg_kernel(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)

    def dyn_gather(x, idx):
        return pl.pallas_call(
            dg_kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, idx)

    xg = R.normal(rng, (1024, 2048), jnp.float32)
    ig = R.randint(R.PRNGKey(3), (1024, 2048), 0, 1024, jnp.int32)
    def dyn_gather_batch(x, idx):
        return jax.vmap(dyn_gather)(
            jnp.broadcast_to(x, (B, *x.shape)),
            jnp.broadcast_to(idx, (B, *idx.shape)))
    yield "pallas_dynamic_gather_16x", (dyn_gather_batch, (xg, ig))

    # ---- hourglass with direct 3D convs --------------------------------------
    from canonswap_tpu.nn import conv3d as C3
    from canonswap_tpu.nn.blocks import Hourglass

    hg = Hourglass(block_expansion=32, in_features=110, num_blocks=5,
                   max_features=1024)
    hg_x = R.normal(rng, (B, 16, 64, 64, 110), DT)
    C3.set_impl_override("direct")
    try:
        hg_p = _init_cpu(hg, hg_x[:1])
        yield "hourglass_direct", (lambda p, x: hg.apply(p, x), (hg_p, hg_x))
    finally:
        pass  # override cleared after the measurement loop runs this stage

    mask_in = R.normal(rng, (B, 16, 64, 64, 142), DT)
    from canonswap_tpu.nn.conv3d import Conv3D
    mk = Conv3D(22, (7, 7, 7), impl="direct")
    mk_p = _init_cpu(mk, mask_in[:1])
    yield "mask_conv_k7_direct", (lambda p, x: mk.apply(p, x), (mk_p, mask_in))
    C3.set_impl_override(None)


def main():
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "profile_r2.jsonl")
    with open(out_path, "a") as fh:
        for name, (fn, inputs) in stages():
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
