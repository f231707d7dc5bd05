"""Round-2 session-2 measurements: gather barrier, swap internals, batch
scaling, adaptive-conv re-measure.  Appends to tools/profile_r2.jsonl."""

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
    vol = R.normal(rng, (B, 16, 64, 64, 32), DT)

    # ---- gather: materialize the packed table via optimization_barrier ----
    from canonswap_tpu.ops.grid_sample import (
        grid_sample_3d_packed, _unnormalize)
    from canonswap_tpu.ops.heatmap import make_coordinate_grid_3d

    grid3 = make_coordinate_grid_3d((16, 64, 64), jnp.float32)
    deform = grid3[None] + R.normal(rng, (B, 16, 64, 64, 3), jnp.float32) * 0.05

    yield "gather_packed_remeasure", (
        lambda v, g: grid_sample_3d_packed(v, g), (vol, deform))

    def gather_barrier(vol, grid):
        b, d, h, w, c = vol.shape
        out_shape = grid.shape[:-1]
        x = _unnormalize(grid[..., 0].astype(jnp.float32), w)
        y = _unnormalize(grid[..., 1].astype(jnp.float32), h)
        z = _unnormalize(grid[..., 2].astype(jnp.float32), d)
        x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
        fx = (x - x0).astype(vol.dtype); fy = (y - y0).astype(vol.dtype)
        fz = (z - z0).astype(vol.dtype)
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32); z0i = z0.astype(jnp.int32)
        vp = jnp.pad(vol, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
        corners = [vp[:, dz:dz + d + 1, dy:dy + h + 1, dx:dx + w + 1]
                   for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)]
        packed = jnp.concatenate(corners, axis=-1)
        packed = packed.reshape(b, (d + 1) * (h + 1) * (w + 1), 8 * c)
        packed = lax.optimization_barrier(packed)  # force materialization
        zc = jnp.clip(z0i + 1, 0, d); yc = jnp.clip(y0i + 1, 0, h)
        xc = jnp.clip(x0i + 1, 0, w)
        flat = (zc * (h + 1) + yc) * (w + 1) + xc
        rows = jnp.take_along_axis(packed, flat.reshape(b, -1)[..., None], axis=1)
        rows = rows.reshape(*out_shape, 8, c)
        ws = []
        for dz in (0, 1):
            wz = fz if dz else 1.0 - fz
            vz = (z0i + dz >= 0) & (z0i + dz < d)
            for dy in (0, 1):
                wy = fy if dy else 1.0 - fy
                vy = (y0i + dy >= 0) & (y0i + dy < h)
                for dx in (0, 1):
                    wx = fx if dx else 1.0 - fx
                    vx = (x0i + dx >= 0) & (x0i + dx < w)
                    ws.append(wz * wy * wx * (vz & vy & vx).astype(vol.dtype))
        wstack = jnp.stack(ws, axis=-1)
        return jnp.einsum("...kc,...k->...c", rows, wstack)

    yield "gather_packed_barrier", (gather_barrier, (vol, deform))

    # ---- adaptive conv: careful isolated re-measures ----
    from canonswap_tpu.ops.modulated_conv import adaptive_blend_conv

    x2d = R.normal(rng, (B, 64, 64, 512), DT)
    w = R.normal(rng, (3, 3, 512, 512), DT) * 0.01
    style = R.normal(rng, (B, 512), DT)
    mask = jax.nn.sigmoid(R.normal(rng, (B, 64, 64, 1), DT))
    bias = jnp.zeros((512,), DT)
    yield "adaptive_blend_conv_512", (
        lambda x, w, s, m, b2: adaptive_blend_conv(x, w, s, m, b2),
        (x2d, w, style, mask, bias))

    x2d32 = jnp.concatenate([x2d, x2d], axis=0)
    yield "conv2d_raw_512_batch32", (
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (x2d32, w))
    yield "conv2d_raw_512_batch16", (
        lambda x, k: lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")),
        (x2d, w))

    # ---- swap module internals ----
    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.models.swap import AdaptiveResBlock2d, SwapModule

    blk = AdaptiveResBlock2d(512, 512)
    blk_p = _init_cpu(blk, x2d[:1], style[:1].astype(jnp.float32))
    yield "adaptive_resblock_full", (
        lambda p, x, s: blk.apply(p, x, s), (blk_p, x2d, style))

    sw = SwapModule(CANONICAL.swap)
    sid = R.normal(rng, (B, 512), DT)
    sw_p = _init_cpu(sw, vol[:1], sid[:1].astype(jnp.float32))
    yield "swap_module_remeasure", (
        lambda p, v, i: sw.apply(p, v, i), (sw_p, vol, sid))

    # ---- dense motion with direct hourglass (wired) ----
    from canonswap_tpu.models.dense_motion import DenseMotionNetwork

    kp1 = R.normal(rng, (B, 21, 3), DT) * 0.1
    kp2 = kp1 + R.normal(R.PRNGKey(2), (B, 21, 3), DT) * 0.05
    dm = DenseMotionNetwork(cfg=CANONICAL.warping.dense_motion, num_kp=21)
    dm_p = _init_cpu(dm, vol[:1], kp1[:1], kp2[:1])
    yield "dense_motion_direct_hg", (
        lambda p, v, a, b2: dm.apply(p, v, a, b2), (dm_p, vol, kp1, kp2))


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
