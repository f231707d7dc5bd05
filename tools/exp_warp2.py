"""Round-3 warp-gather overhead shaving probes.

The packed gather (36-38 ms/site) decomposes as pack 5.7 + gather 18 +
reduce 2.3 + ~10 unexplained.  Probe alternate issue forms; the row count
itself (1 row/point) is provably minimal for arbitrary deformations.

Usage: python tools/exp_warp2.py [name ...]
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


def _inputs():
    from canonswap_tpu.ops.heatmap import make_coordinate_grid_3d

    vol = jax.random.normal(jax.random.PRNGKey(0), (B, 16, 64, 64, 32), DT)
    grid = make_coordinate_grid_3d((16, 64, 64), DT)
    deform = grid[None] + jax.random.normal(
        jax.random.PRNGKey(1), (B, 16, 64, 64, 3), DT) * 0.05
    return vol, deform


def warp_flat_take(vol, grid):
    """Variant: ONE flat jnp.take over the batch-merged packed table
    (global row ids) instead of batched take_along_axis."""
    from canonswap_tpu.ops.grid_sample import _unnormalize

    b, d, h, w, c = vol.shape
    out_shape = grid.shape[:-1]
    x = _unnormalize(grid[..., 0].astype(jnp.float32), w)
    y = _unnormalize(grid[..., 1].astype(jnp.float32), h)
    z = _unnormalize(grid[..., 2].astype(jnp.float32), d)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    fx = (x - x0).astype(vol.dtype)
    fy = (y - y0).astype(vol.dtype)
    fz = (z - z0).astype(vol.dtype)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    z0i = z0.astype(jnp.int32)

    vp = jnp.pad(vol, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    corners = [
        vp[:, dz : dz + d + 1, dy : dy + h + 1, dx : dx + w + 1]
        for dz in (0, 1) for dy in (0, 1) for dx in (0, 1)
    ]
    packed = jnp.concatenate(corners, axis=-1)
    rows_per_b = (d + 1) * (h + 1) * (w + 1)
    packed = packed.reshape(b * rows_per_b, 8 * c)

    zc = jnp.clip(z0i + 1, 0, d)
    yc = jnp.clip(y0i + 1, 0, h)
    xc = jnp.clip(x0i + 1, 0, w)
    flat = (zc * (h + 1) + yc) * (w + 1) + xc
    boff = (jnp.arange(b, dtype=jnp.int32) * rows_per_b)[
        :, None, None, None]
    rows = jnp.take(packed, (flat + boff).reshape(-1), axis=0)
    rows = jax.lax.optimization_barrier(rows)
    rows = rows.reshape(*out_shape, 8, c)

    weights = []
    for dz in (0, 1):
        wz = fz if dz else 1.0 - fz
        vz = (z0i + dz >= 0) & (z0i + dz < d)
        for dy in (0, 1):
            wy = fy if dy else 1.0 - fy
            vy = (y0i + dy >= 0) & (y0i + dy < h)
            for dx in (0, 1):
                wx = fx if dx else 1.0 - fx
                vx = (x0i + dx >= 0) & (x0i + dx < w)
                valid = (vz & vy & vx) & (
                    (z0i + 1 == zc) & (y0i + 1 == yc) & (x0i + 1 == xc)
                )
                weights.append(wz * wy * wx * valid.astype(vol.dtype))
    wstack = jax.lax.optimization_barrier(jnp.stack(weights, axis=-1))
    return jnp.einsum("...kc,...k->...c", rows, wstack)


def warp_nobarrier(vol, grid):
    """Current formulation minus the two optimization barriers (re-check:
    surroundings changed since r2 measured them as a win)."""
    import canonswap_tpu.ops.grid_sample as GS

    orig = jax.lax.optimization_barrier
    try:
        jax.lax.optimization_barrier = lambda x: x
        return GS.grid_sample_3d_packed(vol, grid)
    finally:
        jax.lax.optimization_barrier = orig


def main():
    from canonswap_tpu.ops.grid_sample import grid_sample_3d_packed

    vol, deform = _inputs()
    probes = {
        "warp_packed_base": lambda: scan_slope_time(
            grid_sample_3d_packed, (vol, deform)),
        "warp_flat_take": lambda: scan_slope_time(
            warp_flat_take, (vol, deform)),
        "warp_nobarrier": lambda: scan_slope_time(
            warp_nobarrier, (vol, deform)),
    }
    only = set(sys.argv[1:])
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.environ.get("CANONSWAP_PROFILE_LOG", "profile_r4.jsonl"))
    with open(out_path, "a") as fh:
        for name, fn in probes.items():
            if only and name not in only:
                continue
            try:
                rec = {"stage": name,
                       "ms_per_step": round(fn() * 1000, 2), "batch": B}
            except Exception as e:
                rec = {"stage": name, "error": repr(e)[:300]}
            print(json.dumps(rec), flush=True)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()


if __name__ == "__main__":
    main()
