"""Experiment: trilinear-warp formulations for the hot final warp.

NOTE: Pallas dynamic_gather variants were tried and CRASH the remote Mosaic
compiler on this toolchain (tpu_compile_helper exit 1; repeated attempts hang
the relay ~30 min).  Only the 128-lane axis-1 gather compiles, which cannot
express a volume-sized row gather.  Keep to XLA formulations here.

Shapes: vol (B, 16, 64, 64, 32) bf16, grid (B, 16, 64, 64, 3).
Candidates:
  packed   - current XLA corner-packed gather (grid_sample_3d_packed)
  ref      - flat 8-gather reference
Run on the real TPU; prints ms per call (batch) and parity vs ref.
"""

from __future__ import annotations

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/canonswap_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from canonswap_tpu.ops.grid_sample import (
    grid_sample_3d_packed,
    grid_sample_3d_ref,
    _unnormalize,
)
from tools.ubench import scan_slope_time

D, H, W, C = 16, 64, 64, 32
P = D * H * W


def corner_indices_weights(grid):
    """grid (B, D, H, W, 3) -> idx (B, P, 8) int32 clamped flat rows,
    wgt (B, P, 8) f32 (0 for out-of-range corners)."""
    b = grid.shape[0]
    x = _unnormalize(grid[..., 0].astype(jnp.float32), W)
    y = _unnormalize(grid[..., 1].astype(jnp.float32), H)
    z = _unnormalize(grid[..., 2].astype(jnp.float32), D)
    x0 = jnp.floor(x); y0 = jnp.floor(y); z0 = jnp.floor(z)
    fx = x - x0; fy = y - y0; fz = z - z0
    x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32); z0i = z0.astype(jnp.int32)
    idxs, wgts = [], []
    for dz in (0, 1):
        wz = fz if dz else 1.0 - fz
        vz = (z0i + dz >= 0) & (z0i + dz < D)
        for dy in (0, 1):
            wy = fy if dy else 1.0 - fy
            vy = (y0i + dy >= 0) & (y0i + dy < H)
            for dx in (0, 1):
                wx = fx if dx else 1.0 - fx
                vx = (x0i + dx >= 0) & (x0i + dx < W)
                flat = ((z0i + dz) * H + (y0i + dy)) * W + (x0i + dx)
                idxs.append(jnp.clip(flat, 0, P - 1))
                wgts.append(wz * wy * wx * (vz & vy & vx).astype(jnp.float32))
    idx = jnp.stack(idxs, axis=-1).reshape(b, P, 8)
    wgt = jnp.stack(wgts, axis=-1).reshape(b, P, 8)
    return idx, wgt


def main():
    b = int(os.environ.get("B", "16"))
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.standard_normal((b, D, H, W, C)), jnp.bfloat16)
    # smooth-ish displacement field like the dense-motion output
    base = np.stack(np.meshgrid(
        np.linspace(-1, 1, W), np.linspace(-1, 1, H), np.linspace(-1, 1, D),
        indexing="ij"), axis=-1)  # x,y,z meshgrid -> transpose to D,H,W
    base = np.transpose(base, (2, 1, 0, 3))
    disp = rng.standard_normal((b, D, H, W, 3)) * 0.08
    grid = jnp.asarray(base[None] + disp, jnp.float32)

    ref = np.asarray(grid_sample_3d_ref(vol, grid.astype(vol.dtype)), np.float32)

    cands = {
        "packed": lambda v, g: grid_sample_3d_packed(v, g),
        "ref": lambda v, g: grid_sample_3d_ref(v, g.astype(v.dtype)),
    }
    only = os.environ.get("ONLY")
    for name, fn in cands.items():
        if only and name not in only.split(","):
            continue
        try:
            out = np.asarray(jax.jit(fn)(vol, grid), np.float32)
            err = np.max(np.abs(out - ref))
            t = scan_slope_time(jax.jit(fn), (vol, grid))
            print(f"{name:10s} {t*1000:8.2f} ms/call  max|err|={err:.4f}")
        except Exception as e:
            print(f"{name:10s} FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
