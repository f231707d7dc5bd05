"""Parity: Pallas one-hot-matmul trilinear warp vs the jnp reference.

Covers in-range and out-of-range (zero-padding) coordinates, non-square
spatial sizes, and point counts that do not divide the block size.  Runs in
Pallas interpret mode on CPU."""

import jax
import jax.numpy as jnp
import pytest

from canonswap_tpu.ops.grid_sample import grid_sample_3d_ref
from canonswap_tpu.ops.pallas.warp import grid_sample_3d_onehot


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-9))


@pytest.mark.parametrize("rng_range", [1.0, 1.4])
def test_warp_onehot_matches_ref(rng_range):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vol = jax.random.normal(k1, (2, 8, 16, 16, 32), jnp.float32)
    grid = jax.random.uniform(
        k2, (2, 8, 16, 16, 3), minval=-rng_range, maxval=rng_range
    )
    ref = grid_sample_3d_ref(vol, grid)
    out = grid_sample_3d_onehot(vol, grid, interpret=True)
    assert out.shape == ref.shape
    assert _rel(ref, out) < 1e-6


def test_warp_onehot_windowed_small_motion():
    """Small displacements fit the 32-row/4-slice window -> the windowed
    kernel runs and must match the reference exactly."""
    import numpy as np

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    d, h, w = 8, 32, 16
    vol = jax.random.normal(k1, (2, d, h, w, 32), jnp.float32)
    zz, yy, xx = jnp.meshgrid(
        (jnp.arange(d) + 0.5) / d * 2 - 1,
        (jnp.arange(h) + 0.5) / h * 2 - 1,
        (jnp.arange(w) + 0.5) / w * 2 - 1,
        indexing="ij",
    )
    ident = jnp.stack([xx, yy, zz], -1)[None]
    disp = jax.random.uniform(
        k2, (2, d, h, w, 3), minval=-0.03, maxval=0.03)
    grid = jnp.clip(ident + disp, -1, 1)
    ref = grid_sample_3d_ref(vol, grid)
    out = grid_sample_3d_onehot(vol, grid, interpret=True)
    assert _rel(ref, out) < 1e-6
    # sanity: this motion really does fit the window (exercises run_win)
    from canonswap_tpu.ops.pallas.warp import _unnormalize, _window_fits

    g = grid.reshape(2, -1, 3)
    fits = _window_fits(
        _unnormalize(g[..., 0], w), _unnormalize(g[..., 1], h),
        _unnormalize(g[..., 2], d), d, h, w, min(32, h), min(d, 12), 4, 8)
    assert bool(np.asarray(fits))


def test_warp_onehot_windowed_fallback_large_motion():
    """Displacements beyond the window must fall back to the full kernel
    (same result as the reference, just slower)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    vol = jax.random.normal(k1, (1, 8, 32, 16, 32), jnp.float32)
    grid = jax.random.uniform(
        k2, (1, 8, 32, 16, 3), minval=-1.0, maxval=1.0)
    ref = grid_sample_3d_ref(vol, grid)
    out = grid_sample_3d_onehot(vol, grid, interpret=True)
    assert _rel(ref, out) < 1e-6


def test_warp_onehot_quant_close_to_ref():
    """W8A8 sampling: per-sample quantized slab + int8 one-hot weights stay
    within ~1% of the exact trilinear sample."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    vol = jax.random.normal(k1, (2, 8, 16, 16, 32), jnp.float32)
    grid = jax.random.uniform(k2, (2, 8, 16, 16, 3), minval=-1.0, maxval=1.0)
    ref = grid_sample_3d_ref(vol, grid)
    out = grid_sample_3d_onehot(vol, grid, quant=True, interpret=True)
    assert _rel(ref, out) < 2e-2


def test_warp_onehot_nonsquare_and_ragged_block():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    vol = jax.random.normal(k1, (1, 4, 8, 24, 16), jnp.float32)
    # 6*8*24 = 1152 points: not a multiple of 512 -> pblk falls back
    grid = jax.random.uniform(k2, (1, 6, 8, 24, 3), minval=-1.1, maxval=1.1)
    ref = grid_sample_3d_ref(vol, grid)
    out = grid_sample_3d_onehot(vol, grid, interpret=True)
    assert _rel(ref, out) < 1e-6
