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


def test_window_fit_fraction_observability():
    """window_fit_fraction: 1.0 for identity-plus-small motion, 0.0 for
    whole-batch random grids, and the in-between mix counts per sample."""
    import numpy as np

    from canonswap_tpu.ops.pallas.warp import window_fit_fraction

    # CANONICAL-like geometry: h > win_r (32) and d > win_z (12) so the
    # window is a strict subset and random grids genuinely miss it
    d, h, w, c = 16, 64, 16, 32
    zz, yy, xx = jnp.meshgrid(
        (jnp.arange(d) + 0.5) / d * 2 - 1,
        (jnp.arange(h) + 0.5) / h * 2 - 1,
        (jnp.arange(w) + 0.5) / w * 2 - 1,
        indexing="ij",
    )
    ident = jnp.stack([xx, yy, zz], -1)[None]
    small = jnp.clip(ident + 0.02, -1, 1)
    big = jax.random.uniform(
        jax.random.PRNGKey(0), (1, d, h, w, 3), minval=-1, maxval=1)
    mix = jnp.concatenate([small, small, big, small], axis=0)
    frac = window_fit_fraction((4, d, h, w, c), mix)
    assert np.isclose(float(frac), 0.75)
    assert float(window_fit_fraction((1, d, h, w, c), small)) == 1.0
    assert float(window_fit_fraction((1, d, h, w, c), big)) == 0.0


def test_window_fit_fraction_matches_kernel_dispatch():
    """The per-sample predicate must agree with the kernel's own whole-batch
    _window_fits gate (same geometry via window_geometry)."""
    import numpy as np

    from canonswap_tpu.ops.pallas.warp import (
        _unnormalize, _window_fits, window_fit_fraction, window_geometry)

    d, h, w, c = 8, 32, 16, 32
    rpb, win_r, zsnap, win_z = window_geometry(d, h, w, c)
    for seed, scale in ((0, 0.02), (1, 0.5)):
        zz, yy, xx = jnp.meshgrid(
            (jnp.arange(d) + 0.5) / d * 2 - 1,
            (jnp.arange(h) + 0.5) / h * 2 - 1,
            (jnp.arange(w) + 0.5) / w * 2 - 1,
            indexing="ij",
        )
        ident = jnp.stack([xx, yy, zz], -1)[None]
        disp = jax.random.uniform(
            jax.random.PRNGKey(seed), (2, d, h, w, 3),
            minval=-scale, maxval=scale)
        grid = jnp.clip(ident + disp, -1, 1)
        g = grid.reshape(2, -1, 3)
        fits_all = bool(np.asarray(_window_fits(
            _unnormalize(g[..., 0], w), _unnormalize(g[..., 1], h),
            _unnormalize(g[..., 2], d), d, h, w, win_r, win_z, zsnap, rpb)))
        frac = float(window_fit_fraction((2, d, h, w, c), grid))
        assert fits_all == (frac == 1.0)
