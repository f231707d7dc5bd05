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


def test_warp_onehot_nonsquare_and_ragged_block():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    vol = jax.random.normal(k1, (1, 4, 8, 24, 16), jnp.float32)
    # 6*8*24 = 1152 points: not a multiple of 512 -> pblk falls back
    grid = jax.random.uniform(k2, (1, 6, 8, 24, 3), minval=-1.1, maxval=1.1)
    ref = grid_sample_3d_ref(vol, grid)
    out = grid_sample_3d_onehot(vol, grid, interpret=True)
    assert _rel(ref, out) < 1e-6
