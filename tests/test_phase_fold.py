"""Exactness of the phase-folded SPADE gamma/beta path.

The up_1 SPADE block modulates a factor-4 nearest-upsampled segmap
(reference src/modules/spade_generator.py:37-39 + util.py:295-299);
ops/resize.py computes both the actv AND the gamma/beta 3x3 convs at
segmap resolution over the distinct phase fields.  These tests pin the
reformulation to the direct full-resolution path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from canonswap_tpu.ops.resize import (
    conv3x3_on_nearest_upsample, conv3x3_phase_folded, nearest_upsample,
    nearest_upsample_conv3x3_fields,
)


def _conv3x3(x, k, b):
    y = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _rel(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-9))


@pytest.mark.parametrize("factor", [2, 4])
def test_fields_interleave_to_upsample_conv(factor):
    """The distinct phase fields interleave to the exact
    conv3x3(nearest_upsample(seg)) output."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    seg = jax.random.normal(k1, (2, 6, 5, 16), jnp.float32)
    kern = jax.random.normal(k2, (3, 3, 16, 8), jnp.float32) * 0.1
    bias = jax.random.normal(k3, (8,), jnp.float32) * 0.1
    want = conv3x3_on_nearest_upsample(seg, kern, bias, factor)
    fields, p2c = nearest_upsample_conv3x3_fields(seg, kern, bias, factor)
    ncls = max(p2c) + 1
    assert fields.shape[1] == ncls * ncls
    b, _, h, w, c = fields.shape
    # interleave by phase
    got = jnp.zeros_like(want)
    for py in range(factor):
        for px in range(factor):
            f = fields[:, p2c[py] * ncls + p2c[px]]
            got = got.at[:, py::factor, px::factor].set(f)
    assert _rel(want, got) < 1e-6


@pytest.mark.parametrize("factor", [2, 4])
def test_conv3x3_phase_folded_matches_direct(factor):
    """phase-folded gamma/beta == conv3x3(relu(upsampled actv)) exactly."""
    ks = jax.random.split(jax.random.PRNGKey(1), 5)
    seg = jax.random.normal(ks[0], (2, 8, 8, 24), jnp.float32)
    ka = jax.random.normal(ks[1], (3, 3, 24, 32), jnp.float32) * 0.1
    ba = jax.random.normal(ks[2], (32,), jnp.float32) * 0.1
    kgb = jax.random.normal(ks[3], (3, 3, 32, 12), jnp.float32) * 0.1
    bgb = jax.random.normal(ks[4], (12,), jnp.float32) * 0.1

    actv = jax.nn.relu(conv3x3_on_nearest_upsample(seg, ka, ba, factor))
    want = _conv3x3(actv, kgb, bgb)

    fields, p2c = nearest_upsample_conv3x3_fields(seg, ka, ba, factor)
    got = conv3x3_phase_folded(jax.nn.relu(fields), p2c, kgb, bgb, factor)
    assert got.shape == want.shape
    assert _rel(want, got) < 1e-6


def test_conv3x3_phase_folded_int8_tracks_bf16():
    """The W8A8 variant stays within the int8 quantization budget."""
    ks = jax.random.split(jax.random.PRNGKey(2), 5)
    seg = jax.random.normal(ks[0], (2, 8, 8, 24), jnp.float32)
    ka = jax.random.normal(ks[1], (3, 3, 24, 32), jnp.float32) * 0.1
    ba = jax.random.normal(ks[2], (32,), jnp.float32) * 0.1
    kgb = jax.random.normal(ks[3], (3, 3, 32, 12), jnp.float32) * 0.1
    bgb = jax.random.normal(ks[4], (12,), jnp.float32) * 0.1
    fields, p2c = nearest_upsample_conv3x3_fields(seg, ka, ba, 4)
    want = conv3x3_phase_folded(jax.nn.relu(fields), p2c, kgb, bgb, 4)
    got = conv3x3_phase_folded(jax.nn.relu(fields), p2c, kgb, bgb, 4,
                               int8=True)
    assert _rel(want, got) < 0.05


def test_phase_folded_effective_taps_factor4():
    """Factor 4 merges the degenerate mid phases: 3 distinct classes per
    axis (the MAC-cut precondition)."""
    seg = jnp.zeros((1, 4, 4, 4))
    k = jnp.zeros((3, 3, 4, 4))
    fields, p2c = nearest_upsample_conv3x3_fields(seg, k, None, 4)
    assert p2c == [0, 1, 1, 2]
    assert fields.shape[1] == 9


def test_spade_decoder_phase_fold_param_tree_and_output():
    """SPADEDecoder(phase_fold=True): identical param tree, near-identical
    output (same math, different summation order)."""
    from canonswap_tpu.configs.model_config import TINY
    from canonswap_tpu.models.spade_decoder import SPADEDecoder

    cfg = TINY.spade
    cfg_f = dataclasses.replace(cfg, phase_fold=True)
    key = jax.random.PRNGKey(4)
    feat = jax.random.normal(key, (2, 16, 16, 64), jnp.float32)
    exact = SPADEDecoder(cfg)
    folded = SPADEDecoder(cfg_f)
    params = exact.init(jax.random.fold_in(key, 1), feat)
    params_f = folded.init(jax.random.fold_in(key, 1), feat)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f)), "param tree changed"
    y_exact = exact.apply(params, feat)
    y_fold = folded.apply(params, feat)
    assert y_fold.shape == y_exact.shape
    assert _rel(y_exact, y_fold) < 1e-5
