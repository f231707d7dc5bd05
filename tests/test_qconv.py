"""W8A8 int8 conv path (ops/qconv.py): numeric closeness to the exact conv
and drop-in param compatibility of the int8 model variants (same checkpoint
trees, flag-switchable)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from canonswap_tpu.ops.qconv import conv2d_w8a8, int8_worthwhile


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-9)


def test_conv2d_w8a8_close_to_exact():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 16, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 32)) * 0.05
    b = jax.random.normal(jax.random.PRNGKey(2), (32,)) * 0.1
    exact = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    quant = conv2d_w8a8(x, k, b)
    assert _rel_err(quant, exact) < 0.02


def test_w8a8_per_channel_weight_scaling():
    """A channel with tiny weights must not be destroyed by a channel with
    huge weights (per-output-channel scales)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 16))
    k = jnp.concatenate(
        [jax.random.normal(jax.random.PRNGKey(1), (1, 1, 16, 1)) * 100.0,
         jax.random.normal(jax.random.PRNGKey(2), (1, 1, 16, 1)) * 0.01],
        axis=-1)
    exact = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    quant = conv2d_w8a8(x, k)
    for ch in range(2):
        assert _rel_err(quant[..., ch], exact[..., ch]) < 0.02, ch


def test_int8_worthwhile_gate():
    assert int8_worthwhile(jnp.zeros((1, 64, 64, 512)))
    assert int8_worthwhile(jnp.zeros((1, 128, 128, 256)))
    assert not int8_worthwhile(jnp.zeros((1, 256, 256, 256)))  # traffic-bound
    assert not int8_worthwhile(jnp.zeros((1, 64, 64, 64)))  # narrow


def test_spade_decoder_int8_same_params():
    from canonswap_tpu.configs.model_config import TINY
    from canonswap_tpu.models.spade_decoder import SPADEDecoder

    cfg = TINY.spade
    m_exact = SPADEDecoder(cfg)
    m_int8 = SPADEDecoder(dataclasses.replace(cfg, int8_conv=True))
    feat = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 64))
    v = m_exact.init(jax.random.PRNGKey(1), feat)
    a = m_exact.apply(v, feat)
    b = m_int8.apply(v, feat)  # same tree, flag-switched
    assert a.shape == b.shape
    # at TINY shapes the gate keeps everything exact (narrow channels) or
    # quantizes benignly; either way outputs stay close
    assert _rel_err(b, a) < 0.05


def test_swap_module_int8_same_params():
    from canonswap_tpu.configs.model_config import TINY
    from canonswap_tpu.models.swap import SwapModule

    m_exact = SwapModule(TINY.swap)
    m_int8 = SwapModule(dataclasses.replace(TINY.swap, int8_conv=True))
    vol = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16, 16, 8))
    lat = jax.random.normal(jax.random.PRNGKey(1), (1, TINY.swap.latent_dim))
    v = m_exact.init(jax.random.PRNGKey(2), vol, lat)
    a = m_exact.apply(v, vol, lat)
    b = m_int8.apply(v, vol, lat)
    assert a.shape == b.shape
    assert _rel_err(b, a) < 0.05


def test_dense_motion_int8_same_params():
    """int8 hourglass (canonical channel widths, small spatial) accepts the
    exact param tree and stays close to the exact forward."""
    import jax

    from canonswap_tpu.configs.model_config import DenseMotionConfig
    from canonswap_tpu.models.dense_motion import DenseMotionNetwork

    cfg = DenseMotionConfig()  # canonical widths -> int8 gate engages
    m_exact = DenseMotionNetwork(cfg, num_kp=21)
    m_int8 = DenseMotionNetwork(
        dataclasses.replace(cfg, int8_conv=True), num_kp=21)
    # in-plane 32 keeps all 5 hourglass levels non-degenerate (32 / 2^5 = 1)
    vol = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 32, 32, 32))
    kp1 = jax.random.normal(jax.random.PRNGKey(1), (1, 21, 3)) * 0.2
    kp2 = kp1 + 0.1
    v = m_exact.init(jax.random.PRNGKey(2), vol, kp1, kp2)
    a = m_exact.apply(v, vol, kp1, kp2)
    b = m_int8.apply(v, vol, kp1, kp2)
    assert a["deformation"].shape == b["deformation"].shape
    assert _rel_err(b["occlusion_map"], a["occlusion_map"]) < 0.1
    assert _rel_err(b["deformation"], a["deformation"]) < 0.05


def test_spade_norm_scale_same_params():
    """norm_scale=2 (half-res up-block modulations) reuses the exact param
    tree and stays close to the exact decoder output."""
    from canonswap_tpu.configs.model_config import TINY
    from canonswap_tpu.models.spade_decoder import SPADEDecoder

    cfg = TINY.spade
    m_exact = SPADEDecoder(cfg)
    m_fast = SPADEDecoder(dataclasses.replace(cfg, norm_scale=2))
    feat = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 64))
    v = m_exact.init(jax.random.PRNGKey(1), feat)
    a = m_exact.apply(v, feat)
    b = m_fast.apply(v, feat)
    assert a.shape == b.shape
    # random weights are the worst case: the modulation fields are pure
    # noise, so halving their resolution changes them substantially (trained
    # SPADE modulations are segmap-driven and smooth); just bound sanity
    assert _rel_err(b, a) < 0.6
