"""Metric sanity tests (SSIM vs known properties, cosine)."""

import numpy as np

from canonswap_tpu.utils.metrics import id_cosine, ssim

RNG = np.random.default_rng(2)


def test_ssim_identity_is_one():
    a = RNG.uniform(0, 255, (64, 64, 3))
    assert abs(ssim(a, a) - 1.0) < 1e-9


def test_ssim_orders_degradation():
    a = RNG.uniform(0, 255, (64, 64, 3))
    small = a + RNG.normal(0, 5, a.shape)
    big = a + RNG.normal(0, 50, a.shape)
    s_small, s_big = ssim(a, small), ssim(a, big)
    assert 1.0 > s_small > s_big > 0.0


def test_id_cosine():
    v = RNG.normal(size=512)
    assert abs(id_cosine(v, 2 * v) - 1.0) < 1e-9
    assert abs(id_cosine(v, -v) + 1.0) < 1e-9
