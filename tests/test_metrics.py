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


def test_viz_lmk_draws_points():
    import numpy as np

    from canonswap_tpu.utils.viz import viz_lmk

    img = np.zeros((32, 32, 3), np.uint8)
    pts = np.array([[5, 7], [20, 10.6]])
    out = viz_lmk(img, pts, radius=1, thickness=1)
    assert out.shape == img.shape
    assert img.sum() == 0  # input untouched
    assert (out[:, :, 1] > 0).any()  # green circles drawn
    assert out[7, 5].tolist() != [0, 0, 0] or out[6, 5].tolist() != [0, 0, 0]
