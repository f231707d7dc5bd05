"""Native C++ library parity tests (built on demand with g++)."""

import numpy as np
import pytest

import jax.numpy as jnp

from canonswap_tpu.runtime import native as NAT

pytestmark = pytest.mark.skipif(
    not NAT.available(), reason="no C++ toolchain available"
)

RNG = np.random.default_rng(5)


def test_paste_back_matches_host_path():
    from canonswap_tpu.utils import geometry as G

    crop = RNG.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    ori = RNG.integers(0, 255, (48, 40, 3), dtype=np.uint8)
    pts = (RNG.normal(size=(106, 2)) * 8 + np.asarray([20, 24])).astype(np.float32)
    _, M_c2o = G.estimate_similar_transform(pts, dsize=32)
    mask = np.zeros((48, 40), np.float32)
    mask[8:40, 6:34] = 1.0
    mask[8:40, 6:10] = 0.5

    # explicit cv2 + numpy path (G.paste_back now dispatches to native)
    warped = G.warp_affine(crop, M_c2o, (ori.shape[1], ori.shape[0]))
    want = np.clip(
        mask[..., None] * warped + (1 - mask[..., None]) * ori, 0, 255
    ).astype(np.uint8)
    got = NAT.paste_back(crop, M_c2o, ori, mask)
    # cv2 uses fixed-point interpolation; allow 2 LSB and compare means
    assert np.mean(np.abs(got.astype(np.int32) - want.astype(np.int32))) < 1.0
    assert np.max(np.abs(got.astype(np.int32) - want.astype(np.int32))) <= 3


def test_ms_deform_attn_matches_jnp_ref():
    from canonswap_tpu.ops.ms_deform_attn import ms_deform_attn_ref

    N, M, D = 2, 2, 4
    shapes = ((5, 4), (3, 2))
    LQ, P = 7, 3
    lin = sum(h * w for h, w in shapes)
    value = RNG.normal(size=(N, lin, M, D)).astype(np.float32)
    loc = RNG.uniform(0, 1, (N, LQ, M, 2, P, 2)).astype(np.float32)
    attn = RNG.uniform(0, 1, (N, LQ, M, 2, P)).astype(np.float32)

    want = np.asarray(
        ms_deform_attn_ref(jnp.asarray(value), shapes, jnp.asarray(loc),
                           jnp.asarray(attn))
    )
    got = NAT.ms_deform_attn(value, shapes, loc, attn)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_frames_to_float01():
    x = RNG.integers(0, 255, (2, 8, 8, 3), dtype=np.uint8)
    got = NAT.frames_to_float01(x)
    np.testing.assert_allclose(got, x.astype(np.float32) / 255.0, rtol=1e-6)
