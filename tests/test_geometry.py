"""Geometry layer tests: crop math + device affine warps vs cv2/torch."""

import cv2
import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from canonswap_tpu.ops import affine as A
from canonswap_tpu.utils import geometry as G

RNG = np.random.default_rng(7)


def random_landmarks(n, center=(100, 120), spread=40):
    pts = RNG.normal(size=(n, 2)) * spread + np.asarray(center)
    return pts.astype(np.float32)


class TestSimilarityTransform:
    @pytest.mark.parametrize("n", [5, 9, 68, 101, 106, 203])
    def test_roundtrip_inverse(self, n):
        pts = random_landmarks(n)
        M_o2c, M_c2o = G.estimate_similar_transform(pts, dsize=224)
        np.testing.assert_allclose(M_o2c @ M_c2o, np.eye(3), atol=1e-4)

    def test_crop_centers_face(self):
        """Crop maps the landmark rect centre near the crop centre (it is
        offset by vy_ratio along the face axis)."""
        pts = random_landmarks(106)
        M_o2c, _ = G.estimate_similar_transform(
            pts, dsize=224, scale=2.0, vy_ratio=0.0
        )
        center, _, _ = G.parse_rect_from_landmark(pts, scale=2.0)
        mapped = G.transform_pts(center[None], M_o2c)[0]
        np.testing.assert_allclose(mapped, [112, 112], atol=1e-2)

    def test_crop_is_similarity(self):
        """M_o2c must be a similarity: equal-norm orthogonal rows."""
        pts = random_landmarks(203)
        M_o2c, _ = G.estimate_similar_transform(pts, dsize=512, scale=2.3,
                                                vy_ratio=-0.125)
        A2 = M_o2c[:2, :2]
        np.testing.assert_allclose(A2[0] @ A2[1], 0, atol=1e-6)
        np.testing.assert_allclose(
            np.linalg.norm(A2[0]), np.linalg.norm(A2[1]), rtol=1e-5
        )


class TestDeviceAffine:
    def test_warp_affine_matches_cv2(self):
        img = RNG.uniform(0, 1, (64, 48, 3)).astype(np.float32)
        theta = 0.3
        s = 1.7
        M = np.array(
            [[s * np.cos(theta), s * np.sin(theta), -10.0],
             [-s * np.sin(theta), s * np.cos(theta), 8.0]], np.float32
        )
        want = cv2.warpAffine(img, M, (56, 40), flags=cv2.INTER_LINEAR)
        got = A.warp_affine(jnp.asarray(img)[None], jnp.asarray(M)[None], (40, 56))
        # cv2 uses fixed-point bilinear (5-bit fractional) -> loose atol
        np.testing.assert_allclose(np.asarray(got)[0], want, atol=2e-2)

    def test_paste_back_matches_host(self):
        rng = np.random.default_rng(42)
        crop = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
        ori = rng.uniform(0, 255, (48, 40, 3)).astype(np.float32)
        pts = (rng.normal(size=(106, 2)) * 8 + np.asarray([20, 24])).astype(
            np.float32
        )
        M_o2c, M_c2o = G.estimate_similar_transform(pts, dsize=32)
        mask = np.zeros((48, 40, 1), np.float32)
        mask[10:38, 8:32] = 1.0
        want = G.paste_back(crop, M_c2o, ori.astype(np.uint8), mask)
        got = A.paste_back_batch(
            jnp.asarray(crop)[None], jnp.asarray(M_c2o)[None],
            jnp.asarray(ori)[None], jnp.asarray(mask)[None],
        )
        got = np.clip(np.asarray(got)[0], 0, 255)
        # masks identical, warp differs only by cv2 fixed-point rounding
        assert np.mean(np.abs(got - want.astype(np.float32))) < 0.5


class TestMaskOps:
    def test_soft_erosion_matches_torch_reference(self):
        """Independent torch re-derivation of SoftErosion (crop.py:21-47)."""
        ks, thr, iters = 7, 0.8, 3
        m = (RNG.uniform(0, 1, (1, 24, 24, 1)) > 0.4).astype(np.float32)

        got_soft, got_hard = A.soft_erosion(jnp.asarray(m), ks, thr, iters)

        r = ks // 2
        yi, xi = torch.meshgrid(
            torch.arange(0.0, ks), torch.arange(0.0, ks), indexing="ij"
        )
        dist = torch.sqrt((xi - r) ** 2 + (yi - r) ** 2)
        k = dist.max() - dist
        k = (k / k.sum()).view(1, 1, ks, ks)
        x = torch.from_numpy(m.transpose(0, 3, 1, 2))
        for _ in range(iters - 1):
            x = torch.min(x, tF.conv2d(x, k, padding=r))
        x = tF.conv2d(x, k, padding=r)
        hard = x >= thr
        x[hard] = 1.0
        x[~hard] /= x[~hard].max()

        np.testing.assert_allclose(
            np.asarray(got_soft)[0, ..., 0], x.numpy()[0, 0], rtol=1e-4, atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(got_hard)[0, ..., 0], hard.numpy()[0, 0]
        )

    def test_erode_dilate_smooth(self):
        m = (RNG.uniform(0, 1, (2, 16, 16, 1)) > 0.5).astype(np.float32)
        mt = torch.from_numpy(m.transpose(0, 3, 1, 2))

        want_e = (-tF.max_pool2d(-mt, 5, stride=1, padding=2) > 0).float()
        got_e = A.erode_mask(jnp.asarray(m), 5)
        np.testing.assert_array_equal(
            np.asarray(got_e)[..., 0], want_e.numpy()[:, 0]
        )

        k = torch.ones(1, 1, 5, 5)
        want_d = (tF.conv2d(mt, k, padding=2) > 0).float()
        got_d = A.dilate_mask(jnp.asarray(m), 5)
        np.testing.assert_array_equal(
            np.asarray(got_d)[..., 0], want_d.numpy()[:, 0]
        )

        want_s = tF.conv2d(mt, k / 25.0, padding=2)
        got_s = A.smooth_mask(jnp.asarray(m), 5)
        np.testing.assert_allclose(
            np.asarray(got_s)[..., 0], want_s.numpy()[:, 0], rtol=1e-4, atol=1e-6
        )
