"""Stitching module math + training CLI smoke test."""

import os.path as osp

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from canonswap_tpu.configs.model_config import TINY
from canonswap_tpu.runtime import core as C


def test_stitching_module_shapes_and_effect():
    core = C.CanonSwapCore(TINY)
    params = core.init_stitching_params(jax.random.PRNGKey(0))
    k = TINY.motion.num_kp
    kp_s = jax.random.normal(jax.random.PRNGKey(1), (2, k, 3)) * 0.3
    kp_d = jax.random.normal(jax.random.PRNGKey(2), (2, k, 3)) * 0.3

    stitched = core.stitching.apply(params, kp_s, kp_d, method="stitch")
    assert stitched.shape == (2, k, 3)
    assert float(jnp.abs(stitched - kp_d).max()) > 0  # net applied

    eye_ratio = jnp.full((2, 3), 0.3)
    d_eye = core.stitching.apply(
        params, kp_s, eye_ratio, method="retarget_eye"
    )
    assert d_eye.shape == (2, k, 3)
    lip_ratio = jnp.full((2, 2), 0.3)
    d_lip = core.stitching.apply(
        params, kp_s, lip_ratio, method="retarget_lip"
    )
    assert d_lip.shape == (2, k, 3)


def test_train_cli_smoke(tmp_path):
    from canonswap_tpu.cli import train as TR

    data = tmp_path / "data"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        cv2.imwrite(
            str(data / f"img{i}.png"),
            rng.integers(0, 255, (80, 80, 3), np.uint8),
        )
    ckpt = tmp_path / "ckpt.npz"
    TR.main([
        "--data-dir", str(data), "--steps", "2", "--batch", "2",
        "--tiny", "--ckpt-out", str(ckpt), "--model-axis", "2",
        "--log-every", "1",
    ])
    assert osp.exists(ckpt)

    # resume path
    TR.main([
        "--data-dir", str(data), "--steps", "1", "--batch", "2",
        "--tiny", "--ckpt-out", str(ckpt), "--resume", str(ckpt),
        "--model-axis", "2", "--log-every", "1",
    ])
