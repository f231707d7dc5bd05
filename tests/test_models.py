"""Model-module shape & behaviour tests (tiny config; CPU).

Shape contracts mirror the reference modules' documented tensor shapes
(SURVEY.md §2a); behaviour checks cover the properties that don't need the
real checkpoint (softmax mask partition-of-unity, occlusion range, identity
injection actually depending on the ID latent, etc.).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonswap_tpu.configs.model_config import TINY
from canonswap_tpu.models import (
    AppearanceFeatureExtractor,
    ArcFaceResNet,
    MotionExtractor,
    RefineModule,
    SPADEDecoder,
    StitchingRetargetingNetwork,
    SwapModule,
    WarpingNetwork,
)
from canonswap_tpu.models.dense_motion import DenseMotionNetwork
from canonswap_tpu.models.motion import refine_kp_info
from canonswap_tpu.runtime import core as C

B = 2
CFG = TINY
S = CFG.input_size
D = CFG.appearance.reshape_depth
HW = S // 4
CC = CFG.appearance.reshape_channel
K = CFG.motion.num_kp


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def frames(rng):
    return jax.random.uniform(rng, (B, S, S, 3))


def test_appearance_volume_shape(rng, frames):
    m = AppearanceFeatureExtractor(CFG.appearance)
    params = m.init(rng, frames)
    out = m.apply(params, frames)
    assert out.shape == (B, D, HW, HW, CC)


def test_motion_heads(rng, frames):
    m = MotionExtractor(CFG.motion)
    params = m.init(rng, frames)
    raw = m.apply(params, frames)
    assert raw["kp"].shape == (B, 3 * K)
    assert raw["pitch"].shape == (B, 66)
    info = refine_kp_info(raw)
    assert info["kp"].shape == (B, K, 3)
    assert info["exp"].shape == (B, K, 3)
    assert info["pitch"].shape == (B, 1)


def test_dense_motion_outputs(rng):
    m = DenseMotionNetwork(CFG.warping.dense_motion, num_kp=K)
    vol = jax.random.normal(rng, (B, D, HW, HW, CC))
    kp = jax.random.normal(rng, (B, K, 3)) * 0.3
    params = m.init(rng, vol, kp, kp)
    out = m.apply(params, vol, kp, kp)
    assert out["deformation"].shape == (B, D, HW, HW, 3)
    assert out["occlusion_map"].shape == (B, HW, HW, 1)
    # softmax mask sums to 1 over K+1
    np.testing.assert_allclose(
        np.asarray(out["mask"].sum(-1)), 1.0, rtol=1e-5
    )
    occ = np.asarray(out["occlusion_map"])
    assert occ.min() >= 0 and occ.max() <= 1


def test_dense_motion_identity_kp_gives_near_identity_deformation(rng):
    """With kp_driving == kp_source every sparse motion equals the identity
    grid, so the mask-combined deformation must equal it too."""
    m = DenseMotionNetwork(CFG.warping.dense_motion, num_kp=K)
    vol = jax.random.normal(rng, (B, D, HW, HW, CC))
    kp = jax.random.normal(rng, (B, K, 3)) * 0.3
    params = m.init(rng, vol, kp, kp)
    out = m.apply(params, vol, kp, kp)
    from canonswap_tpu.ops.heatmap import make_coordinate_grid_3d

    grid = make_coordinate_grid_3d((D, HW, HW))
    np.testing.assert_allclose(
        np.asarray(out["deformation"]), np.asarray(jnp.broadcast_to(grid, (B, D, HW, HW, 3))),
        rtol=1e-4, atol=1e-5,
    )


def test_warping_network(rng):
    m = WarpingNetwork(CFG.warping)
    vol = jax.random.normal(rng, (B, D, HW, HW, CC))
    kp = jax.random.normal(rng, (B, K, 3)) * 0.3
    params = m.init(rng, vol, kp, kp)
    ret = m.apply(params, vol, kp, kp)
    ch = CFG.warping.block_expansion * 2**CFG.warping.num_down_blocks
    assert ret["out"].shape == (B, HW, HW, ch)
    warped, occ, _ = m.apply(params, vol, kp, kp, method="warp")
    assert warped.shape == vol.shape
    out2 = m.apply(params, warped, occ, method="warp_out")
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ret["out"]), rtol=1e-4, atol=1e-5
    )


def test_spade_decoder_upscales(rng):
    m = SPADEDecoder(CFG.spade)
    ch = CFG.spade.block_expansion * 2**CFG.spade.num_down_blocks
    feat = jax.random.normal(rng, (B, HW, HW, ch))
    params = m.init(rng, feat)
    img = m.apply(params, feat)
    assert img.shape == (B, HW * 8, HW * 8, 3)  # 2 ups + pixelshuffle
    v = np.asarray(img)
    assert v.min() >= 0 and v.max() <= 1


def test_swap_module_uses_identity_latent(rng):
    m = SwapModule(CFG.swap)
    vol = jax.random.normal(rng, (B, D, HW, HW, CC))
    lat1 = jax.random.normal(rng, (B, CFG.swap.latent_dim))
    lat2 = lat1 + 1.0
    params = m.init(rng, vol, lat1)
    o1 = m.apply(params, vol, lat1)
    o2 = m.apply(params, vol, lat2)
    assert o1.shape == vol.shape
    assert float(jnp.abs(o1 - o2).max()) > 1e-6  # latent actually matters
    _, masks = m.apply(params, vol, lat1, return_mask=True)
    assert len(masks) == CFG.swap.n_blocks
    assert masks[0].shape == (B, HW, HW, 1)


def test_refine_module(rng):
    m = RefineModule()
    vol = jax.random.normal(rng, (B, D, HW, HW, 32))
    params = m.init(rng, vol)
    out = m.apply(params, vol)
    assert out.shape == vol.shape


def test_arcface_dual_output(rng):
    m = ArcFaceResNet(layers=(1, 1, 1, 1))  # tiny depth for CPU
    x = jax.random.normal(rng, (2, 112, 112, 3))
    params = m.init(rng, x)
    emb, mid = m.apply(params, x)
    assert emb.shape == (2, 512)
    assert mid.shape == (2, 256 * 7 * 7)


def test_stitching_network(rng):
    insz, hidden, outsz = CFG.stitching.eye
    m = StitchingRetargetingNetwork(hidden_sizes=hidden, output_size=outsz)
    x = jax.random.normal(rng, (B, insz))
    params = m.init(rng, x)
    assert m.apply(params, x).shape == (B, outsz)


class TestCoreRuntime:
    def test_swap_step_shapes_and_jit(self, rng, frames):
        core = C.CanonSwapCore(CFG)
        params = core.init_params(rng)
        sid = jax.random.normal(rng, (1, CFG.swap.latent_dim))
        motion = C.extract_motion_jit(core, params, frames)
        out = C.swap_step_jit(core, params, frames, sid, motion, with_debug=True)
        assert out["out"].shape == (B, 2 * S, 2 * S, 3)
        assert out["rec_can"].shape == (B, 2 * S, 2 * S, 3)
        assert out["swap_can"].shape == (B, 2 * S, 2 * S, 3)

    def test_swap_step_batch_consistency(self, rng, frames):
        """Per-frame results must not depend on batch composition (the frame
        axis is our parallel axis — BatchNorm must be in inference mode)."""
        core = C.CanonSwapCore(CFG)
        params = core.init_params(rng)
        sid = jax.random.normal(rng, (1, CFG.swap.latent_dim))
        motion = C.extract_motion_jit(core, params, frames)
        full = C.swap_step_jit(core, params, frames, sid, motion)["out"]
        m0 = jax.tree.map(lambda a: a[:1], motion)
        single = C.swap_step_jit(core, params, frames[:1], sid, m0)["out"]
        np.testing.assert_allclose(
            np.asarray(full[:1]), np.asarray(single), rtol=2e-4, atol=2e-5
        )
