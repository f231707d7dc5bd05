"""FULL-CHAIN golden test: the reference's own torch modules composed in
``can_swapper`` order vs our fused ``runtime/core.py::swap_step``.

Per-module parity (test_reference_parity.py) can't catch inter-module
orchestration drift — kp transform ordering, occlusion application,
volume<->2D reshape order, debug-decode wiring.  This test runs the exact
reference hot-loop sequence (can_swap_pipeline_e2e.py:223-283 /
can_swap_e2e.py:165-348):

  M -> refine kp info -> transform_keypoint -> x_can = scale*kp
  F -> warping.warp(f_s, x_t, x_can) -> transfer -> [conv_decode debug]
  -> G3d refine -> warp_decode(f, x_can, x_t) -> SPADE

with shared random weights converted through runtime/weights.py, and
requires our single jitted program to match the composite torch output.
"""

import sys

import numpy as np
import pytest
import torch

torch.manual_seed(0)

REF = "/root/reference"
sys.path.insert(0, REF)

ref_util = pytest.importorskip("src.modules.util")
import src.modules.adaptive_modulate as ref_am  # noqa: E402
import src.modules.appearance_feature_extractor as ref_app  # noqa: E402
import src.modules.motion_extractor as ref_me  # noqa: E402
import src.modules.spade_generator as ref_sg  # noqa: E402
import src.modules.warping_network as ref_wn  # noqa: E402
from src.utils.camera import get_rotation_matrix, headpose_pred_to_degree  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from canonswap_tpu.configs import model_config as MC  # noqa: E402
from canonswap_tpu.runtime import core as C  # noqa: E402
from canonswap_tpu.runtime import weights as W  # noqa: E402

B = 2
SIZE = 64  # frame size; volume is (B, 16, 16, 16, 32) — canonical channels
K = 21
LATENT = 512


def _sd(mod):
    return W.to_numpy_state_dict(mod.state_dict())


def _cfg():
    return MC.CanonSwapModelConfig(
        appearance=MC.AppearanceConfig(num_resblocks=2),
        motion=MC.MotionConfig(num_kp=K),
        warping=MC.WarpingConfig(
            num_kp=K, block_expansion=32,
            dense_motion=MC.DenseMotionConfig(num_blocks=2),
        ),
        spade=MC.SpadeConfig(block_expansion=32, out_channels=32),
        swap=MC.SwapConfig(latent_dim=LATENT, n_blocks=2),
        input_size=SIZE,
        output_size=2 * SIZE,
    )


@pytest.fixture(scope="module")
def torch_stack():
    app = ref_app.AppearanceFeatureExtractor(
        image_channel=3, block_expansion=64, num_down_blocks=2,
        max_features=512, reshape_channel=32, reshape_depth=16,
        num_resblocks=2,
    ).eval()
    me = ref_me.MotionExtractor(num_kp=K, backbone="convnextv2_tiny").eval()
    warp = ref_wn.WarpingNetwork(
        num_kp=K, block_expansion=32, max_features=512, num_down_blocks=2,
        reshape_channel=32, estimate_occlusion_map=True,
        dense_motion_params=dict(
            block_expansion=32, max_features=1024, num_blocks=2,
            reshape_depth=16, compress=4,
        ),
    ).eval()
    spade = ref_sg.SPADEDecoder(
        upscale=2, max_features=512, block_expansion=32, out_channels=32,
        num_down_blocks=2,
    ).eval()
    transfer = ref_am.transfer_model2(latent_dim=LATENT, n_blocks=2).eval()
    refine = ref_am.G3d().eval()
    return app, me, warp, spade, transfer, refine


def _reference_chain(torch_stack, frames_t, source_id_t):
    """The reference hot loop, verbatim composition of its modules."""
    app, me, warp, spade, transfer, refine = torch_stack
    with torch.no_grad():
        kp_info = me(frames_t)
        pitch = headpose_pred_to_degree(kp_info["pitch"])[:, None]
        yaw = headpose_pred_to_degree(kp_info["yaw"])[:, None]
        roll = headpose_pred_to_degree(kp_info["roll"])[:, None]
        kp = kp_info["kp"].reshape(B, -1, 3)
        exp = kp_info["exp"].reshape(B, -1, 3)
        t, scale = kp_info["t"], kp_info["scale"]

        rot = get_rotation_matrix(pitch, yaw, roll)
        # can_swap_e2e.py transform_keypoint: s*(kp@R + exp) + t_xy
        x_t = kp @ rot + exp
        x_t = x_t * scale[..., None]
        x_t[:, :, 0:2] += t[:, None, 0:2]
        x_can = scale[..., None] * kp

        f_s = app(frames_t)
        f_can, occ = warp.warp(f_s, x_t, x_can)
        f_swap = transfer(f_can, source_id_t)
        # debug strips (conv_decode, can_swap_e2e.py:309-312)
        rec_can = spade(warp.warp_out(f_can, occ))
        swap_can = spade(warp.warp_out(f_swap, occ))
        f_ref = refine(f_swap)
        ret = warp(f_ref, kp_source=x_can, kp_driving=x_t)
        out = spade(ret["out"])
    return {
        "out": out.numpy(),
        "rec_can": rec_can.numpy(),
        "swap_can": swap_can.numpy(),
        "x_t": x_t.numpy(),
        "x_can": x_can.numpy(),
    }


def test_full_chain_golden(torch_stack):
    app, me, warp, spade, transfer, refine = torch_stack
    frames_t = torch.rand(B, 3, SIZE, SIZE)
    sid_t = torch.randn(B, LATENT)

    want = _reference_chain(torch_stack, frames_t, sid_t)

    params = {
        "appearance_feature_extractor": W.convert_appearance(
            _sd(app), num_down_blocks=2, num_resblocks=2
        ),
        "motion_extractor": W.convert_motion(_sd(me)),
        "warping_module": W.convert_warping(_sd(warp), num_hourglass_blocks=2),
        "spade_generator": W.convert_spade(_sd(spade)),
        "transfer": W.convert_transfer(_sd(transfer), n_blocks=2, n_res3d=6),
        "refine": W.convert_refine(_sd(refine)),
    }
    core = C.CanonSwapCore(_cfg())
    frames = jnp.asarray(frames_t.numpy().transpose(0, 2, 3, 1))
    sid = jnp.asarray(sid_t.numpy())

    motion = C.extract_motion(core, params, frames)
    np.testing.assert_allclose(
        np.asarray(motion["x_t"]), want["x_t"], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(motion["scale"][..., None] * motion["kp"]),
        want["x_can"], rtol=1e-4, atol=1e-4,
    )

    out = C.swap_step(core, params, frames, sid, motion, with_debug=True)

    def chw(x):
        return np.moveaxis(np.asarray(x), -1, 1)

    # atol 4e-3: the folded SPADE segmap conv and packed volume chains
    # reassociate fp32 sums, drifting a handful of elements past 1e-3
    # (observed max 2.2e-3 on 0.002% of pixels); wiring errors are O(0.1)
    np.testing.assert_allclose(
        chw(out["rec_can"]), want["rec_can"], rtol=1e-3, atol=4e-3
    )
    np.testing.assert_allclose(
        chw(out["swap_can"]), want["swap_can"], rtol=1e-3, atol=4e-3
    )
    np.testing.assert_allclose(
        chw(out["out"]), want["out"], rtol=1e-3, atol=4e-3
    )
