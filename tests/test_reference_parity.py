"""Golden parity vs the reference torch modules (used as a TEST ORACLE).

The reference ships no weights, so we build its torch modules with random
weights, convert the state_dicts through ``runtime.weights``, and require our
JAX modules to reproduce the torch forward numerics.  This validates both the
converter mappings and our modules' semantics in one shot — the strongest
correctness check available without the real checkpoint, and exactly what
will make the real ``combined_weights.pth`` drop in.

Reduced widths/spatial sizes keep CPU runtime sane; the math is size-agnostic.
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
import src.modules.dense_motion as ref_dm  # noqa: E402
import src.modules.spade_generator as ref_sg  # noqa: E402
import src.modules.warping_network as ref_wn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from canonswap_tpu.configs import model_config as MC  # noqa: E402
from canonswap_tpu.models.appearance import AppearanceFeatureExtractor  # noqa: E402
from canonswap_tpu.models.dense_motion import DenseMotionNetwork  # noqa: E402
from canonswap_tpu.models.refine import RefineModule  # noqa: E402
from canonswap_tpu.models.spade_decoder import SPADEDecoder  # noqa: E402
from canonswap_tpu.models.swap import AdaptiveResBlock2d, SwapModule  # noqa: E402
from canonswap_tpu.models.warping import WarpingNetwork  # noqa: E402
from canonswap_tpu.runtime import weights as W  # noqa: E402


def sd_np(mod):
    return W.to_numpy_state_dict(mod.state_dict())


def nchw(x):  # torch -> jax channels-last
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def ncdhw(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 4, 1))


def back2d(x):  # jax -> numpy NCHW
    return np.moveaxis(np.asarray(x), -1, 1)


def back3d(x):
    return np.asarray(x).transpose(0, 4, 1, 2, 3)


def assert_close(got, want, rtol=2e-4, atol=2e-4):
    np.testing.assert_allclose(got, want, rtol=rtol, atol=atol)


def test_appearance_parity():
    tm = ref_app.AppearanceFeatureExtractor(
        image_channel=3, block_expansion=16, num_down_blocks=2,
        max_features=64, reshape_channel=8, reshape_depth=8, num_resblocks=2,
    ).eval()
    x = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        want = tm(x).numpy()

    cfg = MC.AppearanceConfig(
        block_expansion=16, max_features=64, reshape_channel=8,
        reshape_depth=8, num_resblocks=2,
    )
    jm = AppearanceFeatureExtractor(cfg)
    variables = W.convert_appearance(sd_np(tm), num_down_blocks=2, num_resblocks=2)
    got = jm.apply(variables, nchw(x))
    assert_close(back3d(got), want)


def test_dense_motion_parity():
    k, compress, depth = 5, 2, 8
    tm = ref_dm.DenseMotionNetwork(
        block_expansion=8, num_blocks=2, max_features=64, num_kp=k,
        feature_channel=8, reshape_depth=depth, compress=compress,
        estimate_occlusion_map=True,
    ).eval()
    feat = torch.rand(2, 8, depth, 16, 16)
    kp_d = torch.randn(2, k, 3) * 0.3
    kp_s = torch.randn(2, k, 3) * 0.3
    with torch.no_grad():
        want = tm(feature=feat, kp_driving=kp_d, kp_source=kp_s)

    cfg = MC.DenseMotionConfig(
        block_expansion=8, max_features=64, num_blocks=2,
        reshape_depth=depth, compress=compress,
    )
    jm = DenseMotionNetwork(cfg, num_kp=k)
    variables = W.convert_warping(sd_np(tm_wrap(tm)), num_hourglass_blocks=2)
    # extract just the dense-motion subtree from the wrapped conversion
    dm_vars = {
        "params": variables["params"]["dense_motion_network"],
        "batch_stats": variables["batch_stats"]["dense_motion_network"],
    }
    got = jm.apply(dm_vars, ncdhw(feat), jnp.asarray(kp_d.numpy()), jnp.asarray(kp_s.numpy()))
    assert_close(
        np.asarray(got["deformation"]).transpose(0, 4, 1, 2, 3),
        want["deformation"].numpy().transpose(0, 4, 1, 2, 3),
    )
    assert_close(back2d(got["occlusion_map"]), want["occlusion_map"].numpy())


def tm_wrap(dense_motion_torch):
    """Wrap a torch DenseMotionNetwork in a dummy holder so its state_dict
    keys get the 'dense_motion_network.' prefix convert_warping expects."""

    class Holder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dense_motion_network = dense_motion_torch
            self.third = ref_util.SameBlock2d(8 * 8, 16, kernel_size=(3, 3),
                                              padding=(1, 1), lrelu=True)
            self.fourth = torch.nn.Conv2d(16, 16, kernel_size=1)

    return Holder().eval()


def test_warping_network_parity():
    k = 5
    tm = ref_wn.WarpingNetwork(
        num_kp=k, block_expansion=4, max_features=64, num_down_blocks=2,
        reshape_channel=8, estimate_occlusion_map=True,
        dense_motion_params=dict(
            block_expansion=8, max_features=64, num_blocks=2,
            reshape_depth=8, compress=2,
        ),
    ).eval()
    feat = torch.rand(2, 8, 8, 16, 16)
    kp_d = torch.randn(2, k, 3) * 0.3
    kp_s = torch.randn(2, k, 3) * 0.3
    with torch.no_grad():
        want = tm(feat, kp_driving=kp_d, kp_source=kp_s)

    cfg = MC.WarpingConfig(
        num_kp=k, block_expansion=4, max_features=64, num_down_blocks=2,
        reshape_channel=8,
        dense_motion=MC.DenseMotionConfig(
            block_expansion=8, max_features=64, num_blocks=2,
            reshape_depth=8, compress=2,
        ),
    )
    jm = WarpingNetwork(cfg)
    variables = W.convert_warping(sd_np(tm), num_hourglass_blocks=2)
    got = jm.apply(
        variables, ncdhw(feat), jnp.asarray(kp_d.numpy()), jnp.asarray(kp_s.numpy())
    )
    assert_close(back2d(got["out"]), want["out"].numpy())
    assert_close(back2d(got["occlusion_map"]), want["occlusion_map"].numpy())


def test_spade_decoder_parity():
    tm = ref_sg.SPADEDecoder(
        upscale=2, max_features=64, block_expansion=16, out_channels=16,
        num_down_blocks=2,
    ).eval()
    feat = torch.rand(1, 64, 16, 16)
    with torch.no_grad():
        want = tm(feat).numpy()

    cfg = MC.SpadeConfig(
        upscale=2, block_expansion=16, max_features=64, out_channels=16
    )
    jm = SPADEDecoder(cfg)
    variables = W.convert_spade(sd_np(tm))
    got = jm.apply(variables, nchw(feat))
    assert_close(back2d(got), want)


def test_adaptive_resblock_parity():
    dim, latent = 48, 32
    tm = ref_am.ResnetBlock_Adaptive2D(dim=dim, latent_size=latent).eval()
    x = torch.rand(2, dim, 12, 12)
    lat = torch.randn(2, latent)
    with torch.no_grad():
        want, want_mask = tm(x, lat)

    jm = AdaptiveResBlock2d(dim, latent)
    tb = W._TreeBuilder()
    W._adaptive_conv(tb, "conv1", sd_np(tm), "conv1")
    W._adaptive_conv(tb, "conv2", sd_np(tm), "conv2")
    got, got_mask = jm.apply(tb.variables(), nchw(x), jnp.asarray(lat.numpy()))
    assert_close(back2d(got), want.numpy())
    assert_close(back2d(got_mask), want_mask.numpy())


def test_swap_module_parity():
    """Full transfer_model2 at reduced spatial size (channels fixed by the
    reference architecture: 32x16 volume -> 512-ch 2D blocks)."""
    tm = ref_am.transfer_model2(latent_dim=64, n_blocks=2).eval()
    # zero-init BN running stats make variance 1 — randomize them a bit
    x = torch.rand(1, 32, 16, 8, 8)
    lat = torch.randn(1, 64)
    with torch.no_grad():
        want = tm(x, lat).numpy()

    cfg = MC.SwapConfig(latent_dim=64, n_blocks=2, n_resblocks_3d=6)
    jm = SwapModule(cfg)
    variables = W.convert_transfer(sd_np(tm), n_blocks=2, n_res3d=6)
    got = jm.apply(variables, ncdhw(x), jnp.asarray(lat.numpy()))
    assert_close(back3d(got), want)


def test_refine_module_parity():
    tm = ref_am.G3d().eval()
    x = torch.rand(1, 32, 16, 8, 8)
    with torch.no_grad():
        want = tm(x).numpy()

    jm = RefineModule()
    variables = W.convert_refine(sd_np(tm))
    got = jm.apply(variables, ncdhw(x))
    assert_close(back3d(got), want)


def test_stitching_parity():
    import src.modules.stitching_retargeting_network as ref_st

    from canonswap_tpu.models.stitching import StitchingRetargetingNetwork

    tm = ref_st.StitchingRetargetingNetwork(
        input_size=66, hidden_sizes=[256, 256, 128, 128, 64], output_size=63
    ).eval()
    x = torch.randn(2, 66)
    with torch.no_grad():
        want = tm(x).numpy()
    jm = StitchingRetargetingNetwork(
        hidden_sizes=(256, 256, 128, 128, 64), output_size=63
    )
    variables = W.convert_stitching(sd_np(tm), num_hidden=5)
    got = np.asarray(jm.apply(variables, jnp.asarray(x.numpy())))
    assert_close(got, want)


def test_convnextv2_motion_extractor_parity():
    """Full ConvNeXtV2-tiny motion extractor vs the reference torch module
    (src/modules/motion_extractor.py + convnextv2.py)."""
    import src.modules.motion_extractor as ref_me

    from canonswap_tpu.configs.model_config import MotionConfig
    from canonswap_tpu.models.motion import MotionExtractor

    tm = ref_me.MotionExtractor(num_kp=21, backbone="convnextv2_tiny").eval()
    x = torch.rand(1, 3, 64, 64)
    with torch.no_grad():
        want = tm(x)

    jm = MotionExtractor(MotionConfig(num_kp=21))
    variables = W.convert_motion(sd_np(tm))
    got = jm.apply(variables, nchw(x))
    for k in ("kp", "pitch", "yaw", "roll", "t", "exp", "scale"):
        assert_close(np.asarray(got[k]), want[k].numpy(), rtol=5e-4, atol=5e-4)


def test_arcface_parity():
    """SE-IR ResNet ArcFace vs reference models/arcface_models.py (dual
    output contract: (embedding, mid feature))."""
    # import under an alias package: the name 'models' is ambiguous once the
    # XPose oracle put its own models/ package on sys.path
    import importlib
    import types

    if "ref_models" not in sys.modules:
        pkg = types.ModuleType("ref_models")
        pkg.__path__ = [f"{REF}/models"]
        sys.modules["ref_models"] = pkg
    ref_arc = importlib.import_module("ref_models.arcface_models")

    from canonswap_tpu.models.arcface import ArcFaceResNet

    # models/arcface_models.py references conv3x3 without defining it (the
    # pickled checkpoint was created where the original repo provided it);
    # supply the standard ResNet conv3x3.
    if not hasattr(ref_arc, "conv3x3"):
        ref_arc.conv3x3 = lambda i, o, stride=1: torch.nn.Conv2d(
            i, o, 3, stride=stride, padding=1, bias=False
        )
    tm = ref_arc.ResNet(ref_arc.IRBlock, [1, 1, 1, 1], use_se=True).eval()
    x = torch.rand(2, 3, 112, 112)
    with torch.no_grad():
        want_emb, want_mid = tm(x)

    jm = ArcFaceResNet(layers=(1, 1, 1, 1))
    variables = W.convert_arcface(sd_np(tm), layers=(1, 1, 1, 1))
    got_emb, got_mid = jm.apply(variables, nchw(x))
    assert_close(np.asarray(got_emb), want_emb.numpy(), rtol=1e-3, atol=1e-3)
    assert_close(np.asarray(got_mid), want_mid.numpy(), rtol=1e-3, atol=1e-3)
