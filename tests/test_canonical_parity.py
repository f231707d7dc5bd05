"""CANONICAL-shape parity spot checks (VERDICT r2 #7).

Every oracle test in test_reference_parity runs reduced widths; these run
single blocks of each risky family at the FULL models.yaml shapes — the
s2d-packed conv chains, pack_hw2 layouts and 512-ch blocks where a full-size
run can diverge (padding seams, reshape order) even when the reduced test
passes.  Slow module: a few minutes of single-core CPU each.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest
import torch

torch.manual_seed(0)
sys.path.insert(0, "/root/reference")

ref_util = pytest.importorskip("src.modules.util")
import src.modules.adaptive_modulate as ref_am  # noqa: E402
import src.modules.dense_motion as ref_dm  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from canonswap_tpu.configs import model_config as MC  # noqa: E402
from canonswap_tpu.models.dense_motion import DenseMotionNetwork  # noqa: E402
from canonswap_tpu.models.swap import AdaptiveResBlock2d  # noqa: E402
from canonswap_tpu.nn.blocks import ResBlock3d, SPADEResnetBlock  # noqa: E402
from canonswap_tpu.nn.conv3d import pack_hw2, unpack_hw2  # noqa: E402
from canonswap_tpu.runtime import weights as W  # noqa: E402


def sd_np(mod):
    return W.to_numpy_state_dict(mod.state_dict())


def nchw(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 1))


def ncdhw(x):
    return jnp.asarray(x.detach().numpy().transpose(0, 2, 3, 4, 1))


def back2d(x):
    return np.moveaxis(np.asarray(x), -1, 1)


def back3d(x):
    return np.asarray(x).transpose(0, 4, 1, 2, 3)


def test_canonical_adaptive_resblock_512ch():
    """One ResnetBlock_Adaptive2D at the real 512ch/64^2 shape (the swap
    module's working size, models.yaml reshape 32x16 -> 512)."""
    dim, latent = 512, 512
    tm = ref_am.ResnetBlock_Adaptive2D(dim=dim, latent_size=latent).eval()
    x = torch.rand(1, dim, 64, 64)
    lat = torch.randn(1, latent)
    with torch.no_grad():
        want, want_mask = tm(x, lat)

    jm = AdaptiveResBlock2d(dim, latent)
    tb = W._TreeBuilder()
    W._adaptive_conv(tb, "conv1", sd_np(tm), "conv1")
    W._adaptive_conv(tb, "conv2", sd_np(tm), "conv2")
    got, got_mask = jm.apply(tb.variables(), nchw(x),
                             jnp.asarray(lat.numpy()))
    np.testing.assert_allclose(back2d(got), want.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(back2d(got_mask), want_mask.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_canonical_packed_resblock3d_chain():
    """Two chained 32-ch ResBlock3d at the full (16, 64, 64) volume in the
    pack_hw2 layout — the seam/reshape-order risk the reduced tests can't
    catch."""
    tms = [ref_util.ResBlock3d(32, kernel_size=3, padding=1).eval()
           for _ in range(2)]
    # randomize running stats so BN actually transforms
    for tm in tms:
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm3d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.5)
    x = torch.rand(1, 32, 16, 64, 64)
    with torch.no_grad():
        want = x
        for tm in tms:
            want = tm(want)

    tb = W._TreeBuilder()
    for i, tm in enumerate(tms):
        sd = sd_np(tm)
        tb.put_bn(f"res3d_{i}/BatchNorm_0", sd, "norm1")
        tb.put(f"res3d_{i}/Conv_0", W._conv(sd, "conv1"))
        tb.put_bn(f"res3d_{i}/BatchNorm_1", sd, "norm2")
        tb.put(f"res3d_{i}/Conv_1", W._conv(sd, "conv2"))
    variables = tb.variables()

    h = pack_hw2(ncdhw(x))
    for i in range(2):
        blk = ResBlock3d(packed=True)
        sub = {
            "params": variables["params"][f"res3d_{i}"],
            "batch_stats": variables["batch_stats"][f"res3d_{i}"],
        }
        h = blk.apply(sub, h)
    got = unpack_hw2(h)
    np.testing.assert_allclose(back3d(got), want.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_canonical_spade_resblock_512ch():
    """One SPADE resblock at 512ch/64^2 with the 256-ch segmap — full-size
    check of the folded mlp_shared + merged gamma/beta conv."""
    tm = ref_util.SPADEResnetBlock(
        512, 512, norm_G="spadespectralinstance", label_nc=256).eval()
    x = torch.rand(1, 512, 64, 64)
    seg = torch.rand(1, 256, 64, 64)
    with torch.no_grad():
        want = tm(x, seg).numpy()

    class _Holder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.blk = tm

    tb = W._TreeBuilder()
    W._spade_resblock(tb, "blk", sd_np(_Holder().eval()), "blk",
                      learned_shortcut=False)
    variables = {"params": tb.variables()["params"]["blk"]}
    jm = SPADEResnetBlock(512, 512)
    got = jm.apply(variables, nchw(x), nchw(seg))
    np.testing.assert_allclose(back2d(got), want, rtol=2e-3, atol=2e-3)


def test_canonical_dense_motion_full():
    """Full CANONICAL dense-motion network (21 kp, hourglass 32..1024,
    k7^3 mask head) — exercises the fused hg_in einsum build, the depth-
    decomposed k7 conv and the distributed mask combine at real size."""
    k = 21
    tm = ref_dm.DenseMotionNetwork(
        block_expansion=32, num_blocks=5, max_features=1024, num_kp=k,
        feature_channel=32, reshape_depth=16, compress=4,
        estimate_occlusion_map=True,
    ).eval()
    feat = torch.rand(1, 32, 16, 64, 64)
    kp_d = torch.randn(1, k, 3) * 0.3
    kp_s = torch.randn(1, k, 3) * 0.3
    with torch.no_grad():
        want = tm(feature=feat, kp_driving=kp_d, kp_source=kp_s)

    class _Wrap(torch.nn.Module):
        def __init__(self, dm):
            super().__init__()
            self.dense_motion_network = dm
            # dummy warp_out tail so convert_warping finds its keys
            self.third = ref_util.SameBlock2d(
                32 * 16, 256, kernel_size=(3, 3), padding=(1, 1), lrelu=True)
            self.fourth = torch.nn.Conv2d(256, 256, kernel_size=1)

    jm = DenseMotionNetwork(MC.DenseMotionConfig(), num_kp=k)
    variables = W.convert_warping(sd_np(_Wrap(tm).eval()),
                                  num_hourglass_blocks=5)
    dm_vars = {
        "params": variables["params"]["dense_motion_network"],
        "batch_stats": variables["batch_stats"]["dense_motion_network"],
    }
    got = jm.apply(dm_vars, ncdhw(feat), jnp.asarray(kp_d.numpy()),
                   jnp.asarray(kp_s.numpy()))
    np.testing.assert_allclose(
        np.asarray(got["deformation"]),
        want["deformation"].numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        back2d(got["occlusion_map"]), want["occlusion_map"].numpy(),
        rtol=2e-3, atol=2e-3)
