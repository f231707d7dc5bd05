"""Full-size conversion rehearsal (VERDICT r2 #10): synthesize a
CANONICAL-shape combined_weights.pth-layout checkpoint from the reference
torch classes (random weights), run the convert CLI, load the result, and
execute one full swap batch — proving the converter and memory budget at
real checkpoint scale before a user ever supplies weights.
"""

from __future__ import annotations

import sys

import numpy as np
import pytest
import torch

torch.manual_seed(0)
sys.path.insert(0, "/root/reference")

ref_app = pytest.importorskip("src.modules.appearance_feature_extractor")
import src.modules.adaptive_modulate as ref_am  # noqa: E402
import src.modules.motion_extractor as ref_me  # noqa: E402
import src.modules.spade_generator as ref_sg  # noqa: E402
import src.modules.warping_network as ref_wn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _canonical_torch_state_dicts():
    """The six state dicts of combined_weights.pth at models.yaml:1-43
    shapes (can_swap_e2e.py:93-98 keys)."""
    app = ref_app.AppearanceFeatureExtractor(
        image_channel=3, block_expansion=64, num_down_blocks=2,
        max_features=512, reshape_channel=32, reshape_depth=16,
        num_resblocks=6)
    mot = ref_me.MotionExtractor(num_kp=21, backbone="convnextv2_tiny")
    warp = ref_wn.WarpingNetwork(
        num_kp=21, block_expansion=64, max_features=512, num_down_blocks=2,
        reshape_channel=32, estimate_occlusion_map=True,
        dense_motion_params=dict(block_expansion=32, max_features=1024,
                                 num_blocks=5, reshape_depth=16, compress=4))
    spade = ref_sg.SPADEDecoder(
        upscale=2, max_features=512, block_expansion=64, out_channels=64,
        num_down_blocks=2)
    transfer = ref_am.transfer_model2(latent_dim=512, n_blocks=7)
    refine = ref_am.G3d()
    mods = {
        "appearance_feature_extractor": app,
        "motion_extractor": mot,
        "warping_module": warp,
        "spade_generator": spade,
        "transfer": transfer,
        "refine": refine,
    }
    out = {}
    for k, m in mods.items():
        m = m.eval()
        # randomize BN running stats so conversion actually moves numbers
        for sub in m.modules():
            if isinstance(sub, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                sub.running_mean.uniform_(-0.1, 0.1)
                sub.running_var.uniform_(0.7, 1.4)
        out[k] = m.state_dict()
    return out


def test_full_conversion_rehearsal(tmp_path):
    from canonswap_tpu.cli.convert import main as convert_main
    from canonswap_tpu.configs.model_config import CANONICAL
    from canonswap_tpu.runtime import checkpoint as CK
    from canonswap_tpu.runtime import core as C

    pth = tmp_path / "combined_weights.pth"
    torch.save(_canonical_torch_state_dicts(), str(pth))

    npz = tmp_path / "combined.npz"
    convert_main(["combined", str(pth), str(npz)])
    params = CK.load_npz(str(npz))
    assert set(params) == {
        "appearance_feature_extractor", "motion_extractor", "warping_module",
        "spade_generator", "transfer", "refine",
    }

    core = C.CanonSwapCore(CANONICAL)
    # the converted tree must be exactly the shape the model expects
    expect = jax.eval_shape(core.init_params, jax.random.PRNGKey(0))
    got_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(params)}
    want_paths = {p for p, _ in jax.tree_util.tree_leaves_with_path(expect)}
    assert got_paths == want_paths
    for (p, a), (_, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(params), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(expect), key=lambda t: str(t[0])),
    ):
        assert tuple(np.shape(a)) == tuple(b.shape), p

    # one real swap batch at full scale (batch 1, 256^2 -> 512^2)
    frames = jnp.full((1, 256, 256, 3), 0.5, jnp.float32)
    sid = jnp.ones((1, 512), jnp.float32) / np.sqrt(512.0)
    out, motion = C.swap_with_motion(core, params, frames, sid)
    assert out["out"].shape == (1, 512, 512, 3)
    assert np.all(np.isfinite(np.asarray(out["out"])))
    assert motion["kp"].shape == (1, 21, 3)
