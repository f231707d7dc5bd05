"""XPose / UniPose: golden parity vs the reference torch model (random
weights, tiny-but-faithful config) + structural tests.

The reference only reaches UniPose on the dead 'animal_face' path
(src/utils/cropper.py:80-88); this closes the last component-inventory row
with the same oracle methodology as test_reference_parity.py."""

from __future__ import annotations

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from canonswap_tpu.models.xpose import UniPose, UniPoseConfig, XPoseRunner
from canonswap_tpu.models.xpose.convert import convert_unipose


def _np(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


@pytest.mark.slow
def test_unipose_parity_vs_reference():
    import torch
    from tests.helpers.xpose_oracle import load_reference_unipose, tiny_args

    unipose_mod, build, Config = load_reference_unipose()
    args = tiny_args(Config)
    out = build(args)
    model = out[0] if isinstance(out, tuple) else out
    model.eval()

    torch.manual_seed(0)
    img = torch.randn(1, 3, 224, 224) * 0.5
    K = 9
    T = 350
    ins_t = torch.randn(1, 512)
    kpt_t = torch.randn(K, 512)
    tgt = {
        "instance_text_prompt": ["animal"],
        "keypoint_text_prompt": [f"p{i}" for i in range(K)],
        "object_embeddings_text": ins_t,
        "kpts_embeddings_text": torch.cat(
            [kpt_t, torch.zeros(100 - K, 512)], 0),
        "kpt_vis_text": torch.cat([torch.ones(K), torch.zeros(100 - K)], 0),
    }
    with torch.no_grad():
        ref = model(img, [tgt])

    cfg = UniPoseConfig(
        enc_layers=args.enc_layers, dec_layers=args.dec_layers,
        num_queries=args.num_queries, dim_feedforward=args.dim_feedforward)
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_unipose(sd, cfg)

    ours = UniPose(cfg)
    image = jnp.asarray(_np(img).transpose(0, 2, 3, 1))
    mask = jnp.zeros((1, 224, 224), bool)
    ins = np.zeros((1, T, 512), np.float32)
    ins[0, :1] = _np(ins_t)
    tmask = np.zeros((1, T), bool)
    tmask[0, :1] = True
    pos_ids = tmask.astype(np.float32)
    kpt = np.zeros((1, cfg.num_body_points, 512), np.float32)
    kpt[0, :K] = _np(kpt_t)
    kvis = np.zeros((1, cfg.num_body_points), np.float32)
    kvis[0, :K] = 1.0

    got = ours.apply(
        params, image, mask, jnp.asarray(ins), jnp.asarray(tmask),
        jnp.asarray(pos_ids), jnp.asarray(kpt), jnp.asarray(kvis))

    # compare on sigmoid/prob scale (logits contain -inf padding columns)
    ref_logits = torch.sigmoid(ref["pred_logits"]).numpy()
    got_logits = np.asarray(jax.nn.sigmoid(got["pred_logits"]))
    np.testing.assert_allclose(got_logits, ref_logits, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got["pred_boxes"]), _np(ref["pred_boxes"]), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(got["pred_keypoints"]), _np(ref["pred_keypoints"]),
        atol=2e-3)


def test_runner_structure():
    """Runner end-to-end on a tiny canvas/config with random weights:
    shapes, NMS, and pixel-coordinate mapping."""
    from canonswap_tpu.models.xpose.swin import SwinConfig

    cfg = UniPoseConfig(
        hidden_dim=256, enc_layers=1, dec_layers=3, num_queries=64,
        dim_feedforward=64, num_body_points=12, num_group=4,
        swin=SwinConfig(embed_dim=8, depths=(1, 1, 1, 1),
                        num_heads=(1, 1, 1, 1)))
    runner = XPoseRunner(cfg=cfg, canvas=(64, 96), max_text_len=8)
    img = (np.random.default_rng(0).random((50, 70, 3)) * 255).astype(np.uint8)
    ins = np.random.default_rng(1).standard_normal((1, 512)).astype(np.float32)
    kpt = np.random.default_rng(2).standard_normal((9, 512)).astype(np.float32)
    boxes, kpts, scores = runner.get_unipose_output(
        img, num_keypoints=9, ins_embed=ins, kpt_embed=kpt)
    assert boxes.shape[-1] == 4 and kpts.shape[-1] == 18
    assert len(boxes) == len(scores) <= cfg.num_group
    lmk = runner.run(img, num_keypoints=9, box_threshold=-1.0,
                     ins_embed=ins, kpt_embed=kpt)
    assert lmk.shape == (9, 2)
    assert np.all(np.isfinite(lmk))
