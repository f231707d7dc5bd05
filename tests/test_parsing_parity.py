"""Segformer parity vs HuggingFace torch (random weights, local oracle)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

from canonswap_tpu.models import parsing as P  # noqa: E402
from canonswap_tpu.runtime.weights import to_numpy_state_dict  # noqa: E402


def test_segformer_matches_hf():
    torch.manual_seed(0)
    hf_cfg = transformers.SegformerConfig(
        num_labels=19, depths=[1, 1, 1, 1], hidden_sizes=[16, 24, 40, 64],
        num_attention_heads=[1, 2, 5, 8], decoder_hidden_size=64,
        sr_ratios=[8, 4, 2, 1], drop_path_rate=0.0,
    )
    tm = transformers.SegformerForSemanticSegmentation(hf_cfg).eval()
    x = torch.rand(2, 3, 64, 64)
    with torch.no_grad():
        want = tm(pixel_values=x).logits.numpy()

    cfg = P.SegformerConfig(
        hidden_sizes=(16, 24, 40, 64), depths=(1, 1, 1, 1),
        num_heads=(1, 2, 5, 8), decoder_hidden=64,
    )
    jm = P.Segformer(cfg)
    variables = P.convert_hf_segformer(to_numpy_state_dict(tm.state_dict()), cfg)
    got = jm.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), -1, 1), want, rtol=2e-3, atol=2e-4
    )


def test_face_mask_from_logits():
    logits = np.zeros((1, 16, 16, 19), np.float32)
    logits[..., 0] = 1.0  # background wins everywhere
    logits[0, 4:8, 4:8, 1] = 5.0  # skin region
    logits[0, 0:2, 0:2, 13] = 5.0  # class 13 (hair) — not a swap class
    mask = np.asarray(
        P.face_mask_from_logits(jnp.asarray(logits), out_size=(16, 16))
    )
    assert mask[0, 5, 5, 0] == 1.0
    assert mask[0, 0, 0, 0] == 0.0
    assert mask[0, 12, 12, 0] == 0.0
