"""Parity for the fused VMEM-resident W8A8 block-chain kernels.

Three levels, following the reference's kernel-vs-reference harness pattern
(XPose ops/test.py:32-90):

1. kernel (interpret mode) vs its jnp specification — near-exact.
2. jnp specification vs the per-block flax modules in exact bf16 — int8
   quantization tolerance.
3. full models (SPADEDecoder / SwapModule) with cfg.fused_chain=True vs the
   exact path — end-to-end wiring including param-tree identity.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from canonswap_tpu.configs.model_config import TINY
from canonswap_tpu.ops.pallas.chain import (
    adaptive_chain, adaptive_chain_params, adaptive_chain_ref,
    spade_chain, spade_chain_params, spade_chain_ref,
)


def _rel(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-9))


def _make_spade_blocks(key, nb, c, cseg):
    ks = jax.random.split(key, nb * 6).reshape(nb, 6, 2)
    blocks = []
    for j in range(nb):
        blocks.append({
            "a_kernel": jax.random.normal(ks[j, 0], (2, 3, 3, cseg, 128)) * 0.05,
            "a_bias": jax.random.normal(ks[j, 1], (2, 128)) * 0.05,
            "gb_kernel": jax.random.normal(ks[j, 2], (2, 3, 3, 128, 2 * c)) * 0.05,
            "gb_bias": jax.random.normal(ks[j, 3], (2, 2 * c)) * 0.05,
            "cv_kernel": jax.random.normal(ks[j, 4], (2, 3, 3, c, c)) * 0.05,
            "cv_bias": jax.random.normal(ks[j, 5], (2, c)) * 0.05,
        })
    return blocks


def test_spade_chain_kernel_matches_ref():
    n, h, w, c, cseg, nb = 2, 8, 8, 128, 64, 3
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (n, h, w, c), jnp.bfloat16)
    blocks = _make_spade_blocks(k2, nb, c, cseg)
    actv = jax.nn.relu(
        jax.random.normal(k3, (n, nb, 2, h, w, 128), jnp.bfloat16))
    ref = spade_chain_ref(x, actv, blocks)
    prep = spade_chain_params(blocks)
    out = spade_chain(x, actv, prep, interpret=True)
    assert out.shape == ref.shape
    assert _rel(ref, out) < 2e-2  # bf16 roundings accumulate across blocks


def test_spade_chain_ksplit_matches_ref():
    n, h, w, c, cseg, nb = 2, 8, 8, 128, 64, 3
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    x = jax.random.normal(k1, (n, h, w, c), jnp.bfloat16)
    blocks = _make_spade_blocks(k2, nb, c, cseg)
    actv = jax.nn.relu(
        jax.random.normal(k3, (n, nb, 2, h, w, 128), jnp.bfloat16))
    ref = spade_chain_ref(x, actv, blocks)
    prep = spade_chain_params(blocks)
    out = spade_chain(x, actv, prep, interpret=True, ksplit=True)
    assert out.shape == ref.shape
    assert _rel(ref, out) < 2e-2


def _make_adaptive_blocks(key, nb, c):
    ks = jax.random.split(key, nb * 5).reshape(nb, 5, 2)
    blocks = []
    for j in range(nb):
        blocks.append({
            "weight": jax.random.normal(ks[j, 0], (2, 3, 3, c, c)) * 0.01,
            "bias": jax.random.normal(ks[j, 1], (2, c)) * 0.05,
            "mask_kernel": jax.random.normal(ks[j, 2], (2, 3, 3, c, 1)) * 0.05,
            "mask_bias": jax.random.normal(ks[j, 3], (2, 1)) * 0.05,
        })
    return blocks


def test_adaptive_chain_kernel_matches_ref():
    n, h, w, c, nb = 2, 8, 8, 128, 3
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (n, h, w, c), jnp.bfloat16)
    blocks = _make_adaptive_blocks(k2, nb, c)
    styles = 1.0 + 0.3 * jax.random.normal(k3, (n, nb, 2, c))
    ref = adaptive_chain_ref(x, blocks, styles)
    prep = adaptive_chain_params(blocks, styles)
    out = adaptive_chain(x, prep, interpret=True)
    assert out.shape == ref.shape
    assert _rel(ref, out) < 2e-2


def test_adaptive_chain_ksplit_matches_ref():
    n, h, w, c, nb = 2, 8, 8, 128, 3
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(6), 3)
    x = jax.random.normal(k1, (n, h, w, c), jnp.bfloat16)
    blocks = _make_adaptive_blocks(k2, nb, c)
    styles = 1.0 + 0.3 * jax.random.normal(k3, (n, nb, 2, c))
    ref = adaptive_chain_ref(x, blocks, styles)
    prep = adaptive_chain_params(blocks, styles)
    out = adaptive_chain(x, prep, interpret=True, ksplit=True)
    assert out.shape == ref.shape
    assert _rel(ref, out) < 2e-2


def test_adaptive_chain_ref_matches_flax_blocks():
    """The fused spec == the exact bf16 AdaptiveResBlock2d chain, to int8
    quantization tolerance, with the SAME parameters (wiring contract)."""
    from canonswap_tpu.models.swap import AdaptiveResBlock2d

    n, h, w, c, nb = 2, 8, 8, 64, 2
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (n, h, w, c), jnp.float32)
    latent = jax.random.normal(k2, (n, 16), jnp.float32)

    blocks, styles = [], []
    y = x
    for i in range(nb):
        mod = AdaptiveResBlock2d(c, 16)
        params = mod.init(jax.random.fold_in(k3, i), y, latent)
        y, _ = mod.apply(params, y, latent)
        p = params["params"]
        blocks.append({
            "weight": jnp.stack([p["conv1"]["weight"], p["conv2"]["weight"]]),
            "bias": jnp.stack([p["conv1"]["bias"], p["conv2"]["bias"]]),
            "mask_kernel": jnp.stack([
                p["conv1"]["mask_conv"]["kernel"],
                p["conv2"]["mask_conv"]["kernel"]]),
            "mask_bias": jnp.stack([
                p["conv1"]["mask_conv"]["bias"],
                p["conv2"]["mask_conv"]["bias"]]),
        })
        st = []
        for cv in ("conv1", "conv2"):
            s = latent @ p[cv]["style_fc0"]["kernel"] + p[cv]["style_fc0"]["bias"]
            s = jax.nn.leaky_relu(s, 0.2)
            st.append(s @ p[cv]["style_fc1"]["kernel"] + p[cv]["style_fc1"]["bias"])
        styles.append(jnp.stack(st, axis=1))
    styles = jnp.stack(styles, axis=1)  # (n, nb, 2, c)
    fused = adaptive_chain_ref(x.astype(jnp.bfloat16), blocks, styles)
    assert _rel(y, fused) < 0.08  # int8 quantization error budget


def test_swap_module_fused_chain_param_tree_and_output():
    """SwapModule(fused_chain=True) keeps the exact param tree and tracks
    the exact module's output within the int8 budget (interpret on CPU)."""
    from canonswap_tpu.models.swap import SwapModule

    cfg = TINY.swap
    cfg_f = dataclasses.replace(cfg, fused_chain=True)
    key = jax.random.PRNGKey(3)
    vol = jax.random.normal(key, (2, 8, 16, 16, 8), jnp.float32)
    lat = jax.random.normal(jax.random.fold_in(key, 1),
                            (2, cfg.latent_dim), jnp.float32)
    exact = SwapModule(cfg)
    fused = SwapModule(cfg_f)
    params = exact.init(jax.random.fold_in(key, 2), vol, lat)
    params_f = fused.init(jax.random.fold_in(key, 2), vol, lat)
    flat = jax.tree_util.tree_structure(params)
    flat_f = jax.tree_util.tree_structure(params_f)
    assert flat == flat_f, "fused_chain changed the param tree"
    y_exact = exact.apply(params, vol, lat)
    y_fused = fused.apply(params, vol, lat)
    assert y_fused.shape == y_exact.shape
    assert _rel(y_exact, y_fused) < 0.08


def test_spade_decoder_fused_chain_param_tree_and_output():
    from canonswap_tpu.models.spade_decoder import SPADEDecoder

    cfg = TINY.spade
    cfg_f = dataclasses.replace(cfg, fused_chain=True)
    key = jax.random.PRNGKey(4)
    feat = jax.random.normal(key, (2, 16, 16, 64), jnp.float32)
    exact = SPADEDecoder(cfg)
    fused = SPADEDecoder(cfg_f)
    params = exact.init(jax.random.fold_in(key, 1), feat)
    params_f = fused.init(jax.random.fold_in(key, 1), feat)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(params_f)), "param tree changed"
    y_exact = exact.apply(params, feat)
    y_fused = fused.apply(params, feat)
    assert y_fused.shape == y_exact.shape
    # outputs are post-sigmoid images in [0, 1]
    err = float(jnp.mean(jnp.abs(y_exact - y_fused)))
    assert err < 0.03, err
