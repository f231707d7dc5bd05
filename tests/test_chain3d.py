"""Parity for the fused packed-3D resblock chain kernels.

Same three-level pattern as tests/test_chain.py: interpret-mode kernel vs
jnp spec (near-exact), spec vs the exact flax blocks (int8 tolerance),
full-module wiring (see test_chain3d_models below).
"""

import jax
import jax.numpy as jnp

from canonswap_tpu.ops.pallas.chain3d import (
    res3d_bn_chain, res3d_bn_chain_params, res3d_bn_chain_ref,
    res3d_gn_chain, res3d_gn_chain_params, res3d_gn_chain_ref,
)


def _rel(a, b):
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-9))


def _make_bn_blocks(key, nb, c_orig):
    ks = jax.random.split(key, nb * 6).reshape(nb, 6, 2)
    blocks = []
    for j in range(nb):
        blocks.append({
            "bn_scale": 1.0 + 0.1 * jax.random.normal(ks[j, 0], (2, c_orig)),
            "bn_bias": 0.1 * jax.random.normal(ks[j, 1], (2, c_orig)),
            "bn_mean": 0.1 * jax.random.normal(ks[j, 2], (2, c_orig)),
            "bn_var": jnp.abs(
                1.0 + 0.2 * jax.random.normal(ks[j, 3], (2, c_orig))),
            "kernel": jax.random.normal(
                ks[j, 4], (2, 3, 3, 3, c_orig, c_orig)) * 0.05,
            "bias": 0.05 * jax.random.normal(ks[j, 5], (2, c_orig)),
        })
    return blocks


def test_bn_chain_kernel_matches_ref():
    n, d, hh, wh, c_orig, nb = 2, 4, 8, 8, 8, 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    xp = jax.random.normal(k1, (n, d, hh, wh, 4 * c_orig), jnp.bfloat16)
    blocks = _make_bn_blocks(k2, nb, c_orig)
    ref = res3d_bn_chain_ref(xp, blocks)
    prep = res3d_bn_chain_params(blocks)
    out = res3d_bn_chain(xp, prep, interpret=True)
    assert out.shape == ref.shape
    assert _rel(ref, out) < 2e-2


def test_bn_chain_ref_matches_flax_blocks():
    """The fused spec == the exact bf16 packed ResBlock3d chain with the
    SAME parameters, to int8 tolerance (wiring contract)."""
    from canonswap_tpu.nn.blocks import ResBlock3d

    n, d, hh, wh, c_orig, nb = 2, 4, 8, 8, 8, 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    xp = jax.random.normal(k1, (n, d, hh, wh, 4 * c_orig), jnp.float32)

    blocks = []
    y = xp
    for i in range(nb):
        mod = ResBlock3d(packed=True)
        variables = mod.init(jax.random.fold_in(k2, i), y, train=False)
        # randomize the running stats (init is mean=0/var=1)
        kk = jax.random.fold_in(k2, 100 + i)
        bs = variables["batch_stats"]
        bs = jax.tree.map(lambda a: a, bs)
        stats = {
            name: {
                "mean": 0.1 * jax.random.normal(
                    jax.random.fold_in(kk, h), (c_orig,)),
                "var": jnp.abs(1.0 + 0.2 * jax.random.normal(
                    jax.random.fold_in(kk, 10 + h), (c_orig,))),
            }
            for h, name in enumerate(["BatchNorm_0", "BatchNorm_1"])
        }
        variables = {
            "params": variables["params"],
            "batch_stats": stats,
        }
        y = mod.apply(variables, y, train=False)
        p = variables["params"]
        blocks.append({
            "bn_scale": jnp.stack([p["BatchNorm_0"]["scale"],
                                   p["BatchNorm_1"]["scale"]]),
            "bn_bias": jnp.stack([p["BatchNorm_0"]["bias"],
                                  p["BatchNorm_1"]["bias"]]),
            "bn_mean": jnp.stack([stats["BatchNorm_0"]["mean"],
                                  stats["BatchNorm_1"]["mean"]]),
            "bn_var": jnp.stack([stats["BatchNorm_0"]["var"],
                                 stats["BatchNorm_1"]["var"]]),
            "kernel": jnp.stack([p["Conv_0"]["kernel"],
                                 p["Conv_1"]["kernel"]]),
            "bias": jnp.stack([p["Conv_0"]["bias"], p["Conv_1"]["bias"]]),
        })
    fused = res3d_bn_chain_ref(xp.astype(jnp.bfloat16), blocks)
    assert _rel(y, fused) < 0.08


def _make_gn_blocks(key, nb, c_orig):
    ks = jax.random.split(key, nb * 4).reshape(nb, 4, 2)
    blocks = []
    for j in range(nb):
        blocks.append({
            "kernel": jax.random.normal(
                ks[j, 0], (2, 3, 3, 3, c_orig, c_orig)) * 0.05,
            "bias": 0.05 * jax.random.normal(ks[j, 1], (2, c_orig)),
            "gn_scale": 1.0 + 0.1 * jax.random.normal(ks[j, 2], (2, c_orig)),
            "gn_bias": 0.1 * jax.random.normal(ks[j, 3], (2, c_orig)),
        })
    return blocks


def test_gn_chain_kernel_matches_ref():
    n, d, hh, wh, c_orig, nb = 2, 4, 8, 8, 8, 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    xp = jax.random.normal(k1, (n, d, hh, wh, 4 * c_orig), jnp.bfloat16)
    blocks = _make_gn_blocks(k2, nb, c_orig)
    ref = res3d_gn_chain_ref(xp, blocks, groups=c_orig)
    prep = res3d_gn_chain_params(blocks, groups=c_orig)
    out = res3d_gn_chain(xp, prep, groups=c_orig, interpret=True)
    assert out.shape == ref.shape
    assert _rel(ref, out) < 2e-2


def test_appearance_fused_chain_param_tree_and_output():
    """AppearanceFeatureExtractor(fused_chain=True): identical param tree,
    output within the int8 budget (interpret on CPU)."""
    import dataclasses

    from canonswap_tpu.configs.model_config import TINY
    from canonswap_tpu.models.appearance import AppearanceFeatureExtractor

    cfg = TINY.appearance
    cfg_f = dataclasses.replace(cfg, fused_chain=True)
    key = jax.random.PRNGKey(4)
    img = jax.random.uniform(key, (2, 32, 32, 3), jnp.float32)
    exact = AppearanceFeatureExtractor(cfg)
    fused = AppearanceFeatureExtractor(cfg_f)
    v = exact.init(jax.random.fold_in(key, 1), img, train=False)
    v_f = fused.init(jax.random.fold_in(key, 1), img, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_f)), "variables tree changed"
    y_exact = exact.apply(v, img, train=False)
    y_fused = fused.apply(v, img, train=False)
    assert y_fused.shape == y_exact.shape
    assert _rel(y_exact, y_fused) < 0.08


def test_refine_fused_chain_param_tree_and_output():
    from canonswap_tpu.models.refine import RefineModule

    key = jax.random.PRNGKey(5)
    vol = jax.random.normal(key, (2, 4, 16, 16, 8), jnp.float32)
    exact = RefineModule()
    fused = RefineModule(fused_chain=True)
    v = exact.init(jax.random.fold_in(key, 1), vol, train=False)
    v_f = fused.init(jax.random.fold_in(key, 1), vol, train=False)
    assert (jax.tree_util.tree_structure(v)
            == jax.tree_util.tree_structure(v_f)), "variables tree changed"
    y_exact = exact.apply(v, vol, train=False)
    y_fused = fused.apply(v, vol, train=False)
    assert y_fused.shape == y_exact.shape
    assert _rel(y_exact, y_fused) < 0.08


def test_gn_chain_ref_matches_flax_blocks():
    from canonswap_tpu.nn.blocks import ResBlock3dLeakGN

    n, d, hh, wh, c_orig, nb = 2, 4, 8, 8, 8, 2
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    xp = jax.random.normal(k1, (n, d, hh, wh, 4 * c_orig), jnp.float32)

    blocks = []
    y = xp
    for i in range(nb):
        mod = ResBlock3dLeakGN(c_orig, packed=True)
        variables = mod.init(jax.random.fold_in(k2, i), y)
        y = mod.apply(variables, y)
        p = variables["params"]
        blocks.append({
            "kernel": jnp.stack([p["conv1"]["kernel"],
                                 p["conv2"]["kernel"]]),
            "bias": jnp.stack([p["conv1"]["bias"], p["conv2"]["bias"]]),
            "gn_scale": jnp.stack([p["gn1"]["scale"], p["gn2"]["scale"]]),
            "gn_bias": jnp.stack([p["gn1"]["bias"], p["gn2"]["bias"]]),
        })
    groups = min(32, c_orig)
    fused = res3d_gn_chain_ref(xp.astype(jnp.bfloat16), blocks,
                               groups=groups)
    assert _rel(y, fused) < 0.08
