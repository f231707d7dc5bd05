"""Module-level parity for the z-slab (conv3d_impl="zdense") chain layout.

The z-dense form is implementation-only: the parameter tree and the numerics
must match the packed layout exactly (same checkpoint, same outputs up to
float reassociation).  Mirrors the reference's kernel-vs-reference test
pattern (XPose ops/test.py:32-90): every alternate compute form ships with
a parity test against the baseline form.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonswap_tpu.configs.model_config import TINY
from canonswap_tpu.models.appearance import AppearanceFeatureExtractor
from canonswap_tpu.models.refine import RefineModule
from canonswap_tpu.models.swap import SwapModule
from canonswap_tpu.nn.blocks import ResBlock3d, ResBlock3dLeakGN
from canonswap_tpu.nn.conv3d import from_zslab, to_zslab

B, D, H, W, C = 2, 4, 8, 8, 32


def _vol(seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (B, D, H, W, C),
                             jnp.float32)


class TestZSlabBlocks:
    def test_resblock3d_parity(self):
        x = _vol()
        ref = ResBlock3d()
        params = ref.init(jax.random.PRNGKey(1), x)
        want = ref.apply(params, x)
        zs = ResBlock3d(zslab=D)
        got = from_zslab(zs.apply(params, to_zslab(x)), D)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)

    def test_resblock3d_param_tree_identical(self):
        x = _vol()
        p_ref = jax.tree.map(lambda a: a.shape,
                             ResBlock3d().init(jax.random.PRNGKey(1), x))
        p_zs = jax.tree.map(
            lambda a: a.shape,
            ResBlock3d(zslab=D).init(jax.random.PRNGKey(1), to_zslab(x)))
        assert p_ref == p_zs

    def test_resblock3d_train_stats_match(self):
        """BatchNorm train-mode batch stats on the (…, D, C) slab view must
        equal the volume form's (same element sets per channel)."""
        x = _vol()
        ref = ResBlock3d()
        params = ref.init(jax.random.PRNGKey(1), x)
        want, mut_ref = ref.apply(params, x, train=True,
                                  mutable=["batch_stats"])
        zs = ResBlock3d(zslab=D)
        got, mut_zs = zs.apply(params, to_zslab(x), train=True,
                               mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(from_zslab(got, D)),
                                   np.asarray(want), rtol=2e-5, atol=2e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5),
            mut_ref, mut_zs)

    @pytest.mark.parametrize("features", [C, 2 * C])
    def test_leakgn_parity(self, features):
        x = _vol()
        ref = ResBlock3dLeakGN(features)
        params = ref.init(jax.random.PRNGKey(2), x)
        want = ref.apply(params, x)
        zs = ResBlock3dLeakGN(features, zslab=D)
        got = from_zslab(zs.apply(params, to_zslab(x)), D)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def _zdense_tiny():
    return dataclasses.replace(
        TINY,
        appearance=dataclasses.replace(TINY.appearance, conv3d_impl="zdense"),
        swap=dataclasses.replace(TINY.swap, conv3d_impl="zdense"),
    )


class TestZdenseModules:
    def test_appearance_parity(self):
        img = jax.random.uniform(jax.random.PRNGKey(3),
                                 (2, TINY.input_size, TINY.input_size, 3))
        ref = AppearanceFeatureExtractor(TINY.appearance)
        params = ref.init(jax.random.PRNGKey(4), img)
        want = ref.apply(params, img)
        zd = AppearanceFeatureExtractor(_zdense_tiny().appearance)
        got = zd.apply(params, img)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_swap_refine_parity_with_handoff(self):
        cfg, zcfg = TINY, _zdense_tiny()
        d, c = cfg.appearance.reshape_depth, cfg.appearance.reshape_channel
        vol = jax.random.normal(jax.random.PRNGKey(5), (2, d, 16, 16, c))
        lat = jax.random.normal(jax.random.PRNGKey(6),
                                (2, cfg.swap.latent_dim))
        swap_ref = SwapModule(cfg.swap)
        sp = swap_ref.init(jax.random.PRNGKey(7), vol, lat)
        refine_ref = RefineModule()
        rp = refine_ref.init(jax.random.PRNGKey(8), vol)
        want = refine_ref.apply(
            rp, swap_ref.apply(sp, vol, lat, packed_out=True),
            packed_in=True)

        swap_zd = SwapModule(zcfg.swap)
        refine_zd = RefineModule(conv3d_impl="zdense", slab_channels=c)
        got = refine_zd.apply(
            rp, swap_zd.apply(sp, vol, lat, packed_out=True),
            packed_in=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_refine_volume_io_parity(self):
        cfg = TINY
        d, c = cfg.appearance.reshape_depth, cfg.appearance.reshape_channel
        vol = jax.random.normal(jax.random.PRNGKey(9), (2, d, 16, 16, c))
        ref = RefineModule()
        rp = ref.init(jax.random.PRNGKey(10), vol)
        want = ref.apply(rp, vol)
        got = RefineModule(conv3d_impl="zdense", slab_channels=c).apply(
            rp, vol)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
