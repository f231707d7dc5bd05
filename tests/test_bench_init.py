"""Regression tests for the BENCH_r03 rc=1 crash.

Root cause: bench.py selected a Pallas warp config (default backend = TPU)
and then pinned ``init_params`` to CPU via ``jax.default_device(cpu)`` —
flax init *executes* the forward, and ``pallas_call`` cannot lower on the
CPU backend ("Only interpret mode is supported on CPU backend").

The fix is ``CanonSwapCore.init_params_host``: init via a param-tree-
identical Pallas-free twin config (runtime/core.py::pallas_free_twin).
These tests run the *exact* driver combination — every Pallas lever on in
the config, init pinned to a device where Pallas cannot lower — and assert
the resulting tree is byte-identical to a plain packed init.
"""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from canonswap_tpu.configs.model_config import TINY
from canonswap_tpu.runtime import core as C


def _all_levers_cfg():
    """TINY with every Pallas-lowering lever enabled, as the bench/session
    config builders can produce on TPU (warp pallas_quant + int8)."""
    return dataclasses.replace(
        TINY,
        appearance=dataclasses.replace(TINY.appearance, int8_conv=True),
        warping=dataclasses.replace(
            TINY.warping, warp_impl="pallas_quant",
            dense_motion=dataclasses.replace(
                TINY.warping.dense_motion, int8_conv=True)),
        spade=dataclasses.replace(TINY.spade, int8_conv=True),
        swap=dataclasses.replace(TINY.swap, int8_conv=True),
    )


def test_init_params_host_with_pallas_warp_on_cpu():
    """The exact BENCH_r03 combination: Pallas warp config, init pinned to
    a CPU device.  Plain ``init_params`` raised; ``init_params_host`` must
    succeed and produce the identical tree."""
    cfg = dataclasses.replace(
        TINY,
        warping=dataclasses.replace(TINY.warping, warp_impl="pallas"))
    core = C.CanonSwapCore(cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = core.init_params_host(jax.random.PRNGKey(0))
    ref = C.CanonSwapCore(TINY).init_params(jax.random.PRNGKey(0))
    assert jax.tree.structure(params) == jax.tree.structure(ref)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref)):
        assert a.shape == b.shape and a.dtype == b.dtype
        assert jnp.array_equal(a, b), "twin init diverged from packed init"


def test_pallas_free_twin_strips_every_lever():
    cfg = _all_levers_cfg()
    twin = C.pallas_free_twin(cfg)
    assert twin.warping.warp_impl == "packed"
    assert not twin.appearance.int8_conv
    assert not twin.warping.dense_motion.int8_conv
    assert not twin.spade.int8_conv
    assert not twin.swap.int8_conv
    # non-lever fields untouched
    assert twin.input_size == cfg.input_size
    assert twin.motion == cfg.motion


def test_init_params_host_all_levers_matches_plain_tree():
    core = C.CanonSwapCore(_all_levers_cfg())
    with jax.default_device(jax.devices("cpu")[0]):
        params = core.init_params_host(jax.random.PRNGKey(3))
    ref = C.CanonSwapCore(TINY).init_params(jax.random.PRNGKey(3))
    assert jax.tree.structure(params) == jax.tree.structure(ref)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(ref)):
        assert jnp.array_equal(a, b)


def test_bench_config_builders_import_and_init():
    """bench.py's module-level config recipe, exercised at TINY scale with
    the on-TPU branch forced — guards the driver's init path end to end."""
    import bench  # noqa: F401  (import side effects: jax config only)

    exact_cfg = dataclasses.replace(
        TINY,
        warping=dataclasses.replace(TINY.warping, warp_impl="pallas"))
    fast_cfg = dataclasses.replace(
        TINY,
        warping=dataclasses.replace(
            TINY.warping, dense_motion_scale=2, warp_impl="pallas_quant"),
        appearance=dataclasses.replace(TINY.appearance, int8_conv=True),
        swap=dataclasses.replace(TINY.swap, int8_conv=True),
        spade=dataclasses.replace(TINY.spade, int8_conv=True),
    )
    core = C.CanonSwapCore(exact_cfg)
    with jax.default_device(jax.devices("cpu")[0]):
        params = core.init_params_host(jax.random.PRNGKey(0))
    # the fast core must be able to consume the exact core's tree
    fast = C.CanonSwapCore(C.pallas_free_twin(fast_cfg))
    ref = fast.init_params(jax.random.PRNGKey(0))
    assert jax.tree.structure(params) == jax.tree.structure(ref)


def test_dense_motion_rejects_too_small_field():
    """dense_motion_scale must fail fast (clear ValueError) when the scaled
    field is too small for the hourglass — not crash with a 0-dim concat
    deep inside the decoder (the r4 bench quarter-res probe regression)."""
    import jax.numpy as jnp

    from canonswap_tpu.models.dense_motion import DenseMotionNetwork

    m = DenseMotionNetwork(num_kp=21, field_scale=4)  # 64/4=16 < 2^5
    feat = jax.ShapeDtypeStruct((1, 16, 64, 64, 32), jnp.float32)
    kp = jax.ShapeDtypeStruct((1, 21, 3), jnp.float32)
    with pytest.raises(ValueError, match="field_scale"):
        jax.eval_shape(m.init, jax.random.PRNGKey(0), feat, kp, kp)
    # scale 2 (the sanctioned fast-bundle lever) still passes
    m2 = DenseMotionNetwork(num_kp=21, field_scale=2)
    jax.eval_shape(m2.init, jax.random.PRNGKey(0), feat, kp, kp)


def test_init_params_host_disk_cache_roundtrip(tmp_path, monkeypatch):
    """init_params_host memoises to disk (the ~15-min CANONICAL init is the
    dominant startup cost of bench.py and every tool); the cached tree must
    be value-identical and config-keyed (different cfg -> different entry)."""
    import numpy as np

    monkeypatch.setenv("CANONSWAP_INIT_CACHE", str(tmp_path))
    core = C.CanonSwapCore(TINY)
    p1 = core.init_params_host(jax.random.PRNGKey(0))
    assert len(list(tmp_path.glob("params_*.npz"))) == 1
    p2 = core.init_params_host(jax.random.PRNGKey(0))
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), p1, p2)
    # a param-shaping config change misses the cache instead of aliasing
    other = dataclasses.replace(
        TINY, swap=dataclasses.replace(TINY.swap, latent_dim=8))
    C.CanonSwapCore(other).init_params_host(jax.random.PRNGKey(0))
    assert len(list(tmp_path.glob("params_*.npz"))) == 2
