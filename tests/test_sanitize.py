"""NaN/inf sanitizer gates (--debug-nans; VERDICT r4 next #8).

Reference analogue: fail-fast asserts at seams (face_analysis.py:45); here
the gate covers the swapped-batch fetch (pipelines/session.py::swap_batch)
and is unit-tested on the helper directly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from canonswap_tpu.utils.sanitize import assert_finite, checksum_finite


def test_assert_finite_passes_clean_tree():
    tree = {"a": jnp.ones((3, 3)), "b": np.arange(4.0),
            "i": np.arange(5)}  # ints are ignored
    assert assert_finite(tree) is tree


def test_assert_finite_raises_with_leaf_path():
    tree = {"img": jnp.array([1.0, jnp.nan]), "ok": jnp.zeros(2)}
    with pytest.raises(FloatingPointError, match=r"img.*1/2"):
        assert_finite(tree, "unit test")
    with pytest.raises(FloatingPointError, match="inf"):
        assert_finite({"x": np.array([np.inf])}, "inf case")


def test_checksum_finite_device_scalar():
    good = checksum_finite({"a": jnp.ones((4,), jnp.bfloat16)})
    assert float(good) == 0.0
    bad = checksum_finite({"a": jnp.array([1.0, jnp.inf])})
    assert np.isnan(float(bad))
    assert float(checksum_finite({"i": jnp.arange(3)})) == 0.0


def test_cli_flag_exists():
    from canonswap_tpu.cli.main import build_parser

    ns = build_parser().parse_args(
        ["swap", "-s", "a.jpg", "-t", "b.mp4", "--debug-nans", "true"])
    assert ns.debug_nans is True
    ns = build_parser().parse_args(["swap", "-s", "a.jpg", "-t", "b.mp4"])
    assert ns.debug_nans is False
