"""conv2d_cout1_shiftsum == the plain SAME conv it replaces (the
dense-motion occlusion head's 7x7 -> 1 conv, reference
src/modules/dense_motion.py:24,99)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from canonswap_tpu.ops.conv2d import conv2d_cout1_shiftsum


@pytest.mark.parametrize("kh,kw", [(7, 7), (3, 3), (1, 1), (5, 3)])
def test_shiftsum_matches_direct(kh, kw):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 16, 12, 24), jnp.float32)
    k = jax.random.normal(jax.random.PRNGKey(1), (kh, kw, 24, 1)) * 0.1
    b = jnp.array([0.3], jnp.float32)
    want = lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b
    got = conv2d_cout1_shiftsum(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_shiftsum_rejects_multi_channel():
    x = jnp.zeros((1, 8, 8, 4))
    k = jnp.zeros((3, 3, 4, 2))
    with pytest.raises(ValueError):
        conv2d_cout1_shiftsum(x, k)
