"""Parity: Pallas fused W8A8 conv vs the XLA w8a8 reference scheme.

Runs in Pallas interpret mode on CPU (same numerics contract as
tests/test_ms_deform_attn.py)."""

import jax
import jax.numpy as jnp
import pytest

from canonswap_tpu.ops.pallas.qconv import qconv2d_pallas
from canonswap_tpu.ops.qconv import conv2d_w8a8


def _rel(a, b):
    return float(jnp.linalg.norm(a - b) / (jnp.linalg.norm(a) + 1e-9))


@pytest.mark.parametrize("kshape", [(3, 3), (1, 1)])
def test_qconv_pallas_matches_xla_w8a8(kshape):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (2, 16, 16, 256), jnp.float32)
    w = jax.random.normal(k2, (*kshape, 256, 128), jnp.float32) * 0.05
    b = jax.random.normal(k3, (128,))
    ref = conv2d_w8a8(x, w, b)
    out = qconv2d_pallas(x, w, b, interpret=True)
    assert out.shape == ref.shape
    assert _rel(ref, out) < 1e-6


def test_qconv_pallas_no_bias_uneven_chunk():
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    # H=12 not divisible by the default chunk 16 -> falls back to chunk 12
    x = jax.random.normal(k1, (1, 12, 16, 128), jnp.float32)
    w = jax.random.normal(k2, (3, 3, 128, 128), jnp.float32) * 0.05
    ref = conv2d_w8a8(x, w)
    out = qconv2d_pallas(x, w, interpret=True)
    assert _rel(ref, out) < 1e-6
