"""Multi-scale deformable attention: jnp reference vs torch re-derivation,
and Pallas kernel vs jnp reference (interpret mode on CPU).

Mirrors the reference's kernel-vs-reference harness
(XPose ops/test.py:31-62): same tolerances (float: rtol 1e-2 / atol 1e-3 in
the original; we hold tighter)."""

import numpy as np
import torch
import torch.nn.functional as tF

import jax.numpy as jnp

from canonswap_tpu.ops.ms_deform_attn import ms_deform_attn_ref
from canonswap_tpu.ops.pallas.ms_deform_attn import ms_deform_attn_pallas

RNG = np.random.default_rng(11)

N, M, D = 2, 2, 8
SHAPES = ((6, 4), (3, 2))
LQ, P = 5, 4


def make_inputs():
    lin = sum(h * w for h, w in SHAPES)
    value = RNG.normal(size=(N, lin, M, D)).astype(np.float32)
    loc = RNG.uniform(0.01, 0.99, (N, LQ, M, len(SHAPES), P, 2)).astype(
        np.float32
    )
    w = RNG.uniform(0, 1, (N, LQ, M, len(SHAPES), P)).astype(np.float32)
    w = w / w.sum(axis=(3, 4), keepdims=True)
    return value, loc, w


def torch_core(value, shapes, loc, weights):
    """Independent torch re-derivation of ms_deform_attn_core_pytorch
    (ops/functions/ms_deform_attn_func.py:41-71)."""
    value = torch.from_numpy(value)
    loc = torch.from_numpy(loc)
    weights = torch.from_numpy(weights)
    n, _, m, d = value.shape
    _, lq, _, L, p, _ = loc.shape
    sizes = [h * w for h, w in shapes]
    value_list = value.split(sizes, dim=1)
    sampling_grids = 2 * loc - 1
    out = []
    for lid, (h, w) in enumerate(shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(n * m, d, h, w)
        g = sampling_grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled = tF.grid_sample(
            v, g, mode="bilinear", padding_mode="zeros", align_corners=False
        )
        out.append(sampled)  # (N*M, D, Lq, P)
    att = weights.transpose(1, 2).reshape(n * m, 1, lq, L * p)
    res = (torch.stack(out, dim=-2).flatten(-2) * att).sum(-1)
    return res.view(n, m * d, lq).transpose(1, 2).contiguous().numpy()


def test_jnp_ref_matches_torch():
    value, loc, w = make_inputs()
    want = torch_core(value, SHAPES, loc, w)
    got = np.asarray(
        ms_deform_attn_ref(jnp.asarray(value), SHAPES, jnp.asarray(loc),
                           jnp.asarray(w))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pallas_matches_jnp_ref():
    value, loc, w = make_inputs()
    want = np.asarray(
        ms_deform_attn_ref(jnp.asarray(value), SHAPES, jnp.asarray(loc),
                           jnp.asarray(w))
    )
    got = np.asarray(
        ms_deform_attn_pallas(
            jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w),
            block_q=4, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
