"""Pallas kernels under a multi-device mesh.

pallas_call has no automatic SPMD rule; the custom-partitioned wrappers
(batch-axis sharding, everything else replicated) must produce exactly the
single-device result on the virtual 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _mesh():
    return Mesh(np.array(jax.devices()).reshape(-1), ("data",))


def test_warp_onehot_sharded_matches_single_device():
    from canonswap_tpu.ops.pallas.warp import (
        grid_sample_3d_onehot, grid_sample_3d_onehot_sharded)

    b, d, h, w, c = 8, 4, 16, 16, 64
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    vol = jax.random.normal(k1, (b, d, h, w, c), jnp.float32)
    grid = jnp.tanh(jax.random.normal(k2, (b, d, h, w, 3), jnp.float32))
    ref = grid_sample_3d_onehot(vol, grid, interpret=True)

    sh = NamedSharding(_mesh(), P("data"))
    f = jax.jit(
        lambda v, g: grid_sample_3d_onehot_sharded(v, g, interpret=True),
        in_shardings=(sh, sh), out_shardings=sh)
    out = f(vol, grid)
    assert out.sharding.spec == P("data")
    assert float(jnp.max(jnp.abs(out - ref))) == 0.0

    # single-device jit keeps working through the same wrapper
    out1 = jax.jit(
        lambda v, g: grid_sample_3d_onehot_sharded(v, g, interpret=True)
    )(vol, grid)
    assert float(jnp.max(jnp.abs(out1 - ref))) == 0.0


def test_adaptive_chain_sharded_matches_single_device():
    from canonswap_tpu.ops.pallas.chain import (
        adaptive_chain, adaptive_chain_params)

    n, h, w, c, nb = 8, 8, 8, 128, 2
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (n, h, w, c), jnp.bfloat16)
    ks = jax.random.split(k2, nb * 5).reshape(nb, 5, 2)
    blocks = [{
        "weight": jax.random.normal(ks[j, 0], (2, 3, 3, c, c)) * 0.01,
        "bias": 0.05 * jax.random.normal(ks[j, 1], (2, c)),
        "mask_kernel": 0.05 * jax.random.normal(ks[j, 2], (2, 3, 3, c, 1)),
        "mask_bias": 0.05 * jax.random.normal(ks[j, 3], (2, 1)),
    } for j in range(nb)]
    styles = 1.0 + 0.3 * jax.random.normal(k3, (n, nb, 2, c))
    prep = adaptive_chain_params(blocks, styles)

    ref = adaptive_chain(x, prep, interpret=True)
    mesh = _mesh()
    xsh = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def put(tree, batched_axes):
        return tuple(
            jax.device_put(a, xsh if isb else rep)
            for a, isb in zip(tree, batched_axes))

    prep_s = put(prep, (True, True, False, False, False))
    out = jax.jit(
        lambda xx, pp: adaptive_chain(xx, pp, interpret=True),
        out_shardings=xsh)(jax.device_put(x, xsh), prep_s)
    assert float(jnp.max(jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32)))) == 0.0


def test_qconv_pallas_sharded_matches_single_device():
    from canonswap_tpu.ops.pallas.qconv import qconv2d_pallas

    n, h, w, cin, cout = 8, 16, 16, 128, 128
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (n, h, w, cin), jnp.bfloat16)
    kern = 0.05 * jax.random.normal(k2, (3, 3, cin, cout), jnp.bfloat16)
    ref = qconv2d_pallas(x, kern, interpret=True)

    xsh = NamedSharding(_mesh(), P("data"))
    out = jax.jit(
        lambda xx, kk: qconv2d_pallas(xx, kk, interpret=True),
        out_shardings=xsh)(jax.device_put(x, xsh), kern)
    assert float(jnp.max(jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32)))) == 0.0


def test_res3d_bn_chain_sharded_matches_single_device():
    from canonswap_tpu.ops.pallas.chain3d import (
        res3d_bn_chain, res3d_bn_chain_params)

    n, d, hh, wh, c_orig, nb = 8, 2, 8, 8, 8, 1
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    xp = jax.random.normal(k1, (n, d, hh, wh, 4 * c_orig), jnp.bfloat16)
    ks = jax.random.split(k2, 6).reshape(6, 2)
    blocks = [{
        "bn_scale": 1.0 + 0.1 * jax.random.normal(ks[0], (2, c_orig)),
        "bn_bias": 0.1 * jax.random.normal(ks[1], (2, c_orig)),
        "bn_mean": 0.1 * jax.random.normal(ks[2], (2, c_orig)),
        "bn_var": jnp.abs(1.0 + 0.2 * jax.random.normal(ks[3], (2, c_orig))),
        "kernel": 0.05 * jax.random.normal(
            ks[4], (2, 3, 3, 3, c_orig, c_orig)),
        "bias": 0.05 * jax.random.normal(ks[5], (2, c_orig)),
    }]
    prep = res3d_bn_chain_params(blocks)
    ref = res3d_bn_chain(xp, prep, interpret=True)

    mesh = _mesh()
    xsh = NamedSharding(mesh, P("data"))
    out = jax.jit(
        lambda xx, pp: res3d_bn_chain(xx, pp, interpret=True),
        out_shardings=xsh)(jax.device_put(xp, xsh), prep)
    assert float(jnp.max(jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32)))) == 0.0
