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
