"""Training step + mesh/sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from canonswap_tpu.configs.model_config import TINY
from canonswap_tpu.parallel import mesh as M
from canonswap_tpu.runtime import checkpoint as CK
from canonswap_tpu.runtime import core as C
from canonswap_tpu.runtime import train as T


@pytest.fixture(scope="module")
def core():
    return C.CanonSwapCore(TINY)


def test_mesh_and_param_sharding():
    mesh = M.make_mesh(data=4, model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    params = {"big": jnp.zeros((3, 3, 64, 512)), "small": jnp.zeros((7,))}
    sh = M.param_sharding(params, mesh, min_channels=256)
    assert sh["big"].spec == jax.sharding.PartitionSpec(None, None, None, "model")
    assert sh["small"].spec == jax.sharding.PartitionSpec()


def test_train_step_decreases_loss(core):
    """Self-reconstruction training must reduce its own loss over a few
    steps on a fixed batch (all six networks receive gradients)."""
    tx = T.make_optimizer(lr=1e-3)
    params = core.init_params(jax.random.PRNGKey(0))
    state = T.TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    frames = jax.random.uniform(jax.random.PRNGKey(1), (2, TINY.input_size, TINY.input_size, 3))
    sid = jax.random.normal(jax.random.PRNGKey(2), (2, TINY.swap.latent_dim))

    step = jax.jit(lambda s, f, i: T.train_step(core, tx, s, f, i))
    losses = []
    for _ in range(3):
        state, metrics = step(state, frames, sid)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 3


def test_sharded_train_step_runs_on_mesh(core):
    mesh = M.make_mesh(data=4, model=2)
    tx = T.make_optimizer()
    state = T.init_sharded_state(core, tx, mesh, jax.random.PRNGKey(0))
    b = mesh.shape["data"] * 2
    frames = M.shard_batch(
        jnp.full((b, TINY.input_size, TINY.input_size, 3), 0.5), mesh
    )
    sid = M.shard_batch(jnp.ones((b, TINY.swap.latent_dim)), mesh)
    step = T.make_sharded_train_step(core, tx)
    state, metrics = step(state, frames, sid)
    assert np.isfinite(float(metrics["loss"]))


def test_checkpoint_roundtrip(core, tmp_path):
    params = core.init_params(jax.random.PRNGKey(0))
    path = str(tmp_path / "ckpt.npz")
    CK.save_npz(path, params)
    loaded = CK.load_npz(path)
    assert CK.tree_equal(params, loaded)
