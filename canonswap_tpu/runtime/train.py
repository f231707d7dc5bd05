"""Training step for the CanonSwap-TPU stack.

The reference ships inference only (SURVEY.md: no training loop exists), but a
production framework needs one; this module provides a LivePortrait-style
self-reconstruction objective plus an ID-consistency hook, wired for
multi-chip execution: dp over the frame axis, optional tp via
``parallel.mesh.param_sharding``, with XLA inserting the grad all-reduces.

The step trains all six sub-networks jointly:
  recon:   swap_step with the *source's own* ID must reconstruct the frame
  kp prior: keeps predicted keypoints bounded (exp/kp L2)
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from canonswap_tpu.ops.resize import avg_pool
from canonswap_tpu.runtime import core as C


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def make_optimizer(lr: float = 1e-4) -> optax.GradientTransformation:
    return optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))


def loss_fn(core: C.CanonSwapCore, params, frames, source_id):
    """Self-reconstruction loss: swapping a frame with its own identity and
    its own motion must return the frame."""
    motion = C.extract_motion(core, params, frames)
    out = C.swap_step(core, params, frames, source_id, motion)["out"]
    # output is 2x the input resolution (pixel-shuffle head): pool back down
    recon = avg_pool(out, (2, 2))
    l1 = jnp.mean(jnp.abs(recon - frames))
    kp_prior = jnp.mean(motion["exp"] ** 2) + jnp.mean(
        jnp.maximum(jnp.abs(motion["kp"]) - 1.0, 0.0) ** 2
    )
    # range prior on the POSED keypoints the warp actually consumes
    # (x_t = s*(kp@R + exp) + t): scale/translation can push them outside
    # the [-1, 1] sampling grid even when kp itself is bounded — and an
    # out-of-range warp zero-pads, collapsing the reconstruction (the warp's
    # windowed fast path also keys on in-range motion).  Hinge at 0.9.
    x_can = motion["scale"][..., None] * motion["kp"]
    range_prior = (
        jnp.mean(jnp.maximum(jnp.abs(motion["x_t"]) - 0.9, 0.0) ** 2)
        + jnp.mean(jnp.maximum(jnp.abs(x_can) - 0.9, 0.0) ** 2)
    )
    loss = l1 + 0.1 * kp_prior + range_prior
    return loss, {"loss": loss, "l1": l1, "kp_prior": kp_prior,
                  "range_prior": range_prior}


def train_step(
    core: C.CanonSwapCore,
    tx: optax.GradientTransformation,
    state: TrainState,
    frames: jax.Array,
    source_id: jax.Array,
):
    """One SGD step. Pure; jit with core/tx static."""
    grad_fn = jax.value_and_grad(
        lambda p: loss_fn(core, p, frames, source_id), has_aux=True
    )
    (_, metrics), grads = grad_fn(state.params)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics


def init_sharded_state(core, tx, mesh, rng) -> TrainState:
    """Init params + optimizer state placed onto ``mesh``: params (and the
    matching adam moments) per ``param_sharding`` (tp over 'model', else
    replicated).  Sharding then propagates through the jitted step — XLA
    inserts the dp grad all-reduce and any tp collectives."""
    from canonswap_tpu.parallel import mesh as M

    params = core.init_params(rng)
    params = jax.device_put(params, M.param_sharding(params, mesh))
    opt_state = tx.init(params)  # moments inherit the param shardings
    step = jax.device_put(jnp.zeros((), jnp.int32), M.replicated(mesh))
    return TrainState(params, opt_state, step)


def make_sharded_train_step(core, tx):
    """jit the train step (core/tx static, donated state). Input placement
    (from init_sharded_state / shard_batch) drives the partitioning."""
    return jax.jit(
        functools.partial(train_step, core, tx), donate_argnums=(0,)
    )
