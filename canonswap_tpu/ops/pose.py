"""Head-pose math: bin-softmax pose regression and Euler rotation matrices.

Re-implements the reference's ``headpose_pred_to_degree`` and
``get_rotation_matrix`` (src/utils/camera.py:14-73) plus the implicit-keypoint
transform Eqn "s * (kp @ R + exp) + t_xy" (src/can_swap_e2e.py:228-256) as
pure, jittable jnp functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NUM_BINS = 66


def headpose_to_degree(pred: jax.Array) -> jax.Array:
    """(B, 66) pose-bin logits -> (B,) degrees via softmax expectation."""
    idx = jnp.arange(NUM_BINS, dtype=pred.dtype)
    prob = jax.nn.softmax(pred, axis=-1)
    return jnp.sum(prob * idx, axis=-1) * 3.0 - 97.5


def rotation_matrix(pitch: jax.Array, yaw: jax.Array, roll: jax.Array) -> jax.Array:
    """Batched Euler (degrees) -> (B, 3, 3) rotation, matching the reference.

    The reference composes rot_z @ rot_y @ rot_x and returns the transpose
    (src/utils/camera.py:72-73); keypoints are then right-multiplied:
    ``kp @ R``.
    """
    pitch = jnp.reshape(pitch, (-1,)) / 180.0 * jnp.pi
    yaw = jnp.reshape(yaw, (-1,)) / 180.0 * jnp.pi
    roll = jnp.reshape(roll, (-1,)) / 180.0 * jnp.pi

    one = jnp.ones_like(pitch)
    zero = jnp.zeros_like(pitch)
    cx, sx = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    cz, sz = jnp.cos(roll), jnp.sin(roll)

    rot_x = jnp.stack(
        [one, zero, zero, zero, cx, -sx, zero, sx, cx], axis=-1
    ).reshape(-1, 3, 3)
    rot_y = jnp.stack(
        [cy, zero, sy, zero, one, zero, -sy, zero, cy], axis=-1
    ).reshape(-1, 3, 3)
    rot_z = jnp.stack(
        [cz, -sz, zero, sz, cz, zero, zero, zero, one], axis=-1
    ).reshape(-1, 3, 3)

    rot = rot_z @ rot_y @ rot_x
    return jnp.swapaxes(rot, -1, -2)


def transform_keypoint(
    kp: jax.Array,
    pitch: jax.Array,
    yaw: jax.Array,
    roll: jax.Array,
    t: jax.Array,
    exp: jax.Array,
    scale: jax.Array,
) -> jax.Array:
    """Implicit-keypoint transform: ``s * (kp @ R + exp) + t_xy``.

    Args:
      kp: (B, K, 3) canonical keypoints.
      pitch/yaw/roll: (B,) or (B, 1) head pose in degrees.
      t: (B, 3) translation (tz is dropped).
      exp: (B, K, 3) expression deltas.
      scale: (B, 1) scale.

    Returns:
      (B, K, 3) posed keypoints.
    """
    rot = rotation_matrix(pitch, yaw, roll)  # (B, 3, 3)
    out = kp @ rot + exp
    out = out * scale[..., None]
    out = out.at[..., 0:2].add(t[:, None, 0:2])
    return out


def interpolate_rotations(
    pitch: jax.Array, yaw: jax.Array, roll: jax.Array, num_steps: int = 20
) -> jax.Array:
    """Linear pose interpolation toward identity (reference
    ``get_multi_rotation_matrix``, src/utils/camera.py:75-96).

    Returns (num_steps, B, 3, 3)."""
    ts = jnp.linspace(0.0, 1.0, num_steps)

    def step(t):
        return rotation_matrix((1 - t) * pitch, (1 - t) * yaw, (1 - t) * roll)

    return jax.vmap(step)(ts)
