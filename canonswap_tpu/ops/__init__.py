"""Low-level numeric ops (jnp reference implementations + Pallas kernels)."""

from canonswap_tpu.ops.grid_sample import (
    grid_sample_2d,
    grid_sample_3d,
    grid_sample_2d_ref,
    grid_sample_3d_ref,
)
from canonswap_tpu.ops.heatmap import kp2gaussian, make_coordinate_grid_3d
from canonswap_tpu.ops.modulated_conv import adaptive_blend_conv, modulated_conv
from canonswap_tpu.ops.pose import (
    headpose_to_degree,
    interpolate_rotations,
    rotation_matrix,
    transform_keypoint,
)
from canonswap_tpu.ops.resize import (
    adaptive_avg_pool,
    avg_pool,
    bilinear_resize,
    max_pool,
    nearest_resize,
    nearest_upsample,
    pixel_shuffle,
    volume_from_2d,
    volume_to_2d,
)

__all__ = [
    "grid_sample_2d",
    "grid_sample_3d",
    "grid_sample_2d_ref",
    "grid_sample_3d_ref",
    "kp2gaussian",
    "make_coordinate_grid_3d",
    "adaptive_blend_conv",
    "modulated_conv",
    "headpose_to_degree",
    "interpolate_rotations",
    "rotation_matrix",
    "transform_keypoint",
    "adaptive_avg_pool",
    "avg_pool",
    "bilinear_resize",
    "max_pool",
    "nearest_resize",
    "nearest_upsample",
    "pixel_shuffle",
    "volume_from_2d",
    "volume_to_2d",
]
