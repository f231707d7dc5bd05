"""Pipeline configuration dataclasses.

Same three-way split as the reference (SURVEY.md §5 config system):
``ArgumentConfig`` = the CLI surface, ``InferenceConfig`` = runtime flags,
``CropConfig`` = detector/crop geometry (reference src/config/*.py), plus
``partial_fields`` to project CLI args into the other two.
"""

from __future__ import annotations

import dataclasses
from typing import Literal, Optional


@dataclasses.dataclass
class ArgumentConfig:
    """CLI surface (reference argument_config.py:14-55)."""

    source: str = ""  # path to the source portrait (identity donor)
    driving: str = ""  # path to the target video/image (or .pkl template)
    output_dir: str = "results/"

    # inference flags
    flag_use_half_precision: bool = True  # bf16 on TPU
    flag_crop_driving_video: bool = True
    flag_normalize_lip: bool = False
    flag_eye_retargeting: bool = False
    flag_lip_retargeting: bool = False
    flag_stitching: bool = False
    flag_relative_motion: bool = False
    flag_pasteback: bool = True
    flag_do_crop: bool = True
    # Kalman-smooth the motion template along the frame axis before the swap
    # pass (reference src/utils/filter.py:8-19, shipped-but-unwired there;
    # wired here behind this flag).  Forces the two-pass (template-first) path.
    flag_smooth_motion: bool = False
    audio_priority: Literal["source", "driving"] = "driving"

    # source crop args
    det_thresh: float = 0.15
    scale: float = 2.3
    vx_ratio: float = 0.0
    vy_ratio: float = -0.125
    flag_do_rot: bool = True
    source_max_dim: int = 4096
    source_division: int = 2

    # driving crop args
    scale_crop_driving_video: float = 2.2
    vx_ratio_crop_driving_video: float = 0.0
    vy_ratio_crop_driving_video: float = -0.1

    # TPU-specific
    batch_size: int = 8  # frame batch per device step
    checkpoint: Optional[str] = None  # combined_weights.pth (torch) to convert
    stitching_checkpoint: Optional[str] = None
    dense_motion_scale: int = 1  # >1: half-res dense-motion speed mode
    flag_int8: bool = False  # int8 convs in the swap/SPADE hot shapes
    spade_norm_scale: int = 1  # >1: half-res SPADE up-block modulations
    warp_impl: str = "auto"  # auto|packed|pallas|pallas_quant (warp backend)
    # sanitizer: jax_debug_nans + a NaN/inf gate on every swapped batch
    debug_nans: bool = False
    # benchmark/demo mode: zero-init weights via eval_shape (seconds) instead
    # of running the random initializers (~15 min on one host core); use with
    # --checkpoint for real outputs, alone for wall-clock pipeline timing
    fast_init: bool = False


@dataclasses.dataclass
class InferenceConfig:
    """Runtime configuration (reference inference_config.py:19-69)."""

    flag_use_half_precision: bool = True
    flag_crop_driving_video: bool = False
    flag_normalize_lip: bool = True
    flag_eye_retargeting: bool = False
    flag_lip_retargeting: bool = False
    # stitching is OFF by default, matching the reference entry points which
    # force it off (inference_canswap.py:56); when True the session builds the
    # stitching/retargeting nets and applies them to the driving keypoints
    # (runtime/core.py::adjust_driving_kp)
    flag_stitching: bool = False
    flag_relative_motion: bool = False  # unsupported: session raises if True
    flag_pasteback: bool = True
    flag_do_crop: bool = True
    flag_do_rot: bool = True
    flag_smooth_motion: bool = False

    source_max_dim: int = 1280
    source_division: int = 2
    input_shape: tuple[int, int] = (256, 256)
    output_format: Literal["mp4", "gif"] = "mp4"
    crf: int = 15
    output_fps: int = 25

    batch_size: int = 8
    checkpoint: Optional[str] = None
    # stitching/retargeting checkpoint (.pth or converted .npz), used when
    # flag_stitching / flag_*_retargeting are on
    stitching_checkpoint: Optional[str] = None
    # >1 estimates the dense deformation field at 1/N in-plane resolution
    # (exact at 1; ~4x cheaper dense-motion at 2 — the speed/quality knob)
    dense_motion_scale: int = 1
    # W8A8 int8 convs in the swap/SPADE 64^2-128^2 hot shapes (ops/qconv.py)
    flag_int8: bool = False
    # >1: SPADE up-block gamma/beta at 1/N output res (nn/blocks.py::SPADE)
    spade_norm_scale: int = 1
    # trilinear warp backend: auto = Pallas one-hot kernel on TPU
    # (int8 variant under flag_int8), XLA packed gather elsewhere
    warp_impl: str = "auto"
    # sanitizer: jax_debug_nans + a NaN/inf gate on every swapped batch
    debug_nans: bool = False


@dataclasses.dataclass
class CropConfig:
    """Crop geometry (reference crop_config.py:13-33)."""

    det_thresh: float = 0.1
    dsize: int = 512
    scale: float = 2.3
    vx_ratio: float = 0.0
    vy_ratio: float = -0.125
    max_face_num: int = 0
    flag_do_rot: bool = True
    scale_crop_driving_video: float = 2.2
    vx_ratio_crop_driving_video: float = 0.0
    vy_ratio_crop_driving_video: float = -0.1
    direction: str = "large-small"
    # animal-face landmarking via models.xpose (reference crop_config.py:27)
    animal_face_type: str = "animal_face_9"  # or "animal_face_68"


def partial_fields(target_class, kwargs: dict):
    """Project matching fields of a source dict into a config dataclass
    (reference inference_canswap.py:14-15)."""
    names = {f.name for f in dataclasses.fields(target_class)}
    return target_class(**{k: v for k, v in kwargs.items() if k in names})
