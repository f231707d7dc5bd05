"""Model hyper-parameters — the equivalent of the reference's
src/config/models.yaml:1-43, as typed dataclasses.

A reduced "tiny" preset is provided for fast CPU tests (same topology,
smaller widths); the "canonical" preset matches the shipped checkpoint.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class AppearanceConfig:
    image_channel: int = 3
    block_expansion: int = 64
    num_down_blocks: int = 2
    max_features: int = 512
    reshape_channel: int = 32
    reshape_depth: int = 16
    num_resblocks: int = 6
    int8_conv: bool = False  # W8A8 packed volume chain (flag_int8)
    # 3D resblock chain layout (implementation-only, identical param tree):
    # "packed" = pack_hw2 space-to-depth; "zdense" = d-major z-slab with
    # block-banded dense 2D convs (conv3d.conv3d_zdense — exact numerics)
    conv3d_impl: str = "packed"


@dataclasses.dataclass(frozen=True)
class MotionConfig:
    num_kp: int = 21
    num_bins: int = 66
    depths: tuple[int, ...] = (3, 3, 9, 3)
    dims: tuple[int, ...] = (96, 192, 384, 768)


@dataclasses.dataclass(frozen=True)
class DenseMotionConfig:
    block_expansion: int = 32
    max_features: int = 1024
    num_blocks: int = 5
    reshape_depth: int = 16
    compress: int = 4
    int8_conv: bool = False  # W8A8 hourglass convs (flag_int8 lever)


@dataclasses.dataclass(frozen=True)
class WarpingConfig:
    num_kp: int = 21
    block_expansion: int = 64
    max_features: int = 512
    num_down_blocks: int = 2
    reshape_channel: int = 32
    estimate_occlusion_map: bool = True
    # >1 estimates the dense deformation field at 1/N in-plane resolution and
    # bilinearly upsamples it (exact reference semantics at 1; ~4x cheaper
    # dense-motion stage at 2 — see models/dense_motion.py::field_scale)
    dense_motion_scale: int = 1
    # trilinear warp backend: "packed" (XLA corner-packed gather, any
    # backend), "pallas" (one-hot MXU matmul kernel, TPU only — measured
    # 31.7 vs 38.7 ms/site at CANONICAL B=16), "pallas_quant" (int8 MXU,
    # 25.7 ms/site, W8A8-quantized sampling — the fast-bundle lever)
    warp_impl: str = "packed"
    dense_motion: DenseMotionConfig = dataclasses.field(
        default_factory=DenseMotionConfig
    )


@dataclasses.dataclass(frozen=True)
class SpadeConfig:
    upscale: int = 2  # 256x256 -> 512x512 pixel-shuffle head
    block_expansion: int = 64
    max_features: int = 512
    num_down_blocks: int = 2
    out_channels: int = 64
    # live power-iteration spectral norm on the SPADE convs (training from
    # scratch); converted inference checkpoints have it baked in instead.
    spectral_norm: bool = False
    # W8A8 int8 convs where MXU-bound (<=128^2 spatial; ops/qconv.py) —
    # the flag_int8 speed/quality lever, off by default (exact bf16)
    int8_conv: bool = False
    # >1 computes the up-blocks' gamma/beta modulation fields at 1/N of the
    # output resolution and bilinearly upsamples (nn/blocks.py::SPADE;
    # the modulations only carry segmap-resolution content). Exact at 1.
    norm_scale: int = 1
    # NOTE: fused VMEM chain kernels and an exact phase-folded up_1 form
    # were built and measured in rounds 3-4 (tools/profile_r4.jsonl):
    # both REGRESSED vs the per-block int8 path at CANONICAL shapes
    # (chain 90.7 vs 76.7 ms; phase-fold 111.9 vs 91.5) and were removed.


@dataclasses.dataclass(frozen=True)
class SwapConfig:
    latent_dim: int = 512
    n_blocks: int = 7  # adaptive 2D blocks (transfer_model2)
    n_resblocks_3d: int = 6
    int8_conv: bool = False  # W8A8 adaptive convs (see SpadeConfig.int8_conv)
    # layout of the swap AND refine 3D resblock chains (they share a volume;
    # see AppearanceConfig.conv3d_impl for the values)
    conv3d_impl: str = "packed"


@dataclasses.dataclass(frozen=True)
class StitchingConfig:
    # (input_size, hidden_sizes, output_size) per sub-net, models.yaml:31-43
    stitching: tuple = (126, (128, 128, 64), 65)
    lip: tuple = (65, (128, 128, 64), 63)
    eye: tuple = (66, (256, 256, 128, 128, 64), 63)


@dataclasses.dataclass(frozen=True)
class CanonSwapModelConfig:
    appearance: AppearanceConfig = dataclasses.field(default_factory=AppearanceConfig)
    motion: MotionConfig = dataclasses.field(default_factory=MotionConfig)
    warping: WarpingConfig = dataclasses.field(default_factory=WarpingConfig)
    spade: SpadeConfig = dataclasses.field(default_factory=SpadeConfig)
    swap: SwapConfig = dataclasses.field(default_factory=SwapConfig)
    stitching: StitchingConfig = dataclasses.field(default_factory=StitchingConfig)
    input_size: int = 256  # model input crop
    output_size: int = 512


CANONICAL = CanonSwapModelConfig()

# Small preset: same topology & depth counts, narrow widths, 64x64 inputs.
# GroupNorm(32) in the refine module requires channel counts >= 32, so the
# volume keeps C=32 but a shallower depth.
TINY = CanonSwapModelConfig(
    appearance=AppearanceConfig(
        block_expansion=16, max_features=64, reshape_channel=8,
        reshape_depth=8, num_resblocks=1,
    ),
    motion=MotionConfig(num_kp=5, depths=(1, 1, 2, 1), dims=(16, 24, 32, 48)),
    warping=WarpingConfig(
        num_kp=5, block_expansion=16, max_features=64, reshape_channel=8,
        dense_motion=DenseMotionConfig(
            block_expansion=8, max_features=64, num_blocks=2, reshape_depth=8,
            compress=2,
        ),
    ),
    spade=SpadeConfig(upscale=2, block_expansion=16, max_features=64, out_channels=16),
    swap=SwapConfig(latent_dim=32, n_blocks=2, n_resblocks_3d=1),
    input_size=64,
    output_size=128,
)
