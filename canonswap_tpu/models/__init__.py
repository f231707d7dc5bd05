"""CanonSwap-TPU model zoo."""

from canonswap_tpu.models.appearance import AppearanceFeatureExtractor
from canonswap_tpu.models.arcface import ArcFaceResNet, get_id
from canonswap_tpu.models.dense_motion import DenseMotionNetwork
from canonswap_tpu.models.motion import MotionExtractor, refine_kp_info
from canonswap_tpu.models.refine import RefineModule
from canonswap_tpu.models.spade_decoder import SPADEDecoder
from canonswap_tpu.models.stitching import StitchingRetargetingNetwork
from canonswap_tpu.models.swap import SwapModule
from canonswap_tpu.models.warping import WarpingNetwork

__all__ = [
    "AppearanceFeatureExtractor",
    "ArcFaceResNet",
    "get_id",
    "DenseMotionNetwork",
    "MotionExtractor",
    "refine_kp_info",
    "RefineModule",
    "SPADEDecoder",
    "StitchingRetargetingNetwork",
    "SwapModule",
    "WarpingNetwork",
]
