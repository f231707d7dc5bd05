"""canonswap_tpu — a TPU-native (JAX/XLA/Pallas) video face-swap framework.

A from-scratch re-design of the capabilities of Pixel-Talk/CanonSwap
(arXiv 2507.02691) for TPU hardware:

- ``ops``       low-level numerics: 3D/2D grid sampling, modulated convolution,
                keypoint gaussians, head-pose math, resizing.  Each hot op has a
                pure-jnp reference implementation and (where profitable) a Pallas
                TPU kernel behind the same signature.
- ``nn``        flax.linen building blocks (conv blocks, hourglass, SPADE, ConvNeXtV2).
- ``models``    the model zoo: appearance encoder F, motion extractor M, dense
                motion + warping W, SPADE decoder G, canonical-space swap module,
                3D refine module, ArcFace ID encoder, plus perception sidecars
                (SCRFD detector, landmark nets, face parsing) re-implemented in JAX.
- ``parallel``  device mesh / sharding layer (dp over the frame axis, optional tp).
- ``runtime``   weight conversion (torch -> jax), the jitted swapper core,
                frame batching, host<->device transfer.
- ``pipelines`` end-to-end orchestration mirroring the reference's two entry
                points (video swap and video-drives-image).
- ``cli``       command-line entry points.

Layout convention: channels-last everywhere (NHWC for images, NDHWC for feature
volumes) — the layout XLA:TPU prefers.  The canonical feature volume is
(B, D=16, H=64, W=64, C=32).
"""

__version__ = "0.1.0"
