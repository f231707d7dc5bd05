"""FaceSwapSession: builds every component of the swap stack once.

Equivalent of the reference CanSwapPipeline.__init__
(can_swap_pipeline_e2e.py:39-57): generator core + cropper (detector &
landmark runners) + face parsing + ID cropper + ArcFace, with jitted batched
entry points and a checkpoint-conversion path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from canonswap_tpu.configs.model_config import CANONICAL, CanonSwapModelConfig
from canonswap_tpu.configs.pipeline_config import CropConfig, InferenceConfig
from canonswap_tpu.models import parsing as P
from canonswap_tpu.models.arcface import ArcFaceResNet
from canonswap_tpu.models.landmark import Landmark106Runner, Landmark203Runner
from canonswap_tpu.ops import affine as AF
from canonswap_tpu.runtime import core as C
from canonswap_tpu.runtime.cropper import Cropper
from canonswap_tpu.runtime.face_analysis import FaceAnalysis, FaceIDCropper

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class FaceSwapSession:
    def __init__(
        self,
        inference_cfg: InferenceConfig | None = None,
        crop_cfg: CropConfig | None = None,
        model_cfg: CanonSwapModelConfig = CANONICAL,
        rng: jax.Array | None = None,
        det_size: tuple[int, int] = (512, 512),
        arcface_layers: tuple[int, int, int, int] = (3, 4, 23, 3),
        parsing_cfg: P.SegformerConfig | None = None,
        landmark_widths: tuple[int, ...] | None = None,
        landmark_trunk: str = "mobile",
        fast_init: bool = False,
        mesh=None,
    ):
        """``fast_init`` skips random weight initialization (zeros via
        eval_shape) — for benchmark/demo runs where a checkpoint will be
        loaded or weights don't matter; saves minutes of single-core CPU.

        ``mesh``: optional ``jax.sharding.Mesh`` (parallel.mesh.make_mesh).
        When given, INFERENCE runs multi-chip: generator/sidecar params are
        placed per ``param_sharding`` (tp over 'model' when >1, else
        replicated) and every frame batch is sharded over the 'data' axis —
        XLA inserts the collectives.  This replaces the reference's
        single-device select (can_swap_e2e.py:49-58) with real scale-out.
        Frame batches must be divisible by the data-axis size."""
        self.mesh = mesh
        self.inference_cfg = inference_cfg or InferenceConfig()
        self.crop_cfg = crop_cfg or CropConfig()
        if getattr(self.inference_cfg, "flag_relative_motion", False):
            raise ValueError(
                "flag_relative_motion is not supported by the e2e swap path "
                "(the reference never consumes it either — it swaps per-frame "
                "absolute motion; see SURVEY.md §2a)")
        dm_scale = int(getattr(self.inference_cfg, "dense_motion_scale", 1))
        if dm_scale > 1:
            import dataclasses as _dc

            model_cfg = _dc.replace(
                model_cfg,
                warping=_dc.replace(model_cfg.warping,
                                    dense_motion_scale=dm_scale),
            )
        if getattr(self.inference_cfg, "flag_int8", False):
            import dataclasses as _dc

            model_cfg = _dc.replace(
                model_cfg,
                appearance=_dc.replace(model_cfg.appearance, int8_conv=True),
                swap=_dc.replace(model_cfg.swap, int8_conv=True),
                spade=_dc.replace(model_cfg.spade, int8_conv=True),
            )
        sns = int(getattr(self.inference_cfg, "spade_norm_scale", 1))
        if sns > 1:
            import dataclasses as _dc

            model_cfg = _dc.replace(
                model_cfg,
                spade=_dc.replace(model_cfg.spade, norm_scale=sns),
            )
        # Pallas kernels partition over the batch axis under a mesh via
        # the custom_partitioning wrappers (ops/pallas/spmd.py), so the
        # Pallas warp composes with multi-chip.
        # warp backend: "auto" = the Pallas one-hot kernel on TPU (int8
        # variant under flag_int8), the XLA packed gather elsewhere.  The
        # kernel partitions over the batch axis under a mesh via
        # custom_partitioning (ops/pallas/warp.py::
        # grid_sample_3d_onehot_sharded), so multi-chip keeps it too.
        warp_impl = str(
            getattr(self.inference_cfg, "warp_impl", "auto") or "auto")
        if warp_impl == "auto":
            if jax.default_backend() in ("tpu", "axon"):
                warp_impl = (
                    "pallas_quant"
                    if getattr(self.inference_cfg, "flag_int8", False)
                    else "pallas")
            else:
                warp_impl = "packed"
        if warp_impl != model_cfg.warping.warp_impl:
            import dataclasses as _dc

            model_cfg = _dc.replace(
                model_cfg,
                warping=_dc.replace(model_cfg.warping, warp_impl=warp_impl),
            )
        self.model_cfg = model_cfg
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        keys = jax.random.split(rng, 8)

        if fast_init:
            def _zeros_like_init(fn):
                def wrapped(*a, **k):
                    shapes = jax.eval_shape(fn, *a, **k)
                    return jax.tree.map(
                        lambda s: jnp.zeros(s.shape, s.dtype), shapes
                    )
                return wrapped
        else:
            _zeros_like_init = lambda fn: fn  # noqa: E731

        # generator core
        self.core = C.CanonSwapCore(model_cfg)
        if fast_init:
            self.params = _zeros_like_init(self.core.init_params)(keys[0])
        else:
            # init_params_host: identical tree, but disk-memoised (the eager
            # random init is ~15 min of host compute at CANONICAL scale) and
            # Pallas-free (safe on any backend)
            self.params = self.core.init_params_host(keys[0])
        if self.inference_cfg.checkpoint:
            self.load_checkpoint(self.inference_cfg.checkpoint)

        # optional stitching / retargeting nets (flag_stitching,
        # flag_eye_retargeting, flag_lip_retargeting).  Random-init unless a
        # converted stitching checkpoint is loaded — same contract as every
        # other net in this repo (no checkpoints ship with the reference).
        self.use_stitching = bool(
            getattr(self.inference_cfg, "flag_stitching", False))
        self.use_eye_retarget = bool(
            getattr(self.inference_cfg, "flag_eye_retargeting", False))
        self.use_lip_retarget = bool(
            getattr(self.inference_cfg, "flag_lip_retargeting", False))
        self.stitching_params = None
        if self.use_stitching or self.use_eye_retarget or self.use_lip_retarget:
            self.stitching_params = _zeros_like_init(
                self.core.init_stitching_params)(keys[6])
            st_ckpt = getattr(
                self.inference_cfg, "stitching_checkpoint", None)
            if st_ckpt:
                self.load_stitching_checkpoint(st_ckpt)
        # half precision: bf16 params/compute on the generator (the TPU-native
        # analogue of the reference's fp16 autocast, can_swap_e2e.py:113-119);
        # keypoint math stays f32 (refine_kp_info) and outputs are cast back
        self.half = bool(self.inference_cfg.flag_use_half_precision)
        if self.half:
            self.params = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x,
                self.params,
            )
        self.compute_dtype = jnp.bfloat16 if self.half else jnp.float32
        if self.mesh is not None:
            from canonswap_tpu.parallel import mesh as M

            if self.inference_cfg.batch_size % self.mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {self.inference_cfg.batch_size} not divisible"
                    f" by data axis {self.mesh.shape['data']}"
                )
            self.params = jax.device_put(
                self.params, M.param_sharding(self.params, self.mesh)
            )

        # perception stack
        det_params = None
        if fast_init:
            from canonswap_tpu.models import scrfd as S

            det_params = _zeros_like_init(S.SCRFD().init)(
                keys[1], jnp.zeros((1, det_size[1], det_size[0], 3))
            )
        self.face_analysis = FaceAnalysis(
            det_params=det_params, det_thresh=self.crop_cfg.det_thresh,
            det_size=det_size, rng=keys[1],
        )
        if fast_init:
            lp203 = _zeros_like_init(
                lambda r: Landmark203Runner(rng=r, widths=landmark_widths, trunk=landmark_trunk).params
            )(keys[2])
            self.landmark203 = Landmark203Runner(params=lp203, widths=landmark_widths, trunk=landmark_trunk)
            lp106 = _zeros_like_init(
                lambda r: Landmark106Runner(rng=r, widths=landmark_widths, trunk=landmark_trunk).params
            )(keys[3])
            self.lmk106 = Landmark106Runner(params=lp106, widths=landmark_widths, trunk=landmark_trunk)
        else:
            self.landmark203 = Landmark203Runner(rng=keys[2], widths=landmark_widths, trunk=landmark_trunk)
            self.lmk106 = Landmark106Runner(rng=keys[3], widths=landmark_widths, trunk=landmark_trunk)
        self.face_analysis.lmk106 = self.lmk106
        self.cropper = Cropper(
            self.crop_cfg, self.face_analysis, self.landmark203,
            network_input_size=model_cfg.input_size,
        )
        self.id_cropper = FaceIDCropper(self.face_analysis)

        # face parsing
        self.parsing = P.Segformer(parsing_cfg or P.SegformerConfig())
        self.parsing_params = _zeros_like_init(self.parsing.init)(
            keys[4], jnp.zeros((1, model_cfg.input_size, model_cfg.input_size, 3))
        )
        self._parse = jax.jit(self.parsing.apply)

        # ArcFace ID encoder
        self.arcface = ArcFaceResNet(layers=arcface_layers)
        self.arcface_params = _zeros_like_init(self.arcface.init)(
            keys[5], jnp.zeros((1, 112, 112, 3))
        )
        self._arcface_apply = jax.jit(self.arcface.apply)
        if self.mesh is not None:
            from canonswap_tpu.parallel import mesh as M

            # sidecars are small: replicate, shard their batches over 'data'
            self.parsing_params = jax.device_put(
                self.parsing_params, M.replicated(self.mesh)
            )
            self.arcface_params = jax.device_put(
                self.arcface_params, M.replicated(self.mesh)
            )

        # jitted batched stages
        self._extract_motion = C.extract_motion_jit
        self._swap_step = C.swap_step_jit
        self._soft_erosion = jax.jit(
            functools.partial(
                AF.soft_erosion, kernel_size=21, threshold=0.9, iterations=3
            )
        )

    # ------------------------------------------------------------------
    # checkpoint
    # ------------------------------------------------------------------

    def load_checkpoint(self, path: str):
        """Convert + load a torch combined_weights.pth (or a pre-converted
        .npz/.msgpack produced by our tools)."""
        from canonswap_tpu.runtime import weights as W

        converted = W.load_torch_checkpoint(path)
        dtype = getattr(self, "compute_dtype", jnp.float32)
        for k, v in converted.items():
            self.params[k] = jax.tree.map(
                lambda x: jnp.asarray(x).astype(dtype)
                if np.issubdtype(np.asarray(x).dtype, np.floating)
                else jnp.asarray(x),
                v,
            )

    def load_stitching_checkpoint(self, path: str):
        """Convert + load the LivePortrait-lineage stitching/retargeting
        checkpoint (retarget_shoulder/mouth/eye, reference helper.py:157-181)
        for flag_stitching / flag_eye_retargeting / flag_lip_retargeting."""
        from canonswap_tpu.runtime import checkpoint as CK
        from canonswap_tpu.runtime import weights as W

        if path.endswith(".npz"):
            self.stitching_params = CK.load_npz(path)
        else:
            import torch

            ckpt = torch.load(path, map_location="cpu", weights_only=True)
            self.stitching_params = W.convert_stitching_checkpoint(ckpt)

    # ------------------------------------------------------------------
    # stages
    # ------------------------------------------------------------------

    def get_source_id(self, source_rgb: np.ndarray) -> jax.Array:
        """Source image -> (1, 512) L2-normalized ID embedding
        (get_source_id, can_swap_pipeline_e2e.py:90-99)."""
        got = self.id_cropper.get_single(source_rgb, crop_size=112, max_num=1)
        if got is None:
            raise RuntimeError("No face detected in the source image.")
        crop = got[0][0].astype(np.float32) / 255.0
        crop = (crop - IMAGENET_MEAN) / IMAGENET_STD
        emb, _ = self._arcface_apply(
            self.arcface_params, jnp.asarray(crop)[None]
        )
        ld = self.model_cfg.swap.latent_dim
        if emb.shape[-1] != ld:  # reduced test configs only
            emb = emb[..., :ld]
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def parse_masks(self, crops256: np.ndarray) -> jax.Array:
        """(B, S, S, 3) uint8 -> (B, 2S, 2S, 1) feathered swap masks at the
        output resolution (parsing loop + SoftErosion,
        can_swap_pipeline_e2e.py:177-191, 275)."""
        out = self.model_cfg.output_size
        x = P.preprocess(jnp.asarray(crops256))
        x = self._place_batch(x)
        logits = self._parse(self.parsing_params, x)
        mask = P.face_mask_from_logits(logits, (out, out))
        soft, _ = self._soft_erosion(mask)
        return soft

    def motion_template(self, frames01: jax.Array) -> dict:
        """Batched motion template over prepared frames (B, S, S, 3) in [0,1]."""
        return self._extract_motion(self.core, self.params, frames01)

    def swap_with_motion(
        self, frames01: jax.Array, source_id: jax.Array,
        with_debug: bool = False, as_uint8: bool = False,
        eye_ratio: jax.Array | None = None,
        lip_ratio: jax.Array | None = None,
    ) -> tuple[dict, dict]:
        """Fused motion + swap (one device dispatch); as_uint8 quantizes the
        images on device (4x less device->host traffic).  ``eye_ratio`` /
        ``lip_ratio`` are the (B,3)/(B,2) combined close-ratios when the
        retargeting flags are on."""
        st = self.stitching_params
        out, motion = C.swap_with_motion_jit(
            self.core, self.params, frames01, source_id,
            stitching_params=st,
            eye_ratio=eye_ratio if (st is not None and self.use_eye_retarget)
            else None,
            lip_ratio=lip_ratio if (st is not None and self.use_lip_retarget)
            else None,
            use_stitching=self.use_stitching and st is not None,
            normalize_lip=bool(
                getattr(self.inference_cfg, "flag_normalize_lip", False)),
            with_debug=with_debug, as_uint8=as_uint8,
        )
        if not as_uint8:
            out = jax.tree.map(lambda x: x.astype(jnp.float32), out)
        return out, motion

    def parse_masks_uint8(self, crops256: np.ndarray) -> np.ndarray:
        """parse_masks with on-device uint8 quantization (0..255) for cheap
        host transfer; host divides by 255 where a float mask is needed."""
        soft = self.parse_masks(crops256)
        q = jnp.clip(soft * 255.0, 0, 255).astype(jnp.uint8)
        return np.asarray(q)

    def swap_batch(
        self, frames01: jax.Array, source_id: jax.Array, motion: dict,
        with_debug: bool = False,
        eye_ratio: jax.Array | None = None,
        lip_ratio: jax.Array | None = None,
    ) -> dict:
        st = self.stitching_params
        if st is not None and (
            self.use_stitching or self.use_eye_retarget or self.use_lip_retarget
        ):
            motion = dict(motion)
            motion["x_t"] = C.adjust_driving_kp_jit(
                self.core, st, jnp.asarray(motion["x_t"]),
                eye_ratio if self.use_eye_retarget else None,
                lip_ratio if self.use_lip_retarget else None,
                use_stitching=self.use_stitching,
                normalize_lip=bool(
                    getattr(self.inference_cfg, "flag_normalize_lip", False)),
            )
        out = self._swap_step(
            self.core, self.params, frames01, source_id, motion,
            with_debug=with_debug,
        )
        out = jax.tree.map(lambda x: x.astype(jnp.float32), out)
        if getattr(self.inference_cfg, "debug_nans", False):
            from canonswap_tpu.utils.sanitize import assert_finite

            assert_finite(out, "swap_batch output")
        return out

    def prepare_frames(self, frames_uint8: np.ndarray) -> jax.Array:
        """uint8 (B, S, S, 3) -> float [0,1] device array (prepare_videos
        equivalent, can_swap_e2e.py:147-163); native fast path when built."""
        try:
            from canonswap_tpu.runtime import native as NAT

            if NAT.available():
                x = jnp.asarray(NAT.frames_to_float01(frames_uint8))
            else:
                x = jnp.asarray(frames_uint8.astype(np.float32) / 255.0)
        except Exception:
            x = jnp.asarray(frames_uint8.astype(np.float32) / 255.0)
        return self._place_batch(x.astype(self.compute_dtype))

    def _place_batch(self, x):
        """Shard a leading-batch array over the mesh data axis (no-op
        single-device)."""
        if self.mesh is None:
            return x
        from canonswap_tpu.parallel import mesh as M

        return M.shard_batch(x, self.mesh)
