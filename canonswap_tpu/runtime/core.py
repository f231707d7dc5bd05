"""The CanonSwap core runtime: all six generative networks behind jitted,
batched, TPU-shaped entry points.

This is the TPU-native equivalent of the reference's ``can_swapper``
(src/can_swap_e2e.py:39-348) — but where the reference runs six separate
module calls per frame in a Python loop, here the whole per-frame compute
(F -> warp-to-canonical -> identity swap -> refine -> warp-back -> SPADE
decode) is ONE jitted XLA program over a frame *batch*.

Checkpoint param-tree keys mirror the reference checkpoint layout
(can_swap_e2e.py:93-98): appearance_feature_extractor, motion_extractor,
warping_module, spade_generator, transfer, refine.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from canonswap_tpu.configs.model_config import CanonSwapModelConfig, CANONICAL
from canonswap_tpu.models.appearance import AppearanceFeatureExtractor
from canonswap_tpu.models.motion import MotionExtractor, refine_kp_info
from canonswap_tpu.models.refine import RefineModule
from canonswap_tpu.models.spade_decoder import SPADEDecoder
from canonswap_tpu.models.swap import SwapModule
from canonswap_tpu.models.warping import WarpingNetwork
from canonswap_tpu.ops.pose import transform_keypoint

Params = Any


def pallas_free_twin(cfg: CanonSwapModelConfig) -> CanonSwapModelConfig:
    """A param-tree-identical twin of ``cfg`` with every Pallas-lowering
    lever disabled (warp_impl=packed, int8 convs off, fused chains off).

    All of these levers are implementation-only — they never change the
    parameter tree (see the per-field notes in configs/model_config.py) —
    so ``init`` on the twin yields the exact tree of the original config.
    Needed because flax ``init`` *executes* the forward: running it on a
    backend where ``pallas_call`` cannot lower (e.g. under
    ``jax.default_device(cpu)`` while the default backend is TPU) raises
    "Only interpret mode is supported on CPU backend" — the BENCH_r03
    rc=1 regression."""
    return dataclasses.replace(
        cfg,
        appearance=dataclasses.replace(
            cfg.appearance, int8_conv=False, conv3d_impl="packed"),
        warping=dataclasses.replace(
            cfg.warping, warp_impl="packed",
            dense_motion=dataclasses.replace(
                cfg.warping.dense_motion, int8_conv=False)),
        spade=dataclasses.replace(cfg.spade, int8_conv=False),
        swap=dataclasses.replace(
            cfg.swap, int8_conv=False, conv3d_impl="packed"),
    )


@dataclasses.dataclass(frozen=True)
class CanonSwapCore:
    """Bundle of module definitions (hashable; safe as a jit static arg)."""

    cfg: CanonSwapModelConfig = CANONICAL

    @functools.cached_property
    def appearance(self) -> AppearanceFeatureExtractor:
        return AppearanceFeatureExtractor(self.cfg.appearance)

    @functools.cached_property
    def motion(self) -> MotionExtractor:
        return MotionExtractor(self.cfg.motion)

    @functools.cached_property
    def warping(self) -> WarpingNetwork:
        return WarpingNetwork(self.cfg.warping)

    @functools.cached_property
    def spade(self) -> SPADEDecoder:
        return SPADEDecoder(self.cfg.spade)

    @functools.cached_property
    def swap(self) -> SwapModule:
        return SwapModule(self.cfg.swap)

    @functools.cached_property
    def refine(self) -> RefineModule:
        # the refine chain runs on the same volume as the swap 3D chain, so
        # it shares the swap int8 flag and chain layout
        return RefineModule(int8=self.cfg.swap.int8_conv,
                            conv3d_impl=self.cfg.swap.conv3d_impl,
                            slab_channels=self.cfg.appearance.reshape_channel)

    @functools.cached_property
    def stitching(self):
        from canonswap_tpu.models.stitching import StitchingModule

        return StitchingModule(num_kp=self.cfg.motion.num_kp)

    def init_stitching_params(self, rng: jax.Array):
        """Separate init for the optional stitching/retargeting nets (they
        live in their own checkpoint in the LivePortrait lineage)."""
        k = self.cfg.motion.num_kp
        kp = jnp.zeros((1, k, 3))
        return self.stitching.init(rng, kp, kp)

    def init_params(self, rng: jax.Array) -> Params:
        """Random-init the full parameter tree (converted checkpoints replace
        this; keys mirror combined_weights.pth)."""
        s = self.cfg.input_size
        d = self.cfg.appearance.reshape_depth
        c = self.cfg.appearance.reshape_channel
        hw = s // (2**self.cfg.appearance.num_down_blocks)
        k = self.cfg.motion.num_kp
        keys = jax.random.split(rng, 6)
        img = jnp.zeros((1, s, s, 3))
        vol = jnp.zeros((1, d, hw, hw, c))
        kp = jnp.zeros((1, k, 3))
        latent = jnp.zeros((1, self.cfg.swap.latent_dim))
        feat2d = jnp.zeros(
            (1, hw, hw,
             self.cfg.warping.block_expansion * 2**self.cfg.warping.num_down_blocks)
        )
        return {
            "appearance_feature_extractor": self.appearance.init(keys[0], img),
            "motion_extractor": self.motion.init(keys[1], img),
            "warping_module": self.warping.init(keys[2], vol, kp, kp),
            "spade_generator": self.spade.init(keys[3], feat2d),
            "transfer": self.swap.init(keys[4], vol, latent),
            "refine": self.refine.init(keys[5], vol),
        }

    def init_params_host(self, rng: jax.Array) -> Params:
        """``init_params`` via a Pallas-free twin config — safe to run on
        any device/backend (flax init executes the forward, and Pallas
        kernels only lower on TPU).  Returns the identical parameter tree
        with identical values (same rng, same modules-with-params).

        Results are memoised on disk (init is deterministic in (cfg, rng)
        but costs ~15 min of eager CPU at CANONICAL scale on this host —
        the dominant startup cost of every tool and of bench.py).  The
        cache key covers every config field that shapes the param tree;
        implementation-only switches (conv3d_impl, int8/warp backends) are
        param-tree-invariant by design and tested as such, but are keyed
        anyway via the twin-config repr for safety."""
        import hashlib
        import os

        import numpy as np

        twin = pallas_free_twin(self.cfg)
        key = hashlib.sha1(
            f"{twin!r}|{np.asarray(rng).tolist()}".encode()).hexdigest()[:16]
        cache_dir = os.environ.get("CANONSWAP_INIT_CACHE",
                                   "/tmp/canonswap_init_cache")
        path = os.path.join(cache_dir, f"params_{key}.npz")
        struct = jax.eval_shape(CanonSwapCore(twin).init_params, rng)
        leaves, treedef = jax.tree_util.tree_flatten(struct)
        if os.path.exists(path):
            with np.load(path) as z:
                arrs = [z[f"a{i}"] for i in range(len(leaves))]
            if all(a.shape == l.shape and a.dtype == l.dtype
                   for a, l in zip(arrs, leaves)):
                return jax.tree_util.tree_unflatten(
                    treedef, [jnp.asarray(a) for a in arrs])
        params = CanonSwapCore(twin).init_params(rng)
        try:
            os.makedirs(cache_dir, exist_ok=True)
            flat = jax.tree_util.tree_leaves(params)
            np.savez(path + f".tmp{os.getpid()}",
                     **{f"a{i}": np.asarray(x) for i, x in enumerate(flat)})
            os.replace(path + f".tmp{os.getpid()}.npz", path)
        except OSError:
            pass  # cache is best-effort
        return params


# ---------------------------------------------------------------------------
# Pure stage functions (core is static; params/arrays are traced).
# ---------------------------------------------------------------------------


def extract_motion(core: CanonSwapCore, params: Params, frames: jax.Array) -> dict:
    """Batched motion template: frames (B, S, S, 3) in [0,1] -> motion dict.

    Equivalent to the reference's per-frame make_motion_template loop
    (can_swap_pipeline_e2e.py:101-135) in one batched M pass. Returns dict
    with kp/exp (B,K,3), pitch/yaw/roll (B,1) degrees, t (B,3), scale (B,1),
    and x_t (B,K,3) the posed keypoints.
    """
    raw = core.motion.apply(params["motion_extractor"], frames)
    info = refine_kp_info(raw)
    x_t = transform_keypoint(
        info["kp"], info["pitch"][:, 0], info["yaw"][:, 0], info["roll"][:, 0],
        info["t"], info["exp"], info["scale"],
    )
    info["x_t"] = x_t
    return info


def appearance_features(core: CanonSwapCore, params: Params, frames: jax.Array):
    """frames (B, S, S, 3) -> feature volume (B, D, S/4, S/4, C)."""
    return core.appearance.apply(params["appearance_feature_extractor"], frames)


def warp_to_canonical(core, params, f_s, x_t, x_can):
    """Posed volume -> canonical volume (+ occlusion map).

    Mirrors warping_module.warp(f_s, kp_source=x_t, kp_driving=x_can)
    (can_swap_pipeline_e2e.py:244)."""
    warped, occ, _ = core.warping.apply(
        params["warping_module"], f_s, kp_driving=x_can, kp_source=x_t,
        method="warp",
    )
    return warped, occ


def inject_identity(core, params, f_can, source_id, packed_out=False):
    """Canonical-space identity swap (transfer module).

    ``packed_out=True`` hands the volume to the refine module in pack_hw2
    layout (see SwapModule.packed_out)."""
    return core.swap.apply(
        params["transfer"], f_can, source_id.astype(f_can.dtype),
        packed_out=packed_out,
    )


def refine_volume(core, params, f_swap, packed_in=False):
    return core.refine.apply(params["refine"], f_swap, packed_in=packed_in)


def warp_decode(core, params, volume, x_can, x_t):
    """Canonical volume -> posed decode -> image (can_swap_e2e.py:286-308)."""
    ret = core.warping.apply(
        params["warping_module"], volume, kp_driving=x_t, kp_source=x_can
    )
    return core.spade.apply(params["spade_generator"], ret["out"])


def conv_decode(core, params, volume, occlusion_map=None):
    """Decode a volume without re-warping (reference conv_decode,
    can_swap_e2e.py:309-312) — used for canonical-space debug frames and the
    v2i swap-once path."""
    out = core.warping.apply(
        params["warping_module"], volume, occlusion_map, method="warp_out"
    )
    return core.spade.apply(params["spade_generator"], out)


def swap_step(
    core: CanonSwapCore,
    params: Params,
    frames: jax.Array,
    source_id: jax.Array,
    motion: dict,
    *,
    with_debug: bool = False,
):
    """The full per-frame-batch face-swap program (one XLA computation).

    Equivalent of the reference hot loop body (can_swap_pipeline_e2e.py:
    223-283): F -> warp-to-canonical -> swap -> refine -> warp-back+decode.

    Args:
      frames: (B, S, S, 3) target crops in [0, 1].
      source_id: (1 or B, 512) L2-normalized ID embedding.
      motion: dict with 'kp', 'scale', 'x_t' for these frames.
      with_debug: also decode canonical reconstruction + canonical swap
        (the reference's debug strips).

    Returns dict(out=(B, 2S, 2S, 3) swapped images [, rec_can, swap_can]).
    """
    if source_id.shape[0] == 1 and frames.shape[0] != 1:
        source_id = jnp.broadcast_to(
            source_id, (frames.shape[0], source_id.shape[1])
        )
    source_id = source_id.astype(frames.dtype)
    f_s = appearance_features(core, params, frames)
    # kp math arrives in f32; compute path follows the frame dtype
    x_can = (motion["scale"][..., None] * motion["kp"]).astype(frames.dtype)
    x_t = motion["x_t"].astype(frames.dtype)
    f_can, occ = warp_to_canonical(core, params, f_s, x_t, x_can)
    # without debug decodes, the swap->refine boundary stays in pack_hw2
    # layout (the unpack+pack round trip cancels exactly)
    packed = not with_debug
    f_swap = inject_identity(core, params, f_can, source_id,
                             packed_out=packed)
    out = {}
    if with_debug:
        out["rec_can"] = conv_decode(core, params, f_can, occ)
        out["swap_can"] = conv_decode(core, params, f_swap, occ)
    f_swap = refine_volume(core, params, f_swap, packed_in=packed)
    out["out"] = warp_decode(core, params, f_swap, x_can, x_t)
    return out


def reanimate_step(
    core: CanonSwapCore,
    params: Params,
    volume: jax.Array,
    x_swap: jax.Array,
    kp_swap: jax.Array,
    rot_swap: jax.Array,
    t_swap: jax.Array,
    scale_swap: jax.Array,
    delta_t: jax.Array,
):
    """v2i per-frame-batch program (can_swap_pipeline_v2i.py:260-309):
    a fixed swapped canonical volume re-animated by driving expressions.

    x_t_2 = scale_swap * (kp_swap @ R_swap + delta_t) + t_swap_xy, then
    warp_decode(volume, kp_source=x_swap, kp_driving=x_t_2).

    Args:
      volume: (1, D, H, W, C) swapped canonical features (constant per video —
        the reference recomputed it per frame; hoisted here).
      x_swap/kp_swap: (1, K, 3); rot_swap: (1, 3, 3); t_swap: (1, 3);
      scale_swap: (1, 1); delta_t: (B, K, 3) driving expression deltas.
    """
    b = delta_t.shape[0]
    x_t_2 = scale_swap[..., None] * (kp_swap @ rot_swap + delta_t)
    x_t_2 = x_t_2.at[..., 0:2].add(t_swap[:, None, 0:2])
    vol = jnp.broadcast_to(volume, (b, *volume.shape[1:]))
    x_swap_b = jnp.broadcast_to(x_swap, (b, *x_swap.shape[1:]))
    return warp_decode(
        core, params, vol,
        x_swap_b.astype(vol.dtype), x_t_2.astype(vol.dtype),
    )


def adjust_driving_kp(
    core: CanonSwapCore,
    stitching_params: Params,
    x_t: jax.Array,
    eye_ratio: jax.Array | None = None,
    lip_ratio: jax.Array | None = None,
    *,
    use_stitching: bool = False,
    normalize_lip: bool = False,
    lip_normalize_threshold: float = 0.03,
) -> jax.Array:
    """Eye/lip retargeting + stitching on the posed driving keypoints.

    LivePortrait-lineage semantics that the reference's vestigial methods
    implement (can_swap_e2e.py:258-282): additive kp deltas from the
    retargeting MLPs driven by combined close-ratios, then the stitching net
    pulls the modified keypoints back toward coherence with the originals.
    ``normalize_lip`` zeroes the lip delta when the driving lip is closed
    below threshold (LivePortrait flag semantics; the ratio's second column
    is the driving component, utils/ratios.calc_combined_lip_ratio)."""
    st = core.stitching
    dt = x_t.dtype
    x_new = x_t
    if eye_ratio is not None:
        x_new = x_new + st.apply(
            stitching_params, x_t, eye_ratio.astype(dt), method="retarget_eye"
        )
    if lip_ratio is not None:
        lr = lip_ratio.astype(dt)
        delta = st.apply(stitching_params, x_t, lr, method="retarget_lip")
        if normalize_lip:
            gate = (lr[:, 1:2] >= lip_normalize_threshold).astype(dt)
            delta = delta * gate[:, :, None]
        x_new = x_new + delta
    if use_stitching:
        x_new = st.apply(stitching_params, x_t, x_new, method="stitch")
    return x_new


def swap_with_motion(
    core: CanonSwapCore,
    params: Params,
    frames: jax.Array,
    source_id: jax.Array,
    *,
    stitching_params: Params = None,
    eye_ratio: jax.Array | None = None,
    lip_ratio: jax.Array | None = None,
    use_stitching: bool = False,
    normalize_lip: bool = False,
    with_debug: bool = False,
    as_uint8: bool = False,
):
    """Fused motion extraction + swap step: ONE device dispatch per batch
    (each dispatch through the remote-TPU relay costs ~tens of ms).

    ``as_uint8`` quantizes the output images on device — a 4x cut in
    device->host transfer volume (the pipeline's main off-chip cost).

    ``stitching_params`` + ratio arrays enable the optional retargeting /
    stitching keypoint adjustments (flag_eye_retargeting /
    flag_lip_retargeting / flag_stitching) inside the same dispatch.

    Returns (outputs dict, motion dict)."""
    motion = extract_motion(core, params, frames)
    if stitching_params is not None and (
        use_stitching or eye_ratio is not None or lip_ratio is not None
    ):
        motion = dict(motion)
        motion["x_t"] = adjust_driving_kp(
            core, stitching_params, motion["x_t"], eye_ratio, lip_ratio,
            use_stitching=use_stitching, normalize_lip=normalize_lip,
        )
    out = swap_step(
        core, params, frames, source_id, motion, with_debug=with_debug
    )
    if as_uint8:
        out = {
            k: jnp.clip(v.astype(jnp.float32) * 255.0, 0, 255).astype(jnp.uint8)
            for k, v in out.items()
        }
    return out, motion


# Jitted wrappers -----------------------------------------------------------

swap_step_jit = jax.jit(swap_step, static_argnums=0, static_argnames=("with_debug",))
swap_with_motion_jit = jax.jit(
    swap_with_motion, static_argnums=0,
    static_argnames=("with_debug", "as_uint8", "use_stitching",
                     "normalize_lip"),
)
adjust_driving_kp_jit = jax.jit(
    adjust_driving_kp, static_argnums=0,
    static_argnames=("use_stitching", "normalize_lip",
                     "lip_normalize_threshold"),
)
extract_motion_jit = jax.jit(extract_motion, static_argnums=0)
appearance_features_jit = jax.jit(appearance_features, static_argnums=0)
reanimate_step_jit = jax.jit(reanimate_step, static_argnums=0)
conv_decode_jit = jax.jit(conv_decode, static_argnums=0)
warp_to_canonical_jit = jax.jit(warp_to_canonical, static_argnums=0)
inject_identity_jit = jax.jit(inject_identity, static_argnums=0)
