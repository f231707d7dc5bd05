"""Dense motion network: sparse keypoint pairs -> dense 3D deformation field.

Re-design of reference src/modules/dense_motion.py:13-104.  All stages are
expressed batched/channels-last so XLA can fuse them:

  compress (1x1x1 conv + BN + relu)
  -> K+1 sparse motions from the identity grid          (pure arithmetic)
  -> K+1 warped copies of the compressed volume         (ops.grid_sample_3d)
  -> gaussian heatmap difference                        (ops.kp2gaussian)
  -> 3D hourglass over the (K+1)*(C+1)-channel stack
  -> softmax mask combine -> deformation (B, D, H, W, 3)
  -> occlusion head on the depth-flattened prediction -> (B, H, W, 1)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from canonswap_tpu.configs.model_config import DenseMotionConfig
from canonswap_tpu.nn.blocks import Hourglass
from canonswap_tpu.ops.grid_sample import grid_sample_3d_ref
from canonswap_tpu.ops.heatmap import make_coordinate_grid_3d
from canonswap_tpu.ops.resize import avg_pool, volume_to_2d


def _bilinear_upsample_plane(x: jax.Array, fs: int) -> jax.Array:
    """Half-pixel bilinear x``fs`` upsample over the in-plane (H, W) axes of
    (B, H, W, C) or (B, D, H, W, C)."""
    shape = list(x.shape)
    shape[-3] *= fs
    shape[-2] *= fs
    return jax.image.resize(x, tuple(shape), method="linear")


def create_sparse_motions(
    shape_dhw: tuple[int, int, int], kp_driving: jax.Array, kp_source: jax.Array
) -> jax.Array:
    """(B, K, 3) kp pairs -> (B, K+1, D, H, W, 3) sample grids.

    Entry 0 is the identity grid (background); entry k+1 warps toward
    kp_source[k] - kp_driving[k] (reference dense_motion.py:29-43).
    """
    b, k, _ = kp_driving.shape
    grid = make_coordinate_grid_3d(shape_dhw, kp_driving.dtype)  # (D,H,W,3)
    identity = jnp.broadcast_to(grid[None, None], (b, 1, *shape_dhw, 3))
    shift = (kp_source - kp_driving)[:, :, None, None, None, :]
    driving_to_source = grid[None, None] + shift  # (B, K, D, H, W, 3)
    return jnp.concatenate([identity, driving_to_source], axis=1)


def create_deformed_feature(
    feature: jax.Array, sparse_motions: jax.Array
) -> jax.Array:
    """Warp ``feature`` (B, D, H, W, C) by each of the K+1 motions (general
    grid-sample path; kept as the reference implementation for parity).

    Returns (B, K+1, D, H, W, C)."""
    b, kp1 = sparse_motions.shape[:2]
    d, h, w, c = feature.shape[1:]
    feat_rep = jnp.broadcast_to(
        feature[:, None], (b, kp1, d, h, w, c)
    ).reshape(b * kp1, d, h, w, c)
    grids = sparse_motions.reshape(b * kp1, d, h, w, 3)
    warped = grid_sample_3d_ref(feat_rep, grids)
    return warped.reshape(b, kp1, d, h, w, c)


def create_deformed_feature_translated(
    feature: jax.Array, kp_driving: jax.Array, kp_source: jax.Array
) -> jax.Array:
    """Gather-free equivalent of :func:`create_deformed_feature`: every
    sparse motion is identity + (kp_source_k - kp_driving_k), a constant
    translation, so each warp is three shifted-slice lerps
    (ops.grid_sample.translate_volume_trilinear).  ~20x faster on TPU than
    the gather path (which dominated the whole swap step)."""
    from canonswap_tpu.ops.grid_sample import translate_volume_trilinear

    b, k, _ = kp_driving.shape
    d, h, w, c = feature.shape[1:]
    shifts = jnp.concatenate(
        [jnp.zeros((b, 1, 3), feature.dtype), kp_source - kp_driving], axis=1
    )  # (B, K+1, 3)
    feat_rep = jnp.broadcast_to(
        feature[:, None], (b, k + 1, d, h, w, c)
    ).reshape(b * (k + 1), d, h, w, c)
    warped = translate_volume_trilinear(feat_rep, shifts.reshape(-1, 3))
    return warped.reshape(b, k + 1, d, h, w, c)


def build_hourglass_input(
    feature: jax.Array, kp_driving: jax.Array, kp_source: jax.Array,
    kp_variance: float = 0.01,
) -> jax.Array:
    """Fused hg_in build: (B,D,H,W,Cc) compressed volume + kp pairs ->
    (B,D,H,W,(K+1)(Cc+1)) hourglass input, kp-major channel interleave
    (torch cat/view compatible, reference dense_motion.py:83-84).

    Same math as create_deformed_feature_translated + kp2gaussian + the
    stack/moveaxis, but the kp axis is CREATED by the first banded-matrix
    contraction (no (K+1)-way broadcast of the volume) and the final einsum
    emits the transposed layout directly (measured 5.7 -> 4.4 ms/step at
    B=16 CANONICAL; tools/exp_r3.py hg_in_v2)."""
    from canonswap_tpu.ops.grid_sample import _axis_resample_matrix

    b, d, h, w, c = feature.shape
    dt = feature.dtype
    shifts = jnp.concatenate(
        [jnp.zeros((b, 1, 3), dt), (kp_source - kp_driving).astype(dt)],
        axis=1)  # (B, K+1, 3)

    def mats(size, s1d):
        return jax.vmap(jax.vmap(
            lambda s: _axis_resample_matrix(size, s, dt)))(s1d)

    wz = mats(d, shifts[..., 2])
    wy = mats(h, shifts[..., 1])
    wx = mats(w, shifts[..., 0])
    t = jnp.einsum("bkad,bdhwc->bkahwc", wz, feature)
    t = jnp.einsum("bkah,bkdhwc->bkdawc", wy, t)
    t = jnp.einsum("bkaw,bkdhwc->bdhakc", wx, t)  # (B,D,H,W,K+1,Cc)

    # heatmap difference with the kp axis LAST (no transpose of a
    # tiny-channel tensor); channel 0 of each kp group is the heatmap
    grid = make_coordinate_grid_3d((d, h, w), dt)  # (D,H,W,3)

    def gauss(kp):
        # ops.heatmap.kp2gaussian's math in a kp-axis-LAST layout (the
        # shared helper emits (B, K, D, H, W), which would force a
        # transpose of this tiny-channel tensor right before the concat)
        diff = grid[None, :, :, :, None, :] - kp[:, None, None, None, :, :]
        return jnp.exp(-0.5 * jnp.sum(diff * diff, -1) / kp_variance)

    heat = gauss(kp_driving.astype(dt)) - gauss(kp_source.astype(dt))
    heat = jnp.concatenate([jnp.zeros_like(heat[..., :1]), heat], axis=-1)
    stacked = jnp.concatenate([heat[..., None], t], axis=-1)
    return stacked.reshape(b, d, h, w, -1)


class _OcclParams(nn.Module):
    """Param-compatible stand-in for ``nn.Conv(1, (7, 7), name='occlusion')``
    (params kernel (7,7,Cin,1) / bias (1,)); the caller applies the conv via
    the shift-sum form (ops/conv2d.py)."""

    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (7, 7, self.in_features, 1))
        bias = self.param("bias", nn.initializers.zeros, (1,))
        return kernel, bias


class DenseMotionNetwork(nn.Module):
    """``field_scale > 1`` runs the WHOLE estimation pipeline (deformed
    features, heatmaps, hourglass, mask/occlusion heads) at 1/field_scale
    in-plane resolution and bilinearly upsamples the smooth outputs
    (deformation field, occlusion logits) back to full res.  The parameter
    tree is unchanged (same convs, same converted weights); default 1 is
    bit-exact to the reference semantics.  This is the sanctioned speed
    lever for the ~48 TF/s hourglass stage — deformation fields are smooth,
    so estimating them at half resolution loses little (gate via
    InferenceConfig.dense_motion_scale; quality tracked in bench.py)."""

    cfg: DenseMotionConfig = DenseMotionConfig()
    num_kp: int = 21
    estimate_occlusion_map: bool = True
    field_scale: int = 1

    @nn.compact
    def __call__(self, feature, kp_driving, kp_source, train: bool = False):
        """feature: (B, D, H, W, C); kp_*: (B, K, 3).

        Returns dict(deformation=(B, D, H, W, 3), occlusion_map=(B, H, W, 1),
        mask=(B, Ds, Hs, Ws, K+1)).
        """
        c = self.cfg
        b, d, h, w, _ = feature.shape
        k = self.num_kp
        # keypoints may arrive f32 under half-precision inference
        kp_driving = kp_driving.astype(feature.dtype)
        kp_source = kp_source.astype(feature.dtype)

        x = nn.Conv(c.compress, (1, 1, 1), name="compress")(feature)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="norm")(x)
        x = nn.relu(x)

        fs = self.field_scale
        hs, ws = h // fs, w // fs
        if min(hs, ws) < 2 ** self.cfg.num_blocks:
            # the hourglass halves in-plane resolution num_blocks times; a
            # smaller field would pool a 1x1 level to 0x0 (found as a shape
            # crash in the r3 bench's quarter-res probe at CANONICAL:
            # 64/4=16 < 2^5)
            raise ValueError(
                f"field_scale={fs} leaves a {hs}x{ws} field, too small for "
                f"a {self.cfg.num_blocks}-block hourglass (needs >= "
                f"{2 ** self.cfg.num_blocks})")
        if fs > 1:
            x = avg_pool(x, (1, fs, fs))

        # fused hg_in build: translated per-kp warps + heatmap difference,
        # kp-major interleave (exact; tools/exp_r3.py hg_in_v2)
        hg_in = build_hourglass_input(x, kp_driving, kp_source)

        prediction = Hourglass(
            block_expansion=c.block_expansion,
            in_features=(k + 1) * (c.compress + 1),
            num_blocks=c.num_blocks,
            max_features=c.max_features,
            int8=c.int8_conv and not train,
            name="hourglass",
        )(hg_in, train)

        from canonswap_tpu.nn.conv3d import Conv3D

        # k7^3 conv over 142 channels is the reference's costliest conv
        # (dense_motion.py:18 "NOTE: computation cost is large"); depth taps
        # packed into the output channels (Conv3D auto -> outstacked) is the
        # measured-best form: 29.0 ms/16f vs 120.9 direct / 74.4 decomposed
        # (tools/profile_r5.jsonl mask7_*)
        logits = Conv3D(k + 1, (7, 7, 7), name="mask")(prediction)
        mask = jax.nn.softmax(logits, axis=-1)  # (B, D, Hs, Ws, K+1)
        # combine WITHOUT materializing the (B,K+1,D,H,W,3) sparse-motion
        # stack: sum_k softmax_k * (grid + shift_k) = grid + (e[1:] . shifts)
        # / sum(e) with e = exp(logits - max) — sum_k softmax_k == 1, so the
        # grid term needs no mask pass at all.  Identical math reassociated
        # (0.88 -> 0.69 ms/16f, tools/profile_r5.jsonl combine_*).
        grid = make_coordinate_grid_3d((d, hs, ws), mask.dtype)
        shifts = (kp_source - kp_driving).astype(mask.dtype)  # (B, K, 3)
        e = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
        disp = jnp.einsum("bdhwk,bkc->bdhwc", e[..., 1:], shifts) \
            / jnp.sum(e, axis=-1, keepdims=True)
        if fs > 1:
            # the half-res identity grid differs from the full-res one (both
            # are corner-aligned), so upsample the smooth DISPLACEMENT and
            # re-add the full-res grid
            disp = _bilinear_upsample_plane(disp, fs)
            deformation = make_coordinate_grid_3d(
                (d, h, w), disp.dtype)[None] + disp
        else:
            deformation = grid[None] + disp

        out = {"deformation": deformation, "mask": mask}
        if self.estimate_occlusion_map:
            pred2d = volume_to_2d(prediction)  # (B, Hs, Ws, F*D), torch order
            # 7x7 conv to ONE output channel = 1/128 MXU fill; re-expressed
            # exactly as a full-fill pointwise matmul to the 49 taps plus a
            # zero-flop shifted sum (9.2 -> 1.8 ms/16f, profile_r5 occl_*).
            # Param tree unchanged: kernel/bias match nn.Conv(1, (7, 7)).
            from canonswap_tpu.ops.conv2d import conv2d_cout1_shiftsum

            kern = _OcclParams(pred2d.shape[-1], name="occlusion")()
            occ = conv2d_cout1_shiftsum(pred2d, *kern)
            if fs > 1:
                occ = _bilinear_upsample_plane(occ, fs)
            out["occlusion_map"] = jax.nn.sigmoid(occ)
        return out
