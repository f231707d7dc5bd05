"""UniPose top-level model (ED-Pose): open-vocabulary keypoint detection.

TPU-native rebuild of the reference's
src/utils/dependencies/XPose/models/UniPose/unipose.py:26-520 (inference
path: dn disabled), with the two-stage deformable transformer and the
50-group (1 box + K keypoints) decoder.  One jittable forward with static
shapes; batch over images.

Inputs (all padded/static):
  image (B, H, W, 3) normalized; img_mask (B, H, W) bool True = padding;
  ins_text (B, T, 512) CLIP instance embeddings (zero-padded);
  text_token_mask (B, T) True = real token;
  kpt_text (B, K, 512) CLIP keypoint embeddings; kpt_vis (B, K) 1.0 = used.
Outputs: dict(pred_logits (B, 50, T), pred_boxes (B, 50, 4) cxcywh,
  pred_keypoints (B, 50, 3K) in xy...zz order (keypoint_xyzxyz_to_xyxyzz)).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from canonswap_tpu.models.xpose.swin import SwinConfig, SwinTransformer
from canonswap_tpu.models.xpose.transformer import (
    MLP, BiAttentionBlock, DecoderLayer, EncoderLayer, TextEncoderLayer,
    contrastive_logits, encoder_reference_points,
    gen_encoder_output_proposals, gen_sineembed_for_position,
    get_sine_pos_embed, inverse_sigmoid,
)
from canonswap_tpu.ops.resize import nearest_resize


@dataclasses.dataclass(frozen=True)
class UniPoseConfig:
    hidden_dim: int = 256
    nheads: int = 8
    enc_layers: int = 6
    dec_layers: int = 6
    dim_feedforward: int = 2048
    num_queries: int = 900
    num_feature_levels: int = 4
    enc_n_points: int = 4
    dec_n_points: int = 4
    num_body_points: int = 68
    num_group: int = 50
    num_box_decoder_layers: int = 2
    swin: SwinConfig = SwinConfig()


def pos_embed_sine_hw(mask, num_pos_feats=128, temp_h=20, temp_w=20):
    """PositionEmbeddingSineHW (position_encoding.py:66-115), normalize=True.

    mask (B, H, W) True = padding -> (B, H, W, 2*num_pos_feats)."""
    not_mask = (~mask).astype(jnp.float32)
    y_embed = jnp.cumsum(not_mask, axis=1)
    x_embed = jnp.cumsum(not_mask, axis=2)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale

    def emb(e, temp):
        dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
        dim_t = temp ** (2 * (dim_t // 2) / num_pos_feats)
        p = e[..., None] / dim_t
        return jnp.stack(
            [jnp.sin(p[..., 0::2]), jnp.cos(p[..., 1::2])], axis=-1
        ).reshape(*p.shape[:-1], -1)

    return jnp.concatenate([emb(y_embed, temp_h), emb(x_embed, temp_w)], -1)


def keypoint_group_attn_mask(kpt_vis, num_group: int):
    """mask_generate.py:prepare_for_mask for inference: block-diagonal over
    ``num_group`` groups of (1 + K) queries; within a group, query i attends
    j iff kpt_mask_i == kpt_mask_j.  kpt_vis (B, K) -> (B, G*(K+1), G*(K+1))
    True = masked."""
    b, k = kpt_vis.shape
    kpt_mask = jnp.concatenate(
        [jnp.ones((b, 1), kpt_vis.dtype), kpt_vis], axis=1)  # (B, K+1)
    equal = kpt_mask[:, :, None] == kpt_mask[:, None, :]  # (B, K+1, K+1)
    g = num_group
    n = g * (k + 1)
    eye = jnp.eye(g, dtype=bool)  # (G, G) same-group indicator
    block = eye[None, :, None, :, None] & equal[:, None, :, None, :]
    allowed = block.reshape(b, n, n)
    return ~allowed


class UniPose(nn.Module):
    cfg: UniPoseConfig = UniPoseConfig()

    def setup(self):
        c = self.cfg
        d = c.hidden_dim
        self.backbone = SwinTransformer(c.swin)
        self.projection = MLP(d, d, 3, name="projection")
        self.projection_kpt = MLP(d, d, 3, name="projection_kpt")
        # input projections: one per backbone level + one extra stride-2
        self.input_proj_convs = [
            nn.Conv(d, (1, 1), name=f"input_proj_{i}_conv") for i in range(3)
        ] + [nn.Conv(d, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     name="input_proj_3_conv")]
        self.input_proj_norms = [
            nn.GroupNorm(num_groups=32, epsilon=1e-5,
                         name=f"input_proj_{i}_gn")
            for i in range(4)
        ]
        self.level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0),
            (c.num_feature_levels, d))
        self.enc_layers_mod = [
            EncoderLayer(d, c.dim_feedforward, c.num_feature_levels,
                         c.nheads, c.enc_n_points, name=f"enc_{i}")
            for i in range(c.enc_layers)]
        self.fusion_layers = [
            BiAttentionBlock(d, d, c.dim_feedforward // 2, c.nheads // 2,
                             name=f"fusion_{i}")
            for i in range(c.enc_layers)]
        self.text_layers = [
            TextEncoderLayer(d, c.nheads // 2, c.dim_feedforward // 2,
                             name=f"text_{i}")
            for i in range(c.enc_layers)]
        self.dec_layers_mod = [
            DecoderLayer(d, c.dim_feedforward, c.num_feature_levels,
                         c.nheads, c.dec_n_points, name=f"dec_{i}")
            for i in range(c.dec_layers)]
        self.decoder_norm = nn.LayerNorm(epsilon=1e-5, name="decoder_norm")
        self.ref_point_head = MLP(d, d, 2, name="ref_point_head")
        self.enc_output = nn.Dense(d, name="enc_output")
        self.enc_output_norm = nn.LayerNorm(epsilon=1e-5,
                                            name="enc_output_norm")
        self.tgt_embed = self.param(
            "tgt_embed", nn.initializers.normal(1.0), (c.num_queries, d))
        # heads (shared across decoder layers, unipose.py:160-200)
        self.bbox_embed = MLP(d, 4, 3, name="bbox_embed")
        self.enc_out_bbox_embed = MLP(d, 4, 3, name="enc_out_bbox_embed")
        self.pose_embed = MLP(d, 2, 3, name="pose_embed")
        self.pose_hw_embed = MLP(d, 2, 3, name="pose_hw_embed")
        # reference splits the per-keypoint wh weights 17 + (K-17)
        # (decoder init :764-768); generalized for small test configs
        n_hw = min(17, c.num_body_points)
        self.hw = self.param(
            "hw", nn.initializers.normal(1.0), (n_hw, 2))
        if c.num_body_points > 17:
            self.hw_append = self.param(
                "hw_append", nn.initializers.normal(1.0),
                (c.num_body_points - 17, 2))
        else:
            self.hw_append = None

    def __call__(self, image, img_mask, ins_text, text_token_mask,
                 position_ids, kpt_text, kpt_vis):
        c = self.cfg
        b = image.shape[0]
        d = c.hidden_dim
        k = c.num_body_points
        g = c.num_group

        # ---- text side --------------------------------------------------
        encoded_text = self.projection(ins_text)        # (B, T, d)
        kpt_embed = self.projection_kpt(kpt_text)       # (B, K, d)
        t_len = encoded_text.shape[1]
        text_self_mask = ~jnp.eye(t_len, dtype=bool)    # True = masked
        pos_text = get_sine_pos_embed(
            position_ids[..., None].astype(jnp.float32),
            num_pos_feats=256, exchange_xy=False)
        text_pad = ~text_token_mask                     # True = padding

        # ---- backbone + projections ------------------------------------
        feats = self.backbone(image)
        srcs, masks, poss = [], [], []
        for li, stage in enumerate(self.cfg.swin.out_indices):
            f = feats[stage]
            m = nearest_resize(
                img_mask[..., None].astype(jnp.float32),
                (f.shape[1], f.shape[2]))[..., 0] > 0.5
            srcs.append(self.input_proj_norms[li](
                self.input_proj_convs[li](f)))
            masks.append(m)
            poss.append(pos_embed_sine_hw(m, d // 2))
        # extra level: stride-2 conv on the LAST backbone feature
        f_extra = self.input_proj_norms[3](
            self.input_proj_convs[3](feats[self.cfg.swin.out_indices[-1]]))
        m_extra = nearest_resize(
            img_mask[..., None].astype(jnp.float32),
            (f_extra.shape[1], f_extra.shape[2]))[..., 0] > 0.5
        srcs.append(f_extra)
        masks.append(m_extra)
        poss.append(pos_embed_sine_hw(m_extra, d // 2))

        spatial_shapes = tuple(
            (s.shape[1], s.shape[2]) for s in srcs)
        src_flat = jnp.concatenate(
            [s.reshape(b, -1, d) for s in srcs], axis=1)
        mask_flat = jnp.concatenate(
            [m.reshape(b, -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate([
            p.reshape(b, -1, d) + self.level_embed[i][None, None]
            for i, p in enumerate(poss)], axis=1)

        # valid ratios (deformable_transformer.py:293-300)
        ratios = []
        for m in masks:
            vh = jnp.sum((~m[:, :, 0]).astype(jnp.float32), axis=1) / m.shape[1]
            vw = jnp.sum((~m[:, 0, :]).astype(jnp.float32), axis=1) / m.shape[2]
            ratios.append(jnp.stack([vw, vh], -1))
        valid_ratios = jnp.stack(ratios, axis=1)  # (B, L, 2)

        # ---- encoder ----------------------------------------------------
        refs_enc = encoder_reference_points(spatial_shapes, valid_ratios)
        out, mem_text = src_flat, encoded_text
        for i in range(c.enc_layers):
            out, mem_text = self.fusion_layers[i](
                out, mem_text,
                attention_mask_v=mask_flat, attention_mask_l=text_pad)
            mem_text = self.text_layers[i](
                mem_text, src_mask=text_self_mask, pos=pos_text)
            out = self.enc_layers_mod[i](
                out, pos_flat, refs_enc, spatial_shapes, mask_flat)
        memory = out

        # ---- two-stage query selection ---------------------------------
        out_mem, out_props = gen_encoder_output_proposals(
            memory, mask_flat, spatial_shapes)
        out_mem = self.enc_output_norm(self.enc_output(out_mem))
        enc_logits = contrastive_logits(out_mem, mem_text, text_token_mask)
        topk_logits = jnp.max(enc_logits, axis=-1)
        _, topk_idx = jax.lax.top_k(topk_logits, c.num_queries)
        ref_unsig = self.enc_out_bbox_embed(out_mem) + out_props
        refpoints = jnp.take_along_axis(
            ref_unsig, topk_idx[..., None], axis=1)  # (B, nq, 4) unsigmoid
        tgt = jnp.broadcast_to(
            self.tgt_embed[None], (b, c.num_queries, d))

        # ---- decoder ----------------------------------------------------
        reference_points = jax.nn.sigmoid(refpoints)
        kpt_group_mask = keypoint_group_attn_mask(kpt_vis, g)  # (B, N2, N2)
        output = tgt
        self_mask = None
        hs_last = ref_last = None
        for layer_id in range(c.dec_layers):
            ref_in = reference_points[:, :, None] * jnp.concatenate(
                [valid_ratios, valid_ratios], -1)[:, None]  # (B, nq, L, 4)
            sine = gen_sineembed_for_position(ref_in[:, :, 0, :])
            query_pos = self.ref_point_head(sine)
            output = self.dec_layers_mod[layer_id](
                output, query_pos, ref_in, memory, spatial_shapes,
                mask_flat, mem_text, text_pad, self_attn_mask=self_mask)

            if layer_id < c.num_box_decoder_layers:
                # iteration heads run on the RAW layer output; only the
                # intermediate hs are LayerNormed (decoder fwd :860-866)
                delta = self.bbox_embed(output)
                new_refs = jax.nn.sigmoid(
                    delta + inverse_sigmoid(reference_points))

            if layer_id == c.num_box_decoder_layers - 1:
                # expand top-50 groups to (1 box + K keypoints) queries
                # (deformable_transformer.py:869-894)
                cls = contrastive_logits(output, mem_text, text_token_mask)
                _, topg = jax.lax.top_k(jnp.max(cls, axis=-1), g)
                ref_box = jnp.take_along_axis(
                    new_refs, topg[..., None], axis=1)      # (B, G, 4)
                out_box = jnp.take_along_axis(
                    output, topg[..., None], axis=1)        # (B, G, d)
                kpt_q = jnp.broadcast_to(
                    kpt_embed[:, None], (b, g, k, d))       # (B, G, K, d)
                delta_xy = self.pose_embed(kpt_q)[..., :2]
                kpt_xy = jax.nn.sigmoid(
                    inverse_sigmoid(ref_box[..., None, :2]) + delta_xy)
                hw_all = (self.hw if self.hw_append is None else
                          jnp.concatenate([self.hw, self.hw_append], axis=0))
                whw = jax.nn.sigmoid(hw_all)                # (K, 2)
                kpt_wh = whw[None, None] * ref_box[..., None, 2:]
                ref_kpt = jnp.concatenate([kpt_xy, kpt_wh], -1)
                reference_points = jnp.concatenate(
                    [ref_box[:, :, None], ref_kpt], axis=2
                ).reshape(b, g * (k + 1), 4)
                output = jnp.concatenate(
                    [out_box[:, :, None], kpt_q], axis=2
                ).reshape(b, g * (k + 1), d)
                self_mask = jnp.repeat(kpt_group_mask, c.nheads, axis=0)
            elif layer_id >= c.num_box_decoder_layers:
                # iterate box + keypoint refinement on the grouped queries
                # (raw output; decoder fwd :896-934)
                idx_box = jnp.arange(g) * (k + 1)
                ref_sig = inverse_sigmoid(reference_points)
                new_box = jax.nn.sigmoid(
                    self.bbox_embed(output[:, idx_box]) + ref_sig[:, idx_box])
                kpt_index = np.asarray(
                    [i for i in range(g * (k + 1)) if i % (k + 1) != 0])
                hs_kpt = output[:, kpt_index]
                d_xy = self.pose_embed(hs_kpt)
                d_hw = self.pose_hw_embed(hs_kpt)
                unsig = ref_sig[:, kpt_index]
                unsig = unsig.at[..., :2].add(d_xy[..., :2])
                unsig = unsig.at[..., 2:].add(d_hw)
                new_kpt = jax.nn.sigmoid(unsig)
                reference_points = jnp.concatenate(
                    [new_box[:, :, None],
                     new_kpt.reshape(b, g, k, 4)], axis=2
                ).reshape(b, g * (k + 1), 4)
                # final unipose heads consume the NORMED hs of this layer
                # with its input refs (unipose.py:420-485 zips hs with
                # reference[:-1])
                hs_last, ref_last = self.decoder_norm(output), ref_sig
            if layer_id < c.num_box_decoder_layers - 1:
                reference_points = new_refs

        # ---- final heads (unipose.py:420-485, last layer only) ----------
        idx_box = jnp.arange(g) * (k + 1)
        kpt_index = np.asarray(
            [i for i in range(g * (k + 1)) if i % (k + 1) != 0])
        hs_box = hs_last[:, idx_box]
        pred_logits = contrastive_logits(hs_box, mem_text, text_token_mask)
        pred_boxes = jax.nn.sigmoid(
            self.bbox_embed(hs_box) + ref_last[:, idx_box])
        hs_kpt = hs_last[:, kpt_index]
        kpt_xy = jax.nn.sigmoid(
            self.pose_embed(hs_kpt) + ref_last[:, kpt_index][..., :2])
        vis = jax.nn.sigmoid(jnp.ones_like(kpt_xy[..., :1]))
        xyv = jnp.concatenate([kpt_xy, vis], -1).reshape(b, g, k * 3)
        # keypoint_xyzxyz_to_xyxyzz (util/keypoint_ops.py:18-28)
        xyz = xyv.reshape(b, g, k, 3)
        pred_kpts = jnp.concatenate(
            [xyz[..., :2].reshape(b, g, 2 * k), xyz[..., 2].reshape(b, g, k)],
            axis=-1)
        return {
            "pred_logits": pred_logits,
            "pred_boxes": pred_boxes,
            "pred_keypoints": pred_kpts,
        }
