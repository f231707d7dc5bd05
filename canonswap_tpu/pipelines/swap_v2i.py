"""Video-to-image swap: driving-video motion re-animates a swapped source.

Re-design of the reference's CanSwapPipeline (v2i) execute
(can_swap_pipeline_v2i.py:184-373): the source image is warped to canonical
space, swapped ONCE with the driving video's identity, then re-animated per
frame with the driving expressions and pasted back into the source image.

Improvements over the reference (kept semantically identical otherwise):
  - the per-frame ``extract_feature_3d(swap_can_256)`` of a CONSTANT input is
    hoisted out of the loop (the known inefficiency at v2i:308),
  - the re-animation loop runs as batched jitted programs.
"""

from __future__ import annotations

import os
import os.path as osp

import cv2
import numpy as np

import jax.numpy as jnp

from canonswap_tpu.configs.pipeline_config import ArgumentConfig
from canonswap_tpu.ops.pose import rotation_matrix
from canonswap_tpu.ops.resize import bilinear_resize
from canonswap_tpu.pipelines.session import FaceSwapSession
from canonswap_tpu.runtime import core as C
from canonswap_tpu.utils import geometry as G
from canonswap_tpu.utils import io as IO
from canonswap_tpu.utils import video as V
from canonswap_tpu.utils.rlog import log


def _to_uint8(x) -> np.ndarray:
    x = np.asarray(jnp.asarray(x, jnp.float32))
    return np.clip(x * 255, 0, 255).astype(np.uint8)


def execute(session: FaceSwapSession, args: ArgumentConfig):
    inf_cfg = session.inference_cfg
    batch = inf_cfg.batch_size
    core, params = session.core, session.params

    # 1) source -> canonical (execute_face_canonical, v2i:61-106) ----------
    source_img = IO.load_image_rgb(args.source)
    source_img = IO.resize_to_limit(
        source_img, inf_cfg.source_max_dim, inf_cfg.source_division
    )
    crop_info = session.cropper.crop_source_image(source_img)
    if crop_info is None:
        raise RuntimeError("No face detected in the source image.")
    crop256 = crop_info["img_crop_256x256"]
    source_M_c2o = crop_info["M_c2o"]

    source_mask = session.parse_masks(crop256[None])  # (1, 512, 512, 1)

    I_s = session.prepare_frames(crop256[None])
    x_s_info = session.motion_template(I_s)
    f_s = C.appearance_features_jit(core, params, I_s)
    x_s = x_s_info["x_t"]
    x_d_new = x_s_info["scale"][..., None] * x_s_info["kp"]
    f_s_can, occ_map = C.warp_to_canonical_jit(core, params, f_s, x_s, x_d_new)
    source_can = _to_uint8(C.conv_decode_jit(core, params, f_s_can, occ_map))[0]

    # 2) driving video + motion template (v2i:201-238) ---------------------
    output_fps = int(V.get_fps(args.driving))
    driving_rgb_lst = V.load_video(args.driving)
    ret_d = session.cropper.crop_source_video(driving_rgb_lst)
    crops_256 = np.stack(ret_d["frame_crop_lst"])
    n_frames = len(crops_256)
    log(f"Driving video: {n_frames} frames @ {output_fps} fps")

    # driving identity from frame 0 (get_driving_id, v2i:135-147)
    driving_id = session.get_source_id(driving_rgb_lst[0])

    # 3) swap once in canonical space (v2i:285-304) -------------------------
    f_can_swap = C.inject_identity_jit(core, params, f_s_can, driving_id)
    swap_can = C.conv_decode_jit(core, params, f_can_swap, occ_map)
    I_can = _to_uint8(swap_can)[0]
    s_in = session.model_cfg.input_size
    swap_can_256 = bilinear_resize(swap_can, (s_in, s_in))
    x_swap_info = session.motion_template(swap_can_256)
    x_swap = x_swap_info["x_t"]
    kp_swap = x_swap_info["kp"]
    rot_swap = rotation_matrix(
        x_s_info["pitch"], x_s_info["yaw"], x_s_info["roll"]
    )
    t_swap = x_s_info["t"].at[..., 2].set(0.0)
    scale_swap = x_s_info["scale"]
    # hoisted constant (the reference recomputed this per frame, v2i:308)
    f_swap_can_2 = C.appearance_features_jit(core, params, swap_can_256)

    # paste-back mask in source-image space (v2i:255-258)
    mask3 = np.repeat(np.asarray(session.parse_masks(crop256[None]))[0], 3, -1)
    mask_ori = G.prepare_paste_back(
        mask3, source_M_c2o,
        dsize=(source_img.shape[1], source_img.shape[0]), if_float=True,
    )

    # 4) batched re-animation loop (v2i:260-321) ----------------------------
    I_p_lst, I_p_pstbk_lst = [], []
    for lo in range(0, n_frames, batch):
        hi = min(lo + batch, n_frames)
        idx = np.arange(lo, hi)
        pad = batch - len(idx)
        if pad:
            idx = np.concatenate([idx, np.full(pad, hi - 1)])
        frames01 = session.prepare_frames(crops_256[idx])
        motion = session.motion_template(frames01)
        out = C.reanimate_step_jit(
            core, params, f_swap_can_2, x_swap, kp_swap, rot_swap, t_swap,
            scale_swap, motion["exp"],
        )
        res = _to_uint8(out)
        for j in range(hi - lo):
            I_p_lst.append(res[j])
            I_p_pstbk_lst.append(
                G.paste_back(res[j], source_M_c2o, source_img, mask_ori)
            )
        log(f"Re-animated frames {lo}..{hi - 1}")

    # 5) encode --------------------------------------------------------------
    os.makedirs(args.output_dir, exist_ok=True)
    stem = f"{IO.basename(args.source)}--{IO.basename(args.driving)}"
    IO.save_image_rgb(osp.join(args.output_dir, "source_can.jpg"), source_can)
    IO.save_image_rgb(osp.join(args.output_dir, "swap_can.jpg"), I_can)

    wfp = osp.join(args.output_dir, f"{stem}.mp4")
    V.images2video(I_p_pstbk_lst, wfp, fps=output_fps, crf=inf_cfg.crf)
    drv_resized = [
        cv2.resize(c, (I_p_lst[0].shape[1], I_p_lst[0].shape[0]))
        for c in crops_256
    ]
    wfp_concat = osp.join(args.output_dir, f"{stem}_concat.mp4")
    V.images2video(
        V.concat_frames(drv_resized, I_p_lst), wfp_concat, fps=output_fps,
        crf=inf_cfg.crf,
    )
    if V.has_audio_stream(args.driving):
        tmp = wfp + ".audio.mp4"
        if V.add_audio_to_video(wfp, args.driving, tmp):
            os.replace(tmp, wfp)
    log(f"Results: {wfp}")
    return wfp, wfp_concat
