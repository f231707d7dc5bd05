"""End-to-end video face swap (the flagship path).

TPU-batched re-design of the reference's CanSwapPipeline.execute
(can_swap_pipeline_e2e.py:137-350): identical semantics, but the three
per-frame loops (parsing, motion template, swap) become batched jitted
programs over fixed-size frame batches, and paste-back masks are computed on
device.

Outputs: <output_dir>/<source>--<driving>.mp4 (paste-back result) and
<source>--<driving>_concat.mp4 (driving | canonical-swap | result |
canonical-rec debug strip), plus .jpg variants for image targets.
"""

from __future__ import annotations

import os
import os.path as osp

import cv2
import numpy as np

import jax.numpy as jnp

from canonswap_tpu.configs.pipeline_config import ArgumentConfig
from canonswap_tpu.pipelines.session import FaceSwapSession
from canonswap_tpu.utils import geometry as G
from canonswap_tpu.utils import io as IO
from canonswap_tpu.utils import video as V
from canonswap_tpu.utils.ratios import calc_eye_close_ratio, calc_lip_close_ratio
from canonswap_tpu.utils.rlog import log


def _batched(n, batch):
    for i in range(0, n, batch):
        yield i, min(i + batch, n)


def execute(session: FaceSwapSession, args: ArgumentConfig):
    inf_cfg = session.inference_cfg
    crop_cfg = session.crop_cfg
    batch = inf_cfg.batch_size

    # 1) source identity ---------------------------------------------------
    log("Get source ID...")
    source_rgb = IO.load_image_rgb(args.source)
    source_id = session.get_source_id(source_rgb)

    # 2) driving load + crop ----------------------------------------------
    flag_is_video = IO.is_video(args.driving)
    if flag_is_video:
        output_fps = int(V.get_fps(args.driving))
        driving_rgb_lst = V.load_video(args.driving)
        log(f"Loaded driving video: {args.driving} ({len(driving_rgb_lst)} frames @ {output_fps} fps)")
    elif IO.is_image(args.driving):
        driving_rgb_lst = [IO.load_image_rgb(args.driving)]
        output_fps = 25
    else:
        raise ValueError(f"{args.driving} is not a supported type!")

    n_frames = len(driving_rgb_lst)
    h0, w0 = driving_rgb_lst[0].shape[:2]
    is_square = h0 == w0
    if inf_cfg.flag_crop_driving_video or not is_square:
        ret_d = session.cropper.crop_source_video(driving_rgb_lst)
        n_frames = min(n_frames, len(ret_d["frame_crop_lst"]))
        crops_256 = ret_d["frame_crop_lst"][:n_frames]
        lmk_crop_lst = ret_d["lmk_crop_lst"][:n_frames]
        M_c2o_lst = ret_d["M_c2o_lst"][:n_frames]
        log(f"Driving video cropped: {n_frames} frames")
    else:
        lmk_crop_lst = session.cropper.calc_lmks_from_cropped_video(driving_rgb_lst)
        nis = session.cropper.network_input_size
        crops_256 = [cv2.resize(f, (nis, nis)) for f in driving_rgb_lst]
        M_c2o_lst = None  # no crop -> no paste-back transform

    crops_256 = np.stack(crops_256)  # (N, 256, 256, 3) uint8

    # 3) eye/lip ratios (motion template metadata) ------------------------
    c_d_eyes_lst = [calc_eye_close_ratio(l[None]) for l in lmk_crop_lst]
    c_d_lip_lst = [calc_lip_close_ratio(l[None]) for l in lmk_crop_lst]

    # combined ratios for the retargeting nets (reference vestigial path
    # can_swap_e2e.py:324-348, wired here behind the flags)
    eye_ratio_all = lip_ratio_all = None
    if session.use_eye_retarget or session.use_lip_retarget:
        from canonswap_tpu.utils.ratios import (
            calc_combined_eye_ratio, calc_combined_lip_ratio)

        src_crop = session.cropper.crop_source_image(source_rgb)
        if src_crop is None:
            raise RuntimeError(
                "No face detected in the source image (needed for the "
                "retargeting ratios).")
        source_lmk = src_crop["lmk_crop"]
        eye_ratio_all = np.concatenate([
            calc_combined_eye_ratio(c, source_lmk) for c in c_d_eyes_lst
        ])  # (N, 3)
        lip_ratio_all = np.concatenate([
            calc_combined_lip_ratio(c, source_lmk) for c in c_d_lip_lst
        ])  # (N, 2)

    # 4) motion template (batched), with an on-disk cache -----------------
    # The reference designed but disabled this cache
    # (can_swap_pipeline_e2e.py:199-201); here it is real: one .pkl per
    # driving video, keyed by frame count.
    template_path = osp.splitext(args.driving)[0] + ".pkl" if flag_is_video else None
    motion_all = None
    if template_path and osp.exists(template_path):
        cached = IO.load(template_path)
        if cached.get("n_frames") == n_frames:
            motion_all = {
                k: np.asarray(v) for k, v in cached["motion"].items()
            }
            log(f"Loaded motion template from {template_path}")
    # Optional Kalman smoothing of the motion template (reference
    # src/utils/filter.py:8-19 analogue, wired behind flag_smooth_motion).
    # Needs the whole sequence, so it forces the two-pass path: extract the
    # template for all frames first, smooth along the frame axis, then swap.
    if (
        getattr(inf_cfg, "flag_smooth_motion", False)
        and flag_is_video
        and n_frames > 1
        and motion_all is None
    ):
        from canonswap_tpu.utils.smoothing import smooth

        chunks = []
        for lo, hi in _batched(n_frames, batch):
            idx = np.arange(lo, hi)
            pad = batch - len(idx)
            if pad:
                idx = np.concatenate([idx, np.full(pad, hi - 1)])
            m = session.motion_template(session.prepare_frames(crops_256[idx]))
            chunks.append({k: np.asarray(v)[: hi - lo] for k, v in m.items()})
        motion_all = {
            k: smooth(np.concatenate([c[k] for c in chunks]))
            for k in chunks[0]
        }
        log("Motion template Kalman-smoothed")

    use_fused = motion_all is None  # no cache: fuse motion+swap per batch
    motion_chunks = []

    # 5..6) batched swap + parsing ----------------------------------------
    I_p_lst, I_can_lst, rec_can_lst, I_p_pstbk_lst = [], [], [], []
    do_pstbk = inf_cfg.flag_pasteback and inf_cfg.flag_do_crop and M_c2o_lst is not None

    for lo, hi in _batched(n_frames, batch):
        # pad the final batch to keep shapes fixed (no recompile)
        idx = np.arange(lo, hi)
        pad = batch - len(idx)
        if pad:
            idx = np.concatenate([idx, np.full(pad, hi - 1)])
        frames01 = session.prepare_frames(crops_256[idx])
        eye_r = (jnp.asarray(eye_ratio_all[idx])
                 if eye_ratio_all is not None else None)
        lip_r = (jnp.asarray(lip_ratio_all[idx])
                 if lip_ratio_all is not None else None)

        if use_fused:
            out, motion = session.swap_with_motion(
                frames01, source_id, with_debug=True,
                eye_ratio=eye_r, lip_ratio=lip_r,
            )
            motion_chunks.append(
                {k: np.asarray(v)[: hi - lo] for k, v in motion.items()}
            )
        else:
            motion = {k: jnp.asarray(v[idx]) for k, v in motion_all.items()}
            out = session.swap_batch(frames01, source_id, motion,
                                     with_debug=True,
                                     eye_ratio=eye_r, lip_ratio=lip_r)
        masks512 = session.parse_masks(crops_256[idx])

        if not do_pstbk:
            # blend the swapped output with the (resized) input crop through
            # the parsing mask (reference blend_images path,
            # can_swap_pipeline_e2e.py:269, crop.py:93-96)
            from canonswap_tpu.ops.affine import blend_images

            blended = blend_images(
                out["out"], frames01.astype(jnp.float32), masks512
            )
            out = dict(out, out=blended)

        res = np.clip(np.asarray(out["out"], np.float32) * 255, 0, 255).astype(np.uint8)
        can = np.clip(np.asarray(out["swap_can"], np.float32) * 255, 0, 255).astype(np.uint8)
        rec = np.clip(np.asarray(out["rec_can"], np.float32) * 255, 0, 255).astype(np.uint8)
        masks_np = np.asarray(masks512)

        for j, f_idx in enumerate(range(lo, hi)):
            I_p_lst.append(res[j])
            I_can_lst.append(can[j])
            rec_can_lst.append(rec[j])
            if do_pstbk:
                mask3 = np.repeat(masks_np[j], 3, axis=-1)
                mask_ori = G.prepare_paste_back(
                    mask3, M_c2o_lst[f_idx],
                    dsize=(driving_rgb_lst[f_idx].shape[1],
                           driving_rgb_lst[f_idx].shape[0]),
                    if_float=True,
                )
                I_p_pstbk_lst.append(
                    G.paste_back(
                        res[j], M_c2o_lst[f_idx], driving_rgb_lst[f_idx],
                        mask_ori,
                    )
                )
        log(f"Swapped frames {lo}..{hi - 1}")

    if use_fused and motion_chunks and template_path:
        motion_all = {
            k: np.concatenate([c[k] for c in motion_chunks])
            for k in motion_chunks[0]
        }
        try:
            IO.dump(
                template_path,
                {
                    "n_frames": n_frames,
                    "output_fps": output_fps,
                    "motion": motion_all,
                    "c_eyes_lst": c_d_eyes_lst,
                    "c_lip_lst": c_d_lip_lst,
                },
            )
            log(f"Dumped motion template to {template_path}")
        except OSError:
            pass  # read-only source directory

    # 7) encode ------------------------------------------------------------
    os.makedirs(args.output_dir, exist_ok=True)
    stem = f"{IO.basename(args.source)}--{IO.basename(args.driving)}"
    crops_resized = [cv2.resize(c, (res.shape[2], res.shape[1])) for c in crops_256[:n_frames]]
    frames_concat = V.concat_frames(crops_resized, I_can_lst, I_p_lst, rec_can_lst)

    if flag_is_video:
        wfp_concat = osp.join(args.output_dir, f"{stem}_concat.mp4")
        V.images2video(frames_concat, wfp_concat, fps=output_fps, crf=inf_cfg.crf)
        wfp = osp.join(args.output_dir, f"{stem}.mp4")
        V.images2video(
            I_p_pstbk_lst if I_p_pstbk_lst else I_p_lst, wfp,
            fps=output_fps, crf=inf_cfg.crf,
        )
        if V.has_audio_stream(args.driving):
            tmp = wfp + ".audio.mp4"
            if V.add_audio_to_video(wfp, args.driving, tmp):
                os.replace(tmp, wfp)
        log(f"Results: {wfp}")
        log(f"Results with concat: {wfp_concat}")
    else:
        wfp_concat = osp.join(args.output_dir, f"{stem}_concat.jpg")
        IO.save_image_rgb(wfp_concat, frames_concat[0])
        wfp = osp.join(args.output_dir, f"{stem}.jpg")
        IO.save_image_rgb(
            wfp, I_p_pstbk_lst[0] if I_p_pstbk_lst else I_p_lst[0]
        )
        log(f"Swapped image: {wfp}")

    return wfp, wfp_concat
