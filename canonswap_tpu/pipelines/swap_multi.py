"""Multi-face video swap: every detected face is swapped to the source ID.

The reference ships the multi-face *capability* (face_detect_crop_multi.py:
79-100 returns all faces + matrices) but no pipeline around it; this is the
pipeline (BASELINE config 4): detect N faces on the first frame, run an
independent landmark track per face, batch each face's crops through the
swap core (faces fold into the frame batch), and paste every swapped face
back into the original frames.
"""

from __future__ import annotations

import os
import os.path as osp

import numpy as np

from canonswap_tpu.configs.pipeline_config import ArgumentConfig
from canonswap_tpu.pipelines.session import FaceSwapSession
from canonswap_tpu.utils import geometry as G
from canonswap_tpu.utils import io as IO
from canonswap_tpu.utils import video as V
from canonswap_tpu.utils.rlog import log


def _track_face(session, frames, first_lmk106):
    """Per-face landmark track + crop (mirrors Cropper.crop_source_video but
    seeded from a specific face's landmarks)."""
    import cv2

    cfg = session.crop_cfg
    nis = session.cropper.network_input_size
    lmk = session.landmark203.run(frames[0], first_lmk106)
    crops, M_c2o_lst = [], []
    for frame in frames:
        lmk = session.landmark203.run(frame, lmk)
        ret = G.crop_image(
            frame, lmk, dsize=cfg.dsize, scale=cfg.scale,
            vy_ratio=cfg.vy_ratio, flag_do_rot=cfg.flag_do_rot,
        )
        crops.append(
            cv2.resize(ret["img_crop"], (nis, nis), interpolation=cv2.INTER_AREA)
        )
        M_c2o_lst.append(ret["M_c2o"])
    return np.stack(crops), M_c2o_lst


def execute(session: FaceSwapSession, args: ArgumentConfig, max_faces: int = 4):
    inf_cfg = session.inference_cfg
    batch = inf_cfg.batch_size

    source_rgb = IO.load_image_rgb(args.source)
    source_id = session.get_source_id(source_rgb)

    output_fps = int(V.get_fps(args.driving))
    frames = V.load_video(args.driving)
    n_frames = len(frames)

    faces = session.face_analysis.get(
        frames[0], flag_do_landmark_2d_106=True, direction="large-small",
        max_face_num=max_faces,
    )
    if not faces:
        raise RuntimeError("No face detected in the first driving frame.")
    log(f"Tracking {len(faces)} faces over {n_frames} frames")

    results = [f.copy() for f in frames]
    for fi, face in enumerate(faces):
        crops, M_c2o_lst = _track_face(session, frames, face.landmark_2d_106)
        swapped, masks = [], []
        for lo in range(0, n_frames, batch):
            hi = min(lo + batch, n_frames)
            idx = np.arange(lo, hi)
            pad = batch - len(idx)
            if pad:
                idx = np.concatenate([idx, np.full(pad, hi - 1)])
            frames01 = session.prepare_frames(crops[idx])
            out, _ = session.swap_with_motion(
                frames01, source_id, as_uint8=True
            )
            res = np.asarray(out["out"])
            m = session.parse_masks_uint8(crops[idx]).astype(np.float32) / 255.0
            swapped.extend(res[: hi - lo])
            masks.extend(m[: hi - lo])
        for t in range(n_frames):
            mask3 = np.repeat(masks[t], 3, axis=-1)
            mask_ori = G.prepare_paste_back(
                mask3, M_c2o_lst[t],
                dsize=(results[t].shape[1], results[t].shape[0]), if_float=True,
            )
            results[t] = G.paste_back(
                swapped[t], M_c2o_lst[t], results[t], mask_ori
            )
        log(f"Face {fi + 1}/{len(faces)} swapped")

    os.makedirs(args.output_dir, exist_ok=True)
    stem = f"{IO.basename(args.source)}--{IO.basename(args.driving)}_multi"
    wfp = osp.join(args.output_dir, f"{stem}.mp4")
    V.images2video(results, wfp, fps=output_fps, crf=inf_cfg.crf)
    if V.has_audio_stream(args.driving):
        tmp = wfp + ".audio.mp4"
        if V.add_audio_to_video(wfp, args.driving, tmp):
            os.replace(tmp, wfp)
    log(f"Results: {wfp}")
    return wfp
