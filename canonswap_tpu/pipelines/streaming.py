"""Streaming video swap: overlapped decode -> device swap -> encode.

The pipeline-parallel analogue for this workload (SURVEY.md §2e): instead of
loading whole videos into RAM and running stages as separate passes
(reference can_swap_pipeline_e2e.py:150-283), three stages run concurrently
as a software pipeline over fixed-shape frame batches:

  [producer thread]  decode + landmark-track + crop      (host, cv2)
  [main thread]      motion + swap + parsing             (device, jitted)
  [consumer thread]  soft-mask paste-back + encode       (host, native/cv2)

Fixed batch shapes mean one compile; queues give double-buffering so host
I/O hides under device compute.  This is the BASELINE "long 1080p video"
configuration.
"""

from __future__ import annotations

import os
import os.path as osp
import queue
import threading

import numpy as np

from canonswap_tpu.configs.pipeline_config import ArgumentConfig
from canonswap_tpu.pipelines.session import FaceSwapSession
from canonswap_tpu.utils import geometry as G
from canonswap_tpu.utils import io as IO
from canonswap_tpu.utils import video as V
from canonswap_tpu.utils.rlog import log
from canonswap_tpu.utils.timing import StageTimer


def execute(session: FaceSwapSession, args: ArgumentConfig):
    inf_cfg = session.inference_cfg
    batch = inf_cfg.batch_size
    timer = StageTimer()

    source_rgb = IO.load_image_rgb(args.source)
    source_id = session.get_source_id(source_rgb)

    os.makedirs(args.output_dir, exist_ok=True)
    stem = f"{IO.basename(args.source)}--{IO.basename(args.driving)}_stream"
    wfp = osp.join(args.output_dir, f"{stem}.mp4")

    reader = V.BatchedVideoReader(args.driving, batch)
    writer = V.VideoWriterRGB(wfp, reader.fps, inf_cfg.crf)

    in_q: queue.Queue = queue.Queue(maxsize=2)
    out_q: queue.Queue = queue.Queue(maxsize=2)
    errors: list[BaseException] = []

    def producer():
        try:
            lmk = None
            for frames, valid in reader:
                crops, m_c2o = [], []
                with timer.stage("host/track+crop", items=valid):
                    for f in frames:
                        if lmk is None:
                            l106 = session.cropper._detect_lmk(f)
                            if l106 is None:
                                crops.append(
                                    np.zeros(
                                        (session.cropper.network_input_size,) * 2
                                        + (3,), np.uint8,
                                    )
                                )
                                m_c2o.append(np.eye(3, dtype=np.float32))
                                continue
                            lmk = session.landmark203.run(f, l106)
                        else:
                            lmk = session.landmark203.run(f, lmk)
                        ret = G.crop_image(
                            f, lmk, dsize=session.crop_cfg.dsize,
                            scale=session.crop_cfg.scale,
                            vy_ratio=session.crop_cfg.vy_ratio,
                            flag_do_rot=session.crop_cfg.flag_do_rot,
                        )
                        import cv2

                        nis = session.cropper.network_input_size
                        crops.append(
                            cv2.resize(ret["img_crop"], (nis, nis),
                                       interpolation=cv2.INTER_AREA)
                        )
                        m_c2o.append(ret["M_c2o"])
                in_q.put((frames, np.stack(crops), m_c2o, valid))
        except BaseException as e:  # surfaced in main thread
            errors.append(e)
        finally:
            in_q.put(None)

    def consumer():
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                frames, res, masks, m_c2o, valid = item
                with timer.stage("host/pasteback+encode", items=valid):
                    for j in range(valid):
                        mask3 = np.repeat(masks[j], 3, axis=-1)
                        mask_ori = G.prepare_paste_back(
                            mask3, m_c2o[j],
                            dsize=(frames[j].shape[1], frames[j].shape[0]),
                            if_float=True,
                        )
                        writer.write(
                            G.paste_back(res[j], m_c2o[j], frames[j], mask_ori)
                        )
        except BaseException as e:
            errors.append(e)

    tp = threading.Thread(target=producer, daemon=True)
    tc = threading.Thread(target=consumer, daemon=True)
    tp.start()
    tc.start()

    n_done = 0
    while True:
        item = in_q.get()
        if item is None:
            break
        frames, crops, m_c2o, valid = item
        with timer.stage("device/swap", items=valid):
            frames01 = session.prepare_frames(crops)
            out, _ = session.swap_with_motion(
                frames01, source_id, as_uint8=True
            )
            masks = session.parse_masks_uint8(crops).astype(np.float32) / 255.0
            res = np.asarray(out["out"])
        out_q.put((frames, res, masks, m_c2o, valid))
        n_done += valid
        if n_done % (batch * 8) == 0:
            log(f"streamed {n_done} frames")

    out_q.put(None)
    tp.join()
    tc.join()
    writer.close()
    if errors:
        raise errors[0]
    if V.has_audio_stream(args.driving):
        tmp = wfp + ".audio.mp4"
        if V.add_audio_to_video(wfp, args.driving, tmp):
            os.replace(tmp, wfp)
    log(f"Results: {wfp} ({n_done} frames)")
    log(timer.report())
    return wfp
