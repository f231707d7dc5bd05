"""Crop orchestration with frame-to-frame landmark tracking.

Equivalent of the reference Cropper (src/utils/cropper.py:43-369): frame 0
runs detection + 106-pt landmarks, every frame is refined by the 203-pt
landmark net tracking from the previous frame's landmarks, then the eye-lip
similarity crop is applied.  The per-face-miss policy (reuse last landmark =
built-in tracking recovery, cropper.py:190) is preserved.
"""

from __future__ import annotations

import dataclasses

import cv2
import numpy as np

from canonswap_tpu.configs.pipeline_config import CropConfig
from canonswap_tpu.models.landmark import Landmark203Runner
from canonswap_tpu.runtime.face_analysis import FaceAnalysis
from canonswap_tpu.utils import geometry as G


@dataclasses.dataclass
class Trajectory:
    start: int = -1
    end: int = -1
    lmk_lst: list = dataclasses.field(default_factory=list)
    lmk_crop_lst: list = dataclasses.field(default_factory=list)
    frame_rgb_lst: list = dataclasses.field(default_factory=list)
    frame_rgb_crop_lst: list = dataclasses.field(default_factory=list)
    bbox_lst: list = dataclasses.field(default_factory=list)
    M_c2o_lst: list = dataclasses.field(default_factory=list)
    M_o2c_lst: list = dataclasses.field(default_factory=list)


class Cropper:
    def __init__(
        self,
        crop_cfg: CropConfig,
        face_analysis: FaceAnalysis,
        landmark_runner: Landmark203Runner,
        network_input_size: int = 256,
        image_type: str = "human_face",
        animal_landmark_runner=None,
    ):
        """``image_type='animal_face'`` routes frame-0 landmarks through the
        UniPose animal runner (models.xpose.XPoseRunner), mirroring the
        reference gate at cropper.py:80-88,100-140; human faces keep the
        SCRFD + 106-pt path."""
        self.crop_cfg = crop_cfg
        self.face_analysis = face_analysis
        self.landmark_runner = landmark_runner
        self.network_input_size = network_input_size
        self.image_type = image_type
        self.animal_landmark_runner = animal_landmark_runner
        if image_type == "animal_face" and animal_landmark_runner is None:
            raise ValueError(
                "image_type='animal_face' needs an XPoseRunner "
                "(models.xpose) with its CLIP embedding cache")

    def _detect_lmk(self, frame_rgb: np.ndarray):
        if self.image_type == "animal_face":
            # 'animal_face_9' -> 9-pt 'animal_face' prompt,
            # 'animal_face_68' -> 68-pt 'face' prompt (cropper.py:128-140)
            n = 9 if getattr(
                self.crop_cfg, "animal_face_type", "animal_face_9"
            ) == "animal_face_9" else 68
            return self.animal_landmark_runner.run(
                frame_rgb, num_keypoints=n,
                box_threshold=0.0, iou_threshold=0.0)
        faces = self.face_analysis.get(
            frame_rgb,
            flag_do_landmark_2d_106=True,
            direction=self.crop_cfg.direction,
            max_face_num=self.crop_cfg.max_face_num,
        )
        if not faces:
            return None
        return faces[0].landmark_2d_106

    def crop_source_image(self, img_rgb: np.ndarray, lmk=None):
        """Single-image crop (cropper.py:95-164). Returns None if no face."""
        cfg = self.crop_cfg
        if lmk is None:
            lmk = self._detect_lmk(img_rgb)
            if lmk is None:
                return None
        ret = G.crop_image(
            img_rgb, lmk, dsize=cfg.dsize, scale=cfg.scale,
            vx_ratio=cfg.vx_ratio, vy_ratio=cfg.vy_ratio,
            flag_do_rot=cfg.flag_do_rot,
        )
        nis = self.network_input_size
        ret["img_crop_256x256"] = cv2.resize(
            ret["img_crop"], (nis, nis), interpolation=cv2.INTER_AREA
        )
        if self.image_type == "human_face":
            # 203-pt refinement is a human-face net; animal faces keep the
            # XPose landmarks as lmk_crop (reference cropper.py:158-165)
            lmk = self.landmark_runner.run(img_rgb, lmk)
            ret["lmk_crop"] = lmk
            ret["lmk_crop_256x256"] = ret["lmk_crop"] * nis / cfg.dsize
        else:
            ret["lmk_crop"] = lmk
        return ret

    def crop_source_video(self, frames_rgb, crop_cfg: CropConfig | None = None):
        """Tracking crop over a frame sequence (cropper.py:167-222)."""
        cfg = crop_cfg or self.crop_cfg
        traj = Trajectory()
        for idx, frame in enumerate(frames_rgb):
            if self.image_type != "human_face":
                # the 203-pt tracker is a human-face net: animal videos
                # re-detect with XPose each frame, reusing the previous
                # landmarks on a miss (the human path's recovery policy)
                lmk = self._detect_lmk(frame)
                if lmk is None:
                    if traj.start == -1:
                        continue
                    lmk = traj.lmk_lst[-1]
                elif traj.start == -1:
                    traj.start = idx
                traj.end = idx
            elif idx == 0 or traj.start == -1:
                lmk106 = self._detect_lmk(frame)
                if lmk106 is None:
                    continue
                lmk = self.landmark_runner.run(frame, lmk106)
                traj.start, traj.end = idx, idx
            else:
                lmk = self.landmark_runner.run(frame, traj.lmk_lst[-1])
                traj.end = idx
            traj.lmk_lst.append(lmk)

            ret = G.crop_image(
                frame, lmk, dsize=cfg.dsize, scale=cfg.scale,
                vx_ratio=cfg.vx_ratio, vy_ratio=cfg.vy_ratio,
                flag_do_rot=cfg.flag_do_rot,
            )
            nis = self.network_input_size
            crop256 = cv2.resize(
                ret["img_crop"], (nis, nis), interpolation=cv2.INTER_AREA
            )
            traj.frame_rgb_crop_lst.append(crop256)
            traj.lmk_crop_lst.append(lmk * nis / cfg.dsize)
            traj.M_c2o_lst.append(ret["M_c2o"])
            traj.M_o2c_lst.append(ret["M_o2c"])

        return {
            "frame_crop_lst": traj.frame_rgb_crop_lst,
            "lmk_crop_lst": traj.lmk_crop_lst,
            "M_c2o_lst": traj.M_c2o_lst,
            "M_o2c_lst": traj.M_o2c_lst,
        }

    def crop_driving_video(self, driving_rgb_lst, dsize: int = 512):
        """Global averaged-bbox crop of a driving video (reference
        cropper.py:225-283): track landmarks per frame, take the MEAN of the
        per-frame face bboxes (its own scale/vx/vy knobs —
        scale_crop_driving_video family in CropConfig), then crop every frame
        with that single axis-aligned box.  Keeps the driving face static in
        the crop; used when the driving head moves through the frame."""
        cfg = self.crop_cfg
        traj = Trajectory()
        for idx, frame in enumerate(driving_rgb_lst):
            if idx == 0 or traj.start == -1:
                lmk106 = self._detect_lmk(frame)
                if lmk106 is None:
                    continue
                lmk = (self.landmark_runner.run(frame, lmk106)
                       if self.image_type == "human_face" else lmk106)
                traj.start, traj.end = idx, idx
            elif self.image_type == "human_face":
                lmk = self.landmark_runner.run(frame, traj.lmk_lst[-1])
                traj.end = idx
            else:
                lmk = self._detect_lmk(frame)
                if lmk is None:
                    lmk = traj.lmk_lst[-1]
                traj.end = idx
            traj.lmk_lst.append(lmk)
            ret_bbox = G.parse_bbox_from_landmark(
                lmk,
                scale=cfg.scale_crop_driving_video,
                vx_ratio=cfg.vx_ratio_crop_driving_video,
                vy_ratio=cfg.vy_ratio_crop_driving_video,
            )["bbox"]
            traj.bbox_lst.append(
                [ret_bbox[0, 0], ret_bbox[0, 1], ret_bbox[2, 0],
                 ret_bbox[2, 1]])
            traj.frame_rgb_lst.append(frame)

        global_bbox = G.average_bbox(traj.bbox_lst)
        for frame, lmk in zip(traj.frame_rgb_lst, traj.lmk_lst):
            ret = G.crop_image_by_bbox(frame, global_bbox, lmk=lmk,
                                       dsize=dsize)
            traj.frame_rgb_crop_lst.append(ret["img_crop"])
            traj.lmk_crop_lst.append(ret["lmk_crop"])
        return {
            "frame_crop_lst": traj.frame_rgb_crop_lst,
            "lmk_crop_lst": traj.lmk_crop_lst,
            "M_c2o_lst": [],
        }

    def crop_video_with_mo2c(self, frames_rgb, mo2c_lst,
                             crop_cfg: CropConfig | None = None):
        """Crop a video with per-frame PRE-COMPUTED original->crop transforms
        (reference cropper.py:285-341): landmarks are tracked as usual but
        the geometry comes from ``mo2c_lst`` — reusing another pass's crop
        windows so two videos stay pixel-aligned."""
        cfg = crop_cfg or self.crop_cfg
        traj = Trajectory()
        for idx, frame in enumerate(frames_rgb):
            if idx == 0 or traj.start == -1:
                lmk106 = self._detect_lmk(frame)
                if lmk106 is None:
                    continue
                lmk = (self.landmark_runner.run(frame, lmk106)
                       if self.image_type == "human_face" else lmk106)
                traj.start, traj.end = idx, idx
            elif self.image_type == "human_face":
                lmk = self.landmark_runner.run(frame, traj.lmk_lst[-1])
                traj.end = idx
            else:
                lmk = self._detect_lmk(frame)
                if lmk is None:
                    lmk = traj.lmk_lst[-1]
                traj.end = idx
            traj.lmk_lst.append(lmk)

            ret = G.crop_image_mo2c(frame, lmk, mo2c_lst[idx],
                                    dsize=cfg.dsize)
            nis = self.network_input_size
            crop = cv2.resize(ret["img_crop"], (nis, nis),
                              interpolation=cv2.INTER_AREA)
            traj.frame_rgb_crop_lst.append(crop)
            traj.lmk_crop_lst.append(lmk * nis / cfg.dsize)
            traj.M_c2o_lst.append(ret["M_c2o"])
            traj.M_o2c_lst.append(ret["M_o2c"])
        return {
            "frame_crop_lst": traj.frame_rgb_crop_lst,
            "lmk_crop_lst": traj.lmk_crop_lst,
            "M_c2o_lst": traj.M_c2o_lst,
            "M_o2c_lst": traj.M_o2c_lst,
        }

    def calc_lmks_from_cropped_video(self, frames_rgb):
        """Landmark tracking only (cropper.py:343-369); raises on frame-0
        detection failure like the reference."""
        traj = Trajectory()
        for idx, frame in enumerate(frames_rgb):
            if idx == 0 or traj.start == -1:
                lmk106 = self._detect_lmk(frame)
                if lmk106 is None:
                    raise RuntimeError(f"No face detected in the frame #{idx}")
                lmk = self.landmark_runner.run(frame, lmk106)
                traj.start, traj.end = idx, idx
            else:
                lmk = self.landmark_runner.run(frame, traj.lmk_lst[-1])
                traj.end = idx
            traj.lmk_lst.append(lmk)
        return traj.lmk_lst
