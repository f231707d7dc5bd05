"""Misc pipeline helpers (reference src/utils/helper.py equivalents)."""

from __future__ import annotations

import numpy as np


def calc_motion_multiplier(kp_source: np.ndarray,
                           kp_driving_initial: np.ndarray) -> float:
    """sqrt of convex-hull volume ratio between source and first driving
    keypoints (helper.py:29-42) — scales relative motion."""
    from scipy.spatial import ConvexHull

    src = np.asarray(kp_source).reshape(-1, 3)
    drv = np.asarray(kp_driving_initial).reshape(-1, 3)
    return float(np.sqrt(ConvexHull(src).volume) / np.sqrt(ConvexHull(drv).volume))


def is_square_video(video_path: str) -> bool:
    import cv2

    video = cv2.VideoCapture(video_path)
    w = int(video.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(video.get(cv2.CAP_PROP_FRAME_HEIGHT))
    video.release()
    return w == h
