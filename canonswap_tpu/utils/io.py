"""Image / template I/O (host side).

Equivalent of reference src/utils/io.py:12-117 minus imageio dependence:
cv2 handles images; video goes through utils/video.py.
"""

from __future__ import annotations

import os
import os.path as osp
import pickle

import cv2
import numpy as np

cv2.setNumThreads(0)  # the frame loops are parallelized at a higher level


def load_image_rgb(path: str) -> np.ndarray:
    if not osp.exists(path):
        raise FileNotFoundError(f"Image not found: {path}")
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise ValueError(f"Failed to decode image: {path}")
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def save_image_rgb(path: str, img: np.ndarray) -> None:
    os.makedirs(osp.dirname(osp.abspath(path)), exist_ok=True)
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))


def resize_to_limit(img: np.ndarray, max_dim: int = 1920, division: int = 2):
    """Cap the max dimension and force divisibility (io.py:37-60)."""
    h, w = img.shape[:2]
    if max_dim > 0 and max(h, w) > max_dim:
        if h > w:
            new_h, new_w = max_dim, int(w * (max_dim / h))
        else:
            new_h, new_w = int(h * (max_dim / w)), max_dim
        img = cv2.resize(img, (new_w, new_h))
    division = max(division, 1)
    nh = img.shape[0] - (img.shape[0] % division)
    nw = img.shape[1] - (img.shape[1] % division)
    if 0 < nh != img.shape[0] or 0 < nw != img.shape[1]:
        img = img[:nh, :nw]
    return img


def dump(path: str, obj) -> None:
    """Pickle/numpy template dump (motion-template cache)."""
    wd = osp.split(path)[0]
    if wd:
        os.makedirs(wd, exist_ok=True)
    if path.endswith((".pkl", ".pickle")):
        with open(path, "wb") as f:
            pickle.dump(obj, f)
    elif path.endswith(".npy"):
        np.save(path, obj)
    else:
        raise ValueError(f"Unknown template format: {path}")


def load(path: str):
    if path.endswith((".pkl", ".pickle")):
        with open(path, "rb") as f:
            return pickle.load(f)
    if path.endswith(".npy"):
        return np.load(path, allow_pickle=True)
    raise ValueError(f"Unknown template format: {path}")


IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
VIDEO_EXTS = (".mp4", ".mov", ".avi", ".webm", ".mkv")


def is_image(path: str) -> bool:
    return path.lower().endswith(IMAGE_EXTS)


def is_video(path: str) -> bool:
    return path.lower().endswith(VIDEO_EXTS) or osp.isdir(path)


def is_template(path: str) -> bool:
    return path.endswith(".pkl")


def basename(path: str) -> str:
    return osp.splitext(osp.basename(path))[0]
