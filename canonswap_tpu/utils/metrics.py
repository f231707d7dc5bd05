"""Fidelity metrics: SSIM and identity cosine similarity.

Used to validate outputs against the PyTorch reference (BASELINE.md: ID
cosine >= 0.99 per frame, SSIM parity) once the real checkpoint is loaded,
and for regression tracking between our own versions.
"""

from __future__ import annotations

import numpy as np


def ssim(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    """Mean SSIM over channels, 8x8 uniform windows (Wang et al. defaults
    C1=(0.01L)^2, C2=(0.03L)^2).  a, b: (H, W, C) arrays."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    k = 8

    def pool(x):
        h, w = x.shape[:2]
        hh, ww = h - h % k, w - w % k
        x = x[:hh, :ww]
        return x.reshape(hh // k, k, ww // k, k, -1).mean(axis=(1, 3))

    mu_a, mu_b = pool(a), pool(b)
    var_a = pool(a * a) - mu_a**2
    var_b = pool(b * b) - mu_b**2
    cov = pool(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return float(np.mean(s))


def id_cosine(emb_a: np.ndarray, emb_b: np.ndarray) -> float:
    """Cosine similarity of (possibly unnormalized) ID embeddings."""
    a = np.asarray(emb_a, np.float64).reshape(-1)
    b = np.asarray(emb_b, np.float64).reshape(-1)
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def video_metrics(path_a: str, path_b: str, session=None) -> dict:
    """Frame-wise SSIM (and ID cosine when a session with ArcFace is given)
    between two videos; returns means + per-frame minima."""
    from canonswap_tpu.utils.video import iter_video

    ssims, cosines = [], []
    for fa, fb in zip(iter_video(path_a), iter_video(path_b)):
        if fa.shape != fb.shape:
            import cv2

            fb = cv2.resize(fb, (fa.shape[1], fa.shape[0]))
        ssims.append(ssim(fa, fb))
        if session is not None:
            try:
                ea = session.get_source_id(fa)
                eb = session.get_source_id(fb)
                cosines.append(id_cosine(np.asarray(ea), np.asarray(eb)))
            except RuntimeError:
                pass  # no face found in a frame
    out = {
        "ssim_mean": float(np.mean(ssims)) if ssims else None,
        "ssim_min": float(np.min(ssims)) if ssims else None,
        "frames": len(ssims),
    }
    if cosines:
        out["id_cosine_mean"] = float(np.mean(cosines))
        out["id_cosine_min"] = float(np.min(cosines))
    return out
