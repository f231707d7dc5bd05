"""Debug visualisation helpers (reference: src/utils/viz.py).

Host-side only — these annotate numpy frames for inspection; nothing here
touches the device path.
"""

from __future__ import annotations

import numpy as np


def viz_lmk(img: np.ndarray, pts, radius: int = 1, thickness: int = 1,
            color=(0, 255, 0)) -> np.ndarray:
    """Return a copy of ``img`` with ``pts`` drawn as circles.

    Mirrors src/utils/viz.py::viz_lmk (green dots, radius/thickness
    kwargs).  ``pts`` is any (N, 2+) array-like of x, y coordinates.
    """
    import cv2

    out = np.ascontiguousarray(img).copy()
    for pt in np.asarray(pts):
        cv2.circle(out, (int(pt[0]), int(pt[1])), radius=radius,
                   color=color, thickness=thickness, lineType=cv2.LINE_8)
    return out
