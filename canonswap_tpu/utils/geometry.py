"""Host-side crop geometry: eye–lip-axis similarity transforms.

Scalar landmark math stays on host (numpy) — it is a handful of FLOPs per
frame and feeds the *device* batched warp (ops/affine.py).  Semantics follow
the reference's src/utils/crop.py:98-455: the crop axis runs from the eye
centre to the lip centre (cancelling roll), the crop box is the square
rotated bounding box of all landmarks scaled by ``scale`` and shifted by
``vx_ratio``/``vy_ratio`` along the face axes.

Landmark-index conventions (which points form the eye/lip centres for each
landmark count) match the reference exactly so crops are pixel-identical.
"""

from __future__ import annotations

import numpy as np

DTYPE = np.float32


def _eye_lip_points(pts: np.ndarray, use_lip: bool = True) -> np.ndarray:
    """Return the 2 anchor points (eye centre, lip centre) for any of the
    supported landmark counts (5/9/68/101/106/203)."""
    n = pts.shape[0]
    if n == 106:
        left_eye = pts[[33, 35, 40, 39]].mean(0)
        right_eye = pts[[87, 89, 94, 93]].mean(0)
        lip = (pts[52] + pts[61]) / 2
    elif n == 203:
        left_eye = pts[[0, 6, 12, 18]].mean(0)
        right_eye = pts[[24, 30, 36, 42]].mean(0)
        lip = (pts[48] + pts[66]) / 2
    elif n == 101 or n > 101:
        p = pts[:101]
        left_eye = p[[39, 42, 45, 48]].mean(0)
        right_eye = p[[51, 54, 57, 60]].mean(0)
        lip = (p[75] + p[81]) / 2
    elif n == 68:
        idx = np.array([31, 37, 40, 43, 46, 49, 55]) - 1
        left_eye = pts[idx[[1, 2]]].mean(0)
        right_eye = pts[idx[[3, 4]]].mean(0)
        lip = (pts[idx[5]] + pts[idx[6]]) / 2
    elif n == 5:
        left_eye, right_eye = pts[0], pts[1]
        lip = (pts[3] + pts[4]) / 2
    elif n == 9:
        left_eye = (pts[2] + pts[3]) / 2
        right_eye = (pts[0] + pts[1]) / 2
        lip = (pts[5] + pts[6]) / 2
    else:
        raise ValueError(f"unsupported landmark count: {n}")

    eye_center = (left_eye + right_eye) / 2
    if use_lip:
        return np.stack([eye_center, lip]).astype(DTYPE)
    # without lip: rotate the eye axis 90 deg clockwise to get a vertical axis
    pt2 = np.stack([left_eye, right_eye]).astype(DTYPE)
    v = pt2[1] - pt2[0]
    pt2[1] = [pt2[0, 0] - v[1], pt2[0, 1] + v[0]]
    return pt2


def parse_rect_from_landmark(
    pts: np.ndarray,
    scale: float = 1.5,
    vx_ratio: float = 0.0,
    vy_ratio: float = 0.0,
    use_lip: bool = True,
):
    """-> (center (2,), size (2,), angle rad) of the face-axis-aligned square
    covering all landmarks (reference crop.py:244-300)."""
    pt2 = _eye_lip_points(pts, use_lip)
    uy = pt2[1] - pt2[0]
    l = np.linalg.norm(uy)
    uy = np.array([0.0, 1.0], DTYPE) if l <= 1e-3 else uy / l
    ux = np.array([uy[1], -uy[0]], DTYPE)

    angle = float(np.arccos(np.clip(ux[0], -1, 1)))
    if ux[1] < 0:
        angle = -angle

    M = np.stack([ux, uy])
    center0 = pts.mean(0)
    rpts = (pts - center0) @ M.T
    lt, rb = rpts.min(0), rpts.max(0)
    center1 = (lt + rb) / 2
    size = rb - lt
    m = max(size[0], size[1])
    size = np.array([m, m], DTYPE) * scale
    center = center0 + ux * center1[0] + uy * center1[1]
    center = center + ux * (vx_ratio * size) + uy * (vy_ratio * size)
    return center.astype(DTYPE), size, angle


def estimate_similar_transform(
    pts: np.ndarray,
    dsize: int,
    scale: float = 1.5,
    vx_ratio: float = 0.0,
    vy_ratio: float = -0.1,
    flag_do_rot: bool = True,
    use_lip: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """Landmarks -> (M_o2c, M_c2o) 3x3 similarity transforms between the
    original image and the dsize x dsize crop (crop.py:381-426)."""
    center, size, angle = parse_rect_from_landmark(
        pts, scale=scale, vx_ratio=vx_ratio, vy_ratio=vy_ratio, use_lip=use_lip
    )
    s = dsize / max(float(size[0]), 1e-3)  # guard degenerate landmarks
    tc = dsize / 2.0
    if flag_do_rot:
        ct, st = np.cos(angle), np.sin(angle)
        cx, cy = center
        M = np.array(
            [
                [s * ct, s * st, tc - s * (ct * cx + st * cy)],
                [-s * st, s * ct, tc - s * (-st * cx + ct * cy)],
            ],
            DTYPE,
        )
    else:
        M = np.array(
            [[s, 0, tc - s * center[0]], [0, s, tc - s * center[1]]], DTYPE
        )
    M_o2c = np.vstack([M, np.array([0, 0, 1], DTYPE)])
    M_c2o = np.linalg.inv(M_o2c).astype(DTYPE)
    return M_o2c, M_c2o


def transform_pts(pts: np.ndarray, M: np.ndarray) -> np.ndarray:
    """Apply a 2x3/3x3 affine to Nx2 points."""
    return pts @ M[:2, :2].T + M[:2, 2]


def warp_affine(img: np.ndarray, M: np.ndarray, dsize) -> np.ndarray:
    """Host warp via cv2 (INTER_LINEAR, no border handling), matching the
    reference's _transform_img (crop.py:49-63).  ``dsize`` is (w, h) or int."""
    import cv2

    if not isinstance(dsize, (tuple, list)):
        dsize = (dsize, dsize)
    return cv2.warpAffine(img, M[:2, :], tuple(dsize), flags=cv2.INTER_LINEAR)


def parse_bbox_from_landmark(pts: np.ndarray, scale: float = 1.5,
                             vx_ratio: float = 0.0, vy_ratio: float = 0.0,
                             use_lip: bool = True) -> dict:
    """Landmarks -> face rect as axis-aligned + rotated corner sets
    (reference crop.py:303-332).  Used by the driving-video global-bbox
    crop; ``bbox`` rows are (lt, rt, rb, lb)."""
    center, size, angle = parse_rect_from_landmark(
        pts, scale=scale, vx_ratio=vx_ratio, vy_ratio=vy_ratio,
        use_lip=use_lip)
    cx, cy = center
    w, h = size
    bbox = np.array(
        [[cx - w / 2, cy - h / 2], [cx + w / 2, cy - h / 2],
         [cx + w / 2, cy + h / 2], [cx - w / 2, cy + h / 2]], DTYPE)
    R = np.array([[np.cos(angle), -np.sin(angle)],
                  [np.sin(angle), np.cos(angle)]], DTYPE)
    bbox_rot = (bbox - center) @ R.T + center
    return {"center": center, "size": size, "angle": angle,
            "bbox": bbox, "bbox_rot": bbox_rot}


def crop_image_mo2c(img: np.ndarray, pts: np.ndarray, mo2c: np.ndarray,
                    dsize: int = 224) -> dict:
    """Crop with a PRE-COMPUTED original->crop transform (reference
    crop.py:457-476): reuses another video's crop geometry frame-by-frame."""
    M = np.asarray(mo2c, DTYPE)[:2, :]
    M_o2c = np.vstack([M, np.array([0, 0, 1], DTYPE)])
    return {
        "img_crop": warp_affine(img, M, dsize),
        "pt_crop": transform_pts(pts, M),
        "M_o2c": M_o2c,
        "M_c2o": np.linalg.inv(M_o2c).astype(DTYPE),
    }


def crop_image(img: np.ndarray, pts: np.ndarray, dsize=224, scale=1.5,
               vx_ratio=0.0, vy_ratio=-0.1, flag_do_rot=True) -> dict:
    """Crop around landmarks (crop.py:429-455)."""
    M_o2c, M_c2o = estimate_similar_transform(
        pts, dsize=dsize, scale=scale, vx_ratio=vx_ratio, vy_ratio=vy_ratio,
        flag_do_rot=flag_do_rot
    )
    return {
        "img_crop": warp_affine(img, M_o2c, dsize),
        "pt_crop": transform_pts(pts, M_o2c),
        "M_o2c": M_o2c,
        "M_c2o": M_c2o,
    }


def crop_image_by_bbox(img, bbox, lmk=None, dsize=512) -> dict:
    """Axis-aligned bbox crop (crop.py:335-378, no-rotation branch)."""
    left, top, right, bot = bbox
    size = right - left
    s = dsize / size
    src_c = np.array([(left + right) / 2, (top + bot) / 2], DTYPE)
    M = np.array(
        [[s, 0, dsize / 2 - s * src_c[0]], [0, s, dsize / 2 - s * src_c[1]]],
        DTYPE,
    )
    M_o2c = np.vstack([M, np.array([0, 0, 1], DTYPE)])
    return {
        "img_crop": warp_affine(img, M, dsize),
        "lmk_crop": transform_pts(lmk, M) if lmk is not None else None,
        "M_o2c": M_o2c,
        "M_c2o": np.linalg.inv(M_o2c).astype(DTYPE),
    }


def average_bbox(bbox_lst):
    if not bbox_lst:
        return None
    return np.mean(np.asarray(bbox_lst), axis=0).tolist()


def prepare_paste_back(mask_crop, M_c2o, dsize, if_float=False):
    """Warp the crop-space mask into original-image space (crop.py:515-521)."""
    mask_ori = warp_affine(mask_crop, M_c2o, dsize)
    if not if_float:
        mask_ori = mask_ori.astype(np.float32) / 255.0
    return mask_ori


def paste_back(img_crop, M_c2o, img_ori, mask_ori):
    """Blend the swapped crop back into the original frame (crop.py:523-529).

    Dispatches to the fused native C++ path (runtime/native.py) when built;
    falls back to cv2 warp + numpy blend."""
    try:
        from canonswap_tpu.runtime import native as NAT

        if NAT.available() and img_ori.dtype == np.uint8:
            return NAT.paste_back(img_crop, M_c2o, img_ori, np.asarray(mask_ori))
    except Exception:
        pass
    dsize = (img_ori.shape[1], img_ori.shape[0])
    result = warp_affine(img_crop, M_c2o, dsize)
    return np.clip(
        mask_ori * result + (1 - mask_ori) * img_ori, 0, 255
    ).astype(np.uint8)
