"""ctypes loader for the native C++ host library (native/canonswap_native.cpp).

Builds on demand with g++ (cached .so under native/build/), exposes numpy
wrappers, and degrades gracefully: ``available()`` is False when no compiler
exists, and callers fall back to the numpy/cv2 paths.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import shutil
import subprocess

import numpy as np

_REPO = osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__))))
_SRC = osp.join(_REPO, "native", "canonswap_native.cpp")
_BUILD = osp.join(_REPO, "native", "build")
_SO = osp.join(_BUILD, "libcanonswap_native.so")

_lib = None
_tried = False


def _build() -> bool:
    gxx = shutil.which("g++")
    if gxx is None or not osp.exists(_SRC):
        return False
    os.makedirs(_BUILD, exist_ok=True)
    cmd = [gxx, "-O3", "-march=native", "-shared", "-fPIC", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except subprocess.CalledProcessError:
        # retry without -march=native (portability)
        try:
            subprocess.run(
                [gxx, "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
                check=True, capture_output=True,
            )
            return True
        except subprocess.CalledProcessError:
            return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not osp.exists(_SO) or osp.getmtime(_SO) < osp.getmtime(_SRC):
        if not _build():
            return None
    lib = ctypes.CDLL(_SO)
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    c = ctypes.c_int

    lib.paste_back.argtypes = [f32p, c, c, f32p, u8p, c, c, f32p, u8p]
    lib.paste_back.restype = None
    lib.ms_deform_attn_forward.argtypes = [
        f32p, i64p, f32p, f32p, c, c, c, c, c, c, c, f32p,
    ]
    lib.ms_deform_attn_forward.restype = None
    lib.frames_to_float01.argtypes = [u8p, ctypes.c_int64, f32p]
    lib.frames_to_float01.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def paste_back(crop: np.ndarray, M_c2o: np.ndarray, ori: np.ndarray,
               mask: np.ndarray) -> np.ndarray:
    """Fused warp+blend paste-back. crop (ch,cw,3) float/uint8; M_c2o 2x3 or
    3x3; ori (oh,ow,3) uint8; mask (oh,ow) or (oh,ow,{1,3}) float."""
    lib = _load()
    assert lib is not None
    crop = np.ascontiguousarray(crop, np.float32)
    if mask.ndim == 3:
        mask = mask[..., 0]
    mask = np.ascontiguousarray(mask, np.float32)
    ori = np.ascontiguousarray(ori, np.uint8)
    M = np.ascontiguousarray(np.asarray(M_c2o, np.float32)[:2].reshape(6))
    oh, ow = ori.shape[:2]
    out = np.empty_like(ori)
    lib.paste_back(crop, crop.shape[0], crop.shape[1], M, ori, oh, ow, mask, out)
    return out


def ms_deform_attn(value: np.ndarray, spatial_shapes, loc: np.ndarray,
                   attn: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    value = np.ascontiguousarray(value, np.float32)
    loc = np.ascontiguousarray(loc, np.float32)
    attn = np.ascontiguousarray(attn, np.float32)
    shapes = np.ascontiguousarray(np.asarray(spatial_shapes, np.int64))
    n, lin, m, d = value.shape
    _, lq, _, L, p, _ = loc.shape
    out = np.zeros((n, lq, m * d), np.float32)
    lib.ms_deform_attn_forward(
        value, shapes, loc, attn, n, lin, m, d, L, lq, p, out
    )
    return out


def frames_to_float01(frames: np.ndarray) -> np.ndarray:
    lib = _load()
    assert lib is not None
    frames = np.ascontiguousarray(frames, np.uint8)
    out = np.empty(frames.shape, np.float32)
    lib.frames_to_float01(frames, frames.size, out.reshape(-1))
    return out
