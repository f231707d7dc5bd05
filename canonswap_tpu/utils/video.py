"""Video decode / encode with double-buffered batch prefetch.

TPU-first redesign of reference src/utils/video.py: instead of loading whole
videos into python lists and looping frame-by-frame (can_swap_pipeline_e2e.py:
150-163, 223), ``BatchedVideoReader`` streams fixed-shape frame batches on a
background thread so host decode overlaps device compute (the double-buffered
host I/O of SURVEY.md §7 step 6).

Encode uses cv2.VideoWriter (mp4v) since this environment ships no ffmpeg
binary; when an ffmpeg binary is present, audio muxing and libx264 encoding
are used automatically.
"""

from __future__ import annotations

import os.path as osp
import queue
import shutil
import subprocess
import threading
from collections.abc import Iterator

import cv2
import numpy as np

FFMPEG = shutil.which("ffmpeg")
FFPROBE = shutil.which("ffprobe")


def get_fps(path: str, default_fps: float = 25.0) -> float:
    try:
        fps = cv2.VideoCapture(path).get(cv2.CAP_PROP_FPS)
        return fps if fps else default_fps
    except Exception:
        return default_fps


def load_video(path: str, n_frames: int = -1) -> list[np.ndarray]:
    """Decode a video to a list of RGB frames (reference io.py:19-29)."""
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"Cannot open video: {path}")
    frames = []
    while n_frames < 0 or len(frames) < n_frames:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    return frames


def iter_video(path: str) -> Iterator[np.ndarray]:
    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise FileNotFoundError(f"Cannot open video: {path}")
    try:
        while True:
            ok, frame = cap.read()
            if not ok:
                return
            yield cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
    finally:
        cap.release()


class BatchedVideoReader:
    """Streams (batch, ...) frame stacks with background prefetch.

    The final batch is padded by repeating the last frame so every device
    step sees the same shape (no recompiles); ``valid`` gives the true count.
    """

    def __init__(self, path: str, batch_size: int, prefetch: int = 2):
        self.batch_size = batch_size
        self.fps = get_fps(path)
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._thread = threading.Thread(
            target=self._worker, args=(path,), daemon=True
        )
        self._thread.start()

    def _worker(self, path):
        buf = []
        try:
            for frame in iter_video(path):
                buf.append(frame)
                if len(buf) == self.batch_size:
                    self._q.put((np.stack(buf), self.batch_size))
                    buf = []
            if buf:
                valid = len(buf)
                while len(buf) < self.batch_size:
                    buf.append(buf[-1])
                self._q.put((np.stack(buf), valid))
        finally:
            self._q.put(None)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            yield item  # (frames (B, H, W, 3) uint8 RGB, valid count)


class VideoWriterRGB:
    """Incremental mp4 writer (RGB in). libx264+crf via ffmpeg when present,
    else cv2 mp4v (reference video.py:25-47 equivalent)."""

    def __init__(self, path: str, fps: float, crf: int = 18):
        self.path = path
        self.fps = fps
        self.crf = crf
        self._writer = None
        self._proc = None

    def _open(self, h, w):
        if FFMPEG:
            cmd = [
                FFMPEG, "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
                "-s", f"{w}x{h}", "-r", str(self.fps), "-i", "-",
                "-c:v", "libx264", "-crf", str(self.crf),
                "-pix_fmt", "yuv420p", self.path,
            ]
            self._proc = subprocess.Popen(
                cmd, stdin=subprocess.PIPE,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            )
        else:
            self._writer = cv2.VideoWriter(
                self.path, cv2.VideoWriter_fourcc(*"mp4v"), self.fps, (w, h)
            )

    def write(self, frame_rgb: np.ndarray):
        h, w = frame_rgb.shape[:2]
        if self._writer is None and self._proc is None:
            self._open(h, w)
        if self._proc is not None:
            self._proc.stdin.write(
                np.ascontiguousarray(frame_rgb, dtype=np.uint8).tobytes()
            )
        else:
            self._writer.write(cv2.cvtColor(frame_rgb, cv2.COLOR_RGB2BGR))

    def close(self):
        if self._proc is not None:
            self._proc.stdin.close()
            self._proc.wait()
        if self._writer is not None:
            self._writer.release()


def images2video(images, wfp: str, fps: float = 25.0, crf: int = 18):
    w = VideoWriterRGB(wfp, fps, crf)
    for img in images:
        w.write(img)
    w.close()


def concat_frames(*frame_lists) -> list[np.ndarray]:
    """Horizontally concat per-frame debug strips, resizing each stream to
    the first stream's height (reference video.py:84-109 equivalent)."""
    n = min(len(lst) for lst in frame_lists)
    out = []
    for i in range(n):
        ref_h = frame_lists[0][i].shape[0]
        row = []
        for lst in frame_lists:
            f = lst[i]
            if f.shape[0] != ref_h:
                scale = ref_h / f.shape[0]
                f = cv2.resize(f, (int(f.shape[1] * scale), ref_h))
            row.append(f)
        out.append(np.concatenate(row, axis=1))
    return out


def has_audio_stream(path: str) -> bool:
    if not FFPROBE or osp.isdir(path):
        return False
    try:
        r = subprocess.run(
            [FFPROBE, "-v", "error", "-select_streams", "a",
             "-show_entries", "stream=codec_type",
             "-of", "default=noprint_wrappers=1:nokey=1", path],
            capture_output=True, text=True,
        )
        return bool(r.stdout.strip())
    except Exception:
        return False


def add_audio_to_video(silent: str, audio_src: str, out: str) -> bool:
    if not FFMPEG:
        return False
    try:
        subprocess.run(
            [FFMPEG, "-y", "-i", silent, "-i", audio_src, "-map", "0:v",
             "-map", "1:a", "-c:v", "copy", "-shortest", out],
            check=True, capture_output=True,
        )
        return True
    except Exception:
        return False
