"""Video I/O utilities + weight-converter helper tests."""

import numpy as np

from canonswap_tpu.runtime import weights as W
from canonswap_tpu.utils import video as V


def test_batched_video_reader_pads_final_batch(tmp_path):
    import cv2

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (32, 32))
    rng = np.random.default_rng(0)
    for _ in range(5):
        w.write(rng.integers(0, 255, (32, 32, 3), np.uint8))
    w.release()

    reader = V.BatchedVideoReader(path, batch_size=4)
    batches = list(reader)
    assert len(batches) == 2
    assert batches[0][0].shape == (4, 32, 32, 3) and batches[0][1] == 4
    assert batches[1][0].shape == (4, 32, 32, 3) and batches[1][1] == 1
    # padding repeats the last frame
    np.testing.assert_array_equal(batches[1][0][1], batches[1][0][0])


def test_concat_frames_resizes_to_first_stream():
    a = [np.zeros((16, 16, 3), np.uint8)]
    b = [np.ones((32, 32, 3), np.uint8) * 255]
    rows = V.concat_frames(a, b)
    assert rows[0].shape == (16, 32, 3)


def test_images2video_roundtrip(tmp_path):
    import cv2

    frames = [
        np.full((32, 32, 3), i * 60, np.uint8) for i in range(4)
    ]
    path = str(tmp_path / "out.mp4")
    V.images2video(frames, path, fps=25)
    cap = cv2.VideoCapture(path)
    n = 0
    while cap.read()[0]:
        n += 1
    assert n == 4


def test_strip_prefixes():
    sd = {
        "module.layer.weight": np.ones(2),
        "_orig_mod.other.bias": np.zeros(2),
        "plain": np.ones(1),
    }
    out = W.strip_prefixes(sd)
    assert set(out) == {"layer.weight", "other.bias", "plain"}


def test_tree_builder_nested_paths():
    tb = W._TreeBuilder()
    tb.put("a/b/c", {"kernel": np.ones((2, 2))})
    tb.put("a/d", {"bias": np.zeros(3)})
    v = tb.variables()
    assert v["params"]["a"]["b"]["c"]["kernel"].shape == (2, 2)
    assert v["params"]["a"]["d"]["bias"].shape == (3,)
