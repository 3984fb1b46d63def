"""Video prediction path: frame batching, JSON structure, media output."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from luminoth_tpu.predict import predict_video, resolve_files, get_file_type


class FakeNetwork:
    def __init__(self):
        self.batches = []

    def predict_batch(self, frames, pad_to=None):
        self.batches.append(len(frames))
        return [
            [{"bbox": [1.0, 1.0, 10.0, 10.0], "label": "x", "prob": 0.9}]
            for _ in frames
        ]


def write_video(path, frames=7, size=(32, 24)):
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(path, fourcc, 10, size)
    rng = np.random.RandomState(0)
    for _ in range(frames):
        writer.write(rng.randint(0, 255, (size[1], size[0], 3), np.uint8))
    writer.release()


def test_predict_video_batches_frames(tmp_path):
    video_path = str(tmp_path / "in.mp4")
    write_video(video_path, frames=7)
    network = FakeNetwork()
    out_path = str(tmp_path / "out.mp4")
    results = predict_video(
        network, video_path, save_path=out_path, batch_size=4
    )
    assert len(results) == 7
    assert [r["frame"] for r in results] == list(range(7))
    assert all(len(r["objects"]) == 1 for r in results)
    # 7 frames at batch 4 → one full batch + remainder of 3.
    assert network.batches == [4, 3]
    assert os.path.exists(out_path)


def test_file_type_and_resolve(tmp_path):
    assert get_file_type("a.mp4") == "video"
    assert get_file_type("a.JPG") == "image"
    assert get_file_type("a.txt") is None
    (tmp_path / "x.jpg").write_bytes(b"")
    (tmp_path / "y.mov").write_bytes(b"")
    (tmp_path / "z.doc").write_bytes(b"")
    files = resolve_files(str(tmp_path))
    assert len(files) == 2
