"""Detector API tests (network stubbed)."""

import numpy as np
import pytest

import luminoth_tpu.tasks as tasks_module


class StubNetwork:
    def __init__(self, config, class_labels=None):
        self.calls = []

    def predict_batch(self, images, pad_to=None):
        self.calls.append((len(images), pad_to))
        out = []
        for i, _ in enumerate(images):
            out.append(
                [
                    {"bbox": [0, 0, 5, 5], "label": "cat", "prob": 0.9},
                    {"bbox": [1, 1, 6, 6], "label": "dog", "prob": 0.4},
                ]
            )
        return out


@pytest.fixture
def detector(monkeypatch, tmp_path):
    monkeypatch.setattr(tasks_module, "PredictorNetwork", StubNetwork)
    monkeypatch.setattr(
        tasks_module, "get_config", lambda c: {"model": {"type": "x"}}
    )
    return tasks_module.Detector(config="fake.yml")


def test_single_image(detector):
    objects = detector.predict(np.zeros((4, 4, 3)))
    # default prob 0.7 filters the dog
    assert objects == [{"bbox": [0, 0, 5, 5], "label": "cat", "prob": 0.9}]


def test_prob_and_class_filters(detector):
    objects = detector.predict(np.zeros((4, 4, 3)), prob=0.3)
    assert len(objects) == 2
    objects = detector.predict(
        np.zeros((4, 4, 3)), prob=0.3, classes=["dog"]
    )
    assert [o["label"] for o in objects] == ["dog"]


def test_list_chunks_into_pow2_buckets(detector):
    images = [np.zeros((4, 4, 3))] * 11
    results = detector.predict(images, prob=0.3)
    assert len(results) == 11
    # 11 → chunks of 8 (pad 8) and 3 (pad 4).
    assert detector._network.calls == [(8, 8), (3, 4)]


def test_mutually_exclusive_args():
    with pytest.raises(ValueError):
        tasks_module.Detector(checkpoint="a", config="b")
