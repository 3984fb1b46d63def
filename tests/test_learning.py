"""CI-pinned learning proof: train from scratch to AP@0.5 ≥ 0.8.

VERDICT r3 #2: the end-to-end train→eval path must FAIL if training
stops learning — a shape-level integration test passes with frozen
random weights. Both detector families overfit a 4-image synthetic
high-contrast scene (the scaled recipe from scripts/overfit_*.py, which
reached AP 1.0 on TPU) with Adam 1e-3; on the virtual-CPU test platform
the same recipe reaches AP@0.5 = 1.0 by 100 steps (TPU-measured
trajectory: FRCNN@96 0.85 @ 50 steps, SSD@160 0.72 @ 50, both 1.0 @
100). The assertion bar of 0.8 at 120 steps leaves margin for platform
reduction-order drift.

Reference bar this stands in for: the tutorial trains to AP@0.5 = 0.72
(reference docs/tutorial/05-evaluating-models.rst:84).
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from luminoth_tpu.formats.example_pb import encode_sequence_example
from luminoth_tpu.formats.tfrecord import TFRecordWriter
from luminoth_tpu.utils.config import (
    Config, get_base_config, get_model_config, to_plain,
)


def write_contrast_dataset(tmp_path, size):
    """4 images, 2 high-contrast boxes each (class 0 bright square,
    class 1 red rectangle) — the proven overfit scene scaled to
    ``size``."""
    s = size / 160.0
    with TFRecordWriter(str(tmp_path / "train.tfrecords")) as w:
        for i in range(4):
            arr = np.full((size, size, 3), 30, np.uint8)
            x0, y0 = int((10 + 20 * i) * s), int((15 + 10 * i) * s)
            d0 = int(50 * s)
            arr[y0:y0 + d0, x0:x0 + d0] = 250
            x1, y1 = int((90 - 5 * i) * s), int((95 - 8 * i) * s)
            w1, h1 = int(60 * s), int(40 * s)
            arr[y1:y1 + h1, x1:x1 + w1, 0] = 200
            boxes = [[x0, y0, x0 + d0, y0 + d0, 0],
                     [x1, y1, x1 + w1, y1 + h1, 1]]
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            w.write(encode_sequence_example(
                {"image_raw": buf.getvalue(),
                 "filename": f"i{i}.png".encode(),
                 "width": size, "height": size, "depth": 3},
                {"label": [[b[4]] for b in boxes],
                 "xmin": [[b[0]] for b in boxes],
                 "ymin": [[b[1]] for b in boxes],
                 "xmax": [[b[2]] for b in boxes],
                 "ymax": [[b[3]] for b in boxes]},
            ))
    return str(tmp_path)


def _common_train_cfg(cfg, data_dir, tmp_path, run_name):
    cfg.model.network.num_classes = 2
    cfg.dataset.dir = data_dir
    cfg.dataset.max_gt_boxes = 8
    cfg.dataset.data_augmentation = []
    cfg.train.batch_size = 4
    cfg.train.num_epochs = 10000
    cfg.train.job_dir = os.path.join(str(tmp_path), "jobs")
    cfg.train.run_name = run_name
    cfg.train.save_checkpoint_secs = 10**9
    cfg.train.save_summaries_secs = 10**9
    cfg.train.log_every_steps = 10**9
    cfg.train.learning_rate = Config({"learning_rate": 1e-3})
    cfg.train.clip_by_norm = True
    cfg.train.optimizer = Config({"type": "adam"})
    cfg.train.seed = 1
    return cfg


def _train_and_eval(cfg, model_cls, max_steps):
    from luminoth_tpu import train as train_module
    from luminoth_tpu.eval import evaluate_once

    state = train_module.run(cfg, max_steps=max_steps)
    assert int(state.step) == max_steps
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats
    model = model_cls(to_plain(cfg))
    ecfg = Config(to_plain(cfg))
    ecfg.train.random_shuffle = False
    return evaluate_once(ecfg, model, variables)


@pytest.mark.slow
def test_fasterrcnn_learns_to_ap80(tmp_path):
    from luminoth_tpu.models.fasterrcnn import FasterRCNN

    data_dir = write_contrast_dataset(tmp_path, size=96)
    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.base_network.architecture = "resnet_v1_50"
    cfg.model.rpn.proposals.pre_nms_top_n = 512
    cfg.model.rpn.proposals.post_nms_top_n = 64
    cfg.model.rpn.target.minibatch_size = 64
    cfg.model.rcnn.target.minibatch_size = 32
    cfg.model.rcnn.proposals.total_max_detections = 8
    cfg.model.rcnn.proposals.class_max_detections = 8
    cfg.model.rcnn.proposals.min_prob_threshold = 0.0
    cfg.dataset.image_preprocessing = Config(
        {"min_size": 96, "max_size": 96}
    )
    cfg = _common_train_cfg(cfg, data_dir, tmp_path, "learn_frcnn")

    metrics = _train_and_eval(cfg, FasterRCNN, max_steps=120)
    assert metrics["AP@0.5"] >= 0.8, metrics


@pytest.mark.slow
def test_ssd_learns_to_ap80(tmp_path):
    from luminoth_tpu.models.ssd import SSD

    data_dir = write_contrast_dataset(tmp_path, size=160)
    cfg = get_model_config(get_base_config(SSD), Config({}), [])
    cfg.model.proposals.min_prob_threshold = 0.0
    cfg.dataset.image_preprocessing = Config(
        {"fixed_height": 160, "fixed_width": 160}
    )
    cfg = _common_train_cfg(cfg, data_dir, tmp_path, "learn_ssd")

    metrics = _train_and_eval(cfg, SSD, max_steps=120)
    assert metrics["AP@0.5"] >= 0.8, metrics
