"""Measure the mAP cost of the int8 serving profiles.

Trains the 4-image synthetic overfit model (same recipes as
scripts/overfit_fasterrcnn.py / overfit_ssd.py, which reached
AP@[0.5:0.95] of 0.85 / 1.00) and then evaluates the SAME checkpoint
under each serving profile:

* float (the bf16/f32 serving default),
* ``int8_tail`` (Faster R-CNN only),
* ``int8_trunk`` / full-int8.

Prints one JSON line with the AP table and the deltas vs float, giving
the "few tenths of a point" post-training-quantization claim a measured
number on this hardware.

Usage: python scripts/int8_accuracy.py [frcnn|ssd] [steps]
(defaults: frcnn, 3000 / ssd 2500)
"""
import copy
import io
import json
import os
import sys
import tempfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

family = sys.argv[1] if len(sys.argv) > 1 else "frcnn"
default_steps = {"frcnn": 3000, "ssd": 2500}[family]
steps = int(sys.argv[2]) if len(sys.argv) > 2 else default_steps

tmp = tempfile.mkdtemp()
from luminoth_tpu.formats.example_pb import encode_sequence_example
from luminoth_tpu.formats.tfrecord import TFRecordWriter

side = 160 if family == "frcnn" else 300
s = side / 160.0
with TFRecordWriter(os.path.join(tmp, "train.tfrecords")) as w:
    for i in range(4):
        arr = np.full((side, side, 3), 30, np.uint8)
        x0, y0 = int((10 + 20 * i) * s), int((15 + 10 * i) * s)
        d0 = int(50 * s)
        arr[y0:y0 + d0, x0:x0 + d0] = 250
        x1, y1 = int((90 - 5 * i) * s), int((95 - 8 * i) * s)
        dx, dy = int(60 * s), int(40 * s)
        arr[y1:y1 + dy, x1:x1 + dx, 0] = 200
        boxes = [[x0, y0, x0 + d0, y0 + d0, 0], [x1, y1, x1 + dx, y1 + dy, 1]]
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        w.write(encode_sequence_example(
            {"image_raw": buf.getvalue(), "filename": f"i{i}.png".encode(),
             "width": side, "height": side, "depth": 3},
            {"label": [[b[4]] for b in boxes],
             "xmin": [[b[0]] for b in boxes], "ymin": [[b[1]] for b in boxes],
             "xmax": [[b[2]] for b in boxes], "ymax": [[b[3]] for b in boxes]}))

from luminoth_tpu.utils.config import (
    Config, get_base_config, get_model_config, to_plain,
)
from luminoth_tpu import train as train_module

if family == "frcnn":
    from luminoth_tpu.models.fasterrcnn import FasterRCNN as Model

    cfg = get_model_config(get_base_config(Model), Config({}), [])
    cfg.model.network.num_classes = 2
    cfg.model.base_network.architecture = "resnet_v1_50"
    cfg.model.rpn.proposals.pre_nms_top_n = 1024
    cfg.model.rpn.proposals.post_nms_top_n = 128
    cfg.model.rpn.target.minibatch_size = 64
    cfg.model.rcnn.target.minibatch_size = 32
    cfg.model.rcnn.proposals.total_max_detections = 8
    cfg.model.rcnn.proposals.class_max_detections = 8
    cfg.model.rcnn.proposals.min_prob_threshold = 0.0
    cfg.dataset.image_preprocessing = Config(
        {"min_size": side, "max_size": side}
    )
    cfg.train.learning_rate = Config({
        "decay_method": "piecewise_constant",
        "boundaries": [steps // 2, (steps * 4) // 5],
        "values": [3e-4, 1e-4, 3e-5],
    })
    profiles = {
        "float": {},
        "int8_tail": {"int8_tail": True},
        "int8_full": {"int8_tail": True, "int8_trunk": True},
        # what --profile fast ships: static calibrated scales
        "int8_tail_static": {"int8_tail": True, "int8_static": True},
    }
else:
    from luminoth_tpu.models.ssd import SSD as Model

    cfg = get_model_config(get_base_config(Model), Config({}), [])
    cfg.model.network.num_classes = 2
    cfg.model.proposals.min_prob_threshold = 0.0
    cfg.train.learning_rate = Config({
        "decay_method": "piecewise_constant",
        "boundaries": [(steps * 12) // 25, (steps * 4) // 5],
        "values": [1e-3, 3e-4, 1e-4],
    })
    profiles = {
        "float": {},
        "int8_trunk": {"int8_trunk": True},
        "int8_trunk_static": {"int8_trunk": True, "int8_static": True},
    }

cfg.dataset.dir = tmp
cfg.dataset.max_gt_boxes = 8
cfg.dataset.data_augmentation = []
cfg.train.batch_size = 4
cfg.train.num_epochs = steps + 1
cfg.train.job_dir = os.path.join(tmp, "jobs")
cfg.train.run_name = "int8_acc"
cfg.train.save_checkpoint_secs = 10 ** 9
cfg.train.save_summaries_secs = 10 ** 9
cfg.train.log_every_steps = 200
cfg.train.clip_by_norm = True
cfg.train.optimizer = Config({"type": "momentum", "momentum": 0.9})
cfg.train.seed = 1

import logging

logging.basicConfig(level=logging.INFO)
state = train_module.run(cfg, max_steps=steps)
print("trained to step", int(state.step))

from luminoth_tpu.eval import evaluate_once

variables = {"params": state.params}
if state.batch_stats:
    variables["batch_stats"] = state.batch_stats
cfg.train.random_shuffle = False

table = {}
for name, flags in profiles.items():
    pcfg = copy.deepcopy(cfg)
    for k, v in flags.items():
        pcfg.model.base_network[k] = v
    pvars = variables
    if flags.get("int8_static"):
        # calibrate on one real (training) batch, like the predictor
        import jax
        import jax.numpy as jnp

        from luminoth_tpu.datasets import ObjectDetectionDataset

        ds = ObjectDetectionDataset(
            pcfg, shuffle=False, num_epochs=1, augment=False
        )
        batch = next(iter(ds))
        _, upd = Model(to_plain(pcfg)).apply(
            variables, jnp.asarray(batch["image"], jnp.float32),
            train=False, mutable=["int8_stats"],
        )
        pvars = {**variables, "int8_stats": upd["int8_stats"]}
    metrics = evaluate_once(pcfg, Model(to_plain(pcfg)), pvars)
    table[name] = {k: round(float(v), 4) for k, v in metrics.items()}

result = {"family": family, "steps": steps, "profiles": table}
base = table["float"]
result["delta_vs_float"] = {
    name: {k: round(t[k] - base[k], 4) for k in t}
    for name, t in table.items() if name != "float"
}
print(json.dumps(result))
