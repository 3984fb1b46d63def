"""Reproducible verification script (run from the repo root on a TPU host).

See STATUS.md for the round-1 results this produced.
"""
import sys, io, os, json
import numpy as np
from PIL import Image

# Build a synthetic dataset: 4 images, each with 2 high-contrast boxes.
import tempfile
tmp = tempfile.mkdtemp()
from luminoth_tpu.formats.example_pb import encode_sequence_example
from luminoth_tpu.formats.tfrecord import TFRecordWriter

rng = np.random.RandomState(0)
boxes_per_img = []
with TFRecordWriter(os.path.join(tmp, "train.tfrecords")) as w:
    for i in range(4):
        arr = np.full((160, 160, 3), 30, np.uint8)
        # class 0: bright square; class 1: dark-red rectangle
        x0, y0 = 10 + 20*i, 15 + 10*i
        arr[y0:y0+50, x0:x0+50] = 250
        x1, y1 = 90 - 5*i, 95 - 8*i
        arr[y1:y1+40, x1:x1+60, 0] = 200
        boxes = [[x0, y0, x0+50, y0+50, 0], [x1, y1, x1+60, y1+40, 1]]
        boxes_per_img.append(boxes)
        buf = io.BytesIO(); Image.fromarray(arr).save(buf, format="PNG")
        w.write(encode_sequence_example(
            {"image_raw": buf.getvalue(), "filename": f"i{i}.png".encode(),
             "width": 160, "height": 160, "depth": 3},
            {"label": [[b[4]] for b in boxes],
             "xmin": [[b[0]] for b in boxes], "ymin": [[b[1]] for b in boxes],
             "xmax": [[b[2]] for b in boxes], "ymax": [[b[3]] for b in boxes]}))

from luminoth_tpu.models.fasterrcnn import FasterRCNN
from luminoth_tpu.utils.config import Config, get_base_config, get_model_config
from luminoth_tpu import train as train_module

cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
cfg.model.network.num_classes = 2
cfg.model.base_network.architecture = "resnet_v1_50"
cfg.model.rpn.proposals.pre_nms_top_n = 1024
cfg.model.rpn.proposals.post_nms_top_n = 128
cfg.model.rpn.target.minibatch_size = 64
cfg.model.rcnn.target.minibatch_size = 32
cfg.model.rcnn.proposals.total_max_detections = 8
cfg.model.rcnn.proposals.class_max_detections = 8
cfg.model.rcnn.proposals.min_prob_threshold = 0.0
cfg.dataset.dir = tmp
cfg.dataset.image_preprocessing = Config({"min_size": 160, "max_size": 160})
cfg.dataset.max_gt_boxes = 8
cfg.dataset.data_augmentation = []
cfg.train.batch_size = 4
cfg.train.num_epochs = 3000
cfg.train.job_dir = os.path.join(tmp, "jobs")
cfg.train.run_name = "overfit"
cfg.train.save_checkpoint_secs = 10**9
cfg.train.save_summaries_secs = 10**9
cfg.train.log_every_steps = 25
cfg.train.learning_rate = Config({"decay_method": "piecewise_constant", "boundaries": [1500, 2400], "values": [3e-4, 1e-4, 3e-5]})
cfg.train.clip_by_norm = True
cfg.train.optimizer = Config({"type": "momentum", "momentum": 0.9})
cfg.train.seed = 1

import logging; logging.basicConfig(level=logging.INFO)
state = train_module.run(cfg, max_steps=100)
print("trained to step", int(state.step))

# Evaluate on the training split (overfit check).
from luminoth_tpu.eval import evaluate_once
from luminoth_tpu.models import get_model
from luminoth_tpu.utils.config import to_plain
variables = {"params": state.params}
if state.batch_stats: variables["batch_stats"] = state.batch_stats
model = FasterRCNN(to_plain(cfg))
cfg.train.random_shuffle = False
metrics = evaluate_once(cfg, model, variables)
print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}))
