"""Reproducible verification script (run from the repo root on a TPU host).

See STATUS.md for the round-1 results this produced.
"""
import sys, io, os, json
import numpy as np
from PIL import Image
import tempfile
tmp = tempfile.mkdtemp()
from luminoth_tpu.formats.example_pb import encode_sequence_example
from luminoth_tpu.formats.tfrecord import TFRecordWriter

with TFRecordWriter(os.path.join(tmp, "train.tfrecords")) as w:
    for i in range(4):
        arr = np.full((300, 300, 3), 30, np.uint8)
        x0, y0 = 20 + 30*i, 25 + 20*i
        arr[y0:y0+90, x0:x0+90] = 250
        x1, y1 = 170 - 10*i, 180 - 15*i
        arr[y1:y1+70, x1:x1+110, 0] = 200
        boxes = [[x0, y0, x0+90, y0+90, 0], [x1, y1, x1+110, y1+70, 1]]
        buf = io.BytesIO(); Image.fromarray(arr).save(buf, format="PNG")
        w.write(encode_sequence_example(
            {"image_raw": buf.getvalue(), "filename": f"i{i}.png".encode(),
             "width": 300, "height": 300, "depth": 3},
            {"label": [[b[4]] for b in boxes],
             "xmin": [[b[0]] for b in boxes], "ymin": [[b[1]] for b in boxes],
             "xmax": [[b[2]] for b in boxes], "ymax": [[b[3]] for b in boxes]}))

from luminoth_tpu.models.ssd import SSD
from luminoth_tpu.utils.config import Config, get_base_config, get_model_config
from luminoth_tpu import train as train_module

cfg = get_model_config(get_base_config(SSD), Config({}), [])
cfg.model.network.num_classes = 2
cfg.model.proposals.min_prob_threshold = 0.0
cfg.dataset.dir = tmp
cfg.dataset.data_augmentation = []
cfg.dataset.max_gt_boxes = 8
cfg.train.batch_size = 4
cfg.train.num_epochs = 3000
cfg.train.debug = False
cfg.train.image_vis = None
cfg.train.job_dir = os.path.join(tmp, "jobs")
cfg.train.run_name = "ssd_overfit"
cfg.train.save_checkpoint_secs = 10**9
cfg.train.save_summaries_secs = 10**9
cfg.train.log_every_steps = 200
cfg.train.clip_by_norm = True
cfg.train.learning_rate = Config({"decay_method": "piecewise_constant",
                                  "boundaries": [1200, 2000],
                                  "values": [1e-3, 3e-4, 1e-4]})
cfg.train.optimizer = Config({"type": "momentum", "momentum": 0.9})
cfg.train.seed = 1

import logging; logging.basicConfig(level=logging.INFO)
state = train_module.run(cfg, max_steps=2500)
print("trained to step", int(state.step))

from luminoth_tpu.eval import evaluate_once
from luminoth_tpu.utils.config import to_plain
variables = {"params": state.params}
model = SSD(to_plain(cfg))
cfg.train.random_shuffle = False
metrics = evaluate_once(cfg, model, variables)
print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()}))
