"""Generate a self-hostable checkpoint zoo: train, bundle, export, index.

The reference ships ``accurate`` (Faster R-CNN) and ``fast`` (SSD)
checkpoints any user can ``lumi predict --checkpoint fast`` with
(reference: docs/usage/checkpoints.rst:12-16). With zero egress no real
COCO-trained weights can enter this environment, so this script produces
the same *product surface* from models trained here: two synthetic-data
runs, bundled with ``lumi checkpoint create``, exported to tarballs, and
indexed with ``lumi checkpoint build-index`` — yielding a directory that
works as a remote zoo via ``LUMI_REMOTE_INDEX_URL=file://<dir>/index.json``
(or any URL the directory is served under, via --base-url).

Usage (from the repo root):
    python scripts/make_zoo.py <out_dir> [--steps N] [--base-url URL]

``--steps`` trades training time for quality (default 200 is a quick
demo zoo; the overfit scripts use 2500+ for clean detections).
"""
import argparse
import io
import json
import os
import sys
import tempfile

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from luminoth_tpu.formats.example_pb import encode_sequence_example
from luminoth_tpu.formats.tfrecord import TFRecordWriter
from luminoth_tpu.utils.config import (
    Config, dump_config, get_base_config, get_model_config,
)


def write_synthetic_dataset(data_dir, size, n=4):
    """High-contrast two-class boxes on a dark field (like the overfit
    scripts: bright square = class 0, red rectangle = class 1)."""
    os.makedirs(data_dir, exist_ok=True)
    s = size
    with TFRecordWriter(os.path.join(data_dir, "train.tfrecords")) as w:
        for i in range(n):
            arr = np.full((s, s, 3), 30, np.uint8)
            a = s // 3
            x0, y0 = (s // 16) + (s // 8) * i, (s // 12) + (s // 16) * i
            arr[y0:y0 + a, x0:x0 + a] = 250
            b_w, b_h = a + a // 3, a - a // 4
            x1, y1 = s - b_w - (s // 32) * i, s - b_h - (s // 20) * i
            arr[y1:y1 + b_h, x1:x1 + b_w, 0] = 200
            boxes = [[x0, y0, x0 + a, y0 + a, 0],
                     [x1, y1, x1 + b_w, y1 + b_h, 1]]
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            w.write(encode_sequence_example(
                {"image_raw": buf.getvalue(),
                 "filename": f"i{i}.png".encode(),
                 "width": s, "height": s, "depth": 3},
                {"label": [[b[4]] for b in boxes],
                 "xmin": [[b[0]] for b in boxes],
                 "ymin": [[b[1]] for b in boxes],
                 "xmax": [[b[2]] for b in boxes],
                 "ymax": [[b[3]] for b in boxes]},
            ))
    with open(os.path.join(data_dir, "classes.json"), "w") as f:
        json.dump(["square", "rectangle"], f)


def frcnn_config(data_dir, job_dir):
    from luminoth_tpu.models.fasterrcnn import FasterRCNN

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 2
    cfg.model.base_network.architecture = "resnet_v1_50"
    cfg.model.rpn.proposals.pre_nms_top_n = 1024
    cfg.model.rpn.proposals.post_nms_top_n = 128
    cfg.model.rpn.target.minibatch_size = 64
    cfg.model.rcnn.target.minibatch_size = 32
    cfg.model.rcnn.proposals.total_max_detections = 8
    cfg.model.rcnn.proposals.class_max_detections = 8
    cfg.dataset.image_preprocessing = Config(
        {"min_size": 160, "max_size": 160})
    cfg.train.learning_rate = Config({"learning_rate": 3e-4})
    cfg.train.run_name = "zoo_accurate"
    return cfg


def ssd_config(data_dir, job_dir):
    from luminoth_tpu.models.ssd import SSD

    cfg = get_model_config(get_base_config(SSD), Config({}), [])
    cfg.model.network.num_classes = 2
    cfg.train.learning_rate = Config({"learning_rate": 1e-3})
    cfg.train.optimizer = Config({"type": "momentum", "momentum": 0.9})
    cfg.train.clip_by_norm = True
    cfg.train.run_name = "zoo_fast"
    return cfg


def train_and_bundle(cfg, data_dir, job_dir, alias, name, steps, runner):
    from luminoth_tpu import train as train_module
    from luminoth_tpu.tools.checkpoint import checkpoint

    cfg.dataset.dir = data_dir
    cfg.dataset.data_augmentation = []
    cfg.dataset.max_gt_boxes = 8
    cfg.train.batch_size = 4
    cfg.train.num_epochs = 10 ** 6  # bounded by max_steps
    cfg.train.job_dir = job_dir
    cfg.train.save_checkpoint_secs = 0
    cfg.train.save_summaries_secs = 10 ** 9
    cfg.train.log_every_steps = max(50, steps // 4)
    cfg.train.seed = 1
    state = train_module.run(cfg, max_steps=steps)
    print(f"{name}: trained to step {int(state.step)}")

    config_path = os.path.join(job_dir, f"{name}.yml")
    with open(config_path, "w") as f:
        f.write(dump_config(cfg))
    result = runner.invoke(checkpoint, [
        "create", config_path, "--alias", alias,
        "-e", f"name={name}",
        "-e", "description=synthetic two-class demo checkpoint",
    ], catch_exceptions=False)
    print(result.output.strip())
    assert "created successfully" in result.output


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("out_dir")
    parser.add_argument("--steps", type=int, default=200)
    parser.add_argument("--base-url", default=None)
    args = parser.parse_args()

    from click.testing import CliRunner

    from luminoth_tpu.tools.checkpoint import (
        build_remote_index, checkpoint, read_checkpoint_db,
    )

    work = tempfile.mkdtemp(prefix="lumi_zoo_")
    runner = CliRunner()

    frcnn_data = os.path.join(work, "frcnn_data")
    write_synthetic_dataset(frcnn_data, size=160)
    train_and_bundle(
        frcnn_config(frcnn_data, work), frcnn_data,
        os.path.join(work, "jobs_frcnn"), "accurate",
        "fasterrcnn-demo", args.steps, runner,
    )

    ssd_data = os.path.join(work, "ssd_data")
    write_synthetic_dataset(ssd_data, size=300)
    train_and_bundle(
        ssd_config(ssd_data, work), ssd_data,
        os.path.join(work, "jobs_ssd"), "fast",
        "ssd-demo", args.steps, runner,
    )

    os.makedirs(args.out_dir, exist_ok=True)
    for entry in read_checkpoint_db()["checkpoints"]:
        if entry["alias"] in ("accurate", "fast"):
            result = runner.invoke(checkpoint, [
                "export", entry["id"], "--output", args.out_dir,
            ], catch_exceptions=False)
            print(result.output.strip())
    index_path = build_remote_index(args.out_dir, base_url=args.base_url)
    print(f"zoo index: {index_path}")
    print("Use it with:")
    print(f"  export LUMI_REMOTE_INDEX_URL=file://{os.path.abspath(index_path)}")
    print("  lumi predict image.jpg --checkpoint fast")


if __name__ == "__main__":
    main()
