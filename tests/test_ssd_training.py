"""SSD end-to-end training smoke test through the real trainer."""

import io
import os

import numpy as np
import pytest
from PIL import Image

from luminoth_tpu.formats.example_pb import encode_sequence_example
from luminoth_tpu.formats.tfrecord import TFRecordWriter
from luminoth_tpu.utils.config import Config, get_base_config, get_model_config


def write_dataset(tmp_path, n=2):
    rng = np.random.RandomState(0)
    with TFRecordWriter(str(tmp_path / "train.tfrecords")) as w:
        for i in range(n):
            arr = rng.randint(0, 255, (120, 160, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write(
                encode_sequence_example(
                    {
                        "image_raw": buf.getvalue(),
                        "filename": f"s{i}.jpg".encode(),
                        "width": 160,
                        "height": 120,
                        "depth": 3,
                    },
                    {
                        "label": [[0], [1]],
                        "xmin": [[10], [80]],
                        "ymin": [[10], [60]],
                        "xmax": [[70], [150]],
                        "ymax": [[60], [110]],
                    },
                )
            )
    return str(tmp_path)


@pytest.mark.slow
def test_ssd_train_two_steps(tmp_path):
    from luminoth_tpu import train as train_module
    from luminoth_tpu.models.ssd import SSD

    data_dir = write_dataset(tmp_path)
    cfg = get_model_config(get_base_config(SSD), Config({}), [])
    cfg.model.network.num_classes = 2
    cfg.dataset.dir = data_dir
    cfg.dataset.data_augmentation = []
    cfg.train.batch_size = 2
    cfg.train.num_epochs = 2
    cfg.train.job_dir = str(tmp_path / "jobs")
    cfg.train.run_name = "ssdtest"
    cfg.train.save_checkpoint_secs = 0
    cfg.train.save_summaries_secs = 100000
    cfg.train.image_vis = None
    cfg.train.debug = False
    cfg.train.learning_rate = Config({"learning_rate": 1e-5})

    state = train_module.run(cfg, max_steps=2)
    assert int(state.step) == 2
    ckpt_dir = os.path.join(cfg.train.job_dir, "ssdtest", "ckpt")
    assert os.path.isdir(ckpt_dir)
