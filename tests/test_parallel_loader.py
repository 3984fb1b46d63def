"""Multi-process loader tests: shard coverage, content parity, eval pad.

The multi-process loader (datasets/parallel_loader.py) must produce the
same example *multiset* as the single-process path — batch order may
interleave across workers, content may not differ.
"""

import io

import numpy as np
import pytest
from PIL import Image

from luminoth_tpu.datasets import ObjectDetectionDataset
from luminoth_tpu.formats.example_pb import encode_sequence_example
from luminoth_tpu.formats.tfrecord import TFRecordWriter
from luminoth_tpu.utils.config import Config


def make_record(idx, width=64, height=48):
    """A record with a per-index filename, color and gt box."""
    color = 20 + (idx * 17) % 200
    img = Image.new("RGB", (width, height), (color, color, color))
    buf = io.BytesIO()
    img.save(buf, format="PNG")  # lossless: content comparable exactly
    box = (2 + idx, 3, 22 + idx, 23, idx % 3)
    context = {
        "image_raw": buf.getvalue(),
        "filename": f"img{idx:03d}.png".encode(),
        "width": width,
        "height": height,
        "depth": 3,
    }
    lists = {
        "label": [[int(box[4])]],
        "xmin": [[int(box[0])]],
        "ymin": [[int(box[1])]],
        "xmax": [[int(box[2])]],
        "ymax": [[int(box[3])]],
    }
    return encode_sequence_example(context, lists)


def write_records(tmp_path, n, shards=1):
    if shards == 1:
        with TFRecordWriter(str(tmp_path / "train.tfrecords")) as w:
            for i in range(n):
                w.write(make_record(i))
    else:
        for s in range(shards):
            path = tmp_path / f"train-{s:05d}.tfrecords"
            with TFRecordWriter(str(path)) as w:
                for i in range(s, n, shards):
                    w.write(make_record(i))
    return str(tmp_path)


def loader_config(data_dir, batch_size=2, procs=0):
    return Config(
        {
            "train": {
                "batch_size": batch_size,
                "num_epochs": 1,
                "random_shuffle": False,
                "seed": 0,
            },
            "dataset": {
                "type": "object_detection",
                "dir": data_dir,
                "split": "train",
                "image_preprocessing": {
                    "fixed_height": 96,
                    "fixed_width": 96,
                },
                "max_gt_boxes": 8,
                "data_augmentation": [],
                "num_worker_processes": procs,
            },
        }
    )


def collect(dataset):
    """filename → (image, gt row) for every non-padding example."""
    seen = {}
    for batch in dataset:
        b = len(batch["filename"])
        real = b - int(batch.get("pad_count", 0))
        for i in range(real):
            name = batch["filename"][i]
            seen.setdefault(name, []).append(
                (batch["image"][i].copy(), batch["gt_boxes"][i].copy())
            )
    return seen


@pytest.mark.slow
class TestMultiprocessLoader:
    def test_matches_single_process_record_stride(self, tmp_path):
        # 1 file < 2 workers → record-stride sharding path
        data_dir = write_records(tmp_path, n=12, shards=1)
        single = collect(ObjectDetectionDataset(
            loader_config(data_dir), augment=False))
        multi = collect(ObjectDetectionDataset(
            loader_config(data_dir, procs=2), augment=False))
        assert set(single) == set(multi)
        for name in single:
            assert len(multi[name]) == 1, name
            np.testing.assert_array_equal(
                single[name][0][0], multi[name][0][0])
            np.testing.assert_array_equal(
                single[name][0][1], multi[name][0][1])

    def test_matches_single_process_file_shards(self, tmp_path):
        # 4 shard files >= 2 workers → file-sharding path
        data_dir = write_records(tmp_path, n=12, shards=4)
        single = collect(ObjectDetectionDataset(
            loader_config(data_dir), augment=False))
        multi = collect(ObjectDetectionDataset(
            loader_config(data_dir, procs=2), augment=False))
        assert set(single) == set(multi)
        for name in single:
            np.testing.assert_array_equal(
                single[name][0][0], multi[name][0][0])

    def test_pad_final_covers_every_image(self, tmp_path):
        # eval path: odd remainders per worker must still surface every
        # image exactly once, with pad rows marked
        data_dir = write_records(tmp_path, n=7, shards=1)
        ds = ObjectDetectionDataset(
            loader_config(data_dir, procs=2), augment=False,
            pad_final_batch=True,
        )
        seen = collect(ds)
        assert set(seen) == {f"img{i:03d}.png" for i in range(7)}
        assert all(len(v) == 1 for v in seen.values())

    def test_shuffled_epoch_still_exhaustive(self, tmp_path):
        data_dir = write_records(tmp_path, n=8, shards=4)
        cfg = loader_config(data_dir, procs=2)
        cfg.train.random_shuffle = True
        ds = ObjectDetectionDataset(cfg, augment=False,
                                    pad_final_batch=True)
        seen = collect(ds)
        assert set(seen) == {f"img{i:03d}.png" for i in range(8)}

    def test_worker_exception_reraised_in_parent(self, tmp_path):
        # A crashed worker must surface as WorkerError in the consumer,
        # not masquerade as clean end-of-epoch (which would silently
        # train on a partial dataset). Per-record decode failures are
        # skipped by design, so crash at the file level: delete the
        # record files after the first batch — the next epoch's open
        # raises inside the worker.
        import os

        from luminoth_tpu.datasets.parallel_loader import WorkerError

        data_dir = write_records(tmp_path, n=40, shards=2)
        cfg = loader_config(data_dir, procs=2)
        cfg.train.num_epochs = 5

        with pytest.raises(WorkerError) as exc_info:
            ds = ObjectDetectionDataset(cfg, augment=False)
            it = iter(ds)
            next(it)
            for f in os.listdir(data_dir):
                if f.endswith(".tfrecords"):
                    os.unlink(os.path.join(data_dir, f))
            for _ in range(10_000):
                next(it)
        # the child's traceback rides along for diagnosis
        assert "Traceback" in str(exc_info.value)

    def test_hard_killed_worker_detected(self, tmp_path):
        # SIGKILL (the OOM killer's signal) leaves no sentinel at all;
        # the parent's liveness check must raise instead of blocking
        # forever on result_q.get().
        import multiprocessing

        from luminoth_tpu.datasets.parallel_loader import WorkerError

        data_dir = write_records(tmp_path, n=40, shards=4)
        cfg = loader_config(data_dir, procs=2)
        cfg.train.num_epochs = 100  # keep workers busy while we aim

        def consume_until_error():
            ds = ObjectDetectionDataset(cfg, augment=False)
            it = iter(ds)
            next(it)  # workers are up and producing
            victims = [p for p in multiprocessing.active_children()
                       if "Process" in p.name]
            assert victims, "no loader worker children visible"
            victims[0].kill()  # direct handle, never pattern-kill
            for _ in range(10_000):
                next(it)

        with pytest.raises(WorkerError, match="without reporting"):
            consume_until_error()
