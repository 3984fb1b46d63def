"""Dataset pipeline tests: record round-trip, preprocessing, batching."""

import io

import numpy as np
import pytest
from PIL import Image

from luminoth_tpu.datasets import ObjectDetectionDataset, get_dataset
from luminoth_tpu.datasets.exceptions import InvalidDataDirectory
from luminoth_tpu.datasets.object_detection_dataset import (
    pad_gt_boxes,
    pad_to_canvas,
    parse_record,
)
from luminoth_tpu.formats.example_pb import encode_sequence_example
from luminoth_tpu.formats.tfrecord import TFRecordWriter
from luminoth_tpu.utils.config import Config


def make_record(width=64, height=48, boxes=((5, 5, 20, 20, 1),), color=128):
    img = Image.new("RGB", (width, height), (color, color, color))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    context = {
        "image_raw": buf.getvalue(),
        "filename": b"synthetic.jpg",
        "width": width,
        "height": height,
        "depth": 3,
    }
    lists = {
        "label": [[int(b[4])] for b in boxes],
        "xmin": [[int(b[0])] for b in boxes],
        "ymin": [[int(b[1])] for b in boxes],
        "xmax": [[int(b[2])] for b in boxes],
        "ymax": [[int(b[3])] for b in boxes],
    }
    return encode_sequence_example(context, lists)


def write_split(tmp_path, split="train", n=6):
    path = tmp_path / f"{split}.tfrecords"
    with TFRecordWriter(str(path)) as w:
        for i in range(n):
            w.write(make_record(boxes=((5, 5, 20 + i, 20, i % 3),)))
    return str(tmp_path)


def ssd_like_config(data_dir, batch_size=2, epochs=1):
    return Config(
        {
            "train": {
                "batch_size": batch_size,
                "num_epochs": epochs,
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
            },
        }
    )


class TestParseRecord:
    def test_round_trip(self):
        record = make_record(boxes=((1, 2, 30, 40, 7),))
        image, bboxes, filename = parse_record(record)
        assert image.shape == (48, 64, 3)
        assert filename == "synthetic.jpg"
        np.testing.assert_allclose(bboxes, [[1, 2, 30, 40, 7]])


class TestPadding:
    def test_pad_to_canvas(self):
        img = np.ones((40, 60, 3), np.float32)
        padded, (h, w) = pad_to_canvas(img, (64, 64))
        assert padded.shape == (64, 64, 3)
        assert (h, w) == (40, 60)
        assert padded[39, 59, 0] == 1.0
        assert padded[50, 50, 0] == 0.0

    def test_pad_gt(self):
        out = pad_gt_boxes(np.asarray([[1, 2, 3, 4, 0]]), 4)
        assert out.shape == (4, 5)
        assert out[0, 4] == 0
        assert (out[1:, 4] == -1).all()


class TestDatasetIteration:
    def test_batches(self, tmp_path):
        data_dir = write_split(tmp_path, n=6)
        cfg = ssd_like_config(data_dir, batch_size=2)
        ds = ObjectDetectionDataset(cfg, augment=False)
        batches = list(ds)
        assert len(batches) == 3
        b = batches[0]
        assert b["image"].shape == (2, 96, 96, 3)
        assert b["gt_boxes"].shape == (2, 8, 5)
        assert b["im_shape"].shape == (2, 2)
        # boxes scaled by resize 64x48 → 96x96
        assert b["gt_boxes"][0, 0, 4] == 0  # label preserved

    def test_num_gt_clamped_to_shipped_rows(self, tmp_path):
        # 10 boxes but max_gt_boxes=8: pad_gt_boxes truncates to 8 rows,
        # and raw_gt_counts must report the shipped count, not 10.
        path = tmp_path / "train.tfrecords"
        boxes = [(2 + i, 2, 12 + i, 12, 0) for i in range(10)]
        with TFRecordWriter(str(path)) as w:
            w.write(make_record(boxes=boxes))
        cfg = ssd_like_config(str(tmp_path), batch_size=1)
        ds = ObjectDetectionDataset(cfg, augment=False)
        b = next(iter(ds))
        assert b["gt_boxes"].shape == (1, 8, 5)
        assert int(b["raw_gt_counts"][0]) == 8

    def test_epochs(self, tmp_path):
        data_dir = write_split(tmp_path, n=2)
        cfg = ssd_like_config(data_dir, batch_size=1, epochs=3)
        ds = ObjectDetectionDataset(cfg, augment=False)
        assert len(list(ds)) == 6

    def test_min_max_resize_mode(self, tmp_path):
        data_dir = write_split(tmp_path, n=2)
        cfg = ssd_like_config(data_dir, batch_size=1)
        cfg.dataset.image_preprocessing = Config(
            {"min_size": 100, "max_size": 120}
        )
        ds = ObjectDetectionDataset(cfg, augment=False)
        b = next(iter(ds))
        # canvas rounds max_size up to a multiple of 32
        assert b["image"].shape == (1, 128, 128, 3)
        # 64x48 → scale = 100/48 = 2.083 capped by 120/64 = 1.875
        np.testing.assert_allclose(b["scale_factor"][0], 1.875, rtol=1e-3)
        assert tuple(b["im_shape"][0]) == (90.0, 120.0)

    def test_invalid_dir(self):
        cfg = ssd_like_config("/nonexistent/dir")
        with pytest.raises(InvalidDataDirectory):
            ObjectDetectionDataset(cfg)

    def test_registry(self):
        assert get_dataset("object_detection") is ObjectDetectionDataset
        assert get_dataset("tfrecord") is ObjectDetectionDataset
        with pytest.raises(ValueError):
            get_dataset("bogus")

    def test_augmentation_runs(self, tmp_path):
        data_dir = write_split(tmp_path, n=4)
        cfg = ssd_like_config(data_dir, batch_size=1)
        cfg.dataset.data_augmentation = [
            {"flip": {"left_right": True, "up_down": False, "prob": 1.0}}
        ]
        ds = ObjectDetectionDataset(cfg, augment=True)
        b = next(iter(ds))
        assert b["image"].shape == (1, 96, 96, 3)


class TestCanvasBuckets:
    def test_orientation_buckets(self, tmp_path):
        """Mixed-orientation images land in per-orientation buckets."""
        from luminoth_tpu.formats.tfrecord import TFRecordWriter

        path = tmp_path / "train.tfrecords"
        with TFRecordWriter(str(path)) as w:
            for i in range(4):
                w.write(make_record(width=120, height=60))   # landscape
            for i in range(4):
                w.write(make_record(width=60, height=120))   # portrait
        cfg = ssd_like_config(str(tmp_path), batch_size=2)
        cfg.dataset.image_preprocessing = Config(
            {"min_size": 60, "max_size": 128,
             "canvases": [[64, 128], [128, 64]]}
        )
        ds = ObjectDetectionDataset(cfg, augment=False)
        shapes = [b["image"].shape[1:3] for b in ds]
        assert (64, 128) in shapes
        assert (128, 64) in shapes
        # Every batch is homogeneous by construction.
        assert all(s in ((64, 128), (128, 64), (128, 128)) for s in shapes)


class TestNoFitDownscale:
    def test_unfittable_image_downscaled_not_cropped(self, tmp_path):
        """A portrait image with only a landscape canvas configured must
        be downscaled to fit (with boxes rescaled), never cropped."""
        path = tmp_path / "train.tfrecords"
        with TFRecordWriter(str(path)) as w:
            # 60x120 portrait with a box hugging the BOTTOM edge: a crop
            # would remove it entirely.
            w.write(
                make_record(width=60, height=120, boxes=((10, 100, 50, 118, 1),))
            )
        cfg = ssd_like_config(str(tmp_path), batch_size=1)
        cfg.dataset.image_preprocessing = Config(
            {"canvas_height": 64, "canvas_width": 128}
        )
        ds = ObjectDetectionDataset(cfg, augment=False)
        b = next(iter(ds))
        assert b["image"].shape == (1, 64, 128, 3)
        # fit = min(64/120, 128/60) = 0.5333 → 64x32 content region
        np.testing.assert_allclose(
            b["im_shape"][0], (64.0, 32.0), atol=1.0
        )
        gt = b["gt_boxes"][0, 0]
        assert gt[4] == 1  # the box survived
        # y2 scaled into the content region, not cropped away
        assert 50.0 <= gt[3] <= 64.0
        assert gt[2] <= 32.0

    def test_prefetch_worker_stops_on_abandon(self, tmp_path):
        """Breaking out of the batch loop must not leave the prefetch
        worker pinned on a full queue."""
        import threading
        import time as _time

        data_dir = write_split(tmp_path, n=30)
        cfg = ssd_like_config(data_dir, batch_size=1)
        ds = ObjectDetectionDataset(cfg, augment=False, prefetch_batches=1)
        before = threading.active_count()
        it = iter(ds)
        next(it)
        it.close()  # abandon mid-stream (what `break` does at GC time)
        deadline = _time.time() + 5.0
        while _time.time() < deadline:
            if threading.active_count() <= before:
                break
            _time.sleep(0.05)
        assert threading.active_count() <= before


class TestUint8Transfer:
    def test_uint8_batches(self, tmp_path):
        data_dir = write_split(tmp_path, n=4)
        cfg = ssd_like_config(data_dir, batch_size=2)
        cfg.dataset.transfer_dtype = "uint8"
        ds = ObjectDetectionDataset(cfg, augment=False)
        b = next(iter(ds))
        assert b["image"].dtype == np.uint8
        # same pixels as the float pipeline, just quantized
        cfg_f = ssd_like_config(data_dir, batch_size=2)
        bf = next(iter(ObjectDetectionDataset(cfg_f, augment=False)))
        np.testing.assert_allclose(
            b["image"].astype(np.float32), bf["image"], atol=0.5
        )

    def test_bad_transfer_dtype(self, tmp_path):
        data_dir = write_split(tmp_path, n=1)
        cfg = ssd_like_config(data_dir)
        cfg.dataset.transfer_dtype = "float16"
        with pytest.raises(ValueError):
            ObjectDetectionDataset(cfg)


def test_pad_final_batch_covers_every_example(tmp_path):
    """Evaluation-mode datasets pad the leftover batch instead of
    dropping it (the reference's evaluator streams every image)."""
    data_dir = write_split(tmp_path, n=7)
    config = ssd_like_config(data_dir, batch_size=3)

    plain = ObjectDetectionDataset(config, augment=False, shuffle=False)
    plain_batches = [b for b in plain]
    assert len(plain_batches) == 2  # 7 // 3, remainder dropped
    assert all(b["pad_count"] == 0 for b in plain_batches)

    padded = ObjectDetectionDataset(
        config, augment=False, shuffle=False, pad_final_batch=True
    )
    batches = [b for b in padded]
    assert len(batches) == 3
    assert [b["pad_count"] for b in batches] == [0, 0, 2]
    last = batches[-1]
    assert last["image"].shape[0] == 3  # static batch shape kept
    # Padding rows repeat the last real example.
    np.testing.assert_array_equal(last["image"][1], last["image"][2])
    total_real = sum(b["image"].shape[0] - b["pad_count"] for b in batches)
    assert total_real == 7
