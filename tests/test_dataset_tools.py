"""Dataset converter tests: readers × writer × transform/merge CLI."""

import json
import os

import numpy as np
import pytest
from click.testing import CliRunner
from PIL import Image

from luminoth_tpu.datasets.object_detection_dataset import parse_record
from luminoth_tpu.formats.tfrecord import read_tfrecords
from luminoth_tpu.tools.dataset.merge import merge
from luminoth_tpu.tools.dataset.transform import transform
from luminoth_tpu.tools.dataset.readers import READERS, get_reader
from luminoth_tpu.tools.dataset.writers import ObjectDetectionWriter


def save_jpg(path, w=32, h=24):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.new("RGB", (w, h), (120, 50, 20)).save(path, "JPEG")


# ------------------------------------------------------------- fixtures


def make_voc(root):
    """Minimal Pascal VOC tree with 2 images."""
    for i, cls in enumerate(["dog", "cat"]):
        image_id = f"im{i}"
        save_jpg(os.path.join(root, "JPEGImages", f"{image_id}.jpg"))
        os.makedirs(os.path.join(root, "Annotations"), exist_ok=True)
        with open(
            os.path.join(root, "Annotations", f"{image_id}.xml"), "w"
        ) as f:
            f.write(f"""<annotation>
  <filename>{image_id}.jpg</filename>
  <size><width>32</width><height>24</height><depth>3</depth></size>
  <object>
    <name>{cls}</name>
    <bndbox><xmin>1</xmin><ymin>2</ymin><xmax>20</xmax><ymax>20</ymax></bndbox>
  </object>
</annotation>""")
    os.makedirs(os.path.join(root, "ImageSets", "Main"), exist_ok=True)
    with open(os.path.join(root, "ImageSets", "Main", "train.txt"), "w") as f:
        f.write("im0\nim1\n")
    return root


def make_csv(root):
    save_jpg(os.path.join(root, "images", "a.jpg"))
    save_jpg(os.path.join(root, "images", "b.jpg"))
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("image_id,xmin,ymin,xmax,ymax,label\n")
        f.write("a,1,1,20,20,dog\n")
        f.write("a,5,5,25,20,cat\n")
        f.write("b,2,2,18,18,dog\n")
    return root


def make_flat(root):
    split = os.path.join(root, "train")
    save_jpg(os.path.join(split, "x.jpg"))
    with open(os.path.join(split, "x.json"), "w") as f:
        json.dump(
            {"rects": [{"x1": 1, "y1": 1, "x2": 20, "y2": 18, "label": "p"}]},
            f,
        )
    return root


def make_taggerine(root):
    split = os.path.join(root, "train")
    save_jpg(os.path.join(split, "t.jpg"))
    with open(os.path.join(split, "labels.json"), "w") as f:
        json.dump(
            {
                "t.jpg": [
                    {"x": 0.1, "y": 0.1, "width": 0.5, "height": 0.5,
                     "label": "thing"}
                ]
            },
            f,
        )
    return root


def make_coco(root):
    save_jpg(os.path.join(root, "train", "c1.jpg"))
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    data = {
        "images": [{"id": 1, "file_name": "c1.jpg", "width": 32,
                    "height": 24}],
        "categories": [
            {"id": 1, "name": "dog", "supercategory": "animal"},
            {"id": 2, "name": "cat", "supercategory": "animal"},
        ],
        "annotations": [
            {"image_id": 1, "category_id": 1, "bbox": [1, 1, 19, 17],
             "iscrowd": 0},
        ],
    }
    with open(
        os.path.join(root, "annotations", "instances_train.json"), "w"
    ) as f:
        json.dump(data, f)
    return root


# ------------------------------------------------------------- tests


class TestReaders:
    def test_registry(self):
        assert set(READERS.keys()) == {
            "coco", "csv", "flat", "imagenet", "openimages", "pascal",
            "taggerine",
        }
        with pytest.raises(ValueError):
            get_reader("bogus")

    def test_pascal(self, tmp_path):
        root = make_voc(str(tmp_path))
        reader = get_reader("pascal")(root, "train")
        assert reader.total == 2
        assert reader.classes == ["cat", "dog"]
        records = list(reader.iterate())
        assert len(records) == 2
        assert records[0]["gt_boxes"][0]["label"] == reader.classes.index(
            "dog"
        )

    def test_pascal_classes_from_imagesets(self, tmp_path):
        """Per-class ImageSets listings are the O(#classes) fast path."""
        root = make_voc(str(tmp_path))
        main = os.path.join(root, "ImageSets", "Main")
        for cls in ("dog", "cat", "bird"):
            with open(os.path.join(main, f"{cls}_train.txt"), "w") as f:
                f.write("im0  1\nim1 -1\n")
        # Also a listing for another split, which must be ignored.
        with open(os.path.join(main, "horse_val.txt"), "w") as f:
            f.write("im0  1\n")
        reader = get_reader("pascal")(root, "train")
        assert reader.classes == ["bird", "cat", "dog"]

    def test_csv(self, tmp_path):
        root = make_csv(str(tmp_path))
        reader = get_reader("csv")(root, "train")
        assert reader.total == 2
        records = list(reader.iterate())
        assert len(records) == 2
        assert len(records[0]["gt_boxes"]) == 2

    def test_flat(self, tmp_path):
        root = make_flat(str(tmp_path))
        reader = get_reader("flat")(root, "train")
        records = list(reader.iterate())
        assert len(records) == 1
        assert records[0]["gt_boxes"][0]["xmax"] == 20

    def test_taggerine_normalized_coords(self, tmp_path):
        root = make_taggerine(str(tmp_path))
        reader = get_reader("taggerine")(root, "train")
        records = list(reader.iterate())
        assert len(records) == 1
        box = records[0]["gt_boxes"][0]
        # normalized 0.1..0.6 of a 32x24 image
        assert box["xmin"] == 3 and box["xmax"] == 19

    def test_coco(self, tmp_path):
        root = make_coco(str(tmp_path))
        reader = get_reader("coco")(root, "train")
        records = list(reader.iterate())
        assert len(records) == 1
        assert reader.classes == ["cat", "dog"]
        assert records[0]["gt_boxes"][0]["label"] == 1  # dog

    def test_only_classes_filter(self, tmp_path):
        root = make_voc(str(tmp_path))
        reader = get_reader("pascal")(root, "train", only_classes="dog")
        records = list(reader.iterate())
        assert len(records) == 1
        assert reader.classes == ["dog"]

    def test_limit_examples(self, tmp_path):
        root = make_voc(str(tmp_path))
        reader = get_reader("pascal")(root, "train", limit_examples=1)
        assert reader.total == 1
        assert len(list(reader.iterate())) == 1


class TestTransformCLI:
    def test_transform_and_read_back(self, tmp_path):
        voc = make_voc(str(tmp_path / "voc"))
        out = str(tmp_path / "out")
        runner = CliRunner()
        result = runner.invoke(
            transform,
            ["--type", "pascal", "--data-dir", voc, "--output-dir", out,
             "--split", "train"],
        )
        assert result.exit_code == 0, result.output
        record_path = os.path.join(out, "train.tfrecords")
        assert os.path.exists(record_path)
        assert os.path.exists(os.path.join(out, "classes.json"))

        # The produced records parse with the training loader's codec.
        records = list(read_tfrecords(record_path))
        assert len(records) == 2
        image, bboxes, filename = parse_record(records[0])
        assert image.shape == (24, 32, 3)
        assert bboxes.shape[0] == 1

    def test_merge(self, tmp_path):
        voc = make_voc(str(tmp_path / "voc"))
        out = str(tmp_path / "out")
        runner = CliRunner()
        runner.invoke(
            transform,
            ["--type", "pascal", "--data-dir", voc, "--output-dir", out,
             "--split", "train"],
        )
        merged = str(tmp_path / "merged.tfrecords")
        result = runner.invoke(
            merge,
            [os.path.join(out, "train.tfrecords"),
             os.path.join(out, "train.tfrecords"), merged],
        )
        assert result.exit_code == 0, result.output
        assert len(list(read_tfrecords(merged))) == 4
