"""Remote-path IO: the fileio layer and non-local URIs end to end.

The reference reads configs, TFRecords and checkpoints from GCS
transparently via ``tf.gfile`` (reference: luminoth/utils/config.py:37,
luminoth/datasets/base_dataset.py:37). Here every file touch routes
through ``utils/fileio.py``; these tests run the train-save →
eval → predict cycle on ``memory://`` URIs (fsspec's built-in
in-memory filesystem — the same plug point a ``gs://`` path takes).
"""

import io
import json
import os

import numpy as np
import pytest
from PIL import Image

from luminoth_tpu.formats.example_pb import encode_sequence_example
from luminoth_tpu.formats.tfrecord import TFRecordWriter, read_tfrecords
from luminoth_tpu.utils import fileio
from luminoth_tpu.utils.config import Config, get_base_config, get_model_config


@pytest.fixture(autouse=True)
def clean_memory_fs():
    import fsspec

    fs = fsspec.filesystem("memory")
    yield fs
    try:
        fs.rm("/", recursive=True)
    except Exception:
        pass


class TestFileIOUnit:
    def test_local_paths_use_plain_os(self, tmp_path):
        p = tmp_path / "x.txt"
        with fileio.open_file(str(p), "w") as f:
            f.write("hello")
        assert fileio.exists(str(p))
        assert not fileio.is_remote(str(p))
        assert fileio.join(str(tmp_path), "a", "b") == str(
            tmp_path / "a" / "b"
        )

    def test_memory_roundtrip(self):
        path = "memory://bucket/dir/file.bin"
        with fileio.open_file(path, "wb") as f:
            f.write(b"\x00\x01payload")
        assert fileio.is_remote(path)
        assert fileio.exists(path)
        with fileio.open_file(path, "rb") as f:
            assert f.read() == b"\x00\x01payload"
        fileio.remove(path)
        assert not fileio.exists(path)

    def test_join_glob_listdir_preserve_scheme(self):
        base = "memory://bucket/data"
        assert fileio.join(base, "train.tfrecords") == (
            "memory://bucket/data/train.tfrecords"
        )
        for name in ("train-00000.tfrecords", "train-00001.tfrecords"):
            with fileio.open_file(fileio.join(base, name), "wb") as f:
                f.write(b"x")
        found = fileio.glob(fileio.join(base, "train-*.tfrecords"))
        assert len(found) == 2
        assert all(p.startswith("memory://") for p in found)
        # globbed paths are directly openable
        with fileio.open_file(found[0], "rb") as f:
            assert f.read() == b"x"
        assert sorted(fileio.listdir(base)) == [
            "train-00000.tfrecords", "train-00001.tfrecords",
        ]

    def test_listdir_missing_remote_dir_is_empty(self):
        # Object-store makedirs is a no-op (prefixes only exist once an
        # object is written), so a fresh remote run_dir must list as
        # empty at train start rather than crash checkpoint discovery.
        assert fileio.listdir("memory://never-written-prefix/run0") == []
        # Local misses still raise — that's a real error.
        import pytest as _pytest

        with _pytest.raises(FileNotFoundError):
            fileio.listdir("/nonexistent-local-dir-xyz")

    def test_replace_moves_remote(self):
        src = "memory://bucket/a.tmp"
        dst = "memory://bucket/a"
        with fileio.open_file(src, "wb") as f:
            f.write(b"data")
        fileio.replace(src, dst)
        assert fileio.exists(dst)
        assert not fileio.exists(src)

    def test_tfrecord_roundtrip_remote(self):
        path = "memory://bucket/ds/train.tfrecords"
        with TFRecordWriter(path) as w:
            w.write(b"rec-one")
            w.write(b"rec-two")
        assert list(read_tfrecords(path, verify=True)) == [
            b"rec-one", b"rec-two",
        ]

    def test_config_loads_from_remote(self):
        from luminoth_tpu.utils.config import load_config_files

        path = "memory://cfgs/run.yml"
        with fileio.open_file(path, "w") as f:
            f.write("train:\n  run_name: remote-run\n")
        cfg = load_config_files([path])
        assert cfg.train.run_name == "remote-run"

    def test_checkpoint_manager_remote(self):
        from luminoth_tpu.utils.checkpoint_io import CheckpointManager

        manager = CheckpointManager("memory://jobs/run/ckpt", max_to_keep=2)
        state = {"step": 0, "w": np.arange(4, dtype=np.float32)}
        for step in (1, 2, 3):
            manager.save(dict(state, step=step), step)
        # rotation kept the newest two
        assert manager.all_steps() == [2, 3]
        restored = manager.restore(
            {"step": 0, "w": np.zeros(4, np.float32)}, 3
        )
        assert restored["step"] == 3
        np.testing.assert_array_equal(
            restored["w"], np.arange(4, dtype=np.float32)
        )


def write_dataset_remote(base):
    rng = np.random.RandomState(0)
    with TFRecordWriter(fileio.join(base, "train.tfrecords")) as w:
        for i in range(2):
            arr = rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write(encode_sequence_example(
                {"image_raw": buf.getvalue(),
                 "filename": f"img{i}.jpg".encode(),
                 "width": 100, "height": 80, "depth": 3},
                {"label": [[0]], "xmin": [[10]], "ymin": [[10]],
                 "xmax": [[40]], "ymax": [[40]]},
            ))
    with fileio.open_file(fileio.join(base, "classes.json"), "w") as f:
        json.dump(["cat", "dog"], f)


@pytest.mark.slow
def test_train_eval_predict_on_remote_uris(tmp_path, monkeypatch):
    """train-save → eval over saved ckpts → predict, all on memory://
    (the cloud-training workflow: ``job_dir`` and ``data_dir`` both
    non-local, as with a ``gs://bucket/run``)."""
    # summaries mirror locally for remote job_dirs — keep them in tmp
    monkeypatch.setenv("LUMI_HOME", str(tmp_path / "home"))
    from luminoth_tpu import train as train_module
    from luminoth_tpu.eval import get_checkpoints, watch_checkpoints
    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.utils.config import to_plain
    from luminoth_tpu.utils.predicting import PredictorNetwork

    data_dir = "memory://bucket/data"
    write_dataset_remote(data_dir)

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 2
    cfg.model.base_network.architecture = "resnet_v1_50"
    cfg.model.rpn.proposals.pre_nms_top_n = 64
    cfg.model.rpn.proposals.post_nms_top_n = 16
    cfg.model.rpn.target.minibatch_size = 32
    cfg.model.rcnn.target.minibatch_size = 8
    cfg.model.rcnn.proposals.total_max_detections = 5
    cfg.model.rcnn.proposals.class_max_detections = 5
    cfg.dataset.dir = data_dir
    cfg.dataset.image_preprocessing = Config(
        {"min_size": 64, "max_size": 96})
    cfg.dataset.max_gt_boxes = 8
    cfg.dataset.data_augmentation = []
    cfg.train.batch_size = 2
    cfg.train.num_epochs = 1
    cfg.train.job_dir = "memory://bucket/jobs"
    cfg.train.run_name = "remoterun"
    cfg.train.save_checkpoint_secs = 0
    cfg.train.save_summaries_secs = 100000
    cfg.train.seed = 3

    state = train_module.run(cfg, max_steps=1)
    assert int(state.step) == 1
    assert fileio.exists(
        "memory://bucket/jobs/remoterun/ckpt/ckpt_step_1.msgpack"
    )

    # eval discovers and reads the remote checkpoints (the watch-loop
    # machinery with watch=False: evaluate every new ckpt, then return)
    run_dir = "memory://bucket/jobs/remoterun"
    assert get_checkpoints(run_dir) == [1]
    cfg.train.random_shuffle = False
    model = FasterRCNN(to_plain(cfg))
    watch_checkpoints(cfg, model, run_dir, watch=False)

    # predict restores weights through the same remote path
    network = PredictorNetwork(cfg, class_labels=["cat", "dog"])
    image = np.random.RandomState(1).randint(
        0, 255, (80, 100, 3), dtype=np.uint8
    )
    objects = network.predict_image(image)
    assert isinstance(objects, list)
