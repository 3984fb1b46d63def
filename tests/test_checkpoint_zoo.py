"""Checkpoint zoo lifecycle: create → list/info → export → import → delete."""

import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

from luminoth_tpu.utils.checkpoint_io import CheckpointManager
from luminoth_tpu.utils.config import Config, dump_config


@pytest.fixture
def zoo_env(tmp_path, monkeypatch):
    home = tmp_path / "home"
    monkeypatch.setenv("LUMI_HOME", str(home))
    return tmp_path


def make_fake_run(tmp_path):
    """A fake training run dir + user config file."""
    job_dir = tmp_path / "jobs"
    run_dir = job_dir / "myrun" / "ckpt"
    manager = CheckpointManager(str(run_dir))
    state = {
        "step": 7,
        "params": {"w": np.ones((2, 2), np.float32)},
        "batch_stats": {},
        "opt_state": {"momentum": np.zeros((2, 2), np.float32)},
    }
    manager.save(state, 7)

    data_dir = tmp_path / "data"
    os.makedirs(data_dir, exist_ok=True)
    with open(data_dir / "classes.json", "w") as f:
        json.dump(["a", "b"], f)

    config = Config(
        {
            "train": {"job_dir": str(job_dir), "run_name": "myrun"},
            "dataset": {"type": "object_detection", "dir": str(data_dir),
                        "split": "train"},
            "model": {"type": "fasterrcnn",
                      "network": {"num_classes": 2}},
        }
    )
    config_path = tmp_path / "config.yml"
    with open(config_path, "w") as f:
        f.write(dump_config(config))
    return str(config_path)


def test_zoo_lifecycle(zoo_env, tmp_path):
    from luminoth_tpu.tools.checkpoint import (
        checkpoint,
        get_checkpoint,
        get_checkpoint_class_labels,
        get_checkpoint_config,
        read_checkpoint_db,
    )

    config_path = make_fake_run(zoo_env)
    runner = CliRunner()

    # create (configs are positional, as in the reference; -c also works)
    result = runner.invoke(
        checkpoint, ["create", config_path, "--alias", "mymodel"]
    )
    assert result.exit_code == 0, result.output
    assert "created successfully" in result.output

    db = read_checkpoint_db()
    assert len(db["checkpoints"]) == 1
    entry = db["checkpoints"][0]
    assert entry["alias"] == "mymodel"

    # list / info
    result = runner.invoke(checkpoint, ["list"])
    assert entry["id"] in result.output
    result = runner.invoke(checkpoint, ["info", "mymodel"])
    assert entry["id"] in result.output

    # config resolution through the zoo (what predict --checkpoint does)
    cfg = get_checkpoint_config("mymodel", prompt=False)
    assert cfg.model.type == "fasterrcnn"
    assert os.path.isdir(cfg.train.job_dir)
    # the bundled weight file is discoverable by the predictor's search
    from luminoth_tpu.utils.checkpoint_io import CheckpointManager

    assert CheckpointManager(cfg.train.job_dir).latest_step() == 7
    assert get_checkpoint_class_labels("mymodel") == ["a", "b"]

    # edit
    result = runner.invoke(
        checkpoint, ["edit", "mymodel", "--description", "hello"]
    )
    assert result.exit_code == 0
    db = read_checkpoint_db()
    assert db["checkpoints"][0]["description"] == "hello"

    # edit via the reference's -e field=value metadata entries, incl. a
    # dotted field (reference: tools/checkpoint/__init__.py:220-245,527)
    result = runner.invoke(
        checkpoint,
        ["edit", "mymodel", "-e", "name=renamed",
         "-e", "dataset.num_classes=2"],
    )
    assert result.exit_code == 0
    db = read_checkpoint_db()
    assert db["checkpoints"][0]["name"] == "renamed"
    assert db["checkpoints"][0]["dataset"]["num_classes"] == "2"

    # disallowed / repeated / malformed entries are rejected untouched
    for bad in (["-e", "status=X"], ["-e", "name=a", "-e", "name=b"],
                ["-e", "noequals"]):
        result = runner.invoke(checkpoint, ["edit", "mymodel"] + bad)
        assert read_checkpoint_db()["checkpoints"][0]["name"] == "renamed"

    # export → delete → import round trip
    out_dir = str(tmp_path / "exports")
    os.makedirs(out_dir, exist_ok=True)
    result = runner.invoke(
        checkpoint, ["export", "mymodel", "--output", out_dir]
    )
    assert result.exit_code == 0, result.output
    tar_path = os.path.join(out_dir, f"{entry['id']}.tar")
    assert os.path.exists(tar_path)

    result = runner.invoke(checkpoint, ["delete", "mymodel"])
    assert result.exit_code == 0
    assert read_checkpoint_db()["checkpoints"] == []

    result = runner.invoke(checkpoint, ["import", tar_path])
    assert result.exit_code == 0, result.output
    db = read_checkpoint_db()
    assert db["checkpoints"][0]["id"] == entry["id"]
    cfg = get_checkpoint_config(entry["id"], prompt=False)
    assert cfg.model.type == "fasterrcnn"


def test_download_remote_checkpoint_unpacks_export_bundle(zoo_env, tmp_path):
    """`lumi checkpoint download` must land an export-produced tar at
    checkpoints/<id>/config.yml, not double-nest it under <id>/<id>/."""
    from luminoth_tpu.tools.checkpoint import (
        checkpoint,
        download_remote_checkpoint,
        get_checkpoint_config,
        get_checkpoint_path,
        read_checkpoint_db,
    )

    config_path = make_fake_run(zoo_env)
    runner = CliRunner()
    result = runner.invoke(
        checkpoint, ["create", config_path, "--alias", "remoteme"]
    )
    assert result.exit_code == 0, result.output
    entry = read_checkpoint_db()["checkpoints"][0]

    out_dir = str(tmp_path / "remote")
    os.makedirs(out_dir, exist_ok=True)
    result = runner.invoke(
        checkpoint, ["export", "remoteme", "--output", out_dir]
    )
    assert result.exit_code == 0, result.output
    tar_path = os.path.join(out_dir, f"{entry['id']}.tar")

    # Wipe the local copy, then "download" the bundle via a file:// URL.
    runner.invoke(checkpoint, ["delete", "remoteme"])
    db = read_checkpoint_db()
    remote_entry = dict(
        entry, url=f"file://{tar_path}", source="remote",
        status="NOT_DOWNLOADED",
    )
    download_remote_checkpoint(db, remote_entry)

    bundle = get_checkpoint_path(entry["id"])
    assert os.path.exists(os.path.join(bundle, "config.yml"))
    assert not os.path.isdir(os.path.join(bundle, entry["id"]))
    cfg = get_checkpoint_config(entry["id"], prompt=False)
    assert cfg.model.type == "fasterrcnn"


@pytest.mark.slow
def test_remote_zoo_cold_start(tmp_path, monkeypatch):
    """The full self-hosted zoo path, cold: a publisher trains a model,
    creates + exports a bundle and builds an index; a consumer with an
    EMPTY home and only ``LUMI_REMOTE_INDEX_URL`` set runs
    refresh → download → ``lumi predict --checkpoint <alias>``
    (reference: luminoth/tools/checkpoint/__init__.py:270-332 — the
    hosted-zoo workflow, here with zero egress via file:// URLs)."""
    import io as io_mod

    from PIL import Image

    from luminoth_tpu import train as train_module
    from luminoth_tpu.formats.example_pb import encode_sequence_example
    from luminoth_tpu.formats.tfrecord import TFRecordWriter
    from luminoth_tpu.tools.checkpoint import checkpoint, read_checkpoint_db
    from luminoth_tpu.utils.config import get_base_config, get_model_config
    from luminoth_tpu.models.fasterrcnn import FasterRCNN

    # --- publisher side: tiny dataset + 1-step trained run ------------
    monkeypatch.setenv("LUMI_HOME", str(tmp_path / "publisher_home"))
    data_dir = tmp_path / "data"
    data_dir.mkdir()
    rng = np.random.RandomState(0)
    with TFRecordWriter(str(data_dir / "train.tfrecords")) as w:
        for i in range(2):
            arr = rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)
            buf = io_mod.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG")
            w.write(encode_sequence_example(
                {"image_raw": buf.getvalue(),
                 "filename": f"img{i}.jpg".encode(),
                 "width": 100, "height": 80, "depth": 3},
                {"label": [[0]], "xmin": [[10]], "ymin": [[10]],
                 "xmax": [[40]], "ymax": [[40]]},
            ))
    with open(data_dir / "classes.json", "w") as f:
        json.dump(["cat", "dog"], f)

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 2
    cfg.model.base_network.architecture = "resnet_v1_50"
    cfg.model.rpn.proposals.pre_nms_top_n = 64
    cfg.model.rpn.proposals.post_nms_top_n = 16
    cfg.model.rpn.target.minibatch_size = 32
    cfg.model.rcnn.target.minibatch_size = 8
    cfg.model.rcnn.proposals.total_max_detections = 5
    cfg.model.rcnn.proposals.class_max_detections = 5
    cfg.dataset.dir = str(data_dir)
    cfg.dataset.image_preprocessing = Config(
        {"min_size": 64, "max_size": 96})
    cfg.dataset.max_gt_boxes = 8
    cfg.dataset.data_augmentation = []
    cfg.train.batch_size = 2
    cfg.train.num_epochs = 1
    cfg.train.job_dir = str(tmp_path / "jobs")
    cfg.train.run_name = "zoorun"
    cfg.train.save_checkpoint_secs = 0
    cfg.train.save_summaries_secs = 100000
    cfg.train.seed = 3
    train_module.run(cfg, max_steps=1)

    config_path = tmp_path / "config.yml"
    with open(config_path, "w") as f:
        f.write(dump_config(cfg))

    runner = CliRunner()
    result = runner.invoke(
        checkpoint, ["create", str(config_path), "--alias", "fast"])
    assert result.exit_code == 0, result.output
    entry = read_checkpoint_db()["checkpoints"][0]

    zoo_dir = tmp_path / "zoo"
    zoo_dir.mkdir()
    result = runner.invoke(
        checkpoint, ["export", "fast", "--output", str(zoo_dir)])
    assert result.exit_code == 0, result.output
    result = runner.invoke(checkpoint, ["build-index", str(zoo_dir)])
    assert result.exit_code == 0, result.output
    index_path = zoo_dir / "index.json"
    assert index_path.exists()
    index = json.load(open(index_path))
    assert index["checkpoints"][0]["id"] == entry["id"]
    assert index["checkpoints"][0]["url"].startswith("file://")

    # --- consumer side: empty home, only the index URL -----------------
    monkeypatch.setenv("LUMI_HOME", str(tmp_path / "consumer_home"))
    monkeypatch.setenv("LUMI_REMOTE_INDEX_URL", f"file://{index_path}")

    result = runner.invoke(checkpoint, ["refresh"])
    assert "refreshed" in result.output, result.output
    result = runner.invoke(checkpoint, ["list"])
    assert entry["id"] in result.output
    assert "NOT_DOWNLOADED" in result.output

    result = runner.invoke(checkpoint, ["download", "fast"])
    assert "downloaded" in result.output, result.output

    # the real user surface: predict by alias, cold
    img_path = tmp_path / "query.jpg"
    Image.fromarray(
        rng.randint(0, 255, (80, 100, 3), dtype=np.uint8)
    ).save(img_path)
    out_path = tmp_path / "pred.json"
    from luminoth_tpu.predict import predict as predict_cmd

    result = runner.invoke(predict_cmd, [
        str(img_path), "--checkpoint", "fast", "--min-prob", "0",
        "-f", str(out_path),
    ])
    assert result.exit_code == 0, result.output
    pred = json.loads(open(out_path).read().strip().splitlines()[-1])
    assert pred["file"].endswith("query.jpg")
    for obj in pred["objects"]:
        assert obj["label"] in ("cat", "dog")


def test_extractall_checked_rejects_escapes_and_links(tmp_path):
    """The pre-3.10.12 fallback must reject both path traversal and link
    members (a symlink extracted first can route a later member outside
    the destination even though its realpath looks contained)."""
    import io
    import tarfile

    from luminoth_tpu.tools.checkpoint import _extractall_checked

    def make_tar(build):
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w") as tar:
            build(tar)
        buf.seek(0)
        return tarfile.open(fileobj=buf)

    def add_file(tar, name, data=b"x"):
        info = tarfile.TarInfo(name)
        info.size = len(data)
        tar.addfile(info, io.BytesIO(data))

    dest = tmp_path / "out"
    dest.mkdir()

    # Plain traversal.
    with make_tar(lambda t: add_file(t, "../evil")) as tar:
        with pytest.raises(RuntimeError, match="escapes"):
            _extractall_checked(tar, str(dest))

    # Symlink member, then a file routed through it: the file's
    # realpath cannot resolve the (not yet extracted) link, so only the
    # link rejection catches it.
    def build_linked(tar):
        link = tarfile.TarInfo("lnk")
        link.type = tarfile.SYMTYPE
        link.linkname = str(tmp_path / "outside")
        tar.addfile(link)
        add_file(tar, "lnk/through")

    with make_tar(build_linked) as tar:
        with pytest.raises(RuntimeError, match="link"):
            _extractall_checked(tar, str(dest))
    assert not (tmp_path / "outside").exists()

    # Benign archive extracts fine.
    with make_tar(lambda t: add_file(t, "sub/ok.txt", b"hello")) as tar:
        _extractall_checked(tar, str(dest))
    assert (dest / "sub" / "ok.txt").read_bytes() == b"hello"


def test_flat_tar_import_lands_under_metadata_id(zoo_env, tmp_path):
    """A flat tar (files at the tar root, the layout
    download_remote_checkpoint accepts) whose metadata.json names an id
    must extract into checkpoints/<id>/ — the index resolves bundles by
    id, so a mismatched directory would make the import unusable."""
    import tarfile

    from luminoth_tpu.tools.checkpoint import (
        checkpoint,
        get_checkpoint_path,
        read_checkpoint_db,
    )

    src = tmp_path / "flat"
    src.mkdir()
    (src / "config.yml").write_text("model:\n  type: fasterrcnn\n")
    meta = {"id": "abcdef123456", "name": "flat", "alias": "fl"}
    (src / "metadata.json").write_text(json.dumps(meta))
    tar_path = str(tmp_path / "flat.tar")
    with tarfile.open(tar_path, "w") as tar:
        tar.add(src / "config.yml", arcname="config.yml")
        tar.add(src / "metadata.json", arcname="metadata.json")

    runner = CliRunner()
    result = runner.invoke(checkpoint, ["import", tar_path])
    assert result.exit_code == 0, result.output
    db = read_checkpoint_db()
    assert db["checkpoints"][0]["id"] == "abcdef123456"
    bundle = get_checkpoint_path("abcdef123456")
    assert os.path.isfile(os.path.join(bundle, "config.yml"))

    # A second import of the same id must fail cleanly, not clobber.
    result = runner.invoke(checkpoint, ["import", tar_path])
    assert result.exit_code != 0
    assert "already exists" in result.output


def test_export_keeps_nested_metadata_files(zoo_env, tmp_path):
    """Only the bundle-root metadata.json is replaced on export; nested
    files that happen to share the name are user data and must ship."""
    import tarfile

    from luminoth_tpu.tools.checkpoint import (
        checkpoint,
        get_checkpoint_path,
        read_checkpoint_db,
    )

    config_path = make_fake_run(zoo_env)
    runner = CliRunner()
    result = runner.invoke(
        checkpoint, ["create", config_path, "--alias", "nested"]
    )
    assert result.exit_code == 0, result.output
    entry = read_checkpoint_db()["checkpoints"][0]
    bundle = get_checkpoint_path(entry["id"])
    os.makedirs(os.path.join(bundle, "assets"), exist_ok=True)
    with open(os.path.join(bundle, "assets", "metadata.json"), "w") as f:
        json.dump({"user": "data"}, f)

    out_dir = str(tmp_path / "exports")
    os.makedirs(out_dir, exist_ok=True)
    result = runner.invoke(
        checkpoint, ["export", "nested", "--output", out_dir]
    )
    assert result.exit_code == 0, result.output
    with tarfile.open(os.path.join(out_dir, f"{entry['id']}.tar")) as tar:
        names = tar.getnames()
    assert f"{entry['id']}/assets/metadata.json" in names
    # Exactly one top-level metadata.json (the fresh index entry).
    assert names.count(f"{entry['id']}/metadata.json") == 1
