"""Tools tests: server endpoint, cloud launch spec, image_vis, CLI tree."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest
from click.testing import CliRunner


class TestCloudSpec:
    def test_build_launch_spec(self):
        from luminoth_tpu.tools.cloud.tpu import build_launch_spec

        spec = build_launch_spec(
            "myjob", "us-central1-a", "v5litepod-8", "tpu-ubuntu2204-base",
            "config.yml", num_hosts=2,
        )
        assert spec["create"][5] == "myjob"
        assert len(spec["train"]) == 2
        cmd0 = " ".join(spec["train"][0])
        # Multi-host pods rely on JAX's TPU-metadata auto-detection: a
        # coordinator hostname fabricated on the submitter (the old
        # "<name>-0") is not resolvable on the workers.
        assert "LUMI_DISTRIBUTED_AUTO=1" in cmd0
        assert "LUMI_COORDINATOR" not in cmd0
        # Local config: shipped to every host, remote path in the launch.
        assert len(spec["copy"]) == 1
        assert spec["copy"][0][5] == "config.yml"
        assert "lumi train -c ~/lumi-config.yml" in cmd0

    def test_launch_spec_resume_dataset_and_overrides(self):
        # Reference capability parity: --dataset upload + --resume
        # (tools/cloud/gcloud.py:236-270) map to a gsutil rsync +
        # dataset.dir/train.job_dir overrides on the remote command.
        from luminoth_tpu.tools.cloud.tpu import build_launch_spec

        spec = build_launch_spec(
            "myjob", "z", "v5e-8", "v2", "gs://b/cfg.yml", num_hosts=1,
            job_dir="gs://b/runs/myjob", dataset_dir="/data/voc",
            bucket="b", overrides=("train.learning_rate.value=0.001",),
        )
        rsync = [c for c in spec["copy"] if c[0] == "gsutil"]
        assert rsync == [[
            "gsutil", "-m", "rsync", "-r", "/data/voc",
            "gs://b/lumi-datasets/myjob",
        ]]
        cmd = " ".join(spec["train"][0])
        assert "-o train.learning_rate.value=0.001" in cmd
        assert "-o dataset.dir=gs://b/lumi-datasets/myjob" in cmd
        assert "-o train.job_dir=gs://b/runs/myjob" in cmd

        # A gs:// dataset needs no upload and no bucket.
        spec = build_launch_spec(
            "j", "z", "v5e-8", "v2", "gs://b/cfg.yml", num_hosts=1,
            dataset_dir="gs://elsewhere/voc",
        )
        assert all(c[0] != "gsutil" for c in spec["copy"])
        assert "-o dataset.dir=gs://elsewhere/voc" in " ".join(
            spec["train"][0]
        )

        # A local dataset without a destination bucket is an error.
        import pytest

        with pytest.raises(ValueError, match="--bucket"):
            build_launch_spec(
                "j", "z", "v5e-8", "v2", "gs://b/cfg.yml", num_hosts=1,
                dataset_dir="/data/voc",
            )

    def test_gcs_config_is_not_copied(self):
        from luminoth_tpu.tools.cloud.tpu import (
            build_eval_spec,
            build_launch_spec,
        )

        spec = build_launch_spec(
            "j", "z", "v5e-8", "v2", "gs://bucket/cfg.yml", num_hosts=1
        )
        assert spec["copy"] == []
        assert "lumi train -c gs://bucket/cfg.yml" in " ".join(
            spec["train"][0]
        )
        eval_spec = build_eval_spec("j", "z", "gs://bucket/cfg.yml")
        assert eval_spec["copy"] == []

    def test_build_eval_spec(self):
        from luminoth_tpu.tools.cloud.tpu import build_eval_spec

        spec = build_eval_spec(
            "myjob", "us-central1-a", "config.yml", split="test",
            watch=False,
        )
        cmd = " ".join(spec["eval"])
        assert "--worker=0" in cmd
        assert len(spec["copy"]) == 1
        assert spec["copy"][0][5] == "config.yml"
        assert (
            "lumi eval -c ~/lumi-eval-config.yml --split test --no-watch"
            in cmd
        )

    def test_evaluate_command_dry_run(self):
        from luminoth_tpu.tools.cloud.tpu import tpu

        result = CliRunner().invoke(
            tpu, ["evaluate", "--name", "j", "-c", "c.yml", "--dry-run"]
        )
        assert result.exit_code == 0, result.output
        # Config shipped first, then the detached remote eval.
        assert "scp c.yml" in result.output
        assert "lumi eval -c ~/lumi-eval-config.yml --split val" \
            in result.output

    def test_remote_jobs_launch_detached(self):
        # `lumi train`/`lumi eval --watch` never exit; a blocking ssh
        # would hang the submitter (and serialize multi-host launches
        # behind worker 0's whole run). Both specs must wrap the remote
        # command in a backgrounded nohup that the shell can parse.
        import subprocess

        from luminoth_tpu.tools.cloud.tpu import (
            build_eval_spec,
            build_launch_spec,
        )

        spec = build_launch_spec(
            "j", "z", "v5e-8", "v2", "cfg.yml", num_hosts=2
        )
        eval_spec = build_eval_spec("j", "z", "cfg.yml")
        launches = [c[-1] for c in spec["train"]] + [
            eval_spec["eval"][-1]
        ]
        for launch in launches:
            assert launch.startswith("nohup ")
            assert "&" in launch
            check = subprocess.run(
                ["sh", "-n", "-c", launch], capture_output=True
            )
            assert check.returncode == 0, check.stderr

    def test_eval_spec_isolates_evaluator_from_training_tpu(self):
        from luminoth_tpu.tools.cloud.tpu import build_eval_spec

        # Default: CPU evaluator can coexist with the training job
        # holding the (single-process) TPU.
        assert "JAX_PLATFORMS=cpu lumi eval" in " ".join(
            build_eval_spec("j", "z", "cfg.yml")["eval"]
        )
        assert "JAX_PLATFORMS=tpu lumi eval" in " ".join(
            build_eval_spec("j", "z", "cfg.yml", platform="tpu")["eval"]
        )

    def test_spec_command(self):
        from luminoth_tpu.tools.cloud.tpu import tpu

        runner = CliRunner()
        result = runner.invoke(
            tpu, ["spec", "--name", "j", "-c", "c.yml", "--num-hosts", "4"]
        )
        assert result.exit_code == 0
        payload = json.loads(result.output)
        assert len(payload["train"]) == 4


class TestImageVis:
    def test_summaries_fasterrcnn_train(self):
        from luminoth_tpu.utils.image_vis import image_vis_summaries

        image = np.zeros((60, 80, 3), np.float32)
        gt = np.asarray([[5, 5, 30, 30, 1], [0, 0, 0, 0, -1]])
        pred = {
            "rpn_prediction": {
                "proposals": np.asarray([[4, 4, 28, 28], [40, 40, 60, 50]]),
                "scores": np.asarray([0.9, 0.4]),
                "proposals_valid": np.asarray([True, True]),
                "rpn_cls_target": np.asarray([1.0, 0.0]),
            }
        }
        anchors = np.asarray([[4, 4, 28, 28], [40, 40, 60, 50]])
        out = image_vis_summaries(
            pred, config={"type": "fasterrcnn"}, image_vis_mode="train",
            image=image, gt_boxes=gt, all_anchors=anchors,
        )
        assert "draw_gt_boxes" in out
        # Train mode mirrors the reference registry (image_vis.py:23-41):
        # gt boxes + top NMS proposals + final objects.
        assert "draw_top_nms_proposals" in out
        assert out["draw_gt_boxes"].shape == (60, 80, 3)
        # Something was drawn (image isn't all black anymore).
        assert out["draw_gt_boxes"].max() > 0

    def test_summaries_eval_mode_detections(self):
        from luminoth_tpu.utils.image_vis import image_vis_summaries

        image = np.zeros((40, 40, 3), np.float32)
        pred = {
            "classification_prediction": {
                "objects": np.asarray([[5, 5, 25, 25]]),
                "labels": np.asarray([2]),
                "probs": np.asarray([0.8]),
                "valid": np.asarray([True]),
            }
        }
        out = image_vis_summaries(
            pred, config={"type": "fasterrcnn"}, image_vis_mode="eval",
            image=image,
        )
        assert "draw_object_predictions" in out
        assert out["draw_object_predictions"].max() > 0


class TestMultipartParser:
    def test_preserves_crlf_edges_in_binary_payload(self):
        # Payload starting with CRLF / ending with LF must survive: only
        # the single framing CRLF on each side may be trimmed.
        from luminoth_tpu.tools.server.web import _parse_multipart

        payload = b"\r\nBINARY\x0d\x0a"
        body = (
            b"--XYZ\r\n"
            b'Content-Disposition: form-data; name="image"; '
            b'filename="f.bin"\r\n'
            b"Content-Type: application/octet-stream\r\n\r\n"
            + payload
            + b"\r\n--XYZ\r\n"
            b'Content-Disposition: form-data; name="min_prob"\r\n\r\n'
            b"0.25\r\n"
            b"--XYZ--\r\n"
        )
        image, params = _parse_multipart(
            body, "multipart/form-data; boundary=XYZ"
        )
        assert image == payload
        assert params == {"min_prob": "0.25"}


class TestServer:
    def test_web_server_predict_endpoint(self, tmp_path):
        """Spin up the server with a stubbed network and POST an image."""
        import io as _io

        from PIL import Image

        import importlib

        web_mod = importlib.import_module("luminoth_tpu.tools.server.web")

        class FakeNetwork:
            def predict_image(self, image):
                return [
                    {"bbox": [1, 2, 3, 4], "label": "cat", "prob": 0.9},
                    {"bbox": [1, 2, 3, 4], "label": "dog", "prob": 0.2},
                ]

        web_mod.PREDICTOR_NETWORK = FakeNetwork()
        web_mod.NETWORK_START_THREAD = None
        web_mod.Handler.model_name = "fasterrcnn"

        from http.server import ThreadingHTTPServer

        httpd = ThreadingHTTPServer(("127.0.0.1", 0), web_mod.Handler)
        port = httpd.server_address[1]
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        try:
            # GET index
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=5
            ) as resp:
                body = resp.read()
            assert b"fasterrcnn" in body

            # POST an image (raw body path)
            buf = _io.BytesIO()
            Image.new("RGB", (20, 20)).save(buf, "JPEG")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/fasterrcnn/predict/",
                data=buf.getvalue(),
                method="POST",
            )
            with urllib.request.urlopen(req, timeout=5) as resp:
                payload = json.load(resp)
            assert len(payload["objects"]) == 2
            assert payload["objects"][0]["label"] == "cat"

            # POST multipart with a min_prob filter field.
            boundary = "xxBOUNDARYxx"
            img_bytes = buf.getvalue()
            body = b""
            body += f"--{boundary}\r\n".encode()
            body += (
                b'Content-Disposition: form-data; name="image"; '
                b'filename="a.jpg"\r\nContent-Type: image/jpeg\r\n\r\n'
            ) + img_bytes + b"\r\n"
            body += f"--{boundary}\r\n".encode()
            body += (
                b'Content-Disposition: form-data; name="min_prob"\r\n\r\n'
                b"0.5\r\n"
            )
            body += f"--{boundary}--\r\n".encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/api/fasterrcnn/predict/",
                data=body,
                method="POST",
                headers={
                    "Content-Type": f"multipart/form-data; boundary={boundary}"
                },
            )
            with urllib.request.urlopen(req, timeout=5) as resp:
                payload = json.load(resp)
            # dog (0.2) filtered by min_prob 0.5
            assert len(payload["objects"]) == 1

            # Malformed numeric fields must come back as HTTP 400 with
            # a JSON error, not a dropped connection.
            def post_form(fields):
                form = b""
                for name, value in fields.items():
                    form += f"--{boundary}\r\n".encode()
                    if name == "image":
                        form += (
                            b'Content-Disposition: form-data; '
                            b'name="image"; filename="a.jpg"\r\n'
                            b"Content-Type: image/jpeg\r\n\r\n"
                        ) + value + b"\r\n"
                    else:
                        form += (
                            f'Content-Disposition: form-data; '
                            f'name="{name}"\r\n\r\n{value}\r\n'
                        ).encode()
                form += f"--{boundary}--\r\n".encode()
                return urllib.request.Request(
                    f"http://127.0.0.1:{port}/api/fasterrcnn/predict/",
                    data=form, method="POST",
                    headers={"Content-Type":
                             f"multipart/form-data; boundary={boundary}"},
                )

            bad = post_form({"image": img_bytes, "min_prob": "abc"})
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(bad, timeout=5)
            assert exc_info.value.code == 400
            assert "error" in json.load(exc_info.value)

            # A predictor exception must surface as HTTP 500 JSON.
            class BrokenNetwork:
                def predict_image(self, image):
                    raise RuntimeError("boom")

            web_mod.PREDICTOR_NETWORK = BrokenNetwork()
            broken = post_form({"image": img_bytes})
            with pytest.raises(urllib.error.HTTPError) as exc_info:
                urllib.request.urlopen(broken, timeout=5)
            assert exc_info.value.code == 500
            assert "boom" in json.load(exc_info.value)["error"]
        finally:
            web_mod.PREDICTOR_NETWORK = None
            httpd.shutdown()


class TestCLITree:
    def test_all_commands_registered(self):
        from luminoth_tpu.cli import cli

        commands = set(cli.list_commands(None))
        assert {"train", "predict", "eval", "checkpoint", "dataset",
                "server", "cloud"} <= commands
        # The lazy group must resolve each listed command to a real
        # click command at invocation time.
        for name in sorted(commands):
            import click

            assert isinstance(cli.get_command(None, name), click.Command)

    def test_help_runs(self):
        from luminoth_tpu.cli import cli

        runner = CliRunner()
        result = runner.invoke(cli, ["--help"])
        assert result.exit_code == 0
        result = runner.invoke(cli, ["dataset", "--help"])
        assert result.exit_code == 0
        result = runner.invoke(cli, ["checkpoint", "--help"])
        assert result.exit_code == 0


class TestCloudTrainReuse:
    def test_existing_tpu_is_reused_not_recreated(self, monkeypatch):
        """Re-submitting with the same --name (the documented resume
        flow) must probe with `describe` and skip `create` when the TPU
        is live — `create` errors on an existing TPU."""
        import importlib

        tpu_mod = importlib.import_module("luminoth_tpu.tools.cloud.tpu")
        calls = []

        def fake_run(cmd, dry_run=False, stream=False):
            calls.append(cmd)
            return None

        monkeypatch.setattr(tpu_mod, "_run", fake_run)
        result = CliRunner().invoke(
            tpu_mod.tpu,
            ["train", "--name", "j", "-c", "gs://b/cfg.yml"],
        )
        assert result.exit_code == 0, result.output
        verbs = [c[4] for c in calls if c[:4] ==
                 ["gcloud", "compute", "tpus", "tpu-vm"]]
        assert "describe" in verbs
        assert "create" not in verbs  # describe succeeded -> reuse
        assert "reusing" in result.output

    def test_absent_tpu_is_created(self, monkeypatch):
        import importlib

        import click as click_mod

        tpu_mod = importlib.import_module("luminoth_tpu.tools.cloud.tpu")
        calls = []

        def fake_run(cmd, dry_run=False, stream=False):
            calls.append(cmd)
            if len(cmd) > 4 and cmd[4] == "describe":
                raise click_mod.ClickException("not found")
            return None

        monkeypatch.setattr(tpu_mod, "_run", fake_run)
        result = CliRunner().invoke(
            tpu_mod.tpu,
            ["train", "--name", "j", "-c", "gs://b/cfg.yml"],
        )
        assert result.exit_code == 0, result.output
        verbs = [c[4] for c in calls if c[:4] ==
                 ["gcloud", "compute", "tpus", "tpu-vm"]]
        assert verbs.index("describe") < verbs.index("create")
