"""Reference detector-checkpoint conversion tests (zoo `accurate`/`fast`).

Builds synthetic TF checkpoints with the reference's full variable layout
(sonnet outer scopes + slim backbone names + sonnet `w`/`b` head pairs),
converts them with ``convert_zoo_checkpoint``, and runs the result
end-to-end through ``PredictorNetwork``. Heads are pure renames (sonnet
Conv2D kernels are HWIO, snt.Linear weights (in, out)); backbone
numerics are covered by test_slim_conversion.py.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from flax.traverse_util import flatten_dict  # noqa: E402

from luminoth_tpu.models import get_model  # noqa: E402
from luminoth_tpu.tools.checkpoint.zoo_convert import (  # noqa: E402
    convert_zoo_checkpoint,
)
from luminoth_tpu.utils.config import (  # noqa: E402
    Config,
    get_base_config,
    get_model_config,
    to_plain,
)

from test_slim_conversion import (  # noqa: E402
    make_slim_resnet_values,
    make_slim_vgg_values,
    save_slim_checkpoint,
)


def _frcnn_config(tmp_path):
    from luminoth_tpu.models.fasterrcnn import FasterRCNN

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 3
    cfg.model.base_network.architecture = "resnet_v1_50"
    cfg.model.rpn.proposals.pre_nms_top_n = 32
    cfg.model.rpn.proposals.post_nms_top_n = 8
    cfg.model.rcnn.proposals.total_max_detections = 5
    cfg.model.rcnn.proposals.min_prob_threshold = 0.0
    cfg.dataset.image_preprocessing = Config({"min_size": 64, "max_size": 96})
    cfg.train.job_dir = str(tmp_path / "converted")
    cfg.train.run_name = None
    return cfg


def _ssd_config(tmp_path):
    from luminoth_tpu.models.ssd import SSD

    cfg = get_model_config(get_base_config(SSD), Config({}), [])
    cfg.model.network.num_classes = 3
    cfg.model.proposals.total_max_detections = 5
    cfg.model.proposals.min_prob_threshold = 0.0
    cfg.train.job_dir = str(tmp_path / "converted")
    cfg.train.run_name = None
    return cfg


def _our_param_shapes(cfg, image_hw):
    model = get_model(cfg.model.type)(to_plain(cfg))
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, *image_hw, 3), jnp.float32),
            train=False,
        )
    )
    return {
        "/".join(k): v.shape
        for k, v in flatten_dict(variables["params"]).items()
    }


def _head_vals(rng, shapes, flax_prefix, ref_prefix):
    """Random sonnet-style w/b values for a flax kernel/bias pair."""
    vals = {}
    vals[f"{ref_prefix}/w"] = (
        rng.randn(*shapes[f"{flax_prefix}/kernel"]) * 0.05
    ).astype(np.float32)
    if f"{flax_prefix}/bias" in shapes:
        vals[f"{ref_prefix}/b"] = (
            rng.randn(*shapes[f"{flax_prefix}/bias"]) * 0.05
        ).astype(np.float32)
    return vals


def build_frcnn_ref_values(cfg, image_hw=(64, 64), seed=7):
    """Deterministic reference-layout FRCNN checkpoint values."""
    shapes = _our_param_shapes(cfg, image_hw)
    _, backbone_vals = make_slim_resnet_values(50)
    prefix = "fasterrcnn/truncated_base_network"
    vals = {
        f"{prefix}/{name}": value
        for name, value in backbone_vals.items()
        if "logits" not in name and name != "global_step"
    }
    rng = np.random.RandomState(seed)
    for head in ("rpn/conv", "rpn/cls_conv", "rpn/bbox_conv",
                 "rcnn/fc_classifier", "rcnn/fc_bbox"):
        vals.update(_head_vals(rng, shapes, head, f"fasterrcnn/{head}"))
    return vals


def build_ssd_ref_values(cfg, seed=8):
    """Deterministic reference-layout SSD checkpoint values."""
    shapes = _our_param_shapes(cfg, (300, 300))
    vgg_vals = make_slim_vgg_values()
    prefix = "ssd/ssd_feature_extractor"
    vals = {f"{prefix}/{name}": value for name, value in vgg_vals.items()}
    rng = np.random.RandomState(seed)
    extras = ("conv6", "conv7", "conv8_1", "conv8_2", "conv9_1",
              "conv9_2", "conv10_1", "conv10_2", "conv11_1", "conv11_2")
    for name in extras:
        vals.update(
            _head_vals(
                rng, shapes, f"feature_extractor/{name}",
                f"{prefix}/{name}",
            )
        )
    vals[f"{prefix}/conv_4_3_norm/scale"] = np.full(
        shapes["feature_extractor/conv4_3_norm/gamma"], 20.0, np.float32
    )
    i = 0
    while f"MultiBox_{i}_offsets_conv/kernel" in shapes:
        for kind in ("offsets", "classes"):
            vals.update(
                _head_vals(
                    rng, shapes, f"MultiBox_{i}_{kind}_conv",
                    f"ssd/MultiBox_{i}_{kind}_conv",
                )
            )
        i += 1
    assert i == 6
    return vals


class TestFasterRCNNZooConversion:
    def test_convert_and_predict(self, tmp_path):
        cfg = _frcnn_config(tmp_path)
        vals = build_frcnn_ref_values(cfg)
        ckpt = save_slim_checkpoint(vals, str(tmp_path / "ref.ckpt"))

        n_loaded, n_total = convert_zoo_checkpoint(
            ckpt, str(tmp_path / "converted" / "ckpt"), cfg
        )
        assert n_loaded == n_total

        from luminoth_tpu.utils.predicting import PredictorNetwork

        network = PredictorNetwork(cfg)
        # Head values landed verbatim.
        loaded = network._variables["params"]["rpn"]["cls_conv"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(loaded), vals["fasterrcnn/rpn/cls_conv/w"]
        )
        image = np.random.RandomState(1).randint(
            0, 255, (70, 90, 3)
        ).astype(np.float32)
        results = network.predict_image(image)
        assert isinstance(results, list)
        for obj in results:
            assert set(obj) == {"bbox", "label", "prob"}


class TestSSDZooConversion:
    def test_convert_and_predict(self, tmp_path):
        cfg = _ssd_config(tmp_path)
        vals = build_ssd_ref_values(cfg)
        ckpt = save_slim_checkpoint(vals, str(tmp_path / "ref_ssd.ckpt"))

        n_loaded, n_total = convert_zoo_checkpoint(
            ckpt, str(tmp_path / "converted" / "ckpt"), cfg
        )
        assert n_loaded == n_total

        from luminoth_tpu.utils.predicting import PredictorNetwork

        network = PredictorNetwork(cfg)
        loaded = network._variables["params"][
            "MultiBox_3_classes_conv"]["kernel"]
        np.testing.assert_allclose(
            np.asarray(loaded), vals["ssd/MultiBox_3_classes_conv/w"]
        )
        image = np.random.RandomState(2).randint(
            0, 255, (120, 160, 3)
        ).astype(np.float32)
        results = network.predict_image(image)
        assert isinstance(results, list)


def test_convert_detector_cli(tmp_path):
    """The `lumi checkpoint convert-detector` surface end to end.

    Regression: the module's `list` click command shadows the builtin, and
    the CLI body once called `list(config_files)` — which *invoked the
    list command* (printing the index table, converting nothing).
    """
    from click.testing import CliRunner

    from luminoth_tpu.tools.checkpoint import checkpoint
    from luminoth_tpu.utils.config import dump_config

    cfg = _frcnn_config(tmp_path)
    vals = build_frcnn_ref_values(cfg)
    ckpt = save_slim_checkpoint(vals, str(tmp_path / "ref.ckpt"))

    config_path = str(tmp_path / "config.yml")
    with open(config_path, "w") as f:
        f.write(dump_config(cfg))
    out_dir = str(tmp_path / "cli_converted")

    result = CliRunner().invoke(
        checkpoint,
        ["convert-detector", ckpt, out_dir, "-c", config_path],
    )
    assert result.exit_code == 0, result.output
    assert "Converted" in result.output

    from luminoth_tpu.utils.checkpoint_io import CheckpointManager

    assert CheckpointManager(
        str(tmp_path / "cli_converted" / "ckpt")
    ).latest_step() is not None
