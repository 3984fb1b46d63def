"""SSD through PredictorNetwork: fixed-size preprocessing + tuple scales."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminoth_tpu.utils.config import Config, get_base_config, get_model_config


@pytest.mark.slow
def test_ssd_predict_image_roundtrip():
    from luminoth_tpu.models.ssd import SSD
    from luminoth_tpu.utils.predicting import PredictorNetwork

    cfg = get_model_config(get_base_config(SSD), Config({}), [])
    cfg.model.network.num_classes = 2
    cfg.model.proposals.min_prob_threshold = 0.0
    cfg.model.proposals.total_max_detections = 10
    cfg.model.proposals.class_max_detections = 10
    cfg.model.proposals.pre_nms_max_candidates = 64

    model = SSD(cfg)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.zeros((1, 300, 300, 3)), train=False)

    network = PredictorNetwork(
        cfg, variables=variables, class_labels=["cat", "dog"]
    )
    # Non-square input exercises the per-axis (sy, sx) scale factors.
    image = np.random.RandomState(0).randint(
        0, 255, (150, 600, 3), np.uint8
    )
    objects = network.predict_image(image)
    assert isinstance(objects, list)
    for obj in objects:
        assert obj["label"] in ("cat", "dog")
        x1, y1, x2, y2 = obj["bbox"]
        # Boxes map back into the ORIGINAL 150x600 frame.
        assert -1 <= x1 <= 601 and -1 <= y1 <= 151
        assert x2 <= 601 and y2 <= 151


@pytest.mark.slow
def test_uint8_transfer_matches_float32():
    """transfer_dtype uint8 quantizes the upload, not the detections."""
    from luminoth_tpu.models.ssd import SSD
    from luminoth_tpu.utils.predicting import PredictorNetwork

    cfg = get_model_config(get_base_config(SSD), Config({}), [])
    cfg.model.network.num_classes = 2
    cfg.model.proposals.min_prob_threshold = 0.0
    cfg.model.proposals.total_max_detections = 10
    cfg.model.proposals.class_max_detections = 10
    cfg.model.proposals.pre_nms_max_candidates = 64

    model = SSD(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)), train=False
    )
    # Integer-valued image: resize is skipped at fixed 300x300 input, so
    # the uint8 quantization is lossless and results must match exactly.
    image = np.random.RandomState(1).randint(
        0, 255, (300, 300, 3), np.uint8
    )

    net_f = PredictorNetwork(cfg, variables=variables)
    ref = net_f.predict_image(image)

    cfg.dataset.transfer_dtype = "uint8"
    net_u = PredictorNetwork(cfg, variables=variables)
    got = net_u.predict_image(image)

    assert len(ref) == len(got)
    for a, b in zip(ref, got):
        assert a["label"] == b["label"]
        np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-3)
        assert abs(a["prob"] - b["prob"]) <= 1e-3
