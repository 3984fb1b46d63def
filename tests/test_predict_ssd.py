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


@pytest.mark.slow
def test_mesh_sharded_predict_matches_single_device():
    """The auto device mesh shards predict batches without changing
    results: 3 images on the 8-device virtual mesh (rounded up to 8 by
    duplicate-padding) must produce the single-device detections."""
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
    rng = np.random.RandomState(2)
    images = [
        rng.randint(0, 255, (300, 300, 3), np.uint8) for _ in range(3)
    ]

    sharded = PredictorNetwork(cfg, variables=variables)  # mesh="auto"
    assert sharded._mesh is not None and sharded._mesh.size == 8
    single = PredictorNetwork(cfg, variables=variables, mesh=None)

    got = sharded.predict_batch(images)
    ref = single.predict_batch(images)
    assert len(got) == len(ref) == 3
    for got_objs, ref_objs in zip(got, ref):
        assert len(got_objs) == len(ref_objs)
        for a, b in zip(ref_objs, got_objs):
            assert a["label"] == b["label"]
            np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-3)
            assert abs(a["prob"] - b["prob"]) <= 1e-3
