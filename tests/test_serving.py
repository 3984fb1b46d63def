"""MicroBatcher: request coalescing semantics (no device needed)."""

import threading
import time

import pytest

from luminoth_tpu.utils.serving import MicroBatcher


class StubNetwork:
    """Records batch compositions; returns per-image identifiers."""

    def __init__(self, delay_s=0.0, fail=False):
        self.calls = []
        self.delay_s = delay_s
        self.fail = fail

    def predict_batch(self, images, pad_to=None):
        self.calls.append((len(images), pad_to))
        if self.delay_s:
            time.sleep(self.delay_s)
        if self.fail:
            raise RuntimeError("boom")
        return [[{"label": int(img)}] for img in images]


def test_single_request_roundtrip():
    net = StubNetwork()
    batcher = MicroBatcher(net, max_batch=8, max_wait_ms=1.0)
    assert batcher.predict_image(7) == [{"label": 7}]
    assert net.calls == [(1, 1)]
    batcher.close()


def test_concurrent_requests_batch_together():
    net = StubNetwork()
    # A generous window so all threads join one batch deterministically.
    batcher = MicroBatcher(net, max_batch=8, max_wait_ms=150.0)
    results = {}

    def submit(i):
        results[i] = batcher.predict_image(i)

    threads = [
        threading.Thread(target=submit, args=(i,)) for i in range(4)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert results == {i: [{"label": i}] for i in range(4)}
    # All four rode one forward, padded to the power-of-two bucket.
    assert net.calls == [(4, 4)]
    batcher.close()


def test_burst_larger_than_max_batch_splits():
    net = StubNetwork()
    batcher = MicroBatcher(net, max_batch=2, max_wait_ms=100.0)
    results = {}

    def submit(i):
        results[i] = batcher.predict_image(i)

    threads = [
        threading.Thread(target=submit, args=(i,)) for i in range(5)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert results == {i: [{"label": i}] for i in range(5)}
    assert sum(n for n, _ in net.calls) == 5
    assert all(n <= 2 and pad <= 2 for n, pad in net.calls)
    batcher.close()


def test_padding_buckets_are_powers_of_two():
    batcher = MicroBatcher(StubNetwork(), max_batch=8)
    assert [batcher._bucket(n) for n in (1, 2, 3, 4, 5, 8, 9)] == [
        1, 2, 4, 4, 8, 8, 8
    ]
    batcher.close()


def test_errors_propagate_to_every_waiter():
    net = StubNetwork(fail=True)
    batcher = MicroBatcher(net, max_batch=4, max_wait_ms=50.0)
    errors = []

    def submit(i):
        try:
            batcher.predict_image(i)
        except RuntimeError as e:
            errors.append(str(e))

    threads = [
        threading.Thread(target=submit, args=(i,)) for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == ["boom"] * 3
    batcher.close()


def test_closed_batcher_rejects():
    batcher = MicroBatcher(StubNetwork())
    batcher.close()
    with pytest.raises(RuntimeError):
        batcher.predict_image(1)


def test_max_batch_validation():
    with pytest.raises(ValueError):
        MicroBatcher(StubNetwork(), max_batch=0)


def test_server_start_network_wraps_in_batcher(monkeypatch):
    """start_network wires the loaded network through a MicroBatcher
    (and BATCH_SIZE=1 disables the wrap)."""
    import importlib

    web_mod = importlib.import_module("luminoth_tpu.tools.server.web")
    predicting = importlib.import_module("luminoth_tpu.utils.predicting")

    class FakePredictor:
        def __init__(self, config, class_labels=None):
            pass

        def predict_batch(self, images, pad_to=None):
            return [[{"label": "ok"}] for _ in images]

        def predict_image(self, image):
            return [{"label": "ok"}]

    monkeypatch.setattr(predicting, "PredictorNetwork", FakePredictor)

    monkeypatch.setattr(web_mod, "BATCH_SIZE", 4)
    web_mod.start_network(config=None, class_labels=None)
    assert isinstance(web_mod.PREDICTOR_NETWORK, MicroBatcher)
    assert web_mod.PREDICTOR_NETWORK.predict_image("img") == [{"label": "ok"}]
    web_mod.PREDICTOR_NETWORK.close()

    monkeypatch.setattr(web_mod, "BATCH_SIZE", 1)
    web_mod.start_network(config=None, class_labels=None)
    assert isinstance(web_mod.PREDICTOR_NETWORK, FakePredictor)
    web_mod.PREDICTOR_NETWORK = None


def test_apply_serving_profile():
    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.models.ssd import SSD
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )
    from luminoth_tpu.utils.serving import apply_serving_profile

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    default_post = cfg.model.rpn.proposals.post_nms_top_n
    cfg = apply_serving_profile(cfg, "accurate")
    assert cfg.model.rpn.proposals.post_nms_top_n == default_post
    assert cfg.dataset.transfer_dtype == "float32"

    cfg = apply_serving_profile(cfg, "fast")
    assert cfg.dataset.transfer_dtype == "uint8"
    assert cfg.model.rpn.proposals.post_nms_top_n == 1000
    assert cfg.model.rpn.proposals.pre_nms_top_n == 6000
    assert cfg.model.base_network.int8_tail is True
    assert cfg.model.base_network.int8_static is True

    # SSD has no RPN: int8 trunk + uint8 transfer
    ssd_cfg = get_model_config(get_base_config(SSD), Config({}), [])
    ssd_cfg = apply_serving_profile(ssd_cfg, "fast")
    assert ssd_cfg.dataset.transfer_dtype == "uint8"
    assert ssd_cfg.model.base_network.int8_trunk is True
    assert ssd_cfg.model.base_network.int8_static is True

    import pytest

    with pytest.raises(ValueError):
        apply_serving_profile(cfg, "warp9")
