"""Int8 ROI-tail serving profile: checkpoint compatibility + numerics.

The int8 tail (models/base/quantized_tail.py) must (a) declare the exact
parameter pytree of the float ``ResNetTail`` so either path loads any
checkpoint, and (b) track the float tail closely on realistic inputs —
it is a post-training quantization of the same computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminoth_tpu.models.base.quantized_tail import (
    Int8ResNetTail,
    fold_bn,
    quantize_per_tensor,
    quantize_weight_per_channel,
)
from luminoth_tpu.models.base.resnet import ResNetTail


def _tree_spec(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_spec(v, path))
        else:
            out[path] = (tuple(v.shape), str(v.dtype))
    return out


def _randomized_stats(variables, key):
    """Give BN stats non-trivial values so folding is actually tested."""

    def rand_like(path, x):
        k = jax.random.fold_in(key, hash(path) % (2**31))
        leaf = jax.random.normal(k, x.shape) * 0.3
        if path.endswith("var"):
            return jnp.abs(leaf) + 0.5
        if path.endswith("scale"):
            return 1.0 + leaf
        return leaf

    def walk(tree, prefix=""):
        out = {}
        for name, v in tree.items():
            path = f"{prefix}/{name}"
            out[name] = (
                walk(v, path) if isinstance(v, dict) else rand_like(path, v)
            )
        return out

    return jax.tree_util.tree_map(
        lambda a: a, {c: walk(t, c) for c, t in variables.items()}
    )


class TestQuantPrimitives:
    def test_per_tensor_round_trip(self):
        x = jnp.asarray([[0.5, -3.0, 2.0], [1.0, 0.0, -0.1]])
        q, s = quantize_per_tensor(x)
        assert q.dtype == jnp.int8
        np.testing.assert_allclose(
            np.asarray(q, np.float32) * float(s), np.asarray(x),
            atol=float(s) * 0.5 + 1e-8,
        )

    def test_per_channel_scales(self):
        w = jnp.stack(
            [jnp.full((3, 3, 4), 0.01), jnp.full((3, 3, 4), 10.0)], axis=-1
        )
        q, s = quantize_weight_per_channel(w)
        assert s.shape == (2,)
        # Each channel uses its own range: both quantize to +/-127.
        assert int(q[0, 0, 0, 0]) == 127 and int(q[0, 0, 0, 1]) == 127

    def test_fold_bn_matches_explicit(self):
        key = jax.random.PRNGKey(0)
        kernel = jax.random.normal(key, (1, 1, 8, 16))
        gamma = 1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (16,))
        beta = jax.random.normal(jax.random.fold_in(key, 2), (16,))
        mean = jax.random.normal(jax.random.fold_in(key, 3), (16,))
        var = jnp.abs(jax.random.normal(jax.random.fold_in(key, 4), (16,))) + 0.5
        x = jax.random.normal(jax.random.fold_in(key, 5), (2, 5, 5, 8))

        conv = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        bn = gamma * (conv - mean) / jnp.sqrt(var + 1e-5) + beta

        fk, fb = fold_bn(kernel, gamma, beta, mean, var)
        folded = jax.lax.conv_general_dilated(
            x, fk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + fb
        np.testing.assert_allclose(
            np.asarray(folded), np.asarray(bn), rtol=1e-4, atol=1e-4
        )


class TestInt8Tail:
    DEPTH = 50  # small block4 (3 units) keeps the test fast

    def _init_both(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(jax.random.fold_in(key, 9), (6, 7, 7, 1024))
        float_tail = ResNetTail(depth=self.DEPTH, version=1)
        int8_tail = Int8ResNetTail(depth=self.DEPTH, version=1)
        variables = float_tail.init(key, x)
        return float_tail, int8_tail, variables, x

    def test_same_parameter_pytree(self):
        _, int8_tail, variables, x = self._init_both()
        v_int8 = int8_tail.init(jax.random.PRNGKey(0), x)
        assert _tree_spec(variables) == _tree_spec(v_int8)

    def test_tracks_float_tail(self):
        float_tail, int8_tail, variables, x = self._init_both()
        variables = _randomized_stats(variables, jax.random.PRNGKey(3))
        ref = np.asarray(float_tail.apply(variables, x), np.float32)
        out = np.asarray(int8_tail.apply(variables, x), np.float32)
        assert out.shape == ref.shape
        # Post-relu activations: cosine similarity and relative error of
        # the full tensor must be tight for a 3-unit int8 pipeline.
        cos = float(
            (ref * out).sum()
            / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-9)
        )
        assert cos > 0.995, cos
        rel = float(
            np.linalg.norm(ref - out) / (np.linalg.norm(ref) + 1e-9)
        )
        assert rel < 0.1, rel

    def test_model_flag_end_to_end(self):
        # Same variables, flag flipped at apply time: the int8 tail must
        # slot into the full Faster R-CNN inference graph and produce
        # detections close to the float path's.
        from luminoth_tpu.models.fasterrcnn import FasterRCNN
        from luminoth_tpu.utils.config import (
            Config, get_base_config, get_model_config,
        )

        cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
        cfg.model.network.num_classes = 3
        cfg.model.base_network.architecture = "resnet_v1_50"
        cfg.model.rpn.proposals.pre_nms_top_n = 128
        cfg.model.rpn.proposals.post_nms_top_n = 32
        cfg.model.rcnn.proposals.total_max_detections = 10

        key = jax.random.PRNGKey(0)
        images = jax.random.uniform(key, (1, 96, 96, 3)) * 255.0

        float_model = FasterRCNN(cfg)
        variables = float_model.init(key, images, train=False)
        ref = float_model.apply(variables, images, train=False)

        import copy

        cfg_q = copy.deepcopy(cfg)
        cfg_q.model.base_network.int8_tail = True
        int8_model = FasterRCNN(cfg_q)
        # Checkpoint compatibility: the float variables load unchanged.
        out = int8_model.apply(variables, images, train=False)

        r, o = (
            t["classification_prediction"] for t in (ref, out)
        )
        assert o["objects"].shape == r["objects"].shape
        # Fresh random weights give near-uniform scores, so exact
        # detection sets may differ; the score distributions must agree.
        np.testing.assert_allclose(
            np.sort(np.asarray(o["probs"]).ravel()),
            np.sort(np.asarray(r["probs"]).ravel()),
            atol=0.05,
        )

    def test_rejects_v2(self):
        x = jnp.zeros((1, 7, 7, 1024))
        with pytest.raises(ValueError):
            Int8ResNetTail(depth=50, version=2).init(
                jax.random.PRNGKey(0), x
            )


class TestStaticScales:
    """int8_static: calibrated activation scales replace dynamic maxes."""

    def _setup(self):
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (4, 7, 7, 256), jnp.float32) * 2.0
        dyn = Int8ResNetTail(depth=50, version=1)
        static = Int8ResNetTail(depth=50, version=1, static_scales=True)
        variables = dyn.init(key, x)
        variables = _randomized_stats(variables, jax.random.PRNGKey(3))
        return dyn, static, variables, x

    def test_calibrate_then_match_dynamic(self):
        dyn, static, variables, x = self._setup()
        ref = np.asarray(dyn.apply(variables, x), np.float32)

        # calibration pass: collects per-point amax, output exact
        out_cal, updated = static.apply(
            variables, x, mutable=["int8_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(out_cal, np.float32), ref, rtol=0, atol=1e-4
        )
        stats = updated["int8_stats"]
        leaves = jax.tree_util.tree_leaves(stats)
        assert len(leaves) >= 9  # 3 units x 3 quant points
        assert all(float(v) > 0 for v in leaves)

        # static serving on the SAME input: scales equal the recorded
        # maxes, so quantization decisions match the dynamic path bit
        # for bit
        out_static = static.apply({**variables, "int8_stats": stats}, x)
        np.testing.assert_allclose(
            np.asarray(out_static, np.float32), ref, rtol=0, atol=1e-4
        )

    def test_static_tracks_dynamic_on_new_inputs(self):
        dyn, static, variables, x = self._setup()
        _, updated = static.apply(variables, x, mutable=["int8_stats"])
        stats = updated["int8_stats"]

        # a different (smaller-range) input: static scales are coarser
        # than the per-input dynamic ones, but must stay close on the
        # norm metrics the float-tracking test uses (per-tensor quant
        # fidelity is norm-weighted by construction — small entries next
        # to a large amax legitimately carry large pointwise error)
        x2 = x * 0.7
        ref = np.asarray(dyn.apply(variables, x2), np.float32)
        out = np.asarray(
            static.apply({**variables, "int8_stats": stats}, x2),
            np.float32,
        )
        cos = float(
            (ref * out).sum()
            / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-9)
        )
        assert cos > 0.99, cos
        rel = float(
            np.linalg.norm(ref - out) / (np.linalg.norm(ref) + 1e-9)
        )
        assert rel < 0.15, rel

    def test_predictor_auto_calibration(self, tmp_path):
        """PredictorNetwork calibrates automatically when int8_static
        is on and serves through the static path."""
        from luminoth_tpu.models.fasterrcnn import FasterRCNN
        from luminoth_tpu.utils.config import (
            Config, get_base_config, get_model_config,
        )
        from luminoth_tpu.utils.predicting import PredictorNetwork

        cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
        cfg.model.network.num_classes = 2
        cfg.model.base_network.architecture = "resnet_v1_50"
        cfg.model.base_network.int8_tail = True
        cfg.model.base_network.int8_static = True
        cfg.model.rpn.proposals.pre_nms_top_n = 64
        cfg.model.rpn.proposals.post_nms_top_n = 16
        cfg.model.rcnn.proposals.total_max_detections = 5
        cfg.model.rcnn.proposals.class_max_detections = 5
        cfg.dataset.image_preprocessing = Config(
            {"min_size": 64, "max_size": 96})

        model = FasterRCNN(cfg)
        key = jax.random.PRNGKey(0)
        variables = model.init(
            key, jnp.zeros((1, 96, 96, 3)), train=False
        )
        network = PredictorNetwork(cfg, variables=variables, mesh=None)
        assert "int8_stats" in network._variables
        image = np.random.RandomState(1).randint(
            0, 255, (80, 100, 3), dtype=np.uint8
        )
        objects = network.predict_image(image)
        assert isinstance(objects, list)
