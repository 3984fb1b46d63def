"""SSD int8 trunk serving profile: checkpoint compatibility + numerics.

The int8 extractor (models/ssd/quantized_extractor.py + the
``_int8_maps`` branch of ``SSDFeatureExtractor``) must declare the
exact parameter pytree of the float path and track it numerically on
every one of the six feature maps, including the TF-SAME strided
extras (conv8_2/conv9_2) and the VALID ones (conv10_2/conv11_2).
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np

from luminoth_tpu.models.ssd.feature_extractor import SSDFeatureExtractor
from luminoth_tpu.utils.config import Config


def _tree_spec(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_spec(v, path))
        else:
            out[path] = (tuple(v.shape), str(v.dtype))
    return out


def _randomize_biases(params, key):
    """Small random biases so relu outputs aren't degenerate at init."""

    def walk(tree, prefix=""):
        out = {}
        for name, v in tree.items():
            path = f"{prefix}/{name}"
            if isinstance(v, dict):
                out[name] = walk(v, path)
            elif name == "bias":
                k = jax.random.fold_in(key, hash(path) % (2 ** 31))
                out[name] = jax.random.normal(k, v.shape) * 0.05
            else:
                out[name] = v
        return out

    return {c: walk(t, c) for c, t in params.items()}


def _extractors():
    f = SSDFeatureExtractor(Config({}))
    q = SSDFeatureExtractor(Config({"int8_trunk": True}))
    return f, q


class TestInt8SSDExtractor:
    def test_same_parameter_pytree(self):
        f, q = _extractors()
        x = jnp.zeros((1, 300, 300, 3))
        key = jax.random.PRNGKey(0)
        assert _tree_spec(f.init(key, x)) == _tree_spec(q.init(key, x))

    def test_tracks_float_maps(self):
        f, q = _extractors()
        key = jax.random.PRNGKey(1)
        # Mean-subtracted image scale.
        x = jax.random.uniform(
            jax.random.fold_in(key, 2), (2, 300, 300, 3)
        ) * 255.0 - 120.0
        variables = _randomize_biases(
            f.init(key, x), jax.random.fold_in(key, 3)
        )
        ref_maps = f.apply(variables, x)
        out_maps = q.apply(variables, x)
        assert len(ref_maps) == len(out_maps) == 6
        for i, (ref, out) in enumerate(zip(ref_maps, out_maps)):
            ref = np.asarray(ref, np.float32)
            out = np.asarray(out, np.float32)
            assert out.shape == ref.shape, (i, out.shape, ref.shape)
            cos = float(
                (ref * out).sum()
                / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-9)
            )
            assert cos > 0.99, (i, cos)
            rel = float(
                np.linalg.norm(ref - out) / (np.linalg.norm(ref) + 1e-9)
            )
            assert rel < 0.15, (i, rel)

    def test_flag_inert_in_training(self):
        _, q = _extractors()
        x = jnp.zeros((1, 300, 300, 3))
        variables = q.init(jax.random.PRNGKey(0), x, train=True)
        maps = q.apply(variables, x, train=True)
        # Float path traced: six maps at the canonical grid sizes.
        assert [m.shape[1] for m in maps] == [37, 18, 9, 5, 3, 1]


class TestInt8SSDModel:
    def test_model_flag_end_to_end(self):
        from luminoth_tpu.models.ssd import SSD
        from luminoth_tpu.utils.config import (
            get_base_config, get_model_config,
        )

        cfg = get_model_config(get_base_config(SSD), Config({}), [])
        cfg.model.network.num_classes = 3
        cfg.model.proposals.total_max_detections = 10

        key = jax.random.PRNGKey(0)
        images = jax.random.uniform(key, (1, 300, 300, 3)) * 255.0

        float_model = SSD(cfg)
        variables = float_model.init(key, images, train=False)
        ref = float_model.apply(variables, images, train=False)

        cfg_q = copy.deepcopy(cfg)
        cfg_q.model.base_network.int8_trunk = True
        out = SSD(cfg_q).apply(variables, images, train=False)

        r, o = (t["classification_prediction"] for t in (ref, out))
        assert o["objects"].shape == r["objects"].shape
        np.testing.assert_allclose(
            np.sort(np.asarray(o["probs"]).ravel()),
            np.sort(np.asarray(r["probs"]).ravel()),
            atol=0.05,
        )
