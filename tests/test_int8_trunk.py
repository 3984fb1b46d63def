"""Int8 trunk serving profile: checkpoint compatibility + numerics.

Like the tail twin (test_int8_tail.py), the int8 trunk
(models/base/quantized_tail.py::Int8ResNetTrunk) must declare the exact
parameter pytree of the float ``ResNet`` trunk and track it numerically
— including the strided units and the atrous (output_stride=16)
detection configuration the float path uses.
"""

import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminoth_tpu.models.base.quantized_tail import (
    Int8BottleneckV1,
    Int8ResNetTrunk,
    _int8_conv3x3,
    quantize_per_tensor,
    quantize_weight_per_channel,
)
from luminoth_tpu.models.base.resnet import BottleneckV1, ResNet


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
    """Randomize BN params/stats; keep conv kernels at their (variance-
    preserving lecun-normal) init so a 16-unit trunk doesn't blow up."""

    def rand_like(path, x):
        k = jax.random.fold_in(key, hash(path) % (2**31))
        leaf = jax.random.normal(k, x.shape) * 0.3
        if path.endswith("kernel"):
            return x
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

    return {c: walk(t, c) for c, t in variables.items()}


class TestStridedInt8Conv:
    """The generalized 3x3 int8 conv must match a float conv spatially
    and numerically (up to quantization) for every (stride, rate) the
    trunk uses."""

    @pytest.mark.parametrize("stride,rate,h,w", [
        (1, 1, 14, 14),
        (2, 1, 15, 17),   # odd sizes stress conv2d_same padding
        (2, 1, 16, 16),
        (1, 2, 14, 14),   # atrous
    ])
    def test_matches_float_conv2d_same(self, stride, rate, h, w):
        key = jax.random.PRNGKey(0)
        cin, cout = 16, 24
        x = jax.random.normal(key, (2, h, w, cin))
        kernel = jax.random.normal(jax.random.fold_in(key, 1),
                                   (3, 3, cin, cout)) * 0.2

        # Float reference with conv2d_same semantics.
        kernel_eff = 3 + 2 * (rate - 1)
        pad = (kernel_eff - 1) // 2, kernel_eff - 1 - (kernel_eff - 1) // 2
        ref = jax.lax.conv_general_dilated(
            jnp.pad(x, ((0, 0), pad, pad, (0, 0))), kernel,
            (stride, stride), "VALID", rhs_dilation=(rate, rate),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

        x_q, x_s = quantize_per_tensor(x)
        w_q, w_s = quantize_weight_per_channel(kernel)
        out = _int8_conv3x3(
            x_q, x_s, w_q, w_s, jnp.zeros((cout,)), stride=stride, rate=rate
        )
        assert out.shape == ref.shape
        rel = float(
            np.linalg.norm(np.asarray(out) - np.asarray(ref))
            / (np.linalg.norm(np.asarray(ref)) + 1e-9)
        )
        assert rel < 0.03, rel


class TestStridedBottleneck:
    @pytest.mark.parametrize("depth_in,stride", [
        (64, 2),    # projection shortcut, strided
        (256, 2),   # identity-depth shortcut, strided (subsample path)
        (64, 1),    # projection shortcut, unstrided
    ])
    def test_matches_float_unit(self, depth_in, stride):
        key = jax.random.PRNGKey(1)
        x = jax.random.normal(key, (2, 15, 17, depth_in))
        f = BottleneckV1(depth=256, depth_bottleneck=64, stride=stride)
        q = Int8BottleneckV1(depth=256, depth_bottleneck=64, stride=stride)
        variables = _randomized_stats(f.init(key, x), jax.random.fold_in(key, 7))
        assert _tree_spec(f.init(key, x)) == _tree_spec(
            q.init(key, x)
        )
        ref = np.asarray(f.apply(variables, x), np.float32)
        out = np.asarray(q.apply(variables, x), np.float32)
        assert out.shape == ref.shape
        rel = float(np.linalg.norm(ref - out) / (np.linalg.norm(ref) + 1e-9))
        assert rel < 0.05, rel


class TestInt8Trunk:
    DEPTH = 50

    def _trunks(self):
        kw = dict(depth=self.DEPTH, version=1, output_stride=16,
                  endpoint="block3")
        return ResNet(**kw), Int8ResNetTrunk(**kw)

    def test_same_parameter_pytree(self):
        f, q = self._trunks()
        x = jnp.zeros((1, 64, 64, 3))
        key = jax.random.PRNGKey(0)
        assert _tree_spec(f.init(key, x)) == _tree_spec(q.init(key, x))

    def test_tracks_float_trunk(self):
        f, q = self._trunks()
        key = jax.random.PRNGKey(2)
        # Image-scale inputs after mean subtraction: roughly [-120, 130].
        x = jax.random.uniform(
            jax.random.fold_in(key, 9), (1, 65, 63, 3)
        ) * 255.0 - 120.0
        variables = _randomized_stats(f.init(key, x), jax.random.fold_in(key, 3))
        ref, ref_eps = f.apply(variables, x)
        out, out_eps = q.apply(variables, x)
        ref = np.asarray(ref, np.float32)
        out = np.asarray(out, np.float32)
        assert out.shape == ref.shape  # stride-16 map, odd-size padding
        assert set(ref_eps) - {"root"} <= set(out_eps)
        cos = float(
            (ref * out).sum()
            / (np.linalg.norm(ref) * np.linalg.norm(out) + 1e-9)
        )
        assert cos > 0.99, cos
        rel = float(np.linalg.norm(ref - out) / (np.linalg.norm(ref) + 1e-9))
        assert rel < 0.15, rel

    def test_model_flag_end_to_end(self):
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

        cfg_q = copy.deepcopy(cfg)
        cfg_q.model.base_network.int8_trunk = True
        cfg_q.model.base_network.int8_tail = True
        q_model = FasterRCNN(cfg_q)
        out = q_model.apply(variables, images, train=False)

        r, o = (t["classification_prediction"] for t in (ref, out))
        assert o["objects"].shape == r["objects"].shape
        np.testing.assert_allclose(
            np.sort(np.asarray(o["probs"]).ravel()),
            np.sort(np.asarray(r["probs"]).ravel()),
            atol=0.05,
        )

    def test_trains_with_float_path_when_flag_set(self):
        # The flag must be inert in training: train=True uses the float
        # trunk so gradients and BN behavior are untouched.
        from luminoth_tpu.models.base.base_network import (
            TruncatedBaseNetwork,
        )
        from luminoth_tpu.utils.config import Config

        cfg = Config({
            "architecture": "resnet_v1_50",
            "output_stride": 16,
            "int8_trunk": True,
        })
        net = TruncatedBaseNetwork(cfg)
        x = jnp.zeros((1, 64, 64, 3))
        variables = net.init(jax.random.PRNGKey(0), x, train=True)
        out, _ = net.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        assert out.shape[-1] == 1024

    def test_rejects_v2(self):
        with pytest.raises(ValueError):
            Int8ResNetTrunk(depth=50, version=2, endpoint="block3").init(
                jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
            )
