"""Backbone tests: shapes, strides, endpoints, tail.

Mirrors reference base_network_test.py / truncated_base_network_test.py:
subsampling ratios per architecture and trainable-endpoint semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminoth_tpu.models.base import (
    BaseNetworkTail,
    TruncatedBaseNetwork,
    subtract_channel_means,
)
from luminoth_tpu.models.base.resnet import ResNet, ResNetTail
from luminoth_tpu.models.base.vgg import VGG16
from luminoth_tpu.utils.config import Config


class TestResNet:
    def test_block3_stride16_atrous(self):
        model = ResNet(depth=50, version=1, output_stride=16, endpoint="block3")
        x = jnp.zeros((1, 224, 224, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        fm, endpoints = model.apply(variables, x)
        assert fm.shape == (1, 14, 14, 1024)  # stride 16, block3 depth 1024

    def test_block3_no_output_stride_is_32(self):
        model = ResNet(depth=50, version=1, endpoint="block3")
        x = jnp.zeros((1, 224, 224, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        fm, _ = model.apply(variables, x)
        assert fm.shape == (1, 7, 7, 1024)  # slim strides land block3 at 32

    def test_odd_input_shapes(self):
        model = ResNet(depth=50, version=1, output_stride=16, endpoint="block3")
        x = jnp.zeros((1, 600, 800, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        fm, _ = model.apply(variables, x)
        assert fm.shape == (1, 38, 50, 1024)

    def test_v2_runs(self):
        model = ResNet(depth=50, version=2, output_stride=16, endpoint="block3")
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        fm, _ = model.apply(variables, x)
        assert fm.shape == (1, 4, 4, 1024)

    def test_tail_shape(self):
        tail = ResNetTail(depth=101, version=1)
        x = jnp.zeros((5, 7, 7, 1024))
        variables = tail.init(jax.random.PRNGKey(0), x)
        out = tail.apply(variables, x)
        assert out.shape == (5, 7, 7, 2048)


class TestVGG:
    def test_truncated_output(self):
        model = VGG16(truncated=True)
        x = jnp.zeros((1, 300, 300, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        fm, endpoints = model.apply(variables, x)
        # 300 → /16 after 4 pools = 19 (ceil), conv5 stays at 19
        assert fm.shape == (1, 18, 18, 512) or fm.shape == (1, 19, 19, 512)
        assert "conv4/conv4_3" in endpoints

    def test_endpoint_conv5_3(self):
        model = VGG16(truncated=False, endpoint="conv5/conv5_3")
        x = jnp.zeros((1, 224, 224, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        fm, _ = model.apply(variables, x)
        assert fm.shape == (1, 14, 14, 512)


class TestTruncatedBaseNetwork:
    @pytest.mark.parametrize(
        "arch,expected_hw,expected_c",
        [
            ("resnet_v1_50", 14, 1024),
            ("vgg_16", 14, 512),
        ],
    )
    def test_feature_map(self, arch, expected_hw, expected_c):
        config = Config(
            {"architecture": arch, "output_stride": 16, "endpoint": None,
             "train_batch_norm": False}
        )
        model = TruncatedBaseNetwork(config)
        x = jnp.zeros((1, 224, 224, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        fm = model.apply(variables, x)
        assert fm.shape == (1, expected_hw, expected_hw, expected_c)

    def test_tail(self):
        config = Config(
            {"architecture": "resnet_v1_101", "use_tail": True,
             "train_batch_norm": False}
        )
        tail = BaseNetworkTail(config)
        x = jnp.zeros((3, 7, 7, 1024))
        variables = tail.init(jax.random.PRNGKey(0), x)
        out = tail.apply(variables, x)
        assert out.shape == (3, 7, 7, 2048)

    def test_tail_identity_for_vgg(self):
        config = Config({"architecture": "vgg_16", "use_tail": True})
        tail = BaseNetworkTail(config)
        x = jnp.zeros((3, 7, 7, 512))
        variables = tail.init(jax.random.PRNGKey(0), x)
        out = tail.apply(variables, x)
        assert out.shape == x.shape

    def test_invalid_architecture(self):
        config = Config({"architecture": "alexnet"})
        model = TruncatedBaseNetwork(config)
        with pytest.raises(ValueError):
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))


def test_preprocess_means():
    img = jnp.ones((2, 2, 3)) * 128.0
    out = np.asarray(subtract_channel_means(img))
    np.testing.assert_allclose(
        out[0, 0], [128 - 123.68, 128 - 116.78, 128 - 103.94], rtol=1e-5
    )


def test_unit_remat_preserves_params_and_outputs():
    """remat=True must not change variable paths or forward values."""
    import jax
    import jax.numpy as jnp

    from luminoth_tpu.models.base.base_network import TruncatedBaseNetwork

    cfg = {"architecture": "resnet_v1_50", "output_stride": 16}
    x = jnp.asarray(
        np.random.RandomState(0).uniform(0, 255, (1, 64, 64, 3)),
        jnp.float32,
    )
    net_plain = TruncatedBaseNetwork(cfg)
    net_remat = TruncatedBaseNetwork({**cfg, "remat": True})
    v_plain = net_plain.init(jax.random.PRNGKey(0), x)
    v_remat = net_remat.init(jax.random.PRNGKey(0), x)
    paths = lambda v: set(
        "/".join(str(k.key) for k in p)
        for p, _ in jax.tree_util.tree_flatten_with_path(v)[0]
    )
    assert paths(v_plain) == paths(v_remat)
    out_plain = net_plain.apply(v_plain, x)
    out_remat = net_remat.apply(v_plain, x)
    np.testing.assert_allclose(
        np.asarray(out_plain), np.asarray(out_remat), rtol=1e-6
    )

    # gradients flow and match
    g_plain = jax.grad(
        lambda v: net_plain.apply(v, x).sum())(v_plain)
    g_remat = jax.grad(
        lambda v: net_remat.apply(v, x).sum())(v_plain)
    for a, b in zip(jax.tree_util.tree_leaves(g_plain),
                    jax.tree_util.tree_leaves(g_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
