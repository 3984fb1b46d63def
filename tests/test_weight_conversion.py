"""Backbone weight conversion tests: torchvision layout → flax tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminoth_tpu.models.base.resnet import RESNET_BLOCK_DEFS, ResNet
from luminoth_tpu.tools.checkpoint.convert import (
    convert_torchvision_resnet,
    convert_torchvision_vgg16,
)
from luminoth_tpu.utils.checkpoint_io import merge_flat_params


def fake_torchvision_resnet_state(depth=50, seed=0):
    """Random arrays with torchvision ResNet shapes (no torchvision needed)."""
    rng = np.random.RandomState(seed)
    state = {}

    def bn(prefix, c):
        state[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        state[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        state[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        state[f"{prefix}.running_var"] = np.abs(
            rng.randn(c)
        ).astype(np.float32)

    state["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    bn("bn1", 64)

    in_c = 64
    for layer_idx, (base_depth, num_units, _) in enumerate(
        RESNET_BLOCK_DEFS[depth], start=1
    ):
        out_c = base_depth * 4
        for unit in range(num_units):
            p = f"layer{layer_idx}.{unit}"
            state[f"{p}.conv1.weight"] = rng.randn(
                base_depth, in_c, 1, 1
            ).astype(np.float32)
            bn(f"{p}.bn1", base_depth)
            state[f"{p}.conv2.weight"] = rng.randn(
                base_depth, base_depth, 3, 3
            ).astype(np.float32)
            bn(f"{p}.bn2", base_depth)
            state[f"{p}.conv3.weight"] = rng.randn(
                out_c, base_depth, 1, 1
            ).astype(np.float32)
            bn(f"{p}.bn3", out_c)
            if unit == 0:
                state[f"{p}.downsample.0.weight"] = rng.randn(
                    out_c, in_c, 1, 1
                ).astype(np.float32)
                bn(f"{p}.downsample.1", out_c)
            in_c = out_c
    return state


class TestResNetConversion:
    def test_conversion_layout(self):
        state = fake_torchvision_resnet_state(50)
        flat = convert_torchvision_resnet(state, "resnet_v1_50")

        # conv1 kernel transposed OIHW → HWIO.
        k = flat["params/base_network/resnet_v1_50/conv1/kernel"]
        assert k.shape == (7, 7, 3, 64)
        np.testing.assert_allclose(
            k, np.transpose(state["conv1.weight"], (2, 3, 1, 0))
        )
        # Shortcut convs only on the first unit of each block.
        assert (
            "params/base_network/resnet_v1_50/block2/unit_1/shortcut/kernel"
            in flat
        )
        assert (
            "params/base_network/resnet_v1_50/block2/unit_2/shortcut/kernel"
            not in flat
        )
        # block4 mirrored into the tail scope.
        assert (
            "params/base_network_tail/resnet_v1_50/block4/unit_1/conv1/kernel"
            in flat
        )
        # batch stats present for every bn.
        assert (
            "batch_stats/base_network/resnet_v1_50/conv1_bn/BatchNorm/mean"
            in flat
        )

    def test_frcnn_end_to_end_load(self, tmp_path):
        """Convert → save npz → load through the trainer's merge path."""
        from luminoth_tpu.models.fasterrcnn import FasterRCNN
        from luminoth_tpu.utils.config import (
            Config, get_base_config, get_model_config,
        )
        from luminoth_tpu.train import load_pretrained_backbone

        state = fake_torchvision_resnet_state(50)
        flat = convert_torchvision_resnet(state, "resnet_v1_50")
        npz_path = str(tmp_path / "weights.npz")
        np.savez(npz_path, **flat)

        cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
        cfg.model.network.num_classes = 2
        cfg.model.base_network.architecture = "resnet_v1_50"
        cfg.model.base_network.torchvision_compat = True
        cfg.model.base_network.weights = npz_path
        cfg.model.rpn.proposals.pre_nms_top_n = 32
        cfg.model.rpn.proposals.post_nms_top_n = 8
        cfg.model.rcnn.target.minibatch_size = 8

        model = FasterRCNN(cfg)
        key = jax.random.PRNGKey(0)
        images = jnp.zeros((1, 64, 64, 3))
        variables = model.init(key, images, train=False)

        params, batch_stats, loaded = load_pretrained_backbone(
            dict(variables["params"]), dict(variables["batch_stats"]), cfg
        )
        assert loaded
        np.testing.assert_allclose(
            np.asarray(
                params["base_network"]["resnet_v1_50"]["conv1"]["kernel"]
            ),
            np.transpose(state["conv1.weight"], (2, 3, 1, 0)),
        )
        # Tail (block4) was initialized from layer4. (Flax keeps the
        # "block4/unit_1" module name as a literal key.)
        tail = params["base_network_tail"]["resnet_v1_50"]["block4/unit_1"]
        np.testing.assert_allclose(
            np.asarray(tail["conv1"]["kernel"]),
            np.transpose(state["layer4.0.conv1.weight"], (2, 3, 1, 0)),
        )
        # Batch stats loaded too.
        np.testing.assert_allclose(
            np.asarray(
                batch_stats["base_network"]["resnet_v1_50"]["conv1_bn"][
                    "BatchNorm"]["mean"]
            ),
            state["bn1.running_mean"],
        )


class TestVGGConversion:
    def test_vgg_feature_mapping(self):
        rng = np.random.RandomState(0)
        state = {}
        channels = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
                    (256, 256), (256, 256), (256, 512), (512, 512),
                    (512, 512), (512, 512), (512, 512), (512, 512)]
        indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        for (cin, cout), idx in zip(channels, indices):
            state[f"features.{idx}.weight"] = rng.randn(
                cout, cin, 3, 3
            ).astype(np.float32)
            state[f"features.{idx}.bias"] = rng.randn(cout).astype(np.float32)

        flat = convert_torchvision_vgg16(state)
        assert (
            "params/feature_extractor/vgg_16/conv4/conv4_3/kernel" in flat
        )
        assert flat[
            "params/feature_extractor/vgg_16/conv1/conv1_1/kernel"
        ].shape == (3, 3, 3, 64)
