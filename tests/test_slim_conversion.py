"""Slim-checkpoint conversion tests: TF checkpoint → flax, numerically.

The pretrained source the reference actually uses is slim ImageNet
checkpoints (reference: luminoth/utils/checkpoint_downloader.py:13-23).
Real tarballs need network egress, so these tests build a *synthetic*
slim checkpoint (random values under the exact slim variable names,
written with a genuine TF saver) and verify the full chain:

    TF checkpoint --convert_slim_checkpoint_file--> npz --merge--> flax

by comparing the flax forward against an independently hand-written
TensorFlow forward implementing slim's resnet_v1 semantics (conv2d_same
explicit padding, VALID root max-pool, stride on the last unit of each
block, atrous output_stride bookkeeping, BN eps 1e-5).
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from luminoth_tpu.models.base.resnet import (  # noqa: E402
    RESNET_BLOCK_DEFS,
    ResNet,
)
from luminoth_tpu.models.base.vgg import VGG16  # noqa: E402
from luminoth_tpu.tools.checkpoint.slim_convert import (  # noqa: E402
    convert_slim_checkpoint_file,
)
from luminoth_tpu.utils.checkpoint_io import merge_flat_params  # noqa: E402


# ------------------------------------------------- synthetic checkpoints


def make_slim_resnet_values(depth=50, seed=0):
    """Random values under the exact slim resnet_v1 variable names."""
    rng = np.random.RandomState(seed)
    arch = f"resnet_v1_{depth}"
    vals = {}

    def conv(name, h, w, cin, cout):
        vals[name] = (rng.randn(h, w, cin, cout) * 0.05).astype(np.float32)

    def bn(prefix, c):
        vals[f"{prefix}/gamma"] = (
            1.0 + 0.2 * rng.randn(c)
        ).astype(np.float32)
        vals[f"{prefix}/beta"] = (0.1 * rng.randn(c)).astype(np.float32)
        vals[f"{prefix}/moving_mean"] = (
            0.1 * rng.randn(c)
        ).astype(np.float32)
        vals[f"{prefix}/moving_variance"] = (
            0.75 + 0.5 * rng.rand(c)
        ).astype(np.float32)

    conv(f"{arch}/conv1/weights", 7, 7, 3, 64)
    bn(f"{arch}/conv1/BatchNorm", 64)
    in_c = 64
    for b, (base, num_units, _) in enumerate(RESNET_BLOCK_DEFS[depth], 1):
        out_c = base * 4
        for u in range(1, num_units + 1):
            p = f"{arch}/block{b}/unit_{u}/bottleneck_v1"
            if in_c != out_c:
                conv(f"{p}/shortcut/weights", 1, 1, in_c, out_c)
                bn(f"{p}/shortcut/BatchNorm", out_c)
            conv(f"{p}/conv1/weights", 1, 1, in_c, base)
            bn(f"{p}/conv1/BatchNorm", base)
            conv(f"{p}/conv2/weights", 3, 3, base, base)
            bn(f"{p}/conv2/BatchNorm", base)
            conv(f"{p}/conv3/weights", 1, 1, base, out_c)
            bn(f"{p}/conv3/BatchNorm", out_c)
            in_c = out_c
    # Extras a real checkpoint carries; the converter must skip them.
    conv(f"{arch}/logits/weights", 1, 1, in_c, 1000)
    vals[f"{arch}/logits/biases"] = np.zeros(1000, np.float32)
    vals["global_step"] = np.asarray(0, np.int64)
    return arch, vals


def make_slim_resnet_v2_values(depth=50, seed=0):
    """Random values under the exact slim resnet_v2 variable names.

    v2's normalizer-free convs (root conv1, unit conv3, shortcut) carry
    biases; units carry a preact BN; the trunk ends with postnorm.
    """
    rng = np.random.RandomState(seed)
    arch = f"resnet_v2_{depth}"
    vals = {}

    def conv(name, h, w, cin, cout):
        vals[name] = (rng.randn(h, w, cin, cout) * 0.05).astype(np.float32)

    def bias(name, c):
        vals[name] = (0.1 * rng.randn(c)).astype(np.float32)

    def bn(prefix, c):
        vals[f"{prefix}/gamma"] = (
            1.0 + 0.2 * rng.randn(c)
        ).astype(np.float32)
        vals[f"{prefix}/beta"] = (0.1 * rng.randn(c)).astype(np.float32)
        vals[f"{prefix}/moving_mean"] = (
            0.1 * rng.randn(c)
        ).astype(np.float32)
        vals[f"{prefix}/moving_variance"] = (
            0.75 + 0.5 * rng.rand(c)
        ).astype(np.float32)

    conv(f"{arch}/conv1/weights", 7, 7, 3, 64)
    bias(f"{arch}/conv1/biases", 64)
    in_c = 64
    for b, (base, num_units, _) in enumerate(RESNET_BLOCK_DEFS[depth], 1):
        out_c = base * 4
        for u in range(1, num_units + 1):
            p = f"{arch}/block{b}/unit_{u}/bottleneck_v2"
            bn(f"{p}/preact", in_c)
            if in_c != out_c:
                conv(f"{p}/shortcut/weights", 1, 1, in_c, out_c)
                bias(f"{p}/shortcut/biases", out_c)
            conv(f"{p}/conv1/weights", 1, 1, in_c, base)
            bn(f"{p}/conv1/BatchNorm", base)
            conv(f"{p}/conv2/weights", 3, 3, base, base)
            bn(f"{p}/conv2/BatchNorm", base)
            conv(f"{p}/conv3/weights", 1, 1, base, out_c)
            bias(f"{p}/conv3/biases", out_c)
            in_c = out_c
    bn(f"{arch}/postnorm", in_c)
    conv(f"{arch}/logits/weights", 1, 1, in_c, 1000)
    vals[f"{arch}/logits/biases"] = np.zeros(1000, np.float32)
    return arch, vals


def make_slim_vgg_values(seed=0):
    rng = np.random.RandomState(seed)
    vals = {}
    stages = [(1, 2, 3, 64), (2, 2, 64, 128), (3, 3, 128, 256),
              (4, 3, 256, 512), (5, 3, 512, 512)]
    for stage, reps, cin, cout in stages:
        c = cin
        for i in range(1, reps + 1):
            p = f"vgg_16/conv{stage}/conv{stage}_{i}"
            vals[f"{p}/weights"] = (
                rng.randn(3, 3, c, cout) * 0.05
            ).astype(np.float32)
            vals[f"{p}/biases"] = (
                0.1 * rng.randn(cout)
            ).astype(np.float32)
            c = cout
    return vals


def save_slim_checkpoint(vals, prefix):
    """Write the values as a real TF checkpoint under their slim names."""
    tf1 = tf.compat.v1
    graph = tf1.Graph()
    with graph.as_default():
        var_map = {
            name: tf1.Variable(value, name=f"v{i}")
            for i, (name, value) in enumerate(vals.items())
        }
        saver = tf1.train.Saver(var_list=var_map)
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            saver.save(sess, prefix, write_meta_graph=False)
    return prefix


# -------------------------------------- independent slim-semantics forward


def _tf_conv_same(x, w, stride, rate=1):
    if stride == 1:
        return tf.nn.conv2d(
            x, w, strides=1, padding="SAME", dilations=rate
        )
    k = int(w.shape[0])
    keff = k + (k - 1) * (rate - 1)
    pad = keff - 1
    pb, pe = pad // 2, pad - pad // 2
    x = tf.pad(x, [[0, 0], [pb, pe], [pb, pe], [0, 0]])
    return tf.nn.conv2d(x, w, strides=stride, padding="VALID", dilations=rate)


def _tf_bn(x, vals, prefix):
    return tf.nn.batch_normalization(
        x,
        vals[f"{prefix}/moving_mean"],
        vals[f"{prefix}/moving_variance"],
        vals[f"{prefix}/beta"],
        vals[f"{prefix}/gamma"],
        1e-5,
    )


def tf_slim_resnet_v1_forward(x, vals, arch, depth, output_stride=None):
    """Hand-written TF forward with slim resnet_v1 semantics."""
    x = tf.constant(x)
    x = _tf_conv_same(x, vals[f"{arch}/conv1/weights"], 2)
    x = tf.nn.relu(_tf_bn(x, vals, f"{arch}/conv1/BatchNorm"))
    x = tf.nn.max_pool2d(x, 3, 2, "VALID")

    current_stride, rate = 4, 1
    outs = {}
    for b, (base, num_units, block_stride) in enumerate(
        RESNET_BLOCK_DEFS[depth], 1
    ):
        for u in range(1, num_units + 1):
            unit_stride = block_stride if u == num_units else 1
            if output_stride is not None and current_stride == output_stride:
                unit_rate, eff_stride = rate, 1
                rate *= unit_stride
            else:
                unit_rate, eff_stride = 1, unit_stride
                current_stride *= unit_stride

            p = f"{arch}/block{b}/unit_{u}/bottleneck_v1"
            out_c = base * 4
            if int(x.shape[-1]) == out_c:
                shortcut = (
                    x if eff_stride == 1
                    else tf.nn.max_pool2d(x, 1, eff_stride, "VALID")
                )
            else:
                shortcut = tf.nn.conv2d(
                    x, vals[f"{p}/shortcut/weights"], eff_stride, "SAME"
                )
                shortcut = _tf_bn(shortcut, vals, f"{p}/shortcut/BatchNorm")
            r = tf.nn.relu(_tf_bn(
                tf.nn.conv2d(x, vals[f"{p}/conv1/weights"], 1, "SAME"),
                vals, f"{p}/conv1/BatchNorm",
            ))
            r = tf.nn.relu(_tf_bn(
                _tf_conv_same(r, vals[f"{p}/conv2/weights"], eff_stride,
                              unit_rate),
                vals, f"{p}/conv2/BatchNorm",
            ))
            r = _tf_bn(
                tf.nn.conv2d(r, vals[f"{p}/conv3/weights"], 1, "SAME"),
                vals, f"{p}/conv3/BatchNorm",
            )
            x = tf.nn.relu(shortcut + r)
        outs[f"block{b}"] = x.numpy()
    return outs


def tf_slim_resnet_v2_forward(x, vals, arch, depth, output_stride=None):
    """Hand-written TF forward with slim resnet_v2 semantics:
    pre-activation units, biased normalizer-free convs, final postnorm."""
    x = tf.constant(x)
    x = _tf_conv_same(x, vals[f"{arch}/conv1/weights"], 2)
    x = tf.nn.bias_add(x, vals[f"{arch}/conv1/biases"])
    x = tf.nn.max_pool2d(x, 3, 2, "VALID")

    current_stride, rate = 4, 1
    outs = {}
    for b, (base, num_units, block_stride) in enumerate(
        RESNET_BLOCK_DEFS[depth], 1
    ):
        for u in range(1, num_units + 1):
            unit_stride = block_stride if u == num_units else 1
            if output_stride is not None and current_stride == output_stride:
                unit_rate, eff_stride = rate, 1
                rate *= unit_stride
            else:
                unit_rate, eff_stride = 1, unit_stride
                current_stride *= unit_stride

            p = f"{arch}/block{b}/unit_{u}/bottleneck_v2"
            out_c = base * 4
            preact = tf.nn.relu(_tf_bn(x, vals, f"{p}/preact"))
            if int(x.shape[-1]) == out_c:
                shortcut = (
                    x if eff_stride == 1
                    else tf.nn.max_pool2d(x, 1, eff_stride, "VALID")
                )
            else:
                shortcut = tf.nn.conv2d(
                    preact, vals[f"{p}/shortcut/weights"], eff_stride,
                    "SAME",
                )
                shortcut = tf.nn.bias_add(
                    shortcut, vals[f"{p}/shortcut/biases"]
                )
            r = tf.nn.relu(_tf_bn(
                tf.nn.conv2d(preact, vals[f"{p}/conv1/weights"], 1, "SAME"),
                vals, f"{p}/conv1/BatchNorm",
            ))
            r = tf.nn.relu(_tf_bn(
                _tf_conv_same(r, vals[f"{p}/conv2/weights"], eff_stride,
                              unit_rate),
                vals, f"{p}/conv2/BatchNorm",
            ))
            r = tf.nn.conv2d(r, vals[f"{p}/conv3/weights"], 1, "SAME")
            r = tf.nn.bias_add(r, vals[f"{p}/conv3/biases"])
            x = shortcut + r
        outs[f"block{b}"] = x.numpy()
    outs["postnorm"] = tf.nn.relu(
        _tf_bn(x, vals, f"{arch}/postnorm")
    ).numpy()
    return outs


def tf_slim_vgg_forward(x, vals):
    x = tf.constant(x)
    stages = [(1, 2), (2, 2), (3, 3), (4, 3), (5, 3)]
    for stage, reps in stages:
        for i in range(1, reps + 1):
            p = f"vgg_16/conv{stage}/conv{stage}_{i}"
            x = tf.nn.conv2d(x, vals[f"{p}/weights"], 1, "SAME")
            x = tf.nn.relu(tf.nn.bias_add(x, vals[f"{p}/biases"]))
        if stage != 5:
            x = tf.nn.max_pool2d(x, 2, 2, "VALID")
    return x.numpy()


def _strip_prefix(flat, prefix):
    return {
        k[len(prefix):]: v for k, v in flat.items() if k.startswith(prefix)
    }


def _merged_variables(net, x, flat, prefix):
    variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    params, n_p = merge_flat_params(
        dict(variables["params"]), _strip_prefix(flat, f"params/{prefix}")
    )
    out = {"params": params}
    n_s = 0
    if "batch_stats" in variables:
        stats, n_s = merge_flat_params(
            dict(variables["batch_stats"]),
            _strip_prefix(flat, f"batch_stats/{prefix}"),
        )
        out["batch_stats"] = stats
    return out, n_p, n_s


class TestSlimResNetConversion:
    @pytest.fixture(scope="class")
    def converted(self, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("slim")
        arch, vals = make_slim_resnet_values(50)
        ckpt = save_slim_checkpoint(vals, str(tmp / "resnet_v1_50.ckpt"))
        npz = str(tmp / "weights.npz")
        convert_slim_checkpoint_file(ckpt, npz, "resnet_v1_50")
        with np.load(npz, allow_pickle=False) as data:
            flat = {k: data[k] for k in data.files}
        return arch, vals, flat

    def test_layout_stamp_and_skips(self, converted):
        _, _, flat = converted
        assert str(flat["__meta__/layout"]) == "slim"
        assert not any("logits" in k for k in flat)

    def test_full_trunk_matches_slim_forward(self, converted):
        """Odd input dims stress the padding conventions."""
        arch, vals, flat = converted
        rng = np.random.RandomState(1)
        x = rng.randn(1, 65, 63, 3).astype(np.float32)
        golden = tf_slim_resnet_v1_forward(x, vals, arch, 50)

        net = ResNet(depth=50, version=1)
        variables, n_p, n_s = _merged_variables(
            net, x, flat, "base_network/resnet_v1_50/"
        )
        assert n_p == len(jax.tree_util.tree_leaves(variables["params"]))
        assert n_s == len(
            jax.tree_util.tree_leaves(variables["batch_stats"])
        )
        _, endpoints = net.apply(variables, jnp.asarray(x))
        # Tolerance grows with depth: TF and XLA fuse differently, and
        # float32 error accumulates over ~50 conv+BN layers. A layout bug
        # produces O(1) mismatches (or wrong shapes), not 1e-4.
        for block, rtol in (
            ("block1", 2e-4), ("block2", 2e-4),
            ("block3", 5e-4), ("block4", 2e-3),
        ):
            np.testing.assert_allclose(
                np.asarray(endpoints[block]), golden[block],
                rtol=rtol, atol=5e-4, err_msg=block,
            )

    def test_detection_trunk_output_stride_16(self, converted):
        """block3 endpoint at output_stride 16 — the Faster R-CNN config."""
        arch, vals, flat = converted
        rng = np.random.RandomState(2)
        x = rng.randn(1, 64, 64, 3).astype(np.float32)
        golden = tf_slim_resnet_v1_forward(
            x, vals, arch, 50, output_stride=16
        )

        net = ResNet(
            depth=50, version=1, output_stride=16, endpoint="block3"
        )
        variables, _, _ = _merged_variables(
            net, x, flat, "base_network/resnet_v1_50/"
        )
        feature_map, _ = net.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(feature_map), golden["block3"],
            rtol=5e-4, atol=2e-4,
        )

    def test_tail_initialized(self, converted):
        _, _, flat = converted
        assert (
            "params/base_network_tail/resnet_v1_50/block4/unit_1/conv1/kernel"
            in flat
        )


class TestSlimResNetV2Conversion:
    def test_trunk_matches_slim_v2_forward(self, tmp_path):
        """Full v2 chain incl. the normalizer-free conv biases (root
        conv1 / unit conv3 / shortcut) that v1 doesn't have."""
        arch, vals = make_slim_resnet_v2_values(50)
        ckpt = save_slim_checkpoint(vals, str(tmp_path / "resnet_v2_50.ckpt"))
        npz = str(tmp_path / "v2.npz")
        convert_slim_checkpoint_file(ckpt, npz, "resnet_v2_50")
        with np.load(npz, allow_pickle=False) as data:
            flat = {k: data[k] for k in data.files}

        rng = np.random.RandomState(4)
        x = rng.randn(1, 65, 63, 3).astype(np.float32)
        golden = tf_slim_resnet_v2_forward(x, vals, arch, 50)

        net = ResNet(depth=50, version=2)
        variables, n_p, n_s = _merged_variables(
            net, x, flat, "base_network/resnet_v2_50/"
        )
        # Full coverage: every flax param (incl. the biases) converted.
        assert n_p == len(jax.tree_util.tree_leaves(variables["params"]))
        assert n_s == len(
            jax.tree_util.tree_leaves(variables["batch_stats"])
        )
        _, endpoints = net.apply(variables, jnp.asarray(x))
        for block, rtol in (
            ("block1", 2e-4), ("block2", 2e-4),
            ("block3", 5e-4), ("block4", 2e-3), ("postnorm", 2e-3),
        ):
            np.testing.assert_allclose(
                np.asarray(endpoints[block]), golden[block],
                rtol=rtol, atol=5e-4, err_msg=block,
            )


class TestSlimVGGConversion:
    def test_trunk_matches_slim_forward(self, tmp_path):
        vals = make_slim_vgg_values()
        ckpt = save_slim_checkpoint(vals, str(tmp_path / "vgg_16.ckpt"))
        npz = str(tmp_path / "vgg.npz")
        convert_slim_checkpoint_file(ckpt, npz, "vgg_16")
        with np.load(npz, allow_pickle=False) as data:
            flat = {k: data[k] for k in data.files}
        # Emitted under both detector scopes.
        assert "params/feature_extractor/vgg_16/conv1/conv1_1/kernel" in flat
        assert "params/base_network/vgg_16/conv1/conv1_1/kernel" in flat

        rng = np.random.RandomState(3)
        x = rng.randn(1, 48, 64, 3).astype(np.float32)
        golden = tf_slim_vgg_forward(x, vals)

        net = VGG16(truncated=True)
        variables = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params, n_p = merge_flat_params(
            dict(variables["params"]),
            _strip_prefix(flat, "params/feature_extractor/vgg_16/"),
        )
        assert n_p == len(jax.tree_util.tree_leaves(params))
        out, _ = net.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(out), golden, rtol=1e-3, atol=5e-4
        )
