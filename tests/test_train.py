"""Trainer tests with injected mock model/dataset (mirrors train_test.py)."""

import numpy as np
import pytest
import jax.numpy as jnp
from flax import linen as nn

from luminoth_tpu import train as train_module
from luminoth_tpu.utils.config import Config


class MockModel(nn.Module):
    """Tiny trainable stand-in for a detector (cf. MockFasterRCNN)."""

    config: dict
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, images, gt_boxes=None, im_shape=None, train=False):
        kernel = self.param(
            "w", nn.initializers.ones, (3, 1)
        )
        pooled = jnp.mean(images, axis=(1, 2))  # (B, 3)
        out = pooled @ kernel  # (B, 1)
        return {"out": out}

    def loss(self, preds, return_all=False):
        loss = jnp.mean(jnp.square(preds["out"]))
        if return_all:
            return {"total_loss": loss}
        return loss


class FakeDataset:
    """In-memory random batches (cf. train_test.py's FIFOQueue dataset)."""

    def __init__(self, config, **kwargs):
        self._batches = int(config.train.get("num_epochs", 1)) * 4
        self._batch_size = int(config.train.get("batch_size", 1))

    def __iter__(self):
        rng = np.random.RandomState(0)
        for _ in range(self._batches):
            yield {
                "image": rng.uniform(
                    0, 255, (self._batch_size, 16, 16, 3)
                ).astype(np.float32),
                "gt_boxes": np.zeros((self._batch_size, 4, 5), np.float32),
                "filename": ["fake.jpg"] * self._batch_size,
            }


def make_config(tmp_path, **train_overrides):
    train = {
        "batch_size": 2,
        "num_epochs": 2,
        "job_dir": str(tmp_path / "jobs"),
        "run_name": "test",
        "save_checkpoint_secs": 0,  # save every loop
        "save_summaries_secs": 10000,
        "checkpoints_max_keep": 2,
        "learning_rate": {"learning_rate": 1e-6},
        "optimizer": {"type": "momentum", "momentum": 0.9},
        "seed": 7,
    }
    train.update(train_overrides)
    return Config(
        {
            "train": train,
            "dataset": {"type": "object_detection", "dir": "unused",
                        "split": "train"},
            "model": {
                "type": "mock",
                "compute_dtype": "float32",
                "base_network": {"arg_scope": {"weight_decay": 0.0}},
            },
        }
    )


def run_training(config, max_steps=None):
    return train_module.run(
        config,
        get_model_fn=lambda t: MockModel,
        get_dataset_fn=lambda t: FakeDataset,
        max_steps=max_steps,
    )


class TestTrain:
    def test_loss_decreases(self, tmp_path):
        config = make_config(tmp_path, no_log=True)
        state = run_training(config)
        assert int(state.step) == 8
        # Weights moved away from init (ones).
        w = np.asarray(state.params["w"])
        assert not np.allclose(w, 1.0)

    def test_checkpoint_save_and_resume(self, tmp_path):
        config = make_config(tmp_path)
        state = run_training(config, max_steps=3)
        assert int(state.step) == 3

        ckpt_dir = tmp_path / "jobs" / "test" / "ckpt"
        assert any(f.startswith("ckpt_step_") for f in
                   [p.name for p in ckpt_dir.iterdir()])

        # Second run resumes from step 3 and continues.
        state2 = run_training(config, max_steps=5)
        assert int(state2.step) == 5

    def test_max_keep_rotation(self, tmp_path):
        config = make_config(tmp_path, checkpoints_max_keep=1)
        run_training(config, max_steps=4)
        ckpt_dir = tmp_path / "jobs" / "test" / "ckpt"
        ckpts = [p for p in ckpt_dir.iterdir()
                 if p.name.startswith("ckpt_step_")]
        assert len(ckpts) == 1

    def test_tf_debug_and_save_timeline(self, tmp_path):
        """tf_debug → jax_debug_nans (restored after); save_timeline →
        profiler trace dir (reference train.py:133-137,163-168)."""
        import os

        import jax

        config = make_config(
            tmp_path, no_log=True, tf_debug=True, save_timeline=True
        )
        assert not jax.config.jax_debug_nans
        state = run_training(config, max_steps=2)
        assert int(state.step) == 2
        assert not jax.config.jax_debug_nans  # restored
        assert os.path.isdir(str(tmp_path / "jobs" / "test" / "profile"))

    def test_invalid_optimizer_raises(self, tmp_path):
        config = make_config(
            tmp_path, no_log=True, optimizer={"type": "magic"}
        )
        with pytest.raises(ValueError):
            run_training(config, max_steps=1)


def test_ignore_scope_partial_restore(tmp_path):
    """`train.ignore_scope` keeps fresh values for the ignored subtree."""
    import numpy as np
    from luminoth_tpu.utils.checkpoint_io import CheckpointManager

    manager = CheckpointManager(str(tmp_path / "ckpt"))
    saved = {
        "step": 5,
        "params": {"rpn": {"w": np.full((2,), 7.0, np.float32)},
                   "rcnn": {"w": np.full((2,), 9.0, np.float32)}},
    }
    manager.save(saved, 5)

    template = {
        "step": 0,
        "params": {"rpn": {"w": np.zeros(2, np.float32)},
                   "rcnn": {"w": np.zeros(2, np.float32)}},
    }
    restored = manager.restore_latest(template, ignore_scope="rcnn")
    np.testing.assert_allclose(restored["params"]["rpn"]["w"], 7.0)
    np.testing.assert_allclose(restored["params"]["rcnn"]["w"], 0.0)
    assert restored["step"] == 5

    full = manager.restore_latest(template)
    np.testing.assert_allclose(full["params"]["rcnn"]["w"], 9.0)


def test_partial_restore_shape_mismatch_keeps_template(tmp_path):
    import numpy as np
    from luminoth_tpu.utils.checkpoint_io import CheckpointManager

    manager = CheckpointManager(str(tmp_path / "ckpt"))
    manager.save({"params": {"w": np.ones((3,), np.float32)}}, 1)
    template = {"params": {"w": np.zeros((5,), np.float32)}}
    restored = manager.restore_latest(template, ignore_scope="nothing")
    np.testing.assert_allclose(restored["params"]["w"], 0.0)


def test_per_module_weight_decay_coefficients():
    import numpy as np
    from luminoth_tpu.utils.config import Config
    from luminoth_tpu.utils.training import build_weight_decay_coefficients

    params = {
        "base_network": {"conv1": {"kernel": np.zeros(1)}},
        "rpn": {"conv": {"kernel": np.zeros(1), "bias": np.zeros(1)}},
        "rcnn": {"fc_classifier": {"kernel": np.zeros(1)}},
    }
    model_cfg = Config({
        "base_network": {"arg_scope": {"weight_decay": 0.0005}},
        "rpn": {"l2_regularization_scale": 0.001},
        "rcnn": {"l2_regularization_scale": 0.0},
    })
    coeffs = build_weight_decay_coefficients(params, model_cfg)
    assert coeffs["base_network"]["conv1"]["kernel"] == 0.0005
    assert coeffs["rpn"]["conv"]["kernel"] == 0.001
    assert coeffs["rpn"]["conv"]["bias"] == 0.0
    assert coeffs["rcnn"]["fc_classifier"]["kernel"] == 0.0


def test_learning_rate_accepts_yaml_string_scientific():
    # YAML 1.1 parses `1e-4` (no dot, no sign marker) as a STRING, and the
    # learning_rate/optimizer subtrees are `_replace: True` in the base
    # configs so the merge-time type check never sees them. The factory
    # must cast.
    import yaml

    from luminoth_tpu.utils.config import Config
    from luminoth_tpu.utils.training import get_learning_rate, get_optimizer

    parsed = yaml.safe_load("value: 1e-4")
    assert isinstance(parsed["value"], str)  # the YAML 1.1 trap is real

    sched = get_learning_rate(Config({"learning_rate": parsed}))
    assert float(sched(0)) == pytest.approx(1e-4)

    sched = get_learning_rate(
        Config({
            "learning_rate": yaml.safe_load(
                "decay_method: exponential_decay\n"
                "initial_learning_rate: 2.5e-3\n"
                "decay_steps: 10\n"
            )
        })
    )
    assert float(sched(0)) == pytest.approx(2.5e-3)

    opt, _ = get_optimizer(
        Config({
            "optimizer": yaml.safe_load("type: adam\nepsilon: 1e-8"),
            "learning_rate": {"value": 0.001},
        })
    )
    params = {"w": jnp.ones((2,))}
    state = opt.init(params)
    updates, _ = opt.update({"w": jnp.ones((2,))}, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))


class TestPrefetchToDevice:
    def test_yields_all_batches_in_order(self):
        import jax

        batches = [
            {"image": np.full((2, 4, 4, 3), i, np.float32),
             "gt_boxes": np.zeros((2, 4, 5), np.float32),
             "filename": [f"{i}.jpg"] * 2}
            for i in range(5)
        ]
        out = list(train_module.prefetch_to_device(iter(batches), None))
        assert len(out) == 5
        for i, (host, dev) in enumerate(out):
            assert host["filename"][0] == f"{i}.jpg"
            assert isinstance(dev["image"], jax.Array)
            assert float(dev["image"][0, 0, 0, 0]) == i
            # metadata keys aren't uploaded
            assert "filename" not in dev

    def test_empty_iterator(self):
        assert list(train_module.prefetch_to_device(iter([]), None)) == []

    def test_short_iterator_below_depth(self):
        batches = [{"image": np.zeros((1, 2, 2, 3), np.float32)}]
        out = list(
            train_module.prefetch_to_device(iter(batches), None, depth=4)
        )
        assert len(out) == 1


class TestUint8TrainStep:
    def test_step_casts_uint8_on_device(self):
        import jax
        import optax

        model = MockModel(config={})
        images = np.full((2, 16, 16, 3), 100, np.uint8)
        gt = np.zeros((2, 4, 5), np.float32)
        variables = model.init(jax.random.PRNGKey(0), images.astype(np.float32))
        tx = optax.sgd(0.01)
        state = train_module.TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=variables["params"],
            opt_state=tx.init(variables["params"]),
            batch_stats={},
        )
        step = train_module.make_train_step(model, tx)
        batch = {"image": jnp.asarray(images), "gt_boxes": jnp.asarray(gt)}
        state2, metrics = step(state, batch, jax.random.PRNGKey(1))
        expected = float(jnp.mean(jnp.square(
            jnp.full((2, 1), 300.0)  # mean pixel 100 x kernel ones (3,1)
        )))
        assert np.isfinite(float(metrics["total_loss"]))
        np.testing.assert_allclose(
            float(metrics["total_loss"]), expected, rtol=1e-5
        )


def test_warm_transfer_path_async_runs_once():
    from luminoth_tpu.utils import tunnel

    tunnel._started = False
    t = tunnel.warm_transfer_path_async()
    assert t is not None
    t.join(timeout=30)
    assert not t.is_alive()
    # second call is a no-op
    assert tunnel.warm_transfer_path_async() is None
    tunnel._started = False


def test_remat_step_matches_plain_step():
    import jax
    import optax

    model = MockModel(config={})
    images = np.random.RandomState(0).uniform(
        0, 255, (2, 16, 16, 3)).astype(np.float32)
    gt = np.zeros((2, 4, 5), np.float32)
    variables = model.init(jax.random.PRNGKey(0), images)
    tx = optax.sgd(0.01)

    def run(remat):
        # fresh copies: the train step donates its state buffers
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        state = train_module.TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            opt_state=tx.init(params),
            batch_stats={},
        )
        step = train_module.make_train_step(model, tx, remat=remat)
        batch = {"image": jnp.asarray(images), "gt_boxes": jnp.asarray(gt)}
        for _ in range(3):
            state, metrics = step(state, batch, jax.random.PRNGKey(1))
        return float(metrics["total_loss"]), state.params

    loss_plain, params_plain = run(False)
    loss_remat, params_remat = run(True)
    np.testing.assert_allclose(loss_remat, loss_plain, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(params_plain),
                    jax.tree_util.tree_leaves(params_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_reg_loss_reporting_matches_reference_semantics():
    """total_loss includes L2 regularization, no_reg_loss excludes it
    (reference fasterrcnn.py:158-259); the optimization objective is
    unchanged (decay applied by the optimizer)."""
    import jax
    import optax

    from luminoth_tpu.train import TrainState, make_train_step
    from luminoth_tpu.utils.training import l2_regularization_loss

    model = MockModel(config={})
    images = jnp.ones((2, 8, 8, 3))
    gt = jnp.zeros((2, 4, 5))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, images, gt_boxes=gt, train=True
    )
    params = variables["params"]
    coeffs = jax.tree_util.tree_map(lambda _: 0.01, params)
    tx = optax.sgd(1e-3)
    step = make_train_step(
        model, tx, reg_fn=lambda p: l2_regularization_loss(p, coeffs)
    )
    state = TrainState(
        step=jnp.asarray(0, jnp.int32), params=params,
        opt_state=tx.init(params), batch_stats={},
    )
    # the step donates its state buffers: compute the expectation first
    expect = 0.5 * 0.01 * sum(
        float(jnp.sum(jnp.square(w)))
        for w in jax.tree_util.tree_leaves(params)
    )
    _, metrics = step(
        state, {"image": images, "gt_boxes": gt}, jax.random.PRNGKey(1)
    )
    reg = float(metrics["reg_loss"])
    assert reg > 0
    np.testing.assert_allclose(
        float(metrics["total_loss"]),
        float(metrics["no_reg_loss"]) + reg, rtol=1e-6,
    )
    np.testing.assert_allclose(reg, expect, rtol=1e-5)


class TwoScopeModel(nn.Module):
    """Trunk+head model for trainable-partition tests."""

    @nn.compact
    def __call__(self, images, gt_boxes=None, im_shape=None, train=False):
        trunk = self.param(
            "trunk_w", nn.initializers.constant(2.0), (3, 1)
        )
        head = self.param("head_v", nn.initializers.constant(1.5), (1,))
        pooled = jnp.mean(images, axis=(1, 2))  # (B, 3)
        out = (pooled @ trunk)[:, 0] * head[0]
        return {"out": out}

    def loss(self, preds, return_all=False):
        loss = jnp.mean(jnp.square(preds["out"]))
        if return_all:
            return {"total_loss": loss}
        return loss


def test_trainable_mask_restricts_differentiation_and_clip_norm():
    """Frozen params stay put AND stay out of clip_by_global_norm's norm,
    matching the reference's compute_gradients(var_list=trainable_vars)
    (reference train.py:79-83): gradients simply do not exist for frozen
    variables, so they can neither move nor inflate the clip norm."""
    import jax
    import optax

    model = TwoScopeModel()
    images = np.random.RandomState(0).uniform(
        0, 255, (2, 16, 16, 3)).astype(np.float32)
    batch = {"image": jnp.asarray(images),
             "gt_boxes": jnp.zeros((2, 4, 5))}
    variables = model.init(jax.random.PRNGKey(0), images)
    mask = {"trunk_w": False, "head_v": True}

    # Full-diff gradients for the expectation.
    def full_loss(p):
        return model.loss(model.apply({"params": p}, images))

    full_grads = jax.grad(full_loss)(variables["params"])
    g_head = float(jnp.linalg.norm(full_grads["head_v"]))
    g_full = float(optax.global_norm(full_grads))
    assert g_full > g_head  # the trunk gradient is material

    # Aggressive clip: the scale factor depends on which norm is used.
    clip = g_head / 2.0
    lr = 1.0
    tx = optax.chain(optax.clip_by_global_norm(clip), optax.sgd(lr))

    params = jax.tree_util.tree_map(jnp.array, variables["params"])
    state = train_module.TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats={},
    )
    head_before = np.asarray(variables["params"]["head_v"])
    step = train_module.make_train_step(model, tx, trainable_mask=mask)
    state2, metrics = step(state, batch, jax.random.PRNGKey(1))

    # Frozen trunk untouched; head moved.
    np.testing.assert_array_equal(
        np.asarray(state2.params["trunk_w"]), 2.0
    )
    assert not np.allclose(np.asarray(state2.params["head_v"]), head_before)

    # grad_norm reports the trainable-only norm.
    np.testing.assert_allclose(float(metrics["grad_norm"]), g_head,
                               rtol=1e-5)

    # The clip scaled by the head-only norm (clip/g_head), NOT the full
    # norm: update == -lr * g_head_vec * clip / g_head.
    expected_head = head_before - lr * np.asarray(
        full_grads["head_v"]) * (clip / g_head)
    np.testing.assert_allclose(
        np.asarray(state2.params["head_v"]), expected_head, rtol=1e-5
    )


def test_trainable_mask_all_true_matches_no_mask():
    import jax
    import optax

    model = TwoScopeModel()
    images = np.random.RandomState(1).uniform(
        0, 255, (2, 16, 16, 3)).astype(np.float32)
    batch = {"image": jnp.asarray(images),
             "gt_boxes": jnp.zeros((2, 4, 5))}
    variables = model.init(jax.random.PRNGKey(0), images)
    tx = optax.sgd(1e-4)

    def run(mask):
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        state = train_module.TrainState(
            step=jnp.asarray(0, jnp.int32), params=params,
            opt_state=tx.init(params), batch_stats={},
        )
        step = train_module.make_train_step(model, tx, trainable_mask=mask)
        for _ in range(2):
            state, _ = step(state, batch, jax.random.PRNGKey(1))
        return state.params

    p_none = run(None)
    p_true = run({"trunk_w": True, "head_v": True})
    for a, b in zip(jax.tree_util.tree_leaves(p_none),
                    jax.tree_util.tree_leaves(p_true)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestBuildTrainableMask:
    """reference get_trainable_vars semantics (base_network.py:211-241):
    variables starting from the FIRST whose name contains fine_tune_from
    are trainable — the named scope itself trains."""

    def _mask(self, params, **base_cfg):
        from luminoth_tpu.utils.training import build_trainable_mask

        return build_trainable_mask(
            params, Config({"base_network": base_cfg})
        )

    def test_resnet_boundary_is_inclusive(self):
        leaf = np.zeros((1,))
        params = {
            "base_network": {
                "conv1": {"kernel": leaf},
                "block1": {"unit_1": {"conv1": {"kernel": leaf}}},
                "block2": {"unit_1": {"conv2": {"kernel": leaf}}},
                "block3": {"unit_1": {"conv3": {"kernel": leaf}}},
            },
            "base_network_tail": {"block4": {"kernel": leaf}},
            "rpn": {"conv": {"kernel": leaf}},
            "rcnn": {"cls": {"kernel": leaf}},
        }
        m = self._mask(params, fine_tune_from="block2")
        assert m["base_network"]["conv1"]["kernel"] is False
        assert m["base_network"]["block1"]["unit_1"]["conv1"]["kernel"] \
            is False
        # block2 itself trains (reference: all_variables[index:]).
        assert m["base_network"]["block2"]["unit_1"]["conv2"]["kernel"] \
            is True
        assert m["base_network"]["block3"]["unit_1"]["conv3"]["kernel"] \
            is True
        assert m["base_network_tail"]["block4"]["kernel"] is True
        assert m["rpn"]["conv"]["kernel"] is True
        assert m["rcnn"]["cls"]["kernel"] is True

    def test_freeze_tail_and_backbone(self):
        leaf = np.zeros((1,))
        params = {
            "base_network": {"block3": {"kernel": leaf}},
            "base_network_tail": {"block4": {"kernel": leaf}},
            "rcnn": {"cls": {"kernel": leaf}},
        }
        m = self._mask(params, freeze_tail=True)
        assert m["base_network_tail"]["block4"]["kernel"] is False
        assert m["base_network"]["block3"]["kernel"] is True
        m = self._mask(params, trainable=False)
        assert m["base_network"]["block3"]["kernel"] is False
        assert m["rcnn"]["cls"]["kernel"] is True

    def test_vgg_stage_boundary(self):
        leaf = np.zeros((1,))
        params = {
            "feature_extractor": {
                "vgg": {
                    "conv1/conv1_1": {"kernel": leaf},
                    "conv3/conv3_2": {"kernel": leaf},
                    "conv4/conv4_3": {"kernel": leaf},
                    "conv5/conv5_3": {"kernel": leaf},
                },
                "conv6": {"kernel": leaf},
            },
            "multibox": {"cls_0": {"kernel": leaf}},
        }
        m = self._mask(params, fine_tune_from="conv4_3")
        fe = m["feature_extractor"]["vgg"]
        assert fe["conv1/conv1_1"]["kernel"] is False
        assert fe["conv3/conv3_2"]["kernel"] is False
        assert fe["conv4/conv4_3"]["kernel"] is True
        assert fe["conv5/conv5_3"]["kernel"] is True
        # extractor scopes outside the ordered trunk stay trainable
        assert m["feature_extractor"]["conv6"]["kernel"] is True
        assert m["multibox"]["cls_0"]["kernel"] is True

    def test_sub_stage_boundary_resnet_unit(self):
        """Reference configs use sub-stage scopes like 'block4/unit_2'
        (variable-order substring match, base_network.py:232-235): the
        earlier units of the SAME stage must stay frozen."""
        leaf = np.zeros((1,))
        params = {
            "base_network": {
                "block3": {
                    "unit_1": {"conv1": {"kernel": leaf}},
                    "unit_2": {"conv1": {"kernel": leaf}},
                    "unit_10": {"conv1": {"kernel": leaf}},
                    "unit_11": {"conv1": {"kernel": leaf}},
                },
            },
        }
        m = self._mask(params, fine_tune_from="block3/unit_10")
        b3 = m["base_network"]["block3"]
        assert b3["unit_1"]["conv1"]["kernel"] is False
        assert b3["unit_2"]["conv1"]["kernel"] is False
        # natural order: unit_10 after unit_2, not between unit_1/unit_2
        assert b3["unit_10"]["conv1"]["kernel"] is True
        assert b3["unit_11"]["conv1"]["kernel"] is True

    def test_sub_stage_boundary_vgg_conv(self):
        leaf = np.zeros((1,))
        params = {
            "feature_extractor": {
                "vgg": {
                    "conv4/conv4_1": {"kernel": leaf},
                    "conv4/conv4_2": {"kernel": leaf},
                    "conv4/conv4_3": {"kernel": leaf},
                },
            },
        }
        m = self._mask(params, fine_tune_from="conv4/conv4_2")
        fe = m["feature_extractor"]["vgg"]
        assert fe["conv4/conv4_1"]["kernel"] is False
        assert fe["conv4/conv4_2"]["kernel"] is True
        assert fe["conv4/conv4_3"]["kernel"] is True

    def test_arch_prefixes_stripped_from_query(self):
        """Reference-style values carry the slim arch scope
        ('vgg_16/fc6', docstring at base_network.py:216-218); our param
        paths don't — the prefix is stripped rather than failing."""
        leaf = np.zeros((1,))
        params = {
            "base_network": {
                "conv5/conv5_3": {"kernel": leaf},
                "fc6": {"kernel": leaf},
                "fc7": {"kernel": leaf},
            },
        }
        m = self._mask(params, fine_tune_from="vgg_16/fc6")
        assert m["base_network"]["conv5/conv5_3"]["kernel"] is False
        assert m["base_network"]["fc6"]["kernel"] is True
        assert m["base_network"]["fc7"]["kernel"] is True

    def test_unmatched_scope_raises(self):
        """The reference raises ValueError on a fine_tune_from that
        matches nothing (base_network.py:236-240) — silently training
        everything would hide a config typo."""
        leaf = np.zeros((1,))
        params = {"base_network": {"conv1": {"kernel": leaf}}}
        with pytest.raises(ValueError, match="fine_tune_from"):
            self._mask(params, fine_tune_from="blockX/not_a_scope")


def test_trainable_mask_composes_with_remat():
    import jax
    import optax

    model = TwoScopeModel()
    images = np.random.RandomState(2).uniform(
        0, 255, (2, 16, 16, 3)).astype(np.float32)
    batch = {"image": jnp.asarray(images),
             "gt_boxes": jnp.zeros((2, 4, 5))}
    variables = model.init(jax.random.PRNGKey(0), images)
    mask = {"trunk_w": False, "head_v": True}
    tx = optax.sgd(1e-4)

    def run(remat):
        params = jax.tree_util.tree_map(jnp.array, variables["params"])
        state = train_module.TrainState(
            step=jnp.asarray(0, jnp.int32), params=params,
            opt_state=tx.init(params), batch_stats={},
        )
        step = train_module.make_train_step(
            model, tx, remat=remat, trainable_mask=mask
        )
        for _ in range(2):
            state, _ = step(state, batch, jax.random.PRNGKey(1))
        return state.params

    p_plain = run(False)
    p_remat = run(True)
    for a, b in zip(jax.tree_util.tree_leaves(p_plain),
                    jax.tree_util.tree_leaves(p_remat)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(p_remat["trunk_w"]), 2.0)
