"""Faster R-CNN end-to-end smoke tests (mirrors fasterrcnn_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminoth_tpu.utils.config import Config, get_base_config, get_model_config


@pytest.fixture(scope="module")
def config():
    from luminoth_tpu.models.fasterrcnn import FasterRCNN

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 3
    cfg.model.base_network.architecture = "resnet_v1_50"
    # Small static shapes for test speed.
    cfg.model.rpn.proposals.pre_nms_top_n = 128
    cfg.model.rpn.proposals.post_nms_top_n = 32
    cfg.model.rpn.target.minibatch_size = 64
    cfg.model.rcnn.target.minibatch_size = 16
    cfg.model.rcnn.proposals.total_max_detections = 10
    cfg.model.rcnn.proposals.class_max_detections = 8
    return cfg


@pytest.fixture(scope="module")
def model(config):
    from luminoth_tpu.models.fasterrcnn import FasterRCNN

    return FasterRCNN(config)


@pytest.fixture(scope="module")
def train_setup(model):
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (1, 96, 96, 3)) * 255.0
    gt = jnp.asarray([[[10, 10, 60, 60, 0], [30, 30, 90, 90, 2]]], jnp.float32)
    variables = model.init(
        {"params": key, "target": key}, images, gt_boxes=gt, train=True
    )
    return images, gt, variables


class TestFasterRCNNModel:
    def test_train_forward_shapes(self, model, config, train_setup):
        images, gt, variables = train_setup
        preds = model.apply(
            variables, images, gt_boxes=gt, train=True,
            rngs={"target": jax.random.PRNGKey(3)},
        )
        rpn = preds["rpn_prediction"]
        # 96/16 = 6 → 6*6*12 anchors
        a = 6 * 6 * 12
        assert rpn["rpn_cls_prob"].shape == (1, a, 2)
        assert rpn["rpn_bbox_pred"].shape == (1, a, 4)
        assert rpn["rpn_cls_target"].shape == (1, a)
        assert rpn["proposals"].shape == (1, 32, 4)

        cls = preds["classification_prediction"]
        m = config.model.rcnn.target.minibatch_size
        assert cls["rcnn"]["cls_score"].shape == (1, m, 4)
        assert cls["rcnn"]["bbox_offsets"].shape == (1, m, 12)
        assert cls["target"]["cls"].shape == (1, m)

        loss = model.loss(preds)
        assert np.isfinite(float(loss))
        all_losses = model.loss(preds, return_all=True)
        for k in ("rpn_cls_loss", "rpn_reg_loss", "rcnn_cls_loss",
                  "rcnn_reg_loss", "total_loss"):
            assert np.isfinite(float(all_losses[k])), k

    def test_inference_forward(self, model, config, train_setup):
        _, _, variables = train_setup
        images = jax.random.uniform(jax.random.PRNGKey(7), (2, 96, 96, 3)) * 255.0
        preds = model.apply(variables, images, train=False)
        cls = preds["classification_prediction"]
        assert cls["objects"].shape == (2, 10, 4)
        assert cls["labels"].shape == (2, 10)
        assert cls["probs"].shape == (2, 10)
        # Detections clipped inside the image.
        objects = np.asarray(cls["objects"])
        assert objects.min() >= 0
        assert objects.max() <= 95

    def test_im_shape_clipping(self, model, train_setup):
        _, _, variables = train_setup
        images = jax.random.uniform(jax.random.PRNGKey(8), (1, 96, 96, 3)) * 255.0
        im_shape = jnp.asarray([[50.0, 64.0]])
        preds = model.apply(variables, images, im_shape=im_shape, train=False)
        cls = preds["classification_prediction"]
        valid = np.asarray(cls["valid"])[0]
        if valid.any():
            objects = np.asarray(cls["objects"])[0][valid]
            assert objects[:, 2].max() <= 63.0
            assert objects[:, 3].max() <= 49.0

    def test_gradients_flow(self, model, config, train_setup):
        images, gt, variables = train_setup

        def loss_fn(params):
            preds = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, gt_boxes=gt, train=True,
                rngs={"target": jax.random.PRNGKey(1)},
            )
            return model.loss(preds)

        grads = jax.grad(loss_fn)(variables["params"])
        flat = jax.tree_util.tree_leaves(grads)
        total = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
        assert np.isfinite(total) and total > 0
        # RPN conv must receive gradient.
        assert float(
            jnp.sum(jnp.abs(grads["rpn"]["conv"]["kernel"]))
        ) > 0

    def test_rpn_only_mode(self, config, train_setup):
        from luminoth_tpu.models.fasterrcnn import FasterRCNN
        import copy

        cfg = copy.deepcopy(config)
        cfg.model.network.with_rcnn = False
        model = FasterRCNN(cfg)
        key = jax.random.PRNGKey(0)
        images = jax.random.uniform(key, (1, 96, 96, 3)) * 255.0
        gt = jnp.asarray([[[10, 10, 60, 60, 0]]], jnp.float32)
        variables = model.init(
            {"params": key, "target": key}, images, gt_boxes=gt, train=True
        )
        preds = model.apply(
            variables, images, gt_boxes=gt, train=True,
            rngs={"target": key},
        )
        assert "classification_prediction" not in preds
        loss = model.loss(preds)
        assert np.isfinite(float(loss))
