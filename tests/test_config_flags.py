"""Config-flag paths not covered elsewhere: clobber_positives,
apply_nms=False, clip_after_nms, VGG-backboned Faster R-CNN."""

import jax
import jax.numpy as jnp
import numpy as np

from luminoth_tpu.models.fasterrcnn.rpn_proposal import rpn_proposal
from luminoth_tpu.models.fasterrcnn.rpn_target import rpn_target_assign

KEY = jax.random.PRNGKey(0)


class TestClobberPositives:
    def test_low_iou_best_anchor_clobbered(self):
        # The gt's best anchor has IoU < bg threshold: with clobber on, the
        # late bg pass overwrites the fg label; with clobber off it stays fg.
        anchors = jnp.asarray(
            [[0.0, 0, 200, 200], [150, 150, 170, 170]], dtype=jnp.float32
        )
        gt = jnp.asarray([[0, 0, 20, 20, 0]], jnp.float32)
        labels_off, _, _ = rpn_target_assign(
            anchors, gt, (220, 220), KEY, clobber_positives=False
        )
        labels_on, _, _ = rpn_target_assign(
            anchors, gt, (220, 220), KEY, clobber_positives=True
        )
        # anchor 0 is the best for the gt with IoU ~0.01 (< 0.3)
        assert labels_off[0] == 1.0
        assert labels_on[0] == 0.0


class TestRPNProposalFlags:
    ANCHORS = jnp.asarray(
        [[10, 10, 60, 60], [12, 12, 62, 62], [80, 80, 140, 140]],
        dtype=jnp.float32,
    )
    PROBS = jnp.asarray([[0.2, 0.8], [0.3, 0.7], [0.1, 0.9]])
    DELTAS = jnp.zeros((3, 4))

    def test_apply_nms_false_keeps_overlaps(self):
        out = rpn_proposal(
            self.PROBS, self.DELTAS, self.ANCHORS,
            jnp.asarray([200.0, 200.0]),
            pre_nms_top_n=3, post_nms_top_n=3, apply_nms=False,
        )
        assert np.asarray(out["valid"]).sum() == 3  # nothing suppressed

    def test_clip_after_nms(self):
        anchors = jnp.asarray([[80, 80, 140, 140]], dtype=jnp.float32)
        probs = jnp.asarray([[0.1, 0.9]])
        out_before = rpn_proposal(
            probs, jnp.zeros((1, 4)), anchors, jnp.asarray([100.0, 100.0]),
            pre_nms_top_n=1, post_nms_top_n=1, clip_after_nms=False,
        )
        out_after = rpn_proposal(
            probs, jnp.zeros((1, 4)), anchors, jnp.asarray([100.0, 100.0]),
            pre_nms_top_n=1, post_nms_top_n=1, clip_after_nms=True,
        )
        # Both end up clipped; with clip_after_nms the NMS saw the unclipped
        # box but the output is still inside the image.
        for out in (out_before, out_after):
            box = np.asarray(out["proposals"])[0]
            assert box[2] <= 99.0 and box[3] <= 99.0

    def test_min_size_filter(self):
        anchors = jnp.asarray(
            [[10, 10, 12, 12], [20, 20, 80, 80]], dtype=jnp.float32
        )
        probs = jnp.asarray([[0.1, 0.9], [0.2, 0.8]])
        out = rpn_proposal(
            probs, jnp.zeros((2, 4)), anchors, jnp.asarray([100.0, 100.0]),
            pre_nms_top_n=2, post_nms_top_n=2, min_size=10,
        )
        valid = np.asarray(out["valid"])
        assert valid.sum() == 1
        np.testing.assert_allclose(
            np.asarray(out["scores"])[valid], [0.8], atol=1e-6
        )


class TestVGGFasterRCNN:
    def test_forward_with_vgg_backbone(self):
        from luminoth_tpu.models.fasterrcnn import FasterRCNN
        from luminoth_tpu.utils.config import (
            Config, get_base_config, get_model_config,
        )

        cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
        cfg.model.network.num_classes = 2
        cfg.model.base_network.architecture = "vgg_16"
        cfg.model.rpn.proposals.pre_nms_top_n = 32
        cfg.model.rpn.proposals.post_nms_top_n = 8
        cfg.model.rcnn.target.minibatch_size = 8
        cfg.model.rcnn.proposals.total_max_detections = 4
        cfg.model.rcnn.proposals.class_max_detections = 4

        model = FasterRCNN(cfg)
        key = jax.random.PRNGKey(0)
        images = jax.random.uniform(key, (1, 96, 96, 3)) * 255.0
        variables = model.init(key, images, train=False)
        preds = model.apply(variables, images, train=False)
        cp = preds["classification_prediction"]
        assert cp["objects"].shape == (1, 4, 4)
        # VGG tail is the identity: head consumed 7x7x512 crops directly.
        assert "base_network_tail" not in variables["params"] or not (
            variables["params"].get("base_network_tail")
        )
