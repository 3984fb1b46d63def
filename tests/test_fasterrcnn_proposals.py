"""RPN/RCNN proposal stage tests (mirror rpn_proposal_test / rcnn_proposal_test)."""

import jax
import jax.numpy as jnp
import numpy as np

from luminoth_tpu.models.fasterrcnn.rpn_proposal import rpn_proposal
from luminoth_tpu.models.fasterrcnn.rcnn_proposal import rcnn_proposal
from luminoth_tpu.ops.np_boxes import nms as np_nms


class TestRPNProposal:
    def test_nms_suppression_and_sorting(self):
        anchors = jnp.asarray(
            [[10, 10, 60, 60], [12, 12, 62, 62], [100, 100, 160, 160]],
            dtype=jnp.float32,
        )
        probs = jnp.asarray([[0.2, 0.8], [0.3, 0.7], [0.1, 0.9]])
        deltas = jnp.zeros((3, 4))
        out = rpn_proposal(
            probs, deltas, anchors, jnp.asarray([200.0, 200.0]),
            pre_nms_top_n=3, post_nms_top_n=3, nms_threshold=0.5,
        )
        valid = np.asarray(out["valid"])
        assert valid.sum() == 2
        scores = np.asarray(out["scores"])[valid]
        assert scores[0] == 0.9 and scores[1] == 0.8

    def test_negative_area_filtered(self):
        anchors = jnp.asarray([[10, 10, 20, 20]], dtype=jnp.float32)
        # Extreme negative dw shrinks the box to zero area after decode/round.
        probs = jnp.asarray([[0.1, 0.9]])
        deltas = jnp.asarray([[0.0, 0.0, -10.0, -10.0]])
        out = rpn_proposal(
            probs, deltas, anchors, jnp.asarray([100.0, 100.0]),
            pre_nms_top_n=1, post_nms_top_n=1,
        )
        assert np.asarray(out["valid"]).sum() == 0

    def test_clipping_to_image(self):
        anchors = jnp.asarray([[80, 80, 120, 120]], dtype=jnp.float32)
        probs = jnp.asarray([[0.1, 0.9]])
        deltas = jnp.zeros((1, 4))
        out = rpn_proposal(
            probs, deltas, anchors, jnp.asarray([100.0, 100.0]),
            pre_nms_top_n=1, post_nms_top_n=1,
        )
        box = np.asarray(out["proposals"])[0]
        assert box[2] <= 99.0 and box[3] <= 99.0

    def test_filter_outside_anchors(self):
        anchors = jnp.asarray(
            [[-5, -5, 20, 20], [10, 10, 50, 50]], dtype=jnp.float32
        )
        probs = jnp.asarray([[0.1, 0.9], [0.2, 0.8]])
        deltas = jnp.zeros((2, 4))
        out = rpn_proposal(
            probs, deltas, anchors, jnp.asarray([100.0, 100.0]),
            pre_nms_top_n=2, post_nms_top_n=2, filter_outside_anchors=True,
        )
        valid = np.asarray(out["valid"])
        assert valid.sum() == 1
        assert np.asarray(out["scores"])[valid][0] == jnp.float32(0.8)

    def test_min_prob_threshold(self):
        anchors = jnp.asarray(
            [[10, 10, 50, 50], [100, 100, 150, 150]], dtype=jnp.float32
        )
        probs = jnp.asarray([[0.9, 0.1], [0.2, 0.8]])
        deltas = jnp.zeros((2, 4))
        out = rpn_proposal(
            probs, deltas, anchors, jnp.asarray([200.0, 200.0]),
            pre_nms_top_n=2, post_nms_top_n=2, min_prob_threshold=0.5,
        )
        assert np.asarray(out["valid"]).sum() == 1

    def test_matches_reference_pipeline(self, rng):
        # Random anchors/scores: result must equal numpy greedy NMS on the
        # top-k filtered set.
        n = 400
        x1 = rng.uniform(0, 200, n)
        y1 = rng.uniform(0, 200, n)
        anchors = np.stack(
            [x1, y1, x1 + rng.uniform(10, 80, n), y1 + rng.uniform(10, 80, n)],
            axis=1,
        ).astype(np.float32)
        fg = rng.uniform(0, 1, n).astype(np.float32)
        probs = np.stack([1 - fg, fg], axis=1)
        deltas = rng.uniform(-0.1, 0.1, (n, 4)).astype(np.float32)

        out = rpn_proposal(
            jnp.asarray(probs), jnp.asarray(deltas), jnp.asarray(anchors),
            jnp.asarray([300.0, 300.0]),
            pre_nms_top_n=200, post_nms_top_n=100, nms_threshold=0.7,
        )
        # Build the reference pipeline in numpy.
        from luminoth_tpu.ops import np_boxes

        decoded = np_boxes.decode(anchors, deltas)
        areas_ok = (
            np.maximum(decoded[:, 2] - decoded[:, 0], 0)
            * np.maximum(decoded[:, 3] - decoded[:, 1], 0)
            > 0
        )
        clipped = decoded.copy()
        clipped[:, 0::2] = np.clip(clipped[:, 0::2], 0, 299)
        clipped[:, 1::2] = np.clip(clipped[:, 1::2], 0, 299)
        order = np.argsort(-np.where(areas_ok, fg, -1))[:200]
        order = order[np.where(areas_ok, fg, -1)[order] > -1]
        keep = np_nms(clipped[order], fg[order], 0.7)[:100]
        expected = clipped[order][keep]

        valid = np.asarray(out["valid"])
        got = np.asarray(out["proposals"])[valid]
        np.testing.assert_allclose(got, expected, atol=1e-3)


class TestRCNNProposal:
    NUM_CLASSES = 3

    def test_background_ignored_and_labels(self):
        proposals = jnp.asarray(
            [[10, 10, 60, 60], [100, 100, 160, 160]], dtype=jnp.float32
        )
        bbox_pred = jnp.zeros((2, 4 * self.NUM_CLASSES))
        cls_prob = jnp.asarray(
            [[0.9, 0.05, 0.03, 0.02],  # background-dominated
             [0.05, 0.05, 0.1, 0.8]]
        )
        out = rcnn_proposal(
            proposals, bbox_pred, cls_prob,
            jnp.ones(2, dtype=bool), jnp.asarray([200.0, 200.0]),
            self.NUM_CLASSES, min_prob_threshold=0.5,
        )
        valid = np.asarray(out["valid"])
        assert valid.sum() == 1
        assert np.asarray(out["labels"])[valid][0] == 2  # class idx 2

    def test_per_class_nms_keeps_distinct_classes(self):
        # Two overlapping boxes of different classes: both survive.
        proposals = jnp.asarray(
            [[10, 10, 60, 60], [12, 12, 62, 62]], dtype=jnp.float32
        )
        bbox_pred = jnp.zeros((2, 4 * self.NUM_CLASSES))
        cls_prob = jnp.asarray(
            [[0.1, 0.8, 0.05, 0.05], [0.1, 0.05, 0.8, 0.05]]
        )
        out = rcnn_proposal(
            proposals, bbox_pred, cls_prob,
            jnp.ones(2, dtype=bool), jnp.asarray([200.0, 200.0]),
            self.NUM_CLASSES, min_prob_threshold=0.5,
        )
        assert np.asarray(out["valid"]).sum() == 2

    def test_same_class_overlap_suppressed(self):
        proposals = jnp.asarray(
            [[10, 10, 60, 60], [12, 12, 62, 62]], dtype=jnp.float32
        )
        bbox_pred = jnp.zeros((2, 4 * self.NUM_CLASSES))
        cls_prob = jnp.asarray(
            [[0.1, 0.8, 0.05, 0.05], [0.1, 0.7, 0.1, 0.1]]
        )
        out = rcnn_proposal(
            proposals, bbox_pred, cls_prob,
            jnp.ones(2, dtype=bool), jnp.asarray([200.0, 200.0]),
            self.NUM_CLASSES, class_nms_threshold=0.5, min_prob_threshold=0.5,
        )
        assert np.asarray(out["valid"]).sum() == 1

    def test_total_max_detections_limit(self, rng):
        n = 50
        x1 = rng.uniform(0, 500, n)
        y1 = rng.uniform(0, 500, n)
        proposals = jnp.asarray(
            np.stack([x1, y1, x1 + 20, y1 + 20], axis=1), dtype=jnp.float32
        )
        bbox_pred = jnp.zeros((n, 4 * self.NUM_CLASSES))
        probs = rng.dirichlet(np.ones(self.NUM_CLASSES + 1), n).astype(
            np.float32
        )
        out = rcnn_proposal(
            proposals, bbox_pred, jnp.asarray(probs),
            jnp.ones(n, dtype=bool), jnp.asarray([600.0, 600.0]),
            self.NUM_CLASSES, total_max_detections=10, min_prob_threshold=0.0,
        )
        assert out["objects"].shape == (10, 4)
        probs_out = np.asarray(out["probs"])
        assert (np.diff(probs_out) <= 1e-6).all()  # sorted desc
