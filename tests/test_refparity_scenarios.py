"""Reference test scenarios without direct equivalents elsewhere.

Each test reproduces a specific scenario from the reference's test suite
(reference: luminoth/models/fasterrcnn/rcnn_target_test.py,
rpn_target_test.py, rcnn_proposal_test.py) that the existing scenario
files here did not cover one-for-one: odd minibatch sizes, exact batch
size under foreground surplus, label priority when two gt boxes share
their best proposal, the never-zero-foregrounds guarantee, many-GT RPN
labeling, and per-class bbox_pred decoding through the proposal stage.
"""

import jax
import jax.numpy as jnp
import numpy as np

from luminoth_tpu.models.fasterrcnn.rcnn_proposal import rcnn_proposal
from luminoth_tpu.utils.image import apply_data_augmentation, flip_image
from luminoth_tpu.models.fasterrcnn.rcnn_target import rcnn_target_assign
from luminoth_tpu.models.fasterrcnn.rpn_target import rpn_target_assign
from luminoth_tpu.ops.boxes import encode

KEY = jax.random.PRNGKey(0)


def _assign(proposals, gt_rows, **kw):
    proposals = jnp.asarray(proposals, jnp.float32)
    valid = jnp.ones(proposals.shape[0], bool)
    labels, targets = rcnn_target_assign(
        proposals, valid, jnp.asarray(gt_rows, jnp.float32), KEY, **kw
    )
    return np.asarray(labels), np.asarray(targets)


class TestRCNNTargetScenarios:
    # reference: rcnn_target_test.py:228 (testOddMinibatchSize)
    def test_odd_minibatch_size(self):
        labels, _ = _assign(
            [
                (12, 70, 350, 540),     # noise
                (190, 310, 240, 370),   # IoU ~0.48 -> bg
                (197, 300, 252, 389),   # IoU ~0.90 -> fg
                (196, 300, 252, 389),
                (197, 303, 252, 394),
                (180, 310, 235, 370),   # IoU ~0.37 -> bg
                (0, 0, 400, 400),       # noise
                (197, 302, 252, 389),
                (180, 310, 235, 370),
                (180, 310, 235, 370),
                (0, 0, 400, 400),
            ],
            [(200, 300, 250, 390, 3)],
            background_threshold_low=0.1,
            foreground_fraction=0.5,
            minibatch_size=5,
        )
        fg = int((labels >= 1).sum())
        bg = int((labels == 0).sum())
        assert fg <= int(np.floor(0.5 * 5))
        assert fg > 0
        assert bg <= 5 - fg
        assert int((labels >= 0).sum()) == 5

    # reference: rcnn_target_test.py:439 (testCorrectBatchSize)
    def test_correct_batch_size(self):
        labels, _ = _assign(
            [(21, 21, 30, 30)] * 100 + [(11, 11, 19, 19)] * 100,
            [(10, 10, 20, 20, 0)],
            background_threshold_low=0.0,
            foreground_fraction=0.5,
            minibatch_size=64,
        )
        assert int((labels >= 0).sum()) == 64
        assert int((labels >= 1).sum()) == 32

    # reference: rcnn_target_test.py:475 (testLabelPriority). Both
    # proposals best-match the FIRST gt, yet the second gt's best
    # proposal must carry the second label anyway (best-proposal-per-gt
    # override wins over the proposal's own argmax gt).
    def test_label_priority_shared_best_proposal(self):
        first_label, second_label = 0, 1
        labels, _ = _assign(
            [(10, 10, 20, 20), (12, 10, 20, 20)],
            [(10, 10, 20, 20, first_label),
             (10, 10, 30, 30, second_label)],
            background_threshold_low=0.0,
            foreground_fraction=0.5,
            minibatch_size=64,
        )
        assert int((labels == first_label + 1).sum()) == 1
        assert int((labels == second_label + 1).sum()) == 1

    # reference: rcnn_target_test.py:400 (testNonZeroForegrounds): with
    # few gt boxes and proposals there must STILL always be >= 1
    # foreground, via the best-proposal-per-gt override.
    def test_non_zero_foregrounds(self):
        rng = np.random.RandomState(7)
        for _ in range(20):
            h, w = rng.randint(600, 980, 2)
            n_gt = rng.randint(1, 4)
            n_props = rng.randint(4, 8)

            def boxes(n):
                x1 = rng.uniform(0, w - 40, n)
                y1 = rng.uniform(0, h - 40, n)
                return np.stack(
                    [x1, y1,
                     x1 + rng.uniform(10, w - x1.max()),
                     y1 + rng.uniform(10, h - y1.max())], axis=1
                )

            gt = np.concatenate(
                [boxes(n_gt), np.full((n_gt, 1), 3.0)], axis=1
            )
            labels, _ = _assign(boxes(n_props), gt)
            assert int((labels >= 1).sum()) > 0, (gt, labels)


class TestRPNTargetScenarios:
    # reference: rpn_target_test.py:239 (testWithManyGTBoxes): 4 gts,
    # none above the fg IoU threshold, duplicated candidate anchors —
    # exactly one fg per gt via best-anchor-per-gt, backgrounds fill the
    # rest of the minibatch.
    def test_many_gt_boxes(self):
        anchors = jnp.asarray(
            [
                [0, 0, 10, 10], [0, 0, 10, 10],
                [10, 10, 20, 20], [10, 10, 20, 20],
                [20, 20, 30, 30], [20, 20, 30, 30],
                [30, 30, 40, 40], [30, 30, 40, 40],
                [100, 100, 110, 110], [100, 100, 120, 120],
                [110, 110, 120, 120], [110, 110, 130, 130],
                [110, 110, 120, 120], [110, 110, 130, 130],
                [110, 110, 120, 120], [110, 110, 130, 130],
            ],
            jnp.float32,
        )
        gt = jnp.asarray(
            [[2, 2, 8, 8, 0], [12, 12, 18, 18, 0],
             [22, 22, 28, 28, 0], [32, 32, 38, 38, 0]],
            jnp.float32,
        )
        labels, _, _ = rpn_target_assign(
            anchors, gt, (140, 140), KEY,
            minibatch_size=8, foreground_fraction=0.5,
        )
        labels = np.asarray(labels)
        assert int((labels == 1).sum()) == 4
        assert int((labels == 0).sum()) == 4
        # All foregrounds among the first 8 (candidate) anchors.
        assert (np.nonzero(labels == 1)[0] < 8).all()


class TestRCNNProposalBboxPred:
    # reference: rcnn_proposal_test.py:198 (testBboxPred): the deltas of
    # the argmax class — and only that class's 4-column slot — must be
    # the ones decoded into the output box, with results sorted by
    # descending class probability.
    def test_bbox_pred_per_class_decode(self):
        num_classes = 3
        proposals = np.asarray(
            [(200, 315, 400, 370), (56, 0, 106, 4), (15, 15, 20, 20)],
            np.float32,
        )
        class_boxes = np.asarray(
            [(0, 0, 1, 1), (5, 5, 10, 10), (15, 15, 20, 20)], np.float32
        )
        variances = (0.1, 0.2)
        # For every proposal, slot c encodes the offset to class c's box.
        bbox_pred = np.concatenate(
            [
                np.asarray(encode(
                    jnp.asarray(proposals),
                    jnp.tile(jnp.asarray(class_boxes[c][None]), (3, 1)),
                    variances=variances,
                ))
                for c in range(num_classes)
            ],
            axis=1,
        )
        cls_prob = np.asarray(
            [(0.0, 1.0, 0.0, 0.0),
             (0.2, 0.25, 0.3, 0.25),
             (0.45, 0.0, 0.0, 0.55)],
            np.float32,
        )

        out = rcnn_proposal(
            jnp.asarray(proposals), jnp.asarray(bbox_pred),
            jnp.asarray(cls_prob), jnp.ones(3, bool),
            jnp.asarray([500.0, 500.0]), num_classes,
            variances=variances,
        )
        valid = np.asarray(out["valid"])
        assert valid.sum() == 3
        objects = np.asarray(out["objects"])[valid]
        labels = np.asarray(out["labels"])[valid]
        probs = np.asarray(out["probs"])[valid]

        # Sorted by prob: p0 (cls 0, 1.0), p2 (cls 2, 0.55), p1 (cls 1, 0.3).
        np.testing.assert_allclose(probs, [1.0, 0.55, 0.3], atol=1e-6)
        np.testing.assert_array_equal(labels, [0, 2, 1])
        np.testing.assert_allclose(
            objects, class_boxes[[0, 2, 1]], atol=0.05
        )


class TestAugmentationScenarios:
    # reference: datasets/object_detection_dataset_test.py:48
    # (testSortedAugmentation): strategies apply in configured order,
    # each gated by its own prob.
    def _inputs(self):
        rng = np.random.RandomState(0)
        image = rng.randint(0, 255, (60, 80, 3), np.uint8)
        bboxes = np.asarray(
            [[10, 10, 26, 28, 1], [10, 10, 20, 22, 1],
             [10, 11, 20, 21, 1], [19, 30, 31, 33, 1]],
            np.float32,
        )
        return image, bboxes

    def test_sorted_augmentation(self):
        image, bboxes = self._inputs()
        rng = np.random.RandomState(1)
        # prob 0 then prob 1: exactly one flip is applied.
        out_im, out_bb = apply_data_augmentation(
            [{"flip": {"prob": 0}}, {"flip": {"prob": 1}}],
            image, bboxes, rng,
        )
        once = flip_image(image, bboxes=bboxes)
        np.testing.assert_array_equal(out_im, once["image"])
        np.testing.assert_allclose(out_bb, once["bboxes"])
        # prob 1 twice: both apply, in order -> identity (next test).
        out_im2, out_bb2 = apply_data_augmentation(
            [{"flip": {"prob": 1}}, {"flip": {"prob": 1}}],
            image, bboxes, rng,
        )
        np.testing.assert_array_equal(out_im2, image)
        np.testing.assert_allclose(out_bb2, bboxes)

    # reference: datasets/object_detection_dataset_test.py:71
    # (testIdentityAugmentation): flip twice == original.
    def test_flip_twice_is_identity(self):
        image, bboxes = self._inputs()
        first = flip_image(image, bboxes=bboxes)
        second = flip_image(first["image"], bboxes=first["bboxes"])
        np.testing.assert_array_equal(second["image"], image)
        np.testing.assert_allclose(second["bboxes"], bboxes)
