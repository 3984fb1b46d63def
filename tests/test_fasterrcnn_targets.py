"""RPN/RCNN target assignment tests (scenario coverage mirrors
rpn_target_test.py / rcnn_target_test.py in the reference)."""

import jax
import jax.numpy as jnp
import numpy as np

from luminoth_tpu.models.fasterrcnn.rpn_target import rpn_target_assign
from luminoth_tpu.models.fasterrcnn.rcnn_target import (
    rcnn_target_assign,
    select_minibatch,
)

KEY = jax.random.PRNGKey(0)


def gt(rows):
    return jnp.asarray(rows, dtype=jnp.float32)


class TestRPNTarget:
    IM_SHAPE = (100, 100)

    def test_perfect_match_is_fg(self):
        anchors = jnp.asarray([[20, 20, 60, 60]], dtype=jnp.float32)
        labels, targets, overlaps = rpn_target_assign(
            anchors, gt([[20, 20, 60, 60, 0]]), self.IM_SHAPE, KEY
        )
        assert labels[0] == 1.0
        np.testing.assert_allclose(np.asarray(targets[0]), 0.0, atol=1e-5)
        np.testing.assert_allclose(float(overlaps[0]), 1.0)

    def test_outside_anchor_ignored(self):
        anchors = jnp.asarray(
            [[-10, -10, 30, 30], [20, 20, 60, 60]], dtype=jnp.float32
        )
        labels, _, _ = rpn_target_assign(
            anchors, gt([[20, 20, 60, 60, 0]]), self.IM_SHAPE, KEY
        )
        assert labels[0] == -1.0  # partially outside → ignore
        assert labels[1] == 1.0

    def test_best_anchor_per_gt_fg_despite_low_iou(self):
        # No anchor reaches 0.7 IoU; the best one must still be fg.
        anchors = jnp.asarray(
            [[0, 0, 20, 20], [40, 40, 90, 90]], dtype=jnp.float32
        )
        labels, _, _ = rpn_target_assign(
            anchors, gt([[50, 50, 70, 70, 0]]), self.IM_SHAPE, KEY
        )
        assert labels[1] == 1.0

    def test_background_below_threshold(self):
        anchors = jnp.asarray(
            [[0, 0, 10, 10], [50, 50, 70, 70]], dtype=jnp.float32
        )
        labels, _, _ = rpn_target_assign(
            anchors, gt([[50, 50, 70, 70, 0]]), self.IM_SHAPE, KEY
        )
        assert labels[0] == 0.0  # IoU 0 < 0.3 → bg
        assert labels[1] == 1.0

    def test_minibatch_subsampling(self):
        # 600 identical fg anchors: only foreground_fraction*minibatch kept.
        n = 600
        anchors = jnp.tile(jnp.asarray([[20.0, 20, 60, 60]]), (n, 1))
        labels, _, _ = rpn_target_assign(
            anchors,
            gt([[20, 20, 60, 60, 0]]),
            self.IM_SHAPE,
            KEY,
            minibatch_size=256,
            foreground_fraction=0.5,
        )
        assert int(jnp.sum(labels == 1.0)) == 128
        assert int(jnp.sum(labels == 0.0)) == 0

    def test_bg_subsampling_count(self):
        # Many backgrounds: bg count = minibatch - num_fg.
        rng = np.random.RandomState(0)
        x1 = rng.uniform(0, 50, 500)
        y1 = rng.uniform(0, 50, 500)
        anchors_np = np.stack([x1, y1, x1 + 10, y1 + 10], axis=1)
        anchors = jnp.asarray(
            np.concatenate([anchors_np, [[20, 20, 60, 60]]]), dtype=jnp.float32
        )
        labels, _, _ = rpn_target_assign(
            anchors, gt([[20, 20, 60, 60, 0]]), self.IM_SHAPE, KEY
        )
        n_fg = int(jnp.sum(labels == 1.0))
        n_bg = int(jnp.sum(labels == 0.0))
        assert n_fg >= 1
        assert n_fg + n_bg <= 256

    def test_padded_gt(self):
        anchors = jnp.asarray([[20, 20, 60, 60]], dtype=jnp.float32)
        labels, _, _ = rpn_target_assign(
            anchors,
            gt([[20, 20, 60, 60, 0], [0, 0, 0, 0, -1]]),
            self.IM_SHAPE,
            KEY,
        )
        assert labels[0] == 1.0


class TestRCNNTarget:
    def _assign(self, proposals, gts, valid=None, **kw):
        proposals = jnp.asarray(proposals, dtype=jnp.float32)
        if valid is None:
            valid = jnp.ones(proposals.shape[0], dtype=bool)
        return rcnn_target_assign(proposals, valid, gts, KEY, **kw)

    def test_empty_case_best_proposal_wins(self):
        # No proposal reaches fg threshold; the best one is still labeled.
        proposals = [[10, 10, 30, 30], [60, 60, 90, 90]]
        labels, _ = self._assign(proposals, gt([[58, 58, 95, 95, 2]]))
        assert labels[1] == 3.0  # class 2 → label 3

    def test_fg_by_iou(self):
        proposals = [[20, 20, 60, 60]]
        labels, targets = self._assign(proposals, gt([[22, 22, 58, 58, 4]]))
        assert labels[0] == 5.0
        assert not np.allclose(np.asarray(targets[0]), 0.0)

    def test_bg_band(self):
        # IoU below 0.5 but above 0 → background (band [0, 0.5)), provided
        # another proposal is the best for the gt.
        proposals = [[0, 0, 40, 40], [29, 29, 71, 71], [200, 200, 250, 250]]
        labels, _ = self._assign(
            proposals, gt([[30, 30, 70, 70, 1]]),
        )
        assert labels[1] == 2.0  # best proposal
        assert labels[0] == 0.0  # low IoU → bg band

    def test_invalid_proposals_ignored(self):
        proposals = [[20, 20, 60, 60], [20, 20, 60, 60]]
        valid = jnp.asarray([True, False])
        labels, _ = self._assign(
            proposals, gt([[20, 20, 60, 60, 1]]), valid=valid
        )
        assert labels[0] == 2.0
        assert labels[1] <= 0.0  # never fg

    def test_all_proposals_invalid_no_fg(self):
        # Zero valid proposals (possible very early in training): the
        # best-proposal-per-gt override must not promote a padding row.
        proposals = [[20, 20, 60, 60], [10, 10, 50, 50]]
        valid = jnp.asarray([False, False])
        labels, targets = self._assign(
            proposals, gt([[20, 20, 60, 60, 1]]), valid=valid
        )
        assert int(jnp.sum(labels >= 0)) == 0  # nothing selected
        assert np.allclose(np.asarray(targets), 0.0)

    def test_minibatch_size_honored(self):
        rng = np.random.RandomState(1)
        n = 500
        x1 = rng.uniform(0, 80, n)
        y1 = rng.uniform(0, 80, n)
        proposals = np.stack([x1, y1, x1 + 30, y1 + 30], axis=1)
        labels, _ = self._assign(
            proposals,
            gt([[40, 40, 70, 70, 0]]),
            minibatch_size=64,
            foreground_fraction=0.25,
        )
        n_fg = int(jnp.sum(labels > 0))
        n_sel = int(jnp.sum(labels >= 0))
        assert n_fg <= 16
        assert n_sel <= 64

    def test_select_minibatch(self):
        labels = jnp.asarray([-1.0, 2.0, 0.0, -1.0, 1.0])
        idx, mask = select_minibatch(labels, 4)
        selected = set(np.asarray(idx)[np.asarray(mask)].tolist())
        assert selected == {1, 2, 4}
