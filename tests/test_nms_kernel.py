"""Pallas NMS kernel (interpret mode) vs numpy greedy golden."""

import numpy as np
import jax.numpy as jnp

from luminoth_tpu.ops.pallas.nms_kernel import nms_alive_pallas
from luminoth_tpu.ops.np_boxes import nms as np_nms


def random_boxes(rng, n, spread=100.0):
    x1 = rng.uniform(0, spread, n)
    y1 = rng.uniform(0, spread, n)
    w = rng.uniform(5, 40, n)
    h = rng.uniform(5, 40, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def run_kernel(boxes_sorted, valid, thresh, tile):
    g_boxes = jnp.asarray(boxes_sorted)[None].transpose(0, 2, 1)  # (1,4,N)
    g_valid = jnp.asarray(valid, jnp.float32)[None]
    alive = nms_alive_pallas(
        g_boxes, g_valid, thresh, tile=tile, interpret=True
    )
    return np.asarray(alive[0]) > 0.5


class TestNMSKernel:
    def test_matches_numpy_multi_tile(self, rng):
        n, tile = 256, 64
        boxes = random_boxes(rng, n, spread=60.0)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        order = np.argsort(-scores)
        boxes_s = boxes[order]
        for thresh in (0.3, 0.5, 0.7):
            alive = run_kernel(boxes_s, np.ones(n), thresh, tile)
            kept_sorted_pos = np.nonzero(alive)[0]
            ref = np_nms(boxes, scores, thresh)
            ref_sorted_pos = np.searchsorted(
                -scores[order], -scores[ref]
            )
            # Compare via original indices.
            got_original = order[kept_sorted_pos]
            np.testing.assert_array_equal(
                np.sort(got_original), np.sort(ref)
            )

    def test_validity_mask(self, rng):
        n, tile = 128, 64
        boxes = random_boxes(rng, n)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        order = np.argsort(-scores)
        valid = np.zeros(n)
        valid[:40] = 1.0  # only the top-40 sorted rows are real
        alive = run_kernel(boxes[order], valid, 0.5, tile)
        assert not alive[40:].any()
        ref = np_nms(boxes[order][:40], scores[order][:40], 0.5)
        np.testing.assert_array_equal(np.sort(np.nonzero(alive)[0]),
                                      np.sort(ref))

    def test_groups_independent(self, rng):
        n, tile = 128, 64
        b0 = random_boxes(rng, n, spread=50.0)
        b1 = random_boxes(rng, n, spread=50.0)
        s0 = rng.uniform(0, 1, n).astype(np.float32)
        s1 = rng.uniform(0, 1, n).astype(np.float32)
        o0, o1 = np.argsort(-s0), np.argsort(-s1)
        g_boxes = jnp.asarray(
            np.stack([b0[o0], b1[o1]])
        ).transpose(0, 2, 1)
        g_valid = jnp.ones((2, n), jnp.float32)
        alive = np.asarray(
            nms_alive_pallas(g_boxes, g_valid, 0.5, tile=tile,
                             interpret=True)
        ) > 0.5
        for boxes, scores, order, row in ((b0, s0, o0, 0), (b1, s1, o1, 1)):
            ref = np_nms(boxes, scores, 0.5)
            got = order[np.nonzero(alive[row])[0]]
            np.testing.assert_array_equal(np.sort(got), np.sort(ref))

    def test_many_groups(self, rng):
        """An odd group count over the (groups, tiles) grid."""
        g, n, tile = 5, 128, 64
        all_boxes, all_scores, orders = [], [], []
        for _ in range(g):
            b = random_boxes(rng, n, spread=50.0)
            s = rng.uniform(0, 1, n).astype(np.float32)
            o = np.argsort(-s)
            all_boxes.append(b)
            all_scores.append(s)
            orders.append(o)
        g_boxes = jnp.asarray(
            np.stack([b[o] for b, o in zip(all_boxes, orders)])
        ).transpose(0, 2, 1)
        g_valid = jnp.ones((g, n), jnp.float32)
        alive = np.asarray(
            nms_alive_pallas(g_boxes, g_valid, 0.5, tile=tile,
                             interpret=True)
        ) > 0.5
        assert alive.shape == (g, n)
        for row in range(g):
            ref = np_nms(all_boxes[row], all_scores[row], 0.5)
            got = orders[row][np.nonzero(alive[row])[0]]
            np.testing.assert_array_equal(np.sort(got), np.sort(ref))

    def test_early_exit_preserves_top_k(self, rng):
        """max_survivors > 0 may leave alive bits past the exit point
        unspecified, but the top-``max_survivors`` alive entries (all a
        consumer reads) must exactly match the full sweep's — across
        sparse and dense scenes, multiple k values, and k landing inside
        any tile."""
        n, tile = 256, 64
        for spread, k in ((30.0, 8), (30.0, 40), (60.0, 16),
                          (200.0, 16), (60.0, 100)):
            boxes = random_boxes(rng, n, spread=spread)
            scores = rng.uniform(0, 1, n).astype(np.float32)
            order = np.argsort(-scores)
            boxes_s = boxes[order]
            full = run_kernel(boxes_s, np.ones(n), 0.5, tile)
            g_boxes = jnp.asarray(boxes_s)[None].transpose(0, 2, 1)
            early = np.asarray(nms_alive_pallas(
                g_boxes, jnp.ones((1, n), jnp.float32), 0.5, tile=tile,
                max_survivors=k, interpret=True,
            )[0]) > 0.5
            # Top-k alive positions agree (positions are score-sorted, so
            # "first k alive" == "k highest-scored alive").
            np.testing.assert_array_equal(
                np.nonzero(full)[0][:k], np.nonzero(early)[0][:k]
            )

    def test_early_exit_inert_when_k_exceeds_survivors(self, rng):
        """Fewer total survivors than max_survivors: the exit never
        triggers and the mask is bit-identical to the full sweep."""
        n, tile = 128, 64
        boxes = random_boxes(rng, n, spread=40.0)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        order = np.argsort(-scores)
        full = run_kernel(boxes[order], np.ones(n), 0.5, tile)
        g_boxes = jnp.asarray(boxes[order])[None].transpose(0, 2, 1)
        early = np.asarray(nms_alive_pallas(
            g_boxes, jnp.ones((1, n), jnp.float32), 0.5, tile=tile,
            max_survivors=int(full.sum()) + 5, interpret=True,
        )[0]) > 0.5
        np.testing.assert_array_equal(full, early)
