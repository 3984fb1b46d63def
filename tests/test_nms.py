"""NMS kernel tests: exact greedy equivalence against a numpy golden impl."""

import numpy as np
import jax.numpy as jnp

from luminoth_tpu.ops.nms import nms_padded, nms_per_class
from luminoth_tpu.ops.np_boxes import nms as np_nms


def random_boxes(rng, n, spread=100.0):
    x1 = rng.uniform(0, spread, n)
    y1 = rng.uniform(0, spread, n)
    w = rng.uniform(5, 40, n)
    h = rng.uniform(5, 40, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


class TestNMSPadded:
    def test_simple_suppression(self):
        boxes = np.array(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=np.float32
        )
        scores = np.array([0.9, 0.8, 0.7], dtype=np.float32)
        idx, keep = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 3)
        kept = np.asarray(idx)[np.asarray(keep)]
        np.testing.assert_array_equal(kept, [0, 2])

    def test_matches_numpy_greedy(self, rng):
        for n in (1, 7, 50, 300):
            boxes = random_boxes(rng, n, spread=60.0)
            scores = rng.uniform(0, 1, n).astype(np.float32)
            for thresh in (0.3, 0.5, 0.7):
                ref = np_nms(boxes, scores, thresh)
                idx, keep = nms_padded(
                    jnp.asarray(boxes), jnp.asarray(scores), thresh, n
                )
                got = np.asarray(idx)[np.asarray(keep)]
                np.testing.assert_array_equal(got, ref)

    def test_blocked_path_matches(self, rng):
        # n > block_size exercises the cross-tile suppression path.
        n = 600
        boxes = random_boxes(rng, n, spread=120.0)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        ref = np_nms(boxes, scores, 0.5)
        idx, keep = nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, n, block_size=128
        )
        got = np.asarray(idx)[np.asarray(keep)]
        np.testing.assert_array_equal(got, ref)

    def test_max_outputs_truncates(self, rng):
        n = 100
        boxes = random_boxes(rng, n, spread=500.0)  # mostly disjoint
        scores = rng.uniform(0, 1, n).astype(np.float32)
        ref = np_nms(boxes, scores, 0.5)[:10]
        idx, keep = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 10)
        assert np.asarray(keep).sum() == 10
        np.testing.assert_array_equal(np.asarray(idx), ref)

    def test_valid_mask(self, rng):
        boxes = random_boxes(rng, 20)
        scores = rng.uniform(0, 1, 20).astype(np.float32)
        valid = np.zeros(20, dtype=bool)
        valid[:5] = True
        ref = np_nms(boxes[:5], scores[:5], 0.5)
        idx, keep = nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20, valid=jnp.asarray(valid)
        )
        got = np.asarray(idx)[np.asarray(keep)]
        np.testing.assert_array_equal(got, ref)

    def test_max_outputs_larger_than_n(self, rng):
        boxes = random_boxes(rng, 4, spread=500.0)
        scores = np.array([0.5, 0.6, 0.7, 0.8], dtype=np.float32)
        idx, keep = nms_padded(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 8)
        assert idx.shape == (8,)
        assert np.asarray(keep).sum() <= 4


class TestNMSPerClass:
    def test_vmapped_classes(self, rng):
        c, n = 4, 80
        boxes = np.stack([random_boxes(rng, n) for _ in range(c)])
        scores = rng.uniform(0, 1, (c, n)).astype(np.float32)
        idx, keep = nms_per_class(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 20)
        assert idx.shape == (c, 20)
        for ci in range(c):
            ref = np_nms(boxes[ci], scores[ci], 0.5)[:20]
            got = np.asarray(idx[ci])[np.asarray(keep[ci])]
            np.testing.assert_array_equal(got, ref)


def test_empty_candidate_set():
    """Zero candidates (e.g. a top-n clamped to 0) must yield all-masked
    outputs, not a ZeroDivisionError in the tile-size computation."""
    idx, keep = nms_padded(
        jnp.zeros((0, 4)), jnp.zeros((0,)), 0.5, max_outputs=5
    )
    assert idx.shape == (5,) and keep.shape == (5,)
    assert not bool(np.asarray(keep).any())
