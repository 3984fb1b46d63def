"""Grouped NMS wrapper vs per-group golden."""

import numpy as np
import jax.numpy as jnp

from luminoth_tpu.ops.nms import nms_padded_batch
from luminoth_tpu.ops.np_boxes import nms as np_nms


def random_boxes(rng, n, spread=100.0):
    x1 = rng.uniform(0, spread, n)
    y1 = rng.uniform(0, spread, n)
    w = rng.uniform(5, 40, n)
    h = rng.uniform(5, 40, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_matches_per_group_golden(rng):
    g, n = 5, 200
    boxes = np.stack([random_boxes(rng, n, spread=80.0) for _ in range(g)])
    scores = rng.uniform(0, 1, (g, n)).astype(np.float32)
    idx, keep = nms_padded_batch(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 50
    )
    for gi in range(g):
        ref = np_nms(boxes[gi], scores[gi], 0.5)[:50]
        got = np.asarray(idx[gi])[np.asarray(keep[gi])]
        np.testing.assert_array_equal(got, ref)


def test_valid_mask_and_padding(rng):
    g, n = 2, 60
    boxes = np.stack([random_boxes(rng, n) for _ in range(g)])
    scores = rng.uniform(0, 1, (g, n)).astype(np.float32)
    valid = np.zeros((g, n), bool)
    valid[:, :20] = True
    idx, keep = nms_padded_batch(
        jnp.asarray(boxes), jnp.asarray(scores), 0.5, 80,
        valid=jnp.asarray(valid),
    )
    assert idx.shape == (2, 80)
    for gi in range(g):
        ref = np_nms(boxes[gi, :20], scores[gi, :20], 0.5)
        got = np.asarray(idx[gi])[np.asarray(keep[gi])]
        np.testing.assert_array_equal(got, ref)
