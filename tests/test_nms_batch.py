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


def test_presorted_matches_unsorted_path():
    """presorted=True on top_k-ordered input == the argsort path."""
    import jax
    import jax.numpy as jnp

    from luminoth_tpu.ops.nms import nms_padded_batch

    rng = np.random.RandomState(7)
    g, n = 5, 64
    boxes = np.zeros((g, n, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, 100, (g, n))
    boxes[..., 1] = rng.uniform(0, 100, (g, n))
    boxes[..., 2] = boxes[..., 0] + rng.uniform(5, 30, (g, n))
    boxes[..., 3] = boxes[..., 1] + rng.uniform(5, 30, (g, n))
    scores = rng.uniform(0, 1, (g, n)).astype(np.float32)
    valid = rng.rand(g, n) > 0.2

    # Emulate the proposal stages' candidate cap: top_k by masked score.
    masked = np.where(valid, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(jnp.asarray(masked), n)
    boxes_s = jnp.take_along_axis(jnp.asarray(boxes), top_idx[..., None], 1)
    scores_s = jnp.take_along_axis(jnp.asarray(scores), top_idx, 1)
    valid_s = top_scores > -1.0

    idx_ref, mask_ref = nms_padded_batch(boxes_s, scores_s, 0.5, 16,
                                         valid=valid_s)
    idx_pre, mask_pre = nms_padded_batch(boxes_s, scores_s, 0.5, 16,
                                         valid=valid_s, presorted=True)
    np.testing.assert_array_equal(np.asarray(mask_ref), np.asarray(mask_pre))
    m = np.asarray(mask_ref)
    np.testing.assert_array_equal(np.asarray(idx_ref)[m],
                                  np.asarray(idx_pre)[m])
