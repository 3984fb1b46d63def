"""Cross-check the NMS stack against tf.image.non_max_suppression.

The reference's proposal stages call ``tf.image.non_max_suppression``
directly (rpn_proposal.py:152, rcnn_proposal.py, ssd/proposal.py), so TF
itself is the executable parity oracle: same greedy sweep, same no-+1
overlap convention (unlike the +1 ``bbox_overlap_tf`` used in target
assignment). Fuzzes both the numpy golden and the jitted static-shape
NMS against it.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from luminoth_tpu.ops.nms import nms_padded  # noqa: E402
from luminoth_tpu.ops.np_boxes import nms as np_nms  # noqa: E402


def _random_boxes(rng, n, spread):
    x1 = rng.uniform(0, spread, n)
    y1 = rng.uniform(0, spread, n)
    w = rng.uniform(2, 40, n)
    h = rng.uniform(2, 40, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def _tf_nms(boxes, scores, thresh):
    # tf expects [y1, x1, y2, x2]; IoU is invariant to the axis swap but
    # pass the proper order anyway.
    yx = boxes[:, [1, 0, 3, 2]]
    return np.sort(
        tf.image.non_max_suppression(
            yx, scores, max_output_size=len(boxes), iou_threshold=thresh
        ).numpy()
    )


def test_numpy_golden_matches_tf():
    rng = np.random.RandomState(0)
    for trial in range(20):
        n = int(rng.randint(5, 60))
        spread = float(rng.choice([30.0, 60.0, 120.0]))
        boxes = _random_boxes(rng, n, spread)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        for thresh in (0.3, 0.5, 0.7):
            ours = np.sort(np_nms(boxes, scores, thresh))
            theirs = _tf_nms(boxes, scores, thresh)
            np.testing.assert_array_equal(ours, theirs)


def test_static_shape_nms_matches_tf():
    rng = np.random.RandomState(1)
    for trial in range(5):
        n = 96
        boxes = _random_boxes(rng, n, 50.0)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        idx, keep = nms_padded(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, max_outputs=n
        )
        ours = np.sort(np.asarray(idx)[np.asarray(keep)])
        theirs = _tf_nms(boxes, scores, 0.5)
        np.testing.assert_array_equal(ours, theirs)


def test_convention_flip_case():
    """A pair whose suppression decision differs between +1 and no-+1
    overlaps: TF (and therefore the reference's NMS) keeps both."""
    boxes = np.array([[0, 0, 10, 4], [4, 0, 14, 4]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    # no-+1 IoU = 24/56 ≈ 0.43 < 0.45; +1 IoU = 35/75 ≈ 0.47 > 0.45.
    assert list(_tf_nms(boxes, scores, 0.45)) == [0, 1]
    assert sorted(np_nms(boxes, scores, 0.45).tolist()) == [0, 1]
    idx, keep = nms_padded(
        jnp.asarray(boxes), jnp.asarray(scores), 0.45, max_outputs=2
    )
    assert sorted(np.asarray(idx)[np.asarray(keep)].tolist()) == [0, 1]
