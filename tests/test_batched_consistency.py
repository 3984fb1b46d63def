"""Batched proposal stages must equal per-image application."""

import numpy as np
import jax.numpy as jnp

from luminoth_tpu.models.fasterrcnn.rpn_proposal import rpn_proposal
from luminoth_tpu.models.fasterrcnn.rcnn_proposal import rcnn_proposal
from luminoth_tpu.models.ssd.proposal import ssd_proposal


def test_rpn_proposal_batch_equals_single(rng):
    b, a = 3, 120
    x1 = rng.uniform(0, 200, (b, a)); y1 = rng.uniform(0, 200, (b, a))
    anchors = np.stack(
        [x1[0], y1[0], x1[0] + rng.uniform(10, 60, a),
         y1[0] + rng.uniform(10, 60, a)], axis=1
    ).astype(np.float32)
    fg = rng.uniform(0, 1, (b, a)).astype(np.float32)
    probs = np.stack([1 - fg, fg], axis=-1)
    deltas = rng.uniform(-0.2, 0.2, (b, a, 4)).astype(np.float32)
    im_shape = np.asarray([[250.0, 260.0]] * b, np.float32)

    kwargs = dict(pre_nms_top_n=64, post_nms_top_n=32, nms_threshold=0.7)
    batched = rpn_proposal(
        jnp.asarray(probs), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(im_shape), **kwargs,
    )
    for i in range(b):
        single = rpn_proposal(
            jnp.asarray(probs[i]), jnp.asarray(deltas[i]),
            jnp.asarray(anchors), jnp.asarray(im_shape[i]), **kwargs,
        )
        for key in ("proposals", "scores", "valid"):
            np.testing.assert_allclose(
                np.asarray(batched[key][i]), np.asarray(single[key]),
                atol=1e-5, err_msg=f"{key} image {i}",
            )


def test_rcnn_proposal_batch_equals_single(rng):
    b, p, c = 2, 40, 3
    x1 = rng.uniform(0, 150, (b, p)); y1 = rng.uniform(0, 150, (b, p))
    proposals = np.stack(
        [x1, y1, x1 + rng.uniform(10, 50, (b, p)),
         y1 + rng.uniform(10, 50, (b, p))], axis=-1
    ).astype(np.float32)
    bbox_pred = rng.uniform(-0.2, 0.2, (b, p, 4 * c)).astype(np.float32)
    probs = rng.dirichlet(np.ones(c + 1), (b, p)).astype(np.float32)
    valid = rng.uniform(0, 1, (b, p)) > 0.2
    im_shape = np.asarray([[200.0, 220.0]] * b, np.float32)

    kwargs = dict(class_max_detections=8, class_nms_threshold=0.5,
                  total_max_detections=12, min_prob_threshold=0.1)
    batched = rcnn_proposal(
        jnp.asarray(proposals), jnp.asarray(bbox_pred), jnp.asarray(probs),
        jnp.asarray(valid), jnp.asarray(im_shape), c, **kwargs,
    )
    for i in range(b):
        single = rcnn_proposal(
            jnp.asarray(proposals[i]), jnp.asarray(bbox_pred[i]),
            jnp.asarray(probs[i]), jnp.asarray(valid[i]),
            jnp.asarray(im_shape[i]), c, **kwargs,
        )
        for key in ("objects", "labels", "probs", "valid"):
            np.testing.assert_allclose(
                np.asarray(batched[key][i]), np.asarray(single[key]),
                atol=1e-5, err_msg=f"{key} image {i}",
            )


def test_ssd_proposal_batch_equals_single(rng):
    b, a, c = 2, 60, 2
    x1 = rng.uniform(0, 250, a); y1 = rng.uniform(0, 250, a)
    anchors = np.stack(
        [x1, y1, x1 + rng.uniform(10, 40, a), y1 + rng.uniform(10, 40, a)],
        axis=1,
    ).astype(np.float32)
    probs = rng.dirichlet(np.ones(c + 1), (b, a)).astype(np.float32)
    loc = rng.uniform(-0.2, 0.2, (b, a, 4)).astype(np.float32)
    im_shape = jnp.asarray([300.0, 300.0])

    args = (jnp.asarray(anchors), im_shape, c, 0.45, 6, 10, 0.05,
            (0.1, 0.2), 32)
    batched = ssd_proposal(jnp.asarray(probs), jnp.asarray(loc), *args)
    for i in range(b):
        single = ssd_proposal(jnp.asarray(probs[i]), jnp.asarray(loc[i]), *args)
        for key in ("objects", "labels", "probs", "valid"):
            np.testing.assert_allclose(
                np.asarray(batched[key][i]), np.asarray(single[key]),
                atol=1e-5, err_msg=f"{key} image {i}",
            )
