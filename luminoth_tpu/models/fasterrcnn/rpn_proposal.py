"""RPN proposal stage: decode, filter, top-k, NMS — static shapes, batched.

reference: luminoth/models/fasterrcnn/rpn_proposal.py:41-197. The reference's
boolean_mask filters become validity masks; the variable-length NMS becomes
the padded grouped NMS (one Pallas sweep for the whole batch on TPU).
Output is always (B, post_nms_top_n, 4) with an explicit ``valid`` mask,
score-sorted. Unbatched (A, ...) inputs are auto-wrapped.
"""

from functools import partial

import jax
import jax.numpy as jnp

from luminoth_tpu.ops.boxes import clip_boxes, decode
from luminoth_tpu.ops.nms import nms_padded_batch


@partial(
    jax.jit,
    static_argnames=(
        "pre_nms_top_n",
        "post_nms_top_n",
        "nms_threshold",
        "apply_nms",
        "clip_after_nms",
        "filter_outside_anchors",
        "min_size",
    ),
)
def rpn_proposal(
    rpn_cls_prob,
    rpn_bbox_pred,
    all_anchors,
    im_shape,
    pre_nms_top_n=12000,
    post_nms_top_n=2000,
    nms_threshold=0.7,
    min_size=0,
    apply_nms=True,
    clip_after_nms=False,
    filter_outside_anchors=False,
    min_prob_threshold=0.0,
):
    """Produce padded, score-sorted object proposals.

    Args:
        rpn_cls_prob: (B, A, 2) softmax (bg, fg) probabilities (or (A, 2)).
        rpn_bbox_pred: (B, A, 4) box deltas.
        all_anchors: (A, 4) anchors (shared across the batch).
        im_shape: (B, 2) actual (height, width) per image.

    Returns:
        dict with ``proposals`` (B, P, 4), ``scores`` (B, P), ``valid``
        (B, P) where P = post_nms_top_n.
    """
    unbatched = rpn_cls_prob.ndim == 2
    if unbatched:
        rpn_cls_prob = rpn_cls_prob[None]
        rpn_bbox_pred = rpn_bbox_pred[None]
        im_shape = jnp.asarray(im_shape, jnp.float32).reshape(1, 2)

    scores = rpn_cls_prob[..., 1]  # (B, A)
    anchors = all_anchors.astype(jnp.float32)
    im_shape = jnp.asarray(im_shape, dtype=jnp.float32)
    b = scores.shape[0]

    valid = jnp.ones(scores.shape, dtype=bool)
    if filter_outside_anchors:
        heights = im_shape[:, 0:1]
        widths = im_shape[:, 1:2]
        valid &= (
            (anchors[None, :, 0] >= 0)
            & (anchors[None, :, 1] >= 0)
            & (anchors[None, :, 2] < widths)
            & (anchors[None, :, 3] < heights)
        )

    proposals = decode(anchors[None], rpn_bbox_pred)  # (B, A, 4)

    valid &= scores >= min_prob_threshold
    x1, y1, x2, y2 = jnp.split(proposals, 4, axis=-1)
    valid &= (
        jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0) > 0.0
    )[..., 0]
    if min_size:
        valid &= (
            (x2 - x1 + 1.0 >= min_size) & (y2 - y1 + 1.0 >= min_size)
        )[..., 0]

    if not clip_after_nms:
        proposals = clip_boxes(proposals, im_shape)

    # Top pre_nms_top_n candidates by score among the valid ones.
    k = min(pre_nms_top_n, scores.shape[1])
    masked_scores = jnp.where(valid, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(masked_scores, k)  # (B, K)
    top_proposals = jnp.take_along_axis(
        proposals, top_idx[..., None], axis=1
    )
    top_valid = top_scores > -1.0

    if apply_nms:
        keep_idx, keep_mask = nms_padded_batch(
            top_proposals,
            top_scores,
            float(nms_threshold),
            post_nms_top_n,
            valid=top_valid,
            # top_k output is descending with invalids (-1) at the tail:
            # the NMS can skip its own stable sort.
            presorted=True,
        )
        out_proposals = jnp.take_along_axis(
            top_proposals, keep_idx[..., None], axis=1
        )
        out_scores = jnp.where(
            keep_mask, jnp.take_along_axis(top_scores, keep_idx, axis=1), 0.0
        )
        out_valid = keep_mask
    else:
        p = min(post_nms_top_n, k)
        out_proposals = top_proposals[:, :p]
        out_scores = jnp.where(top_valid[:, :p], top_scores[:, :p], 0.0)
        out_valid = top_valid[:, :p]
        if post_nms_top_n > p:
            extra = post_nms_top_n - p
            out_proposals = jnp.pad(
                out_proposals, ((0, 0), (0, extra), (0, 0))
            )
            out_scores = jnp.pad(out_scores, ((0, 0), (0, extra)))
            out_valid = jnp.pad(out_valid, ((0, 0), (0, extra)))

    if clip_after_nms:
        out_proposals = clip_boxes(out_proposals, im_shape)

    result = {
        "proposals": out_proposals,
        "scores": out_scores,
        "valid": out_valid,
    }
    if unbatched:
        result = {k2: v[0] for k2, v in result.items()}
    return result
