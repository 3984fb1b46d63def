"""RPN proposal stage: decode, filter, top-k, NMS — static shapes.

reference: luminoth/models/fasterrcnn/rpn_proposal.py:41-197. The reference's
boolean_mask filters become validity masks; the variable-length NMS becomes
the padded partitioned NMS kernel. Output is always (post_nms_top_n, 4) with
an explicit ``valid`` mask, score-sorted.
"""

from functools import partial

import jax
import jax.numpy as jnp

from luminoth_tpu.ops.boxes import clip_boxes, decode
from luminoth_tpu.ops.nms import nms_padded


@partial(
    jax.jit,
    static_argnames=(
        "pre_nms_top_n",
        "post_nms_top_n",
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
    """Produce padded, score-sorted object proposals for one image.

    Args:
        rpn_cls_prob: (A, 2) softmax (bg, fg) probabilities.
        rpn_bbox_pred: (A, 4) box deltas.
        all_anchors: (A, 4) anchors.
        im_shape: (height, width) of the (unpadded) image.

    Returns:
        dict with ``proposals`` (P, 4), ``scores`` (P,), ``valid`` (P,) where
        P = post_nms_top_n.
    """
    scores = rpn_cls_prob[:, 1]
    anchors = all_anchors.astype(jnp.float32)
    im_shape = jnp.asarray(im_shape, dtype=jnp.float32)

    valid = jnp.ones(scores.shape, dtype=bool)
    if filter_outside_anchors:
        valid &= (
            (anchors[:, 0] >= 0)
            & (anchors[:, 1] >= 0)
            & (anchors[:, 2] < im_shape[1])
            & (anchors[:, 3] < im_shape[0])
        )

    proposals = decode(anchors, rpn_bbox_pred)

    valid &= scores >= min_prob_threshold
    x1, y1, x2, y2 = jnp.split(proposals, 4, axis=-1)
    valid &= (
        jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0) > 0.0
    )[:, 0]
    if min_size:
        valid &= (
            (x2 - x1 + 1.0 >= min_size) & (y2 - y1 + 1.0 >= min_size)
        )[:, 0]

    if not clip_after_nms:
        proposals = clip_boxes(proposals, im_shape)

    # Top pre_nms_top_n candidates by score among the valid ones.
    k = min(pre_nms_top_n, scores.shape[0])
    masked_scores = jnp.where(valid, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(masked_scores, k)
    top_proposals = proposals[top_idx]
    top_valid = top_scores > -1.0

    if apply_nms:
        keep_idx, keep_mask = nms_padded(
            top_proposals,
            top_scores,
            nms_threshold,
            post_nms_top_n,
            valid=top_valid,
        )
        out_proposals = top_proposals[keep_idx]
        out_scores = jnp.where(keep_mask, top_scores[keep_idx], 0.0)
        out_valid = keep_mask
    else:
        p = min(post_nms_top_n, k)
        out_proposals = top_proposals[:p]
        out_scores = jnp.where(top_valid[:p], top_scores[:p], 0.0)
        out_valid = top_valid[:p]
        if post_nms_top_n > p:
            pad = post_nms_top_n - p
            out_proposals = jnp.pad(out_proposals, ((0, pad), (0, 0)))
            out_scores = jnp.pad(out_scores, (0, pad))
            out_valid = jnp.pad(out_valid, (0, pad))

    if clip_after_nms:
        out_proposals = clip_boxes(out_proposals, im_shape)

    return {
        "proposals": out_proposals,
        "scores": out_scores,
        "valid": out_valid,
    }
