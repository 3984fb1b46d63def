"""SSD inference proposal stage: per-class NMS with padded outputs.

reference: luminoth/models/ssd/proposal.py:41-171. The reference loops over
classes in python with dynamic boolean_masks; here the class loop is a
``vmap`` over a (C, ...) axis and every filter is a validity mask:

1. decode anchors once (regression is class-agnostic), clip, area filter;
2. per class: min-prob mask, top-k candidate prefilter, padded NMS;
3. flatten all class survivors and take the global ``total_max_detections``
   top-k by probability.

Outputs are fixed-size with an explicit ``valid`` mask.
"""

from functools import partial

import jax
import jax.numpy as jnp

from luminoth_tpu.ops.boxes import clip_boxes, decode
from luminoth_tpu.ops.nms import nms_padded


@partial(
    jax.jit,
    static_argnames=(
        "num_classes",
        "class_max_detections",
        "total_max_detections",
        "pre_nms_max_candidates",
    ),
)
def ssd_proposal(
    cls_prob,
    loc_pred,
    all_anchors,
    im_shape,
    num_classes,
    class_nms_threshold,
    class_max_detections,
    total_max_detections,
    min_prob_threshold,
    variances,
    pre_nms_max_candidates=1000,
):
    """Turn raw SSD outputs into final padded detections.

    Args:
        cls_prob: (A, C+1) softmax probabilities (col 0 = background).
        loc_pred: (A, 4) box offsets.
        all_anchors: (A, 4) anchors.
        im_shape: (height, width) to clip against.
        pre_nms_max_candidates: static per-class candidate cap before NMS.

    Returns:
        dict with ``objects`` (T, 4), ``labels`` (T,), ``probs`` (T,),
        ``valid`` (T,) for T = total_max_detections.
    """
    anchors = all_anchors.astype(jnp.float32)
    num_anchors = anchors.shape[0]

    decoded = decode(anchors, loc_pred, variances=variances)
    clipped = clip_boxes(decoded, im_shape)
    x1, y1, x2, y2 = jnp.split(clipped, 4, axis=-1)
    area_valid = (
        jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0) > 0.0
    )[:, 0]

    k = min(pre_nms_max_candidates, num_anchors)

    def per_class(class_scores):
        valid = (class_scores >= min_prob_threshold) & area_valid
        masked = jnp.where(valid, class_scores, -1.0)
        top_scores, top_idx = jax.lax.top_k(masked, k)
        cand_boxes = clipped[top_idx]
        cand_valid = top_scores > -1.0
        keep_idx, keep_mask = nms_padded(
            cand_boxes,
            top_scores,
            class_nms_threshold,
            class_max_detections,
            valid=cand_valid,
        )
        return cand_boxes[keep_idx], top_scores[keep_idx], keep_mask

    class_scores = jnp.swapaxes(cls_prob[:, 1:], 0, 1)  # (C, A)
    boxes_c, probs_c, keep_c = jax.vmap(per_class)(class_scores)

    labels_c = jnp.broadcast_to(
        jnp.arange(num_classes)[:, None], keep_c.shape
    )

    flat_boxes = boxes_c.reshape(-1, 4)
    flat_probs = jnp.where(keep_c, probs_c, -1.0).reshape(-1)
    flat_labels = labels_c.reshape(-1)

    top_probs, top_pos = jax.lax.top_k(
        flat_probs, min(total_max_detections, flat_probs.shape[0])
    )
    return {
        "objects": flat_boxes[top_pos],
        "labels": flat_labels[top_pos],
        "probs": jnp.maximum(top_probs, 0.0),
        "valid": top_probs > -1.0,
    }
