"""Final detection stage: per-class decode + NMS + global top-k.

reference: luminoth/models/fasterrcnn/rcnn_proposal.py:46-164. The per-class
python loop becomes a vmap over the class axis; every boolean_mask becomes a
validity mask; outputs are fixed-size (total_max_detections) with a ``valid``
mask.
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
def rcnn_proposal(
    proposals,
    bbox_pred,
    cls_prob,
    proposals_valid,
    im_shape,
    num_classes,
    class_max_detections=100,
    class_nms_threshold=0.5,
    total_max_detections=300,
    min_prob_threshold=0.0,
    variances=(0.1, 0.2),
    pre_nms_max_candidates=0,
):
    """Turn RCNN head outputs into final padded detections for one image.

    Args:
        proposals: (P, 4) RPN proposals.
        bbox_pred: (P, 4·C) per-class deltas.
        cls_prob: (P, C+1) softmax probabilities (col 0 = background).
        proposals_valid: (P,) bool.
        im_shape: (height, width).

    Returns:
        dict with ``objects`` (T, 4), ``labels`` (T,), ``probs`` (T,),
        ``valid`` (T,).
    """
    props = proposals.astype(jnp.float32)
    im_shape = jnp.asarray(im_shape, dtype=jnp.float32)

    deltas = bbox_pred.reshape(-1, num_classes, 4)  # (P, C, 4)
    deltas_c = jnp.swapaxes(deltas, 0, 1)  # (C, P, 4)
    probs_c = jnp.swapaxes(cls_prob[:, 1:], 0, 1)  # (C, P)

    def per_class(class_deltas, class_prob):
        objects = decode(props, class_deltas, variances=variances)
        objects = clip_boxes(objects, im_shape)
        x1, y1, x2, y2 = jnp.split(objects, 4, axis=-1)
        area_ok = (
            jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0) > 0.0
        )[:, 0]
        valid = (
            proposals_valid & area_ok & (class_prob >= min_prob_threshold)
        )
        if pre_nms_max_candidates and pre_nms_max_candidates < objects.shape[0]:
            # Optional top-k candidate cap before NMS: shrinks the padded
            # suppression sweep. Score-sorted, so every potential suppressor
            # of a kept box is included; outputs differ from the exact sweep
            # only if the kept set would reach past the cap.
            masked = jnp.where(valid, class_prob, -1.0)
            top_scores, top_idx = jax.lax.top_k(
                masked, pre_nms_max_candidates
            )
            objects = objects[top_idx]
            class_prob = class_prob[top_idx]
            valid = top_scores > -1.0
        keep_idx, keep_mask = nms_padded(
            objects, class_prob, class_nms_threshold, class_max_detections,
            valid=valid,
        )
        return objects[keep_idx], class_prob[keep_idx], keep_mask

    boxes_c, scores_c, keep_c = jax.vmap(per_class)(deltas_c, probs_c)
    labels_c = jnp.broadcast_to(
        jnp.arange(num_classes)[:, None], keep_c.shape
    )

    flat_boxes = boxes_c.reshape(-1, 4)
    flat_probs = jnp.where(keep_c, scores_c, -1.0).reshape(-1)
    flat_labels = labels_c.reshape(-1)

    k = min(total_max_detections, flat_probs.shape[0])
    top_probs, top_pos = jax.lax.top_k(flat_probs, k)
    return {
        "objects": flat_boxes[top_pos],
        "labels": flat_labels[top_pos],
        "probs": jnp.maximum(top_probs, 0.0),
        "valid": top_probs > -1.0,
    }
