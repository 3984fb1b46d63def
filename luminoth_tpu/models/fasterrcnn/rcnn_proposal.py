"""Final detection stage: per-class decode + NMS + global top-k, batched.

reference: luminoth/models/fasterrcnn/rcnn_proposal.py:46-164. The per-class
python loop becomes an (image × class) group axis consumed by the grouped
padded NMS (one Pallas sweep on TPU); every boolean_mask becomes a validity
mask; outputs are fixed-size (B, total_max_detections) with a ``valid``
mask. Unbatched inputs are auto-wrapped.
"""

from functools import partial

import jax
import jax.numpy as jnp

from luminoth_tpu.ops.boxes import clip_boxes, decode
from luminoth_tpu.ops.nms import nms_padded_batch


@partial(
    jax.jit,
    static_argnames=(
        "num_classes",
        "class_max_detections",
        "class_nms_threshold",
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
    """Turn RCNN head outputs into final padded detections.

    Args:
        proposals: (B, P, 4) RPN proposals (or (P, 4)).
        bbox_pred: (B, P, 4·C) per-class deltas.
        cls_prob: (B, P, C+1) softmax probabilities (col 0 = background).
        proposals_valid: (B, P) bool.
        im_shape: (B, 2) (height, width).

    Returns:
        dict with ``objects`` (B, T, 4), ``labels`` (B, T), ``probs``
        (B, T), ``valid`` (B, T).
    """
    unbatched = cls_prob.ndim == 2
    if unbatched:
        proposals = proposals[None]
        bbox_pred = bbox_pred[None]
        cls_prob = cls_prob[None]
        proposals_valid = proposals_valid[None]
        im_shape = jnp.asarray(im_shape, jnp.float32).reshape(1, 2)

    props = proposals.astype(jnp.float32)
    im_shape = jnp.asarray(im_shape, dtype=jnp.float32)
    b, p = props.shape[0], props.shape[1]
    c = num_classes

    # (B, P, C, 4) → group axis (B·C, P, 4).
    deltas = bbox_pred.reshape(b, p, c, 4).transpose(0, 2, 1, 3)
    deltas_g = deltas.reshape(b * c, p, 4)
    props_g = jnp.broadcast_to(props[:, None], (b, c, p, 4)).reshape(
        b * c, p, 4
    )
    scores_g = cls_prob[..., 1:].transpose(0, 2, 1).reshape(b * c, p)
    im_shape_g = jnp.repeat(im_shape, c, axis=0)  # (B·C, 2)

    objects = decode(props_g, deltas_g, variances=variances)
    objects = clip_boxes(objects, im_shape_g)
    x1, y1, x2, y2 = jnp.split(objects, 4, axis=-1)
    area_ok = (
        jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0) > 0.0
    )[..., 0]
    valid_g = (
        jnp.broadcast_to(
            proposals_valid[:, None], (b, c, p)
        ).reshape(b * c, p)
        & area_ok
        & (scores_g >= min_prob_threshold)
    )

    capped = bool(pre_nms_max_candidates and pre_nms_max_candidates < p)
    if capped:
        # Optional top-k candidate cap before NMS: shrinks the padded
        # suppression sweep. Score-sorted, so every potential suppressor of
        # a kept box is included.
        masked = jnp.where(valid_g, scores_g, -1.0)
        top_scores, top_idx = jax.lax.top_k(masked, pre_nms_max_candidates)
        objects = jnp.take_along_axis(objects, top_idx[..., None], axis=1)
        scores_g = jnp.take_along_axis(scores_g, top_idx, axis=1)
        valid_g = top_scores > -1.0

    keep_idx, keep_mask = nms_padded_batch(
        objects, scores_g, float(class_nms_threshold), class_max_detections,
        valid=valid_g,
        # top_k output is descending with invalids at the tail: the NMS
        # can skip its own stable sort.
        presorted=capped,
    )
    boxes_k = jnp.take_along_axis(objects, keep_idx[..., None], axis=1)
    scores_k = jnp.take_along_axis(scores_g, keep_idx, axis=1)

    # Flatten classes per image, global top-k by probability.
    m = class_max_detections
    flat_boxes = boxes_k.reshape(b, c * m, 4)
    flat_probs = jnp.where(keep_mask, scores_k, -1.0).reshape(b, c * m)
    labels = jnp.broadcast_to(
        jnp.arange(c)[None, :, None], (b, c, m)
    ).reshape(b, c * m)

    k = min(total_max_detections, c * m)
    top_probs, top_pos = jax.lax.top_k(flat_probs, k)
    result = {
        "objects": jnp.take_along_axis(
            flat_boxes, top_pos[..., None], axis=1
        ),
        "labels": jnp.take_along_axis(labels, top_pos, axis=1),
        "probs": jnp.maximum(top_probs, 0.0),
        "valid": top_probs > -1.0,
    }
    if unbatched:
        result = {k2: v[0] for k2, v in result.items()}
    return result
