"""SSD inference proposal stage: per-class NMS with padded outputs, batched.

reference: luminoth/models/ssd/proposal.py:41-171. The reference loops over
classes in python with dynamic boolean_masks; here classes form an
(image × class) group axis consumed by the grouped padded NMS (one Pallas
sweep on TPU), and every filter is a validity mask:

1. decode anchors once (regression is class-agnostic), clip, area filter;
2. per class: min-prob mask, top-k candidate prefilter, padded NMS;
3. flatten all class survivors and take the global ``total_max_detections``
   top-k by probability.

Outputs are fixed-size with an explicit ``valid`` mask. Unbatched inputs
are auto-wrapped.
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
        "class_nms_threshold",
        "class_max_detections",
        "total_max_detections",
        "min_prob_threshold",
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
        cls_prob: (B, A, C+1) softmax probabilities (col 0 = background).
        loc_pred: (B, A, 4) box offsets.
        all_anchors: (A, 4) anchors.
        im_shape: (height, width) to clip against.
        pre_nms_max_candidates: static per-class candidate cap before NMS.

    Returns:
        dict with ``objects`` (B, T, 4), ``labels`` (B, T), ``probs``
        (B, T), ``valid`` (B, T) for T = total_max_detections.

    At the reference defaults (``min_prob_threshold: 0.5``,
    ``class_max_detections == total_max_detections``,
    ssd/base_config.yml:151-159) a fused per-IMAGE path applies: softmax
    probabilities ≥ 0.5 admit at most one class per anchor, so the
    per-class candidate lists are disjoint and a single class-offset NMS
    per image (boxes shifted by ``class·1e4`` so cross-class pairs never
    overlap) is exactly equivalent to the per-class sweep — with a
    B-group top-k/NMS instead of B·C groups (the r2-measured proposal
    bottleneck: ``lax.top_k`` over (B·C, 8732) at 6.7 ms plus the B·C
    candidate gather). The sole theoretical divergence is two classes
    tied at exactly prob 0.5 on one anchor (sum of softmax outputs
    forces every other class to exactly 0), which cannot occur away
    from a measure-zero float coincidence.
    """
    unbatched = cls_prob.ndim == 2
    if unbatched:
        cls_prob = cls_prob[None]
        loc_pred = loc_pred[None]

    anchors = all_anchors.astype(jnp.float32)
    b, num_anchors = cls_prob.shape[0], anchors.shape[0]
    c = num_classes

    decoded = decode(anchors[None], loc_pred, variances=variances)
    clipped = clip_boxes(decoded, im_shape)  # (B, A, 4)
    x1, y1, x2, y2 = jnp.split(clipped, 4, axis=-1)
    area_valid = (
        jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0) > 0.0
    )[..., 0]  # (B, A)

    fused = (
        float(min_prob_threshold) >= 0.5
        and class_max_detections >= total_max_detections
    )
    if fused:
        fg = cls_prob[..., 1:]  # (B, A, C)
        best_prob = jnp.max(fg, axis=-1)  # (B, A)
        best_class = jnp.argmax(fg, axis=-1).astype(jnp.int32)
        valid_a = (best_prob >= min_prob_threshold) & area_valid
        k = min(pre_nms_max_candidates, num_anchors)
        masked = jnp.where(valid_a, best_prob, -1.0)
        top_scores, top_idx = jax.lax.top_k(masked, k)  # (B, K)
        boxes_c = jnp.take_along_axis(
            clipped, top_idx[..., None], axis=1
        )  # (B, K, 4)
        classes_c = jnp.take_along_axis(best_class, top_idx, axis=1)
        valid_c = top_scores > -1.0
        # Boxes clip to im_shape (≤ a few thousand px); a 1e4 per-class
        # shift keeps classes in disjoint coordinate islands, exactly in
        # f32 for any real class count.
        nms_boxes = boxes_c + (
            classes_c[..., None].astype(jnp.float32) * 1e4
        )
        keep_idx, keep_mask = nms_padded_batch(
            nms_boxes, top_scores, float(class_nms_threshold),
            total_max_detections, valid=valid_c, presorted=True,
        )
        top_probs = jnp.where(
            keep_mask,
            jnp.take_along_axis(top_scores, keep_idx, axis=1),
            -1.0,
        )
        result = {
            "objects": jnp.take_along_axis(
                boxes_c, keep_idx[..., None], axis=1
            ),
            "labels": jnp.take_along_axis(classes_c, keep_idx, axis=1),
            "probs": jnp.maximum(top_probs, 0.0),
            "valid": keep_mask,
        }
        if unbatched:
            result = {k2: v[0] for k2, v in result.items()}
        return result

    scores = cls_prob[..., 1:].transpose(0, 2, 1)  # (B, C, A)
    valid = (
        (scores >= min_prob_threshold) & area_valid[:, None, :]
    )

    k = min(pre_nms_max_candidates, num_anchors)
    masked = jnp.where(valid, scores, -1.0)
    top_scores, top_idx = jax.lax.top_k(masked, k)  # (B, C, K)

    # Gather per-class candidate boxes (regression is class-agnostic).
    boxes_g = jnp.take_along_axis(
        jnp.broadcast_to(
            clipped[:, None], (b, c, num_anchors, 4)
        ).reshape(b * c, num_anchors, 4),
        top_idx.reshape(b * c, k)[..., None],
        axis=1,
    )  # (B·C, K, 4)
    scores_g = top_scores.reshape(b * c, k)
    valid_g = scores_g > -1.0

    keep_idx, keep_mask = nms_padded_batch(
        boxes_g, scores_g, float(class_nms_threshold), class_max_detections,
        valid=valid_g,
        # top_k output is descending with invalids (-1) at the tail: the
        # NMS can skip its own stable sort.
        presorted=True,
    )
    boxes_k = jnp.take_along_axis(boxes_g, keep_idx[..., None], axis=1)
    scores_k = jnp.take_along_axis(scores_g, keep_idx, axis=1)

    m = class_max_detections
    flat_boxes = boxes_k.reshape(b, c * m, 4)
    flat_probs = jnp.where(keep_mask, scores_k, -1.0).reshape(b, c * m)
    labels = jnp.broadcast_to(
        jnp.arange(c)[None, :, None], (b, c, m)
    ).reshape(b, c * m)

    top_probs, top_pos = jax.lax.top_k(
        flat_probs, min(total_max_detections, c * m)
    )
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
