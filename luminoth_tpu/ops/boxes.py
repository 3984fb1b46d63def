"""Bounding-box geometry in pure ``jax.numpy``.

Boxes use the ``(x1, y1, x2, y2)`` corner convention with the reference's
"+1 pixel" width semantics: ``width = x2 - x1 + 1``. The decode path subtracts
``1.`` from the predicted max corner. These conventions must be preserved for
metric parity with reference checkpoints
(reference: luminoth/utils/bbox_transform_tf.py:4-126, +1 widths at :8-9 and
decode ``-1.`` at :60-61; IoU at luminoth/utils/bbox_overlap.py:7-48).

All functions broadcast over leading dimensions: boxes are ``(..., N, 4)``.
Everything here is jit-/vmap-friendly: no data-dependent shapes.
"""

import jax.numpy as jnp


def split_corners(boxes):
    """Split a (..., 4) box array into x1, y1, x2, y2 of shape (..., 1)."""
    x1, y1, x2, y2 = jnp.split(boxes.astype(jnp.float32), 4, axis=-1)
    return x1, y1, x2, y2


def get_width_upright(boxes):
    """Width, height and center ("upright") point with +1 pixel convention."""
    x1, y1, x2, y2 = split_corners(boxes)
    width = x2 - x1 + 1.0
    height = y2 - y1 + 1.0
    urx = x1 + 0.5 * width
    ury = y1 + 0.5 * height
    return width, height, urx, ury


def encode(boxes, gt_boxes, variances=None):
    """Encode ``gt_boxes`` as center/size deltas relative to ``boxes``.

    Args:
        boxes: (..., N, 4) reference boxes (anchors / proposals).
        gt_boxes: (..., N, 4) target boxes, row-aligned with ``boxes``.
        variances: optional (center, size) scaling pair.

    Returns:
        (..., N, 4) deltas ``(dx, dy, dw, dh)``.
    """
    bw, bh, burx, bury = get_width_upright(boxes)
    gw, gh, gurx, gury = get_width_upright(gt_boxes)
    if variances is None:
        variances = [1.0, 1.0]

    targets_dx = (gurx - burx) / (bw * variances[0])
    targets_dy = (gury - bury) / (bh * variances[0])
    targets_dw = jnp.log(gw / bw) / variances[1]
    targets_dh = jnp.log(gh / bh) / variances[1]

    return jnp.concatenate([targets_dx, targets_dy, targets_dw, targets_dh], axis=-1)


def decode(roi, deltas, variances=None):
    """Apply predicted deltas to reference boxes (inverse of :func:`encode`)."""
    rw, rh, rurx, rury = get_width_upright(roi)
    dx, dy, dw, dh = jnp.split(deltas.astype(jnp.float32), 4, axis=-1)
    if variances is None:
        variances = [1.0, 1.0]

    pred_ur_x = dx * rw * variances[0] + rurx
    pred_ur_y = dy * rh * variances[0] + rury
    pred_w = jnp.exp(dw * variances[1]) * rw
    pred_h = jnp.exp(dh * variances[1]) * rh

    bbox_x1 = pred_ur_x - 0.5 * pred_w
    bbox_y1 = pred_ur_y - 0.5 * pred_h
    # The reference subtracts an extra pixel on the max corner to close the
    # +1-width round trip (encode∘decode == identity).
    bbox_x2 = pred_ur_x + 0.5 * pred_w - 1.0
    bbox_y2 = pred_ur_y + 0.5 * pred_h - 1.0

    return jnp.concatenate([bbox_x1, bbox_y1, bbox_x2, bbox_y2], axis=-1)


def clip_boxes(boxes, im_shape):
    """Clip boxes to ``[0, W-1] x [0, H-1]``.

    Args:
        boxes: (..., N, 4) boxes.
        im_shape: (height, width) pair (python scalars or traced values), or a
            (..., 2) array broadcastable over the leading box dims.
    """
    boxes = boxes.astype(jnp.float32)
    im_shape = jnp.asarray(im_shape, dtype=jnp.float32)
    height = im_shape[..., 0][..., None, None]
    width = im_shape[..., 1][..., None, None]

    x1, y1, x2, y2 = split_corners(boxes)
    x1 = jnp.clip(x1, 0.0, width - 1.0)
    x2 = jnp.clip(x2, 0.0, width - 1.0)
    y1 = jnp.clip(y1, 0.0, height - 1.0)
    y2 = jnp.clip(y2, 0.0, height - 1.0)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def change_order(boxes):
    """Swap xyxy <-> yxyx orders (self-inverse)."""
    a, b, c, d = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([b, a, d, c], axis=-1)


def iou_matrix(boxes1, boxes2, offset=1.0):
    """Pairwise IoU between two box sets.

    Args:
        boxes1: (..., N, 4), boxes2: (..., M, 4).
        offset: pixel convention for widths/areas. The default 1.0 matches
            the reference's overlap op (bbox_overlap_tf, used for every
            target assignment); pass 0.0 for the convention of
            ``tf.image.non_max_suppression`` (the reference's NMS — no +1).

    Returns:
        (..., N, M) IoU matrix, clamped at 0.
    """
    x11, y11, x12, y12 = split_corners(boxes1)
    x21, y21, x22, y22 = split_corners(boxes2)
    # (..., N, 1) vs (..., 1, M)
    x21, y21, x22, y22 = (
        jnp.swapaxes(v, -1, -2) for v in (x21, y21, x22, y22)
    )

    xi1 = jnp.maximum(x11, x21)
    yi1 = jnp.maximum(y11, y21)
    xi2 = jnp.minimum(x12, x22)
    yi2 = jnp.minimum(y12, y22)

    intersection = jnp.maximum(xi2 - xi1 + offset, 0.0) * jnp.maximum(
        yi2 - yi1 + offset, 0.0
    )
    area1 = (x12 - x11 + offset) * (y12 - y11 + offset)
    area2 = (x22 - x21 + offset) * (y22 - y21 + offset)
    # Degenerate boxes have zero area under offset=0: guard the 0/0.
    union = jnp.maximum(area1 + area2 - intersection, 1e-8)
    return jnp.maximum(intersection / union, 0.0)
