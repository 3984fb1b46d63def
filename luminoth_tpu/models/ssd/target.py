"""SSD anchor target assignment with online hard negative mining.

reference: luminoth/models/ssd/target.py:35-200. Static-shape redesign:

* Labels live in a dense (A,) array: -1 = ignore, 0 = background (selected by
  hard mining), 1..C = foreground class. No boolean_mask — the loss consumes
  label masks instead.
* The dynamic ``top_k(k=3*num_fg)`` hard-negative selection becomes a
  static-shape top-k mask (``ops.select.top_k_mask``: one value-only sort +
  threshold + tie fill) — identical semantics, ~3x cheaper on TPU than the
  earlier argsort-of-argsort rank formulation it replaces.
* Ground truth arrives padded: (G, 5) with label < 0 marking padding rows.
"""

import jax.numpy as jnp

from luminoth_tpu.ops.boxes import encode, iou_matrix
from luminoth_tpu.ops.select import gather_rows, top_k_mask


def ssd_target_assign(
    probs,
    all_anchors,
    gt_boxes,
    num_classes,
    foreground_threshold,
    background_threshold_high,
    hard_negative_ratio,
    variances,
):
    """Assign class and box-regression targets to every anchor.

    Args:
        probs: (A, C+1) predicted softmax probabilities (for hard mining).
        all_anchors: (A, 4) anchors in image coordinates.
        gt_boxes: (G, 5) padded ground truth ``(x1, y1, x2, y2, label)``;
            padding rows must have label < 0.
        num_classes: number of foreground classes C.
        foreground_threshold: IoU at/above which an anchor is foreground.
        background_threshold_high: max IoU with any GT for an anchor to be a
            hard-negative candidate.
        hard_negative_ratio: backgrounds per foreground to keep.
        variances: (center, size) target normalization variances.

    Returns:
        ``(class_targets, bbox_offsets_targets)``: (A,) float labels
        (-1/0/1..C) and (A, 4) encoded offsets (zeros for non-foreground).
    """
    anchors = all_anchors.astype(jnp.float32)
    gt = gt_boxes.astype(jnp.float32)
    num_anchors = anchors.shape[0]

    gt_valid = gt[:, 4] >= 0  # (G,)
    overlaps = iou_matrix(anchors, gt[:, :4])  # (A, G)
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)

    max_overlaps = jnp.max(overlaps, axis=1)
    best_gt_for_anchor = jnp.argmax(overlaps, axis=1)  # (A,)

    iou_is_fg = max_overlaps >= foreground_threshold

    # Best-anchor-per-gt override (highest priority). Formulated as a
    # dense claim matrix rather than a scatter: duplicate-index scatter
    # writes are order-undefined in XLA, which let a padded gt row's
    # stale write race a valid gt's class write at anchor 0 (padded
    # columns are all -1, so their argmax lands on anchor 0). Ties
    # between valid gts resolve to the HIGHEST gt index, matching the
    # reference's sequential per-gt writes where the last gt wins (same
    # semantics as rcnn_target's label-priority pass).
    best_anchor_for_gt = jnp.argmax(overlaps, axis=0)  # (G,)
    claim = gt_valid[:, None] & (
        jnp.arange(num_anchors)[None, :] == best_anchor_for_gt[:, None]
    )  # (G, A)
    num_gt = claim.shape[0]
    winner_gt = (num_gt - 1) - jnp.argmax(claim[::-1], axis=0)  # (A,) last claiming gt
    claimed = jnp.any(claim, axis=0)  # (A,)

    # One fused (G,5)-table lookup covers both the class labels and the
    # box targets: matched_idx is the winner gt for claimed anchors
    # (override priority) and the best-IoU gt otherwise — exactly the
    # row whose label each branch above would have gathered. A single
    # gather_rows pays one one-hot contraction instead of three; XLA's
    # dynamic gather from a tiny table is a measured multi-ms cost at
    # (A,) scale on TPU.
    matched_idx = jnp.where(claimed, winner_gt, best_gt_for_anchor)
    matched_gt = gather_rows(gt[:, :5], matched_idx)  # (A, 5)
    anchors_label = jnp.where(
        claimed | iou_is_fg, matched_gt[:, 4] + 1.0, -1.0
    )

    # Online hard negative mining: strongest-scoring backgrounds first.
    max_cls_probs = jnp.max(probs[:, 1:], axis=1)
    bg_candidate = (max_overlaps <= background_threshold_high) & (
        anchors_label <= 0
    )
    mining_scores = jnp.where(bg_candidate, max_cls_probs, -1.0)

    num_fg = jnp.sum(anchors_label > 0)
    num_bg = (num_fg.astype(jnp.float32) * hard_negative_ratio).astype(jnp.int32)

    set_bg = top_k_mask(mining_scores, num_bg) & (mining_scores > -1.0)
    anchors_label = jnp.where(set_bg, 0.0, anchors_label)

    # Box targets for foreground anchors only. A claimed anchor regresses
    # toward its claiming gt so its class and box target stay consistent
    # even when its max-IoU gt is a different one (same matched_gt rows
    # as the label pass above).
    bbox_targets = encode(anchors, matched_gt[:, :4], variances=variances)
    bbox_targets = jnp.where(
        (anchors_label > 0)[:, None], bbox_targets, 0.0
    )

    return anchors_label, bbox_targets
