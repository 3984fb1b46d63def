"""RCNN proposal target assignment + minibatch selection — static shapes.

reference: luminoth/models/fasterrcnn/rcnn_target.py:48-299. Semantics kept:

* background band: ``background_threshold_low <= IoU < high`` → label 0;
* foreground at/above ``foreground_threshold`` → best gt's class + 1;
* the single best proposal per gt is foreground regardless (priority);
* random subsampling to ``minibatch_size`` with at most
  ``foreground_fraction`` positives;
* encode() targets with variances for positives only.

Extra (TPU): proposals carry a ``valid`` mask (padded NMS output); invalid
rows are always ignored. A second helper extracts a fixed-size minibatch
index set so the ROI stage only computes the selected rows, replacing the
reference's dynamic boolean_mask (rcnn.py:152-172).
"""

import jax
import jax.numpy as jnp

from luminoth_tpu.ops.boxes import encode, iou_matrix
from luminoth_tpu.ops.select import gather_rows
from luminoth_tpu.models.fasterrcnn.rpn_target import _keep_random_quota


def rcnn_target_assign(
    proposals,
    proposals_valid,
    gt_boxes,
    key,
    foreground_threshold=0.5,
    background_threshold_high=0.5,
    background_threshold_low=0.0,
    foreground_fraction=0.25,
    minibatch_size=256,
    variances=(0.1, 0.2),
):
    """Label RPN proposals against ground truth for one image.

    Args:
        proposals: (P, 4) padded proposals.
        proposals_valid: (P,) bool mask of real proposals.
        gt_boxes: (G, 5) padded ground truth (label < 0 = padding).
        key: PRNG key for subsampling.

    Returns:
        ``(labels, bbox_targets)``: (P,) float labels (-1 ignore, 0 bg,
        1..C fg) and (P, 4) encoded offsets (zeros unless fg).
    """
    props = proposals.astype(jnp.float32)
    gt = gt_boxes.astype(jnp.float32)
    num_proposals = props.shape[0]

    gt_valid = gt[:, 4] >= 0
    overlaps = iou_matrix(props, gt[:, :4])
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    overlaps = jnp.where(proposals_valid[:, None], overlaps, -1.0)

    max_overlaps = jnp.max(overlaps, axis=1)
    # With zero valid gt boxes every overlap is the -1 sentinel, which
    # falls outside the background band; treat the whole image as
    # background instead, consistent with rpn_target (which labels all
    # inside anchors background on an empty image).
    max_overlaps = jnp.where(jnp.any(gt_valid), max_overlaps, 0.0)
    best_gt_idx = jnp.argmax(overlaps, axis=1)

    bg_cond = (
        (max_overlaps >= background_threshold_low)
        & (max_overlaps < background_threshold_high)
        & proposals_valid
    )
    iou_is_fg = (max_overlaps >= foreground_threshold) & proposals_valid

    # The single best proposal for each gt gets its class (priority). A
    # column that is all -1 means no valid proposal overlapped this gt at
    # all (e.g. zero valid proposals early in training); argmax would point
    # at padding row 0, so the claim is gated on gt_best > -1 like
    # rpn_target's best-anchor-per-gt pass. Formulated as a dense claim
    # matrix rather than a scatter: duplicate-index scatter writes are
    # order-undefined in XLA, which let a padded gt row's stale write
    # race a valid gt's class write at proposal 0. Ties between valid
    # gts resolve to the HIGHEST gt index, matching the reference's
    # sequential per-gt writes where the last gt wins
    # (reference: rcnn_target.py label-priority semantics pinned by
    # rcnn_target_test.py testLabelPriority).
    best_proposal_idx = jnp.argmax(overlaps, axis=0)  # (G,)
    gt_best = jnp.max(overlaps, axis=0)  # (G,)
    best_valid = gt_valid & (gt_best > -1.0)
    claim = best_valid[:, None] & (
        jnp.arange(num_proposals)[None, :] == best_proposal_idx[:, None]
    )  # (G, P)
    num_gt = claim.shape[0]
    winner_gt = (num_gt - 1) - jnp.argmax(claim[::-1], axis=0)  # (P,) last claiming gt
    is_best = jnp.any(claim, axis=0)  # (P,)

    # One fused (G,5)-table lookup covers the class labels and the box
    # targets: matched_idx is the winner gt for best-claimed proposals
    # (override priority) and the best-IoU gt otherwise — exactly the
    # row each label branch would have gathered. gather_rows: XLA's
    # dynamic gather from a tiny table is a measured multi-ms TPU cost
    # at (P,) scale; one one-hot contraction replaces three.
    matched_idx = jnp.where(is_best, winner_gt, best_gt_idx)
    matched_gt = gather_rows(gt[:, :5], matched_idx)  # (P, 5)
    labels = jnp.where(
        is_best | iou_is_fg,
        matched_gt[:, 4] + 1.0,
        jnp.where(bg_cond, 0.0, -1.0),
    )

    # Subsample: at most max_fg positives, then fill with backgrounds.
    fg_key, bg_key = jax.random.split(key)
    max_fg = int(foreground_fraction * minibatch_size)
    fg_cond = (iou_is_fg | is_best) & (labels > 0)
    fg_kept = _keep_random_quota(fg_cond, max_fg, fg_key)
    labels = jnp.where(fg_cond & ~fg_kept, -labels, labels)

    total_fg = jnp.sum(labels > 0)
    max_bg = minibatch_size - total_fg
    bg_mask = labels == 0.0
    bg_kept = _keep_random_quota(bg_mask, max_bg, bg_key)
    labels = jnp.where(bg_mask & ~bg_kept, -1.0, labels)

    # A best-claimed proposal regresses toward its claiming gt so its
    # class and box target stay consistent even when its max-IoU gt is a
    # different one (same matched_gt rows as the label pass above).
    bbox_targets = encode(props, matched_gt[:, :4], variances=variances)
    bbox_targets = jnp.where((labels > 0)[:, None], bbox_targets, 0.0)

    return labels, bbox_targets


def select_minibatch(labels, minibatch_size):
    """Fixed-size indices of the proposals kept for the ROI stage.

    All label >= 0 rows (the subsampled minibatch, at most
    ``minibatch_size``), padded with arbitrary indices + a mask.

    Returns:
        ``(indices, mask)``: (M,) int32 indices and (M,) bool validity.
    """
    selected = labels >= 0
    # Stable order: selected first, preserving index order.
    sort_key = jnp.where(selected, 0, 1)
    order = jnp.argsort(sort_key, stable=True)
    indices = order[:minibatch_size]
    mask = selected[indices]
    return indices.astype(jnp.int32), mask
