"""RPN anchor target assignment — static shapes, PRNG-keyed subsampling.

reference: luminoth/models/fasterrcnn/rpn_target.py:73-335. Semantics kept:

* anchors (partially) outside the image (± allowed_border) are ignored;
* background below ``background_threshold_high`` IoU, foreground at/above
  ``foreground_threshold``; every gt's best anchor(s) (all IoU ties) are
  foreground regardless (unless clobber_positives re-marks low-IoU ones);
* random subsampling to ``minibatch_size`` with at most
  ``foreground_fraction`` positives — the reference's random_shuffle+disable
  becomes "keep top-quota by random priority", identical in distribution;
* box targets are plain encode() against each anchor's best gt, zeros for
  non-foreground; outputs are dense over all anchors.

Ground truth is padded (G, 5) with label < 0 on padding rows.
"""

import jax
import jax.numpy as jnp

from luminoth_tpu.ops.boxes import encode, iou_matrix
from luminoth_tpu.ops.select import gather_rows, top_k_mask


def _keep_random_quota(candidate_mask, quota, key):
    """Keep at most ``quota`` True entries, chosen uniformly at random.

    Returns the pruned mask. Entries beyond the quota are dropped by ranking
    candidates with random priorities (top-quota selection via
    ``ops.select.top_k_mask`` — one value-only sort, not two variadic
    argsorts).
    """
    n = candidate_mask.shape[0]
    priorities = jax.random.uniform(key, (n,))
    masked = jnp.where(candidate_mask, priorities, -1.0)
    return candidate_mask & top_k_mask(masked, quota)


def rpn_target_assign(
    all_anchors,
    gt_boxes,
    im_shape,
    key,
    allowed_border=0,
    clobber_positives=False,
    foreground_threshold=0.7,
    background_threshold_high=0.3,
    foreground_fraction=0.5,
    minibatch_size=256,
):
    """Label anchors and build RPN regression targets for one image.

    Args:
        all_anchors: (A, 4) anchors.
        gt_boxes: (G, 5) padded ground truth (label < 0 = padding).
        im_shape: (height, width) of the unpadded image.
        key: PRNG key for minibatch subsampling.

    Returns:
        ``(labels, bbox_targets, max_overlaps)``: (A,) float in {-1, 0, 1},
        (A, 4) encode targets (zeros unless fg), (A,) best-gt IoU.
    """
    anchors = all_anchors.astype(jnp.float32)
    gt = gt_boxes.astype(jnp.float32)
    im_shape = jnp.asarray(im_shape, dtype=jnp.float32)
    num_anchors = anchors.shape[0]

    inside = (
        (anchors[:, 0] >= -allowed_border)
        & (anchors[:, 1] >= -allowed_border)
        & (anchors[:, 2] < im_shape[1] + allowed_border)
        & (anchors[:, 3] < im_shape[0] + allowed_border)
    )

    gt_valid = gt[:, 4] >= 0
    overlaps = iou_matrix(anchors, gt[:, :4])
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    # Outside anchors must not influence per-gt maxima.
    overlaps_inside = jnp.where(inside[:, None], overlaps, -1.0)

    max_overlaps = jnp.max(overlaps_inside, axis=1)
    argmax_gt = jnp.argmax(overlaps_inside, axis=1)  # (A,)

    labels = jnp.full((num_anchors,), -1.0)

    def assign_bg(labels):
        return jnp.where(
            inside & (max_overlaps < background_threshold_high), 0.0, labels
        )

    if not clobber_positives:
        labels = assign_bg(labels)

    # Best anchor(s) per gt — all IoU ties count (rpn_target.py:159-183).
    gt_max = jnp.max(overlaps_inside, axis=0)  # (G,)
    is_best = jnp.any(
        (overlaps_inside == gt_max[None, :]) & gt_valid[None, :] & (gt_max[None, :] > -1.0),
        axis=1,
    )
    labels = jnp.where(inside & is_best, 1.0, labels)
    labels = jnp.where(
        inside & (max_overlaps >= foreground_threshold), 1.0, labels
    )

    if clobber_positives:
        labels = assign_bg(labels)

    # Random fg/bg subsampling.
    fg_key, bg_key = jax.random.split(key)
    num_fg_quota = int(foreground_fraction * minibatch_size)
    fg_mask = labels == 1.0
    fg_kept = _keep_random_quota(fg_mask, num_fg_quota, fg_key)
    labels = jnp.where(fg_mask & ~fg_kept, -1.0, labels)

    num_fg = jnp.sum(labels == 1.0)
    num_bg_quota = minibatch_size - num_fg
    bg_mask = labels == 0.0
    bg_kept = _keep_random_quota(bg_mask, num_bg_quota, bg_key)
    labels = jnp.where(bg_mask & ~bg_kept, -1.0, labels)

    # Regression targets against each anchor's best gt (fg only).
    # gather_rows: tiny-table dynamic gathers are a measured multi-ms
    # TPU cost at (A,) scale.
    matched_gt = gather_rows(gt[:, :4], argmax_gt)
    bbox_targets = encode(anchors, matched_gt)
    bbox_targets = jnp.where((labels == 1.0)[:, None], bbox_targets, 0.0)

    max_overlaps_out = jnp.where(inside, max_overlaps, 0.0)
    return labels, bbox_targets, max_overlaps_out
