"""Same-process hardware A/B for the round-5 target-stage rewrite.

Two changes land together in the target-assignment stages (all three:
SSD, RPN, RCNN):

1. dynamic-k selection: argsort-of-argsort ranks -> ops.select.top_k_mask
   (one value-only sort + threshold + tie fill);
2. tiny-table lookups (gt labels/boxes by argmax index) ->
   ops.select.gather_rows (one-hot contraction) — XLA lowers a dynamic
   gather from a (G,)-row table to a per-element loop on TPU, measured
   1.8-4 ms PER GATHER at (A=8732/23k) scale.

Cross-process timings vary with the tunnel attachment (STATUS.md r5
note 6), so this script measures OLD and NEW in one process: the
isolated SSD target stage, then the full SSD train step with the old
formulation monkeypatched into the model module and back out.
``--frcnn`` additionally measures the shipped FRCNN train step
(~600 s cold compile, no old-side patch — its target stages are
2.9+1.0 ms of a ~136 ms step, below the cross-run noise floor).

Usage: python scripts/target_gather_ab.py [--frcnn]
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import luminoth_tpu.models.ssd.model as ssd_model_mod
import luminoth_tpu.models.ssd.target as ssd_target_mod
from luminoth_tpu.ops.boxes import encode, iou_matrix

jax.device_get(jnp.zeros(()))  # poison the tunnel once; fences cheap after


def timeit(label, fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:<46s} {dt:8.2f} ms", flush=True)
    return dt


def old_ssd_target_assign(probs, all_anchors, gt_boxes, num_classes,
                          foreground_threshold, background_threshold_high,
                          hard_negative_ratio, variances):
    """The pre-round-5 formulation: indexing gathers + rank selection."""
    anchors = all_anchors.astype(jnp.float32)
    gt = gt_boxes.astype(jnp.float32)
    num_anchors = anchors.shape[0]
    gt_valid = gt[:, 4] >= 0
    overlaps = iou_matrix(anchors, gt[:, :4])
    overlaps = jnp.where(gt_valid[None, :], overlaps, -1.0)
    max_overlaps = jnp.max(overlaps, axis=1)
    best_gt_for_anchor = jnp.argmax(overlaps, axis=1)
    anchors_label = jnp.full((num_anchors,), -1.0)
    best_fg_labels = gt[:, 4][best_gt_for_anchor] + 1.0
    iou_is_fg = max_overlaps >= foreground_threshold
    anchors_label = jnp.where(iou_is_fg, best_fg_labels, anchors_label)
    best_anchor_for_gt = jnp.argmax(overlaps, axis=0)
    claim = gt_valid[:, None] & (
        jnp.arange(num_anchors)[None, :] == best_anchor_for_gt[:, None]
    )
    num_gt = claim.shape[0]
    winner_gt = (num_gt - 1) - jnp.argmax(claim[::-1], axis=0)
    claimed = jnp.any(claim, axis=0)
    anchors_label = jnp.where(
        claimed, gt[:, 4][winner_gt] + 1.0, anchors_label
    )
    max_cls_probs = jnp.max(probs[:, 1:], axis=1)
    bg_candidate = (max_overlaps <= background_threshold_high) & (
        anchors_label <= 0
    )
    mining_scores = jnp.where(bg_candidate, max_cls_probs, -1.0)
    num_fg = jnp.sum(anchors_label > 0)
    num_bg = (num_fg.astype(jnp.float32) * hard_negative_ratio
              ).astype(jnp.int32)
    order = jnp.argsort(-mining_scores, stable=True)
    ranks = jnp.argsort(order, stable=True)
    set_bg = (ranks < num_bg) & (mining_scores > -1.0)
    anchors_label = jnp.where(set_bg, 0.0, anchors_label)
    matched_idx = jnp.where(claimed, winner_gt, best_gt_for_anchor)
    matched_gt = gt[:, :4][matched_idx]
    bbox_targets = encode(anchors, matched_gt, variances=variances)
    bbox_targets = jnp.where(
        (anchors_label > 0)[:, None], bbox_targets, 0.0
    )
    return anchors_label, bbox_targets


def bench_stage():
    B, A, C = 32, 8732, 20
    key = jax.random.PRNGKey(0)
    probs = jax.random.uniform(key, (B, A, C + 1))
    anchors = jnp.abs(jax.random.normal(key, (A, 4))) * 50
    anchors = jnp.concatenate(
        [anchors[:, :2], anchors[:, :2] + 20], axis=1
    )
    rng = np.random.RandomState(0)
    gt = np.full((B, 8, 5), -1.0, np.float32)
    for b in range(B):
        for i in range(4):
            x1, y1 = rng.uniform(0, 220), rng.uniform(0, 220)
            gt[b, i] = [x1, y1, x1 + 60, y1 + 60, rng.randint(0, 20)]
    gt = jnp.asarray(gt)

    kw = dict(num_classes=C, foreground_threshold=0.5,
              background_threshold_high=0.2, hard_negative_ratio=3.0,
              variances=(0.1, 0.2))
    old = jax.jit(jax.vmap(partial(old_ssd_target_assign, **kw),
                           in_axes=(0, None, 0)))
    new = jax.jit(jax.vmap(partial(ssd_target_mod.ssd_target_assign, **kw),
                           in_axes=(0, None, 0)))
    # Equivalence on device first.
    lo, bo = old(probs, anchors, gt)
    ln, bn = new(probs, anchors, gt)
    same = bool(jnp.all(lo == ln) & jnp.all(bo == bn))
    print(f"stage outputs identical: {same}", flush=True)
    t_old = timeit("ssd target stage OLD (gathers+ranks)", old,
                   probs, anchors, gt)
    t_new = timeit("ssd target stage NEW (onehot+topkmask)", new,
                   probs, anchors, gt)
    return t_old, t_new, same


def bench_ssd_train_both():
    """Full SSD train step, old formulation monkeypatched in and out.

    ``models/ssd/model.py`` binds ``ssd_target_assign`` by from-import,
    so the patch targets the model module's reference. Each variant is
    a distinct traced computation (different jaxprs), so the persistent
    compile cache cannot cross-serve them.
    """
    import bench
    new = bench.bench_ssd_train()
    print(f"ssd train step NEW (shipped): "
          f"{new['images_per_sec']} img/s, {new['step_ms']} ms",
          flush=True)
    ssd_model_mod.ssd_target_assign = old_ssd_target_assign
    try:
        old = bench.bench_ssd_train()
    finally:
        ssd_model_mod.ssd_target_assign = ssd_target_mod.ssd_target_assign
    print(f"ssd train step OLD (patched):  "
          f"{old['images_per_sec']} img/s, {old['step_ms']} ms",
          flush=True)
    return old, new


def bench_frcnn_train():
    import bench
    r = bench.bench_frcnn_train()
    print(f"frcnn train step (shipped): "
          f"{r['images_per_sec']} img/s, {r['step_ms']} ms", flush=True)
    return r


def main():
    t_old, t_new, same = bench_stage()
    results = {"stage_old_ms": t_old, "stage_new_ms": t_new,
               "identical": same}
    old, new = bench_ssd_train_both()
    results["ssd_train_old"] = old
    results["ssd_train_new"] = new
    if "--frcnn" in sys.argv:  # ~600 s cold compile; opt-in
        results["frcnn_train"] = bench_frcnn_train()
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
