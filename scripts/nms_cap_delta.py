"""Measure the detection/mAP delta of ``pre_nms_max_candidates``.

Reference eval NMS-es ALL ~2000 post-RPN proposals per class
(reference eval.py:52-89 sets min_prob=0; rcnn_proposal.py:77-135 has
no candidate cap). Our serving default caps the per-class NMS sweep at
the top 512 scored candidates. This script quantifies the difference
on two synthetic scenarios, computing AP with the real evaluator:

1. *overfit-like*: few well-separated objects, unimodal score peaks —
   the common case, where the cap should be exactly lossless.
2. *dense*: a grid of many same-class objects, each covered by a
   cluster of jittered duplicate proposals, so suppression must chew
   through far more than (cap - class_max_detections) candidates —
   the adversarial case for a score-sorted cap.

Run on CPU (pure numerics, no TPU needed):
    JAX_PLATFORMS=cpu python scripts/nms_cap_delta.py

Prints one JSON line: per-scenario AP@[0.5:0.95] for cap=512 vs
uncapped, plus max box/score drift on matched detections.
"""
import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from luminoth_tpu.models.fasterrcnn.rcnn_proposal import rcnn_proposal  # noqa: E402
from luminoth_tpu.eval import calculate_metrics  # noqa: E402

H, W = 608.0, 800.0
NUM_CLASSES = 3
rng = np.random.RandomState(7)


def jitter(box, scale):
    dx = rng.uniform(-scale, scale, 4)
    x1, y1, x2, y2 = box + dx
    return [min(x1, x2 - 2), min(y1, y2 - 2), max(x2, x1 + 2), max(y2, y1 + 2)]


def build_scene(gt_boxes, gt_classes, dup_per_gt, noise_boxes):
    """Proposals = per-GT jitter clusters + uniform noise, with head
    outputs shaped so decode() reproduces the proposal box exactly
    (zero deltas) and the GT class score peaks on the cluster."""
    props, scores = [], []
    for box, cls in zip(gt_boxes, gt_classes):
        for d in range(dup_per_gt):
            props.append(jitter(np.asarray(box, np.float64), 6.0))
            s = np.full(NUM_CLASSES + 1, 0.01)
            # descending duplicate scores: one clear winner per cluster
            s[cls + 1] = 0.95 - 0.03 * d - rng.uniform(0, 0.01)
            scores.append(s)
    for _ in range(noise_boxes):
        x1 = rng.uniform(0, W - 40)
        y1 = rng.uniform(0, H - 40)
        props.append([x1, y1, x1 + rng.uniform(10, 40),
                      y1 + rng.uniform(10, 40)])
        s = np.full(NUM_CLASSES + 1, 0.01)
        s[rng.randint(1, NUM_CLASSES + 1)] = rng.uniform(0.02, 0.30)
        scores.append(s)
    props = np.asarray(props, np.float32)
    scores = np.asarray(scores, np.float32)
    scores /= scores.sum(axis=1, keepdims=True) / 1.0  # keep relative order
    p = props.shape[0]
    return {
        "proposals": props,
        "bbox_pred": np.zeros((p, 4 * NUM_CLASSES), np.float32),
        "cls_prob": scores,
        "valid": np.ones(p, bool),
    }


def run(scene, cap):
    out = rcnn_proposal(
        jnp.asarray(scene["proposals"])[None],
        jnp.asarray(scene["bbox_pred"])[None],
        jnp.asarray(scene["cls_prob"])[None],
        jnp.asarray(scene["valid"])[None],
        jnp.asarray([[H, W]], jnp.float32),
        num_classes=NUM_CLASSES,
        min_prob_threshold=0.0,
        pre_nms_max_candidates=cap,
    )
    v = np.asarray(out["valid"][0])
    return (np.asarray(out["objects"][0])[v],
            np.asarray(out["labels"][0])[v],
            np.asarray(out["probs"][0])[v])


def ap(dets, gt_boxes, gt_classes):
    boxes, labels, probs = dets
    output = {
        "bboxes": [boxes.astype(np.float64)],
        "classes": [labels.astype(np.int64)],
        "scores": [probs.astype(np.float64)],
        "gt_bboxes": [np.asarray(gt_boxes, np.float64).reshape(-1, 4)],
        "gt_classes": [np.asarray(gt_classes, np.int64)],
    }
    ap_per_class, _ = calculate_metrics(output, NUM_CLASSES)
    # mean over classes with GT, averaged over the 10 IoU thresholds
    per_class = np.asarray(ap_per_class, np.float64)
    has_gt = np.isfinite(per_class).all(axis=-1)
    return float(np.nanmean(per_class[has_gt]))


def measure(name, gt_boxes, gt_classes, dup_per_gt, noise):
    scene = build_scene(gt_boxes, gt_classes, dup_per_gt, noise)
    n_props = scene["proposals"].shape[0]
    capped = run(scene, 512)
    exact = run(scene, 0)
    res = {
        "proposals": int(n_props),
        "ap_cap512": round(float(ap(capped, gt_boxes, gt_classes)), 6),
        "ap_uncapped": round(float(ap(exact, gt_boxes, gt_classes)), 6),
        "n_dets_cap512": int(capped[0].shape[0]),
        "n_dets_uncapped": int(exact[0].shape[0]),
    }
    res["ap_delta"] = round(res["ap_cap512"] - res["ap_uncapped"], 6)
    return name, res


def main():
    results = {}

    # Scenario 1: overfit-like — 6 well-separated objects, 2000 proposals.
    gt1, cls1 = [], []
    for i in range(6):
        x1 = 60 + (i % 3) * 250.0
        y1 = 80 + (i // 3) * 280.0
        gt1.append([x1, y1, x1 + 120, y1 + 100])
        cls1.append(i % NUM_CLASSES)
    k, v = measure("sparse", gt1, cls1, dup_per_gt=20, noise=1880)
    results[k] = v

    # Scenario 2: dense — 150 same-class objects in a grid, 15 jittered
    # duplicates each (2250 proposals of one class). Suppression must
    # remove 14/15 of every cluster: ~2100 suppressions >> (512-100).
    gt2, cls2 = [], []
    for r in range(10):
        for c in range(15):
            x1, y1 = 20 + c * 50.0, 20 + r * 56.0
            gt2.append([x1, y1, x1 + 42, y1 + 48])
            cls2.append(0)
    k, v = measure("dense_one_class", gt2, cls2, dup_per_gt=15, noise=0)
    results[k] = v

    print(json.dumps({"nms_cap_delta": results}))


if __name__ == "__main__":
    main()
