"""Render model internals onto images for TensorBoard summaries.

reference: luminoth/utils/image_vis.py (per-model × per-mode registry
``summaries_fn`` :21-116, dispatcher ``image_vis_summaries`` :151-184, and
the family of draw functions). Draws with PIL on host numpy arrays and
returns ``{name: (H, W, 3) uint8}`` for the summary writer.
"""

import numpy as np
from PIL import Image, ImageDraw

from luminoth_tpu.vis import build_colormap

FG_COLOR = (44, 160, 44)
BG_COLOR = (214, 39, 40)
PROPOSAL_COLOR = (31, 119, 180)
GT_COLOR = (255, 127, 14)


def _to_pil(image):
    arr = np.clip(np.asarray(image), 0, 255).astype(np.uint8)
    return Image.fromarray(arr).convert("RGB")


def _draw_boxes(draw, boxes, color, width=2, texts=None):
    for i, box in enumerate(np.asarray(boxes)):
        x1, y1, x2, y2 = [float(v) for v in box[:4]]
        if x2 <= x1 or y2 <= y1:
            continue
        for off in range(width):
            draw.rectangle(
                [x1 - off, y1 - off, x2 + off, y2 + off], outline=color
            )
        if texts is not None:
            draw.text((x1 + 2, y1 + 2), str(texts[i]), fill=color)


def draw_gt_boxes(image, gt_boxes=None, **kwargs):
    """Ground-truth boxes with labels."""
    pil = _to_pil(image)
    if gt_boxes is not None and len(gt_boxes):
        gt = np.asarray(gt_boxes)
        valid = gt[:, 4] >= 0
        draw = ImageDraw.Draw(pil)
        _draw_boxes(
            draw, gt[valid], GT_COLOR,
            texts=[int(v) for v in gt[valid][:, 4]],
        )
    return np.asarray(pil)


def draw_rpn_proposals(image, prediction_dict=None, top_k=20, **kwargs):
    """Top-k RPN proposals by score."""
    pil = _to_pil(image)
    rpn = (prediction_dict or {}).get("rpn_prediction", {})
    proposals = rpn.get("proposals")
    if proposals is not None:
        scores = np.asarray(rpn.get("scores"))
        valid = np.asarray(rpn.get("proposals_valid", np.ones_like(scores)))
        proposals = np.asarray(proposals)[valid.astype(bool)]
        scores = scores[valid.astype(bool)]
        order = np.argsort(-scores)[:top_k]
        draw = ImageDraw.Draw(pil)
        _draw_boxes(
            draw, proposals[order], PROPOSAL_COLOR,
            texts=[f"{s:.2f}" for s in scores[order]],
        )
    return np.asarray(pil)


def draw_rpn_targets(image, prediction_dict=None, all_anchors=None, **kwargs):
    """Foreground (green) / background (red) anchor targets."""
    pil = _to_pil(image)
    rpn = (prediction_dict or {}).get("rpn_prediction", {})
    targets = rpn.get("rpn_cls_target")
    if targets is not None and all_anchors is not None:
        targets = np.asarray(targets)
        anchors = np.asarray(all_anchors)
        draw = ImageDraw.Draw(pil)
        _draw_boxes(draw, anchors[targets == 1.0], FG_COLOR, width=1)
        bg = anchors[targets == 0.0]
        if len(bg) > 30:
            bg = bg[np.random.RandomState(0).choice(len(bg), 30,
                                                    replace=False)]
        _draw_boxes(draw, bg, BG_COLOR, width=1)
    return np.asarray(pil)


def draw_object_predictions(image, prediction_dict=None, min_prob=0.0,
                            **kwargs):
    """Final detections with class + probability labels."""
    pil = _to_pil(image)
    cls_pred = (prediction_dict or {}).get("classification_prediction", {})
    objects = cls_pred.get("objects")
    if objects is None:
        cls_pred = prediction_dict or {}
        objects = cls_pred.get("objects")
    if objects is not None:
        objects = np.asarray(objects)
        labels = np.asarray(cls_pred.get("labels"))
        probs = np.asarray(cls_pred.get("probs"))
        valid = np.asarray(
            cls_pred.get("valid", np.ones(len(objects), bool))
        ).astype(bool)
        keep = valid & (probs >= min_prob)
        colormap = build_colormap()
        draw = ImageDraw.Draw(pil)
        for box, label, prob in zip(
            objects[keep], labels[keep], probs[keep]
        ):
            color = colormap(int(label))
            _draw_boxes(
                draw, [box], color, texts=[f"{int(label)} {prob:.2f}"]
            )
    return np.asarray(pil)


def draw_ssd_anchor_matches(image, prediction_dict=None, anchors=None,
                            **kwargs):
    """SSD: anchors labeled foreground by the target stage."""
    pil = _to_pil(image)
    target = (prediction_dict or {}).get("target", {})
    cls = target.get("cls")
    if cls is not None and anchors is not None:
        cls = np.asarray(cls)
        anchors = np.asarray(anchors)
        draw = ImageDraw.Draw(pil)
        _draw_boxes(draw, anchors[cls > 0], FG_COLOR, width=1)
    return np.asarray(pil)


def draw_top_proposals(image, prediction_dict=None, min_score=0.8, **kwargs):
    """RPN proposals above a score threshold (reference draw_top_proposals)."""
    pil = _to_pil(image)
    rpn = (prediction_dict or {}).get("rpn_prediction", {})
    proposals = rpn.get("proposals")
    if proposals is not None:
        scores = np.asarray(rpn.get("scores"))
        valid = np.asarray(
            rpn.get("proposals_valid", np.ones_like(scores))
        ).astype(bool)
        keep = valid & (scores >= min_score)
        draw = ImageDraw.Draw(pil)
        _draw_boxes(
            draw, np.asarray(proposals)[keep], PROPOSAL_COLOR,
            texts=[f"{s:.2f}" for s in scores[keep]],
        )
    return np.asarray(pil)


def draw_rcnn_cls_batch(image, prediction_dict=None, gt_boxes=None, **kwargs):
    """RCNN minibatch proposals colored fg/bg with their target labels."""
    pil = _to_pil(image)
    cls_pred = (prediction_dict or {}).get("classification_prediction", {})
    target = cls_pred.get("target", {})
    labels = target.get("cls")
    proposals = cls_pred.get("proposals")
    if labels is not None and proposals is not None:
        labels = np.asarray(labels)
        proposals = np.asarray(proposals)
        mask = np.asarray(
            target.get("selected_mask", np.ones_like(labels))
        ).astype(bool)
        draw = ImageDraw.Draw(pil)
        fg = mask & (labels > 0)
        bg = mask & (labels == 0)
        _draw_boxes(
            draw, proposals[fg], FG_COLOR,
            texts=[int(v) for v in labels[fg]],
        )
        sel = proposals[bg][:20]
        _draw_boxes(draw, sel, BG_COLOR, width=1)
    if gt_boxes is not None and len(gt_boxes):
        gt = np.asarray(gt_boxes)
        draw = ImageDraw.Draw(pil)
        _draw_boxes(draw, gt[gt[:, 4] >= 0], GT_COLOR)
    return np.asarray(pil)


def draw_rpn_bbox_targets(image, prediction_dict=None, all_anchors=None,
                          **kwargs):
    """Foreground anchors with their regression-target boxes (decoded)."""
    from luminoth_tpu.ops import np_boxes

    pil = _to_pil(image)
    rpn = (prediction_dict or {}).get("rpn_prediction", {})
    targets = rpn.get("rpn_cls_target")
    offsets = rpn.get("rpn_bbox_target")
    if targets is not None and offsets is not None and all_anchors is not None:
        targets = np.asarray(targets)
        fg = targets == 1.0
        anchors = np.asarray(all_anchors)[fg]
        decoded = np_boxes.decode(anchors, np.asarray(offsets)[fg])
        draw = ImageDraw.Draw(pil)
        _draw_boxes(draw, anchors, BG_COLOR, width=1)
        _draw_boxes(draw, decoded, FG_COLOR, width=1)
    return np.asarray(pil)


# Per-model × per-mode registry (reference image_vis.py:21-116).
summaries_fn = {
    "fasterrcnn": {
        "train": [draw_gt_boxes, draw_rpn_proposals, draw_rpn_targets],
        "eval": [draw_gt_boxes, draw_object_predictions],
        "debug": [
            draw_gt_boxes,
            draw_rpn_proposals,
            draw_top_proposals,
            draw_rpn_targets,
            draw_rpn_bbox_targets,
            draw_rcnn_cls_batch,
            draw_object_predictions,
        ],
    },
    "ssd": {
        "train": [draw_gt_boxes, draw_ssd_anchor_matches],
        "eval": [draw_gt_boxes, draw_object_predictions],
        "debug": [
            draw_gt_boxes,
            draw_ssd_anchor_matches,
            draw_object_predictions,
        ],
    },
}


def image_vis_summaries(prediction_dict, config=None, image_vis_mode="train",
                        image=None, gt_boxes=None, extra_tag=None,
                        all_anchors=None):
    """Run the registered draw functions for the model/mode.

    Returns {summary_name: uint8 image array}.
    """
    model_type = (config or {}).get("type", "fasterrcnn") if isinstance(
        config, dict
    ) else getattr(config, "type", "fasterrcnn")
    fns = summaries_fn.get(model_type, {}).get(image_vis_mode) or []

    summaries = {}
    for fn in fns:
        name = fn.__name__
        if extra_tag:
            name = f"{name}/{extra_tag}"
        try:
            summaries[name] = fn(
                image,
                prediction_dict=prediction_dict,
                gt_boxes=gt_boxes,
                all_anchors=all_anchors,
            )
        except Exception:  # vis must never break training
            continue
    return summaries
