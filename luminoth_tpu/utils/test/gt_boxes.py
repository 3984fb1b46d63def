"""Synthetic ground-truth box generator for tests.

reference: luminoth/utils/test/gt_boxes.py:4-56 — random, internally
consistent (x1 < x2, y1 < y2, inside the image) ground-truth boxes.
"""

import numpy as np


def generate_gt_boxes(total_boxes, image_size, min_size=10, rng=None,
                      with_label=False, num_classes=None):
    """Generate ``total_boxes`` random valid boxes inside ``image_size``.

    Args:
        total_boxes: number of boxes.
        image_size: (height, width).
        min_size: minimum side length.
        rng: optional ``np.random.RandomState``.
        with_label: append a random class label column.
        num_classes: label range when ``with_label``.

    Returns:
        (total_boxes, 4) float array (or (total_boxes, 5) with labels).
    """
    rng = rng or np.random.RandomState(0)
    height, width = image_size

    x1 = rng.uniform(0, width - min_size - 1, total_boxes)
    y1 = rng.uniform(0, height - min_size - 1, total_boxes)
    x2 = np.minimum(
        x1 + min_size + rng.uniform(0, width, total_boxes), width - 1
    )
    y2 = np.minimum(
        y1 + min_size + rng.uniform(0, height, total_boxes), height - 1
    )
    boxes = np.stack([x1, y1, x2, y2], axis=1)

    if with_label:
        labels = rng.randint(0, num_classes or 2, (total_boxes, 1))
        boxes = np.concatenate([boxes, labels.astype(boxes.dtype)], axis=1)
    return boxes
