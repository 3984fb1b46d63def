"""Synthetic-data helpers shared by the test suite
(reference: luminoth/utils/test/)."""

from luminoth_tpu.utils.test.anchors import generate_anchors  # noqa: F401
from luminoth_tpu.utils.test.gt_boxes import generate_gt_boxes  # noqa: F401
