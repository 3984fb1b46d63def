"""TPU-native numeric ops: box geometry, anchors, losses, NMS, ROI align."""

from luminoth_tpu.ops.boxes import (  # noqa: F401
    encode,
    decode,
    clip_boxes,
    change_order,
    iou_matrix,
)
from luminoth_tpu.ops.losses import smooth_l1_loss  # noqa: F401
from luminoth_tpu.ops.select import gather_rows, top_k_mask  # noqa: F401
from luminoth_tpu.ops.anchors import (  # noqa: F401
    generate_anchors_reference,
    generate_anchors_grid,
)
