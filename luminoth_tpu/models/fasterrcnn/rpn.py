"""Region Proposal Network head.

reference: luminoth/models/fasterrcnn/rpn.py:67-217. A 3x3 conv (512ch) over
the backbone feature map followed by sibling 1x1 convs producing 2·A
objectness logits and 4·A box deltas per cell. Batched: (B, H, W, C) in,
(B, H·W·A, {2,4}) out — flattening order (rows, cols, anchors) matches the
anchor grid layout.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from luminoth_tpu.utils.vars import get_activation, get_initializer


class RPN(nn.Module):
    """RPN conv heads (the proposal/target stages are pure functions)."""

    num_anchors: int
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_map, train=False):
        cfg = self.config
        activation = get_activation(cfg.get("activation_function", "relu6"))
        kernel = tuple(cfg.get("kernel_shape", [3, 3]))

        rpn_feature = nn.Conv(
            cfg.get("num_channels", 512),
            kernel,
            padding="SAME",
            kernel_init=get_initializer(cfg.get("rpn_initializer")),
            dtype=self.dtype,
            name="conv",
        )(feature_map)
        rpn_feature = activation(rpn_feature)

        cls_score = nn.Conv(
            self.num_anchors * 2,
            (1, 1),
            padding="VALID",
            kernel_init=get_initializer(cfg.get("cls_initializer")),
            dtype=self.dtype,
            name="cls_conv",
        )(rpn_feature)
        bbox_pred = nn.Conv(
            self.num_anchors * 4,
            (1, 1),
            padding="VALID",
            kernel_init=get_initializer(cfg.get("bbox_initializer")),
            dtype=self.dtype,
            name="bbox_conv",
        )(rpn_feature)

        batch = feature_map.shape[0]
        cls_score = cls_score.astype(jnp.float32).reshape(batch, -1, 2)
        bbox_pred = bbox_pred.astype(jnp.float32).reshape(batch, -1, 4)
        cls_prob = jax.nn.softmax(cls_score, axis=-1)

        return {
            "rpn_cls_score": cls_score,
            "rpn_cls_prob": cls_prob,
            "rpn_bbox_pred": bbox_pred,
        }
