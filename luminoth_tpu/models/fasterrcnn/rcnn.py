"""RCNN head: FC stack + classifier/regressor over pooled ROI features.

reference: luminoth/models/fasterrcnn/rcnn.py:70-253 (the target/proposal
stages live in their own modules). Input is the tail output over ROI crops;
optional mean pooling (rcnn.py:185-188) precedes flattening.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from luminoth_tpu.utils.vars import get_activation, get_initializer


class RCNNHead(nn.Module):
    """Dense layers producing class scores and per-class box deltas."""

    num_classes: int
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_features, train=False):
        """(N, S, S, C) tail features -> ((N, C+1) scores, (N, 4·C) deltas)."""
        cfg = self.config
        activation = get_activation(cfg.get("activation_function", "relu6"))
        keep_prob = cfg.get("dropout_keep_prob", 1.0)

        net = roi_features.astype(self.dtype)
        if cfg.get("use_mean", True):
            net = jnp.mean(net, axis=(1, 2))
        net = net.reshape(net.shape[0], -1)

        if train and keep_prob < 1.0:
            net = nn.Dropout(rate=1.0 - keep_prob, deterministic=False)(net)

        for i, layer_size in enumerate(cfg.get("layer_sizes", [])):
            net = nn.Dense(
                layer_size,
                kernel_init=get_initializer(cfg.get("rcnn_initializer")),
                dtype=self.dtype,
                name=f"fc_{i}",
            )(net)
            net = activation(net)
            if train and keep_prob < 1.0:
                net = nn.Dropout(rate=1.0 - keep_prob, deterministic=False)(net)

        cls_score = nn.Dense(
            self.num_classes + 1,
            kernel_init=get_initializer(cfg.get("cls_initializer")),
            dtype=self.dtype,
            name="fc_classifier",
        )(net).astype(jnp.float32)
        bbox_offsets = nn.Dense(
            self.num_classes * 4,
            kernel_init=get_initializer(cfg.get("bbox_initializer")),
            dtype=self.dtype,
            name="fc_bbox",
        )(net).astype(jnp.float32)

        return cls_score, jax.nn.softmax(cls_score, axis=-1), bbox_offsets
