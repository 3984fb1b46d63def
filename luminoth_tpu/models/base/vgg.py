"""VGG-16 backbone in Flax (full and truncated variants).

reference: luminoth/models/base/truncated_vgg.py:79-121 (conv1..conv5_3, no
FC layers — used by SSD) and slim's ``vgg_16`` (used by Faster R-CNN tests
with endpoint ``conv5/conv5_3``).
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

_STAGES = ((2, 64, "conv1"), (2, 128, "conv2"), (3, 256, "conv3"),
           (3, 512, "conv4"), (3, 512, "conv5"))


class VGG16(nn.Module):
    """VGG-16 conv trunk with per-layer endpoints.

    ``truncated=True`` stops after conv5_3 (no pool5/fc layers), matching the
    reference's SSD feature source. ``endpoint`` may name any conv endpoint
    (e.g. ``"conv5/conv5_3"``) to stop early.
    """

    truncated: bool = True
    endpoint: Optional[str] = None
    num_classes: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train=False):
        endpoints = {}
        x = x.astype(self.dtype)

        for reps, features, stage in _STAGES:
            for i in range(1, reps + 1):
                x = nn.Conv(
                    features, (3, 3), padding="SAME", dtype=self.dtype,
                    name=f"{stage}/{stage}_{i}",
                )(x)
                x = nn.relu(x)
                endpoints[f"{stage}/{stage}_{i}"] = x
                if self.endpoint == f"{stage}/{stage}_{i}":
                    return x, endpoints
            if stage != "conv5":
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
                endpoints[f"pool{stage[-1]}"] = x

        if self.endpoint is not None:
            # A typo'd endpoint would silently return the full conv5 trunk
            # at the wrong stride.
            raise ValueError(
                f"Unknown endpoint {self.endpoint!r}; expected one of "
                f"{sorted(n for n in endpoints if n.startswith('conv'))}"
            )

        if self.truncated:
            endpoints["output"] = x
            return x, endpoints

        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        x = nn.Conv(4096, (7, 7), padding="VALID", dtype=self.dtype, name="fc6")(x)
        x = nn.relu(x)
        endpoints["fc6"] = x
        x = nn.Conv(4096, (1, 1), dtype=self.dtype, name="fc7")(x)
        x = nn.relu(x)
        endpoints["fc7"] = x
        if self.num_classes:
            x = nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype, name="fc8"
            )(x)
        endpoints["output"] = x
        return x, endpoints
