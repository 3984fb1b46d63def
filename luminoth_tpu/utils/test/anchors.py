"""Numpy twin of the in-graph anchor generation, for tests.

reference: luminoth/utils/test/anchors.py:4-60.
"""

import numpy as np

from luminoth_tpu.ops.anchors import generate_anchors_reference


def generate_anchors(anchors_reference, anchor_stride, feature_map_shape):
    """All anchors over a feature map, pure numpy.

    Matches :func:`luminoth_tpu.ops.anchors.generate_anchors_grid` exactly
    (same meshgrid ordering) so tests can cross-check the jnp version.
    """
    shift_x = np.arange(feature_map_shape[1]) * anchor_stride
    shift_y = np.arange(feature_map_shape[0]) * anchor_stride
    shift_x, shift_y = np.meshgrid(shift_x, shift_y)
    shifts = np.stack(
        [shift_x.reshape(-1), shift_y.reshape(-1)] * 2, axis=1
    ).astype(np.float64)
    all_anchors = (
        np.asarray(anchors_reference)[None, :, :] + shifts[:, None, :]
    )
    return all_anchors.reshape(-1, 4)


__all__ = ["generate_anchors", "generate_anchors_reference"]
