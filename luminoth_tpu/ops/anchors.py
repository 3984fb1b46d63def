"""Anchor generation.

The reference generates a numpy (A, 4) reference set at model-build time
(reference: luminoth/utils/anchors.py:4-52) and shifts it over the feature map
inside the graph (luminoth/models/fasterrcnn/fasterrcnn.py:261-308). Here both
steps are static-shape jnp so the whole grid is constant-folded by XLA when
feature-map sizes are static (they always are under padded batching).
"""

import numpy as np
import jax.numpy as jnp


def generate_anchors_reference(base_size, aspect_ratios, scales):
    """(num_ratios * num_scales, 4) reference anchors centered at 0.

    ``aspect_ratio = height / width``; scales multiply the base size on each
    side. Corner convention matches the reference: ``±(size - 1) / 2``.
    """
    scales_grid, ratios_grid = np.meshgrid(
        np.asarray(scales, dtype=np.float64),
        np.asarray(aspect_ratios, dtype=np.float64),
    )
    base_scales = scales_grid.reshape(-1)
    base_ratios = ratios_grid.reshape(-1)

    ratio_sqrts = np.sqrt(base_ratios)
    heights = base_scales * ratio_sqrts * base_size
    widths = base_scales / ratio_sqrts * base_size

    anchors = np.column_stack(
        [
            -(widths - 1) / 2,
            -(heights - 1) / 2,
            (widths - 1) / 2,
            (heights - 1) / 2,
        ]
    )

    real_heights = (anchors[:, 3] - anchors[:, 1]).astype(np.int64)
    real_widths = (anchors[:, 2] - anchors[:, 0]).astype(np.int64)
    if (real_widths == 0).any() or (real_heights == 0).any():
        raise ValueError(
            "base_size {} is too small for aspect_ratios and scales.".format(
                base_size
            )
        )
    return anchors.astype(np.float32)


def generate_anchors_grid(anchors_reference, anchor_stride, feature_map_shape):
    """Shift the reference anchors over every feature-map cell.

    Args:
        anchors_reference: (A, 4) from :func:`generate_anchors_reference`.
        anchor_stride: input pixels per feature-map cell (e.g. 16).
        feature_map_shape: static (height, width) of the feature map.

    Returns:
        (H * W * A, 4) anchors in input-image coordinates. Ordering matches
        the reference's meshgrid construction (x varies fastest within a row,
        anchors innermost), which the target/proposal modules rely on.
    """
    fm_h, fm_w = int(feature_map_shape[0]), int(feature_map_shape[1])
    shift_x = jnp.arange(fm_w, dtype=jnp.float32) * anchor_stride
    shift_y = jnp.arange(fm_h, dtype=jnp.float32) * anchor_stride
    shift_x, shift_y = jnp.meshgrid(shift_x, shift_y)  # (H, W) each

    shifts = jnp.stack(
        [shift_x.reshape(-1), shift_y.reshape(-1)] * 2, axis=1
    )  # (H*W, 4) as (x, y, x, y)

    ref = jnp.asarray(anchors_reference, dtype=jnp.float32)
    all_anchors = ref[None, :, :] + shifts[:, None, :]  # (H*W, A, 4)
    return all_anchors.reshape(-1, 4)
