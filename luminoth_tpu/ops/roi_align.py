"""ROI crop-and-resize with bilinear sampling (TF semantics), pure XLA.

Replaces ``tf.image.crop_and_resize`` followed by 2x2 max-pool
(reference: luminoth/models/fasterrcnn/roi_pool.py:68-95). Implemented as two
separable 1-D bilinear gathers (rows then columns), vmapped over ROIs: each
gather is a dense take along one axis, which XLA lowers to efficient dynamic
gathers without any host round-trip or dynamic shape.

Boxes are normalized ``(y1, x1, y2, x2)`` like TF's op: sample positions are
``y1·(H−1) + i·(y2−y1)·(H−1)/(S−1)`` and out-of-image samples extrapolate 0.
"""

from functools import partial

import jax
import jax.numpy as jnp


def _sample_coords(lo, hi, size, image_dim):
    """TF crop_and_resize sampling positions along one axis."""
    if size > 1:
        steps = jnp.arange(size, dtype=jnp.float32) / (size - 1)
        return lo * (image_dim - 1) + steps * (hi - lo) * (image_dim - 1)
    return 0.5 * (lo + hi) * (image_dim - 1) * jnp.ones((1,), jnp.float32)


def _gather_axis0_bilinear(data, coords):
    """Bilinear interpolation of ``data`` (D, ...) at float ``coords`` (S,)."""
    d = data.shape[0]
    in_bounds = (coords >= 0) & (coords <= d - 1)
    lo = jnp.clip(jnp.floor(coords), 0, d - 1)
    hi = jnp.clip(lo + 1, 0, d - 1)
    frac = (coords - lo).astype(data.dtype)
    lo_i = lo.astype(jnp.int32)
    hi_i = hi.astype(jnp.int32)

    top = jnp.take(data, lo_i, axis=0)
    bot = jnp.take(data, hi_i, axis=0)
    expand = (slice(None),) + (None,) * (data.ndim - 1)
    out = top * (1.0 - frac[expand]) + bot * frac[expand]
    return jnp.where(in_bounds[expand], out, jnp.zeros((), data.dtype))


def _crop_one(feature_map, box, crop_size):
    """Crop one normalized (y1, x1, y2, x2) box to (S, S, C)."""
    h, w = feature_map.shape[0], feature_map.shape[1]
    y1, x1, y2, x2 = box[0], box[1], box[2], box[3]
    ys = _sample_coords(y1, y2, crop_size, h)
    xs = _sample_coords(x1, x2, crop_size, w)
    rows = _gather_axis0_bilinear(feature_map, ys)  # (S, W, C)
    cols = _gather_axis0_bilinear(jnp.swapaxes(rows, 0, 1), xs)  # (S, S, C)
    return jnp.swapaxes(cols, 0, 1)


@partial(jax.jit, static_argnames=("crop_size", "chunk_size"))
def crop_and_resize(feature_map, boxes, crop_size, chunk_size=256):
    """Crop normalized boxes from a feature map with bilinear resampling.

    ROIs are processed in chunks via ``lax.map`` so the separable-gather
    intermediate stays at ``chunk · S · W · C`` instead of ``R · S · W · C``
    (with thousands of ROIs per image the unchunked form is tens of GB).

    Args:
        feature_map: (H, W, C) feature map.
        boxes: (R, 4) normalized ``(y1, x1, y2, x2)`` boxes.
        crop_size: static output side S.
        chunk_size: ROIs per sequential chunk.

    Returns:
        (R, S, S, C) crops.
    """
    boxes = boxes.astype(jnp.float32)
    r = boxes.shape[0]
    crop_fn = jax.vmap(lambda b: _crop_one(feature_map, b, crop_size))
    if r <= chunk_size:
        return crop_fn(boxes)

    num_chunks = -(-r // chunk_size)
    pad = num_chunks * chunk_size - r
    padded = jnp.pad(boxes, ((0, pad), (0, 0)))
    chunked = padded.reshape(num_chunks, chunk_size, 4)
    out = jax.lax.map(crop_fn, chunked)
    return out.reshape(num_chunks * chunk_size, crop_size, crop_size, -1)[:r]


def roi_crop_pool(feature_map, rois, im_shape, crop_size=14, pool=True):
    """Full reference ROI pooling: normalize, crop 2S×2S-equivalent, max-pool.

    The reference crops ``pooled_size * 2`` (14×14) then 2×2/2 max-pools to
    7×7 (roi_pool.py:68-95). ``rois`` are (R, 4) xyxy in image coordinates;
    ``im_shape`` is the (height, width) the rois live in.

    Returns:
        (R, S/2, S/2, C) pooled crops when ``pool`` else (R, S, S, C).
    """
    h, w = im_shape[0], im_shape[1]
    x1, y1, x2, y2 = jnp.split(rois.astype(jnp.float32), 4, axis=-1)
    # Normalize by the image dims like the reference (roi_pool.py:55-66).
    boxes = jnp.concatenate(
        [y1 / h, x1 / w, y2 / h, x2 / w], axis=-1
    )
    crops = crop_and_resize(feature_map, boxes, crop_size)
    if not pool:
        return crops
    r, s, _, c = crops.shape
    crops = crops.reshape(r, s // 2, 2, s // 2, 2, c)
    return jnp.max(crops, axis=(2, 4))
