"""Image resize + data-augmentation ops (host-side numpy/cv2).

reference: luminoth/utils/image.py (resize_image :38-114, fixed :117-147,
patch :150-315, flip :318-370, random_patch :373-449, random_resize
:452-498, random_distortion :501-566, expand :569-620).

TPU-first design change: the reference runs augmentation inside the TF graph;
here augmentation runs on the host in the data-loader workers (numpy/cv2),
and the accelerator receives fixed-size, already-augmented batches. Bounding
boxes are (N, 5) float arrays ``(x1, y1, x2, y2, label)``; images are
(H, W, 3) in 0-255 scale, uint8 or float32 — every geometric op preserves
the input dtype (the loader keeps the pipeline uint8 end to end, 4x less
memory traffic on this host-bound stage; only ``random_distortion``'s
photometric arithmetic promotes to float32).
"""

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover - cv2 is in the image
    cv2 = None


def settle_transfer_dtype(image, transfer_dtype):
    """Coerce an image to the configured device-transfer dtype.

    One definition shared by the training loader and the serving path so
    the two can never drift: uint8 rounds-and-clips (lossless for
    integer-valued pixels), anything else becomes float32.
    """
    if transfer_dtype == np.uint8:
        if image.dtype != np.uint8:
            return np.clip(np.rint(image), 0.0, 255.0).astype(np.uint8)
        return image
    if image.dtype != np.float32:
        return image.astype(np.float32)
    return image


def _resize_tf1(image, new_height, new_width):
    """Bilinear resize on the TF1 legacy grid (src = dst_idx · scale).

    The reference ran under TF 1.x, whose ``tf.image.resize_images``
    defaulted to ``align_corners=False, half_pixel_centers=False`` — the
    legacy sampling grid, shifted ~half a pixel from the modern
    (cv2 / TF2) half-pixel-centers grid. Matches
    ``tf.compat.v1.image.resize_bilinear`` to float noise
    (tests/test_image_ops.py); used via
    ``dataset.image_preprocessing.resize_method: tf1`` for
    reference-checkpoint parity evaluations.
    """
    img = np.asarray(image)
    dtype = img.dtype
    img = img.astype(np.float32)
    h, w = img.shape[:2]
    new_height, new_width = int(new_height), int(new_width)
    ys = np.arange(new_height) * (h / new_height)
    xs = np.arange(new_width) * (w / new_width)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    top = img[y0][:, x0] * (1 - fx) + img[y0][:, x1] * fx
    bot = img[y1][:, x0] * (1 - fx) + img[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    if dtype == np.uint8:
        return np.clip(np.rint(out), 0, 255).astype(np.uint8)
    return out.astype(dtype)


def _resize(image, new_height, new_width, method=None):
    new_height, new_width = int(new_height), int(new_width)
    if (new_height, new_width) == image.shape[:2]:
        # Identity resize (scale 1.0, already-sized datasets): skip the
        # full-image resample on the host-bound loader hot path.
        return image
    if method == "tf1":
        return _resize_tf1(image, new_height, new_width)
    if cv2 is not None:
        # dtype-preserving: cv2's uint8 bilinear path is ~2x the float one.
        return cv2.resize(
            np.ascontiguousarray(image),
            (new_width, new_height),
            interpolation=cv2.INTER_LINEAR,
        )
    # PIL fallback
    from PIL import Image

    arr = np.asarray(
        Image.fromarray(np.clip(image, 0, 255).astype(np.uint8)).resize(
            (new_width, new_height), Image.BILINEAR
        )
    )
    return arr.astype(image.dtype)


def adjust_bboxes(bboxes, old_height, old_width, new_height, new_width):
    """Rescale (N, 5) boxes between image sizes, preserving labels."""
    bboxes = np.asarray(bboxes, dtype=np.float32)
    if bboxes.size == 0:
        return bboxes
    out = bboxes.copy()
    out[:, 0] = bboxes[:, 0] / old_width * new_width
    out[:, 1] = bboxes[:, 1] / old_height * new_height
    out[:, 2] = bboxes[:, 2] / old_width * new_width
    out[:, 3] = bboxes[:, 3] / old_height * new_height
    return out


def resize_image(image, bboxes=None, min_size=None, max_size=None,
                 method=None):
    """Min/max-side resize returning a scale factor (FRCNN preprocessing)."""
    image = np.asarray(image)
    height, width = float(image.shape[0]), float(image.shape[1])

    upscale = max(float(min_size) / min(height, width), 1.0) if min_size else 1.0
    downscale = (
        min(float(max_size) / max(height, width), 1.0) if max_size else 1.0
    )
    scale_factor = upscale * downscale
    # The reference computes both factors on the original dims, so upscaling
    # to min_size can overflow max_size (utils/image.py:70-88). We clamp the
    # final scale so the long side never exceeds max_size — required for the
    # static padded canvas, and standard detection behavior.
    if max_size:
        scale_factor = min(
            scale_factor, float(max_size) / max(height, width)
        )

    new_height = height * scale_factor
    new_width = width * scale_factor
    image = _resize(image, new_height, new_width, method=method)

    result = {"image": image, "scale_factor": scale_factor}
    if bboxes is not None:
        result["bboxes"] = adjust_bboxes(
            bboxes, height, width, new_height, new_width
        )
    return result


def resize_image_fixed(image, new_height, new_width, bboxes=None,
                       method=None):
    """Fixed-size resize (SSD preprocessing)."""
    image = np.asarray(image)
    height, width = float(image.shape[0]), float(image.shape[1])
    out = _resize(image, new_height, new_width, method=method)
    result = {
        "image": out,
        "scale_factor": (new_height / height, new_width / width),
    }
    if bboxes is not None:
        result["bboxes"] = adjust_bboxes(
            bboxes, height, width, new_height, new_width
        )
    return result


def fit_to_canvas(image, canvas_hw, bboxes=None, method=None):
    """Downscale (aspect-preserving) so the image fits the canvas.

    No-op when it already fits. Used before padding: an image that fits
    no canvas bucket (e.g. a portrait image with only a landscape canvas
    configured) must be scaled down, never cropped — cropping would
    orphan gt/detection coordinates pointing at removed content.

    Returns dict(image, bboxes?, scale) where ``scale`` is the extra
    (sy, sx) factor applied on top of any earlier resize ((1.0, 1.0)
    when untouched).
    """
    image = np.asarray(image)
    h, w = image.shape[0], image.shape[1]
    ch, cw = int(canvas_hw[0]), int(canvas_hw[1])
    if h <= ch and w <= cw:
        out = {"image": image, "scale": (1.0, 1.0)}
        if bboxes is not None:
            out["bboxes"] = bboxes
        return out
    fit = min(ch / h, cw / w)
    nh = max(1, min(ch, int(round(h * fit))))
    nw = max(1, min(cw, int(round(w * fit))))
    result = resize_image_fixed(image, nh, nw, bboxes=bboxes, method=method)
    result["scale"] = (nh / h, nw / w)
    return result


def compose_scale(scale, extra):
    """Combine a scalar-or-(sy, sx) scale with an extra (sy, sx) factor."""
    sy, sx = extra
    if isinstance(scale, tuple):
        return (scale[0] * sy, scale[1] * sx)
    return (scale * sy, scale * sx)


def flip_image(image, bboxes=None, left_right=True, up_down=False):
    """Flip image (and boxes) on one or both axes."""
    image = np.asarray(image)
    height, width = image.shape[0], image.shape[1]
    if bboxes is not None:
        bboxes = np.asarray(bboxes, dtype=np.float32).copy()

    if left_right:
        image = image[:, ::-1]
        if bboxes is not None and bboxes.size:
            x1 = bboxes[:, 0].copy()
            bboxes[:, 0] = width - 1 - bboxes[:, 2]
            bboxes[:, 2] = width - 1 - x1
    if up_down:
        image = image[::-1]
        if bboxes is not None and bboxes.size:
            y1 = bboxes[:, 1].copy()
            bboxes[:, 1] = height - 1 - bboxes[:, 3]
            bboxes[:, 3] = height - 1 - y1

    result = {"image": np.ascontiguousarray(image)}
    if bboxes is not None:
        result["bboxes"] = bboxes
    return result


def patch_image(image, bboxes=None, offset_height=0, offset_width=0,
                target_height=None, target_width=None):
    """Crop a patch, keep boxes whose center lies inside, resize back.

    Mirrors the reference: the patch is resized back to the original image
    size and the original image is returned unchanged when no boxes survive.
    """
    image = np.asarray(image)
    im_h, im_w = image.shape[0], image.shape[1]
    target_height = target_height or im_h - offset_height
    target_width = target_width or im_w - offset_width

    patch = image[
        offset_height : offset_height + target_height,
        offset_width : offset_width + target_width,
    ]
    patch_h, patch_w = patch.shape[0], patch.shape[1]

    if bboxes is None:
        return {"image": _resize(patch, im_h, im_w)}

    bboxes = np.asarray(bboxes, dtype=np.float32)
    cx = (bboxes[:, 0] + bboxes[:, 2]) / 2.0
    cy = (bboxes[:, 1] + bboxes[:, 3]) / 2.0
    inside = (
        (cx > offset_width)
        & (cx < offset_width + target_width)
        & (cy > offset_height)
        & (cy < offset_height + target_height)
    )
    kept = bboxes[inside].copy()
    if kept.shape[0] < 1:
        return {"image": image, "bboxes": bboxes}

    kept[:, 0] = np.clip(kept[:, 0] - offset_width, 0, patch_w - 1)
    kept[:, 2] = np.clip(kept[:, 2] - offset_width, 0, patch_w - 1)
    kept[:, 1] = np.clip(kept[:, 1] - offset_height, 0, patch_h - 1)
    kept[:, 3] = np.clip(kept[:, 3] - offset_height, 0, patch_h - 1)

    new_image = _resize(patch, im_h, im_w)
    new_bboxes = adjust_bboxes(kept, patch_h, patch_w, im_h, im_w)
    return {"image": new_image, "bboxes": new_bboxes}


def random_patch(image, bboxes=None, min_height=600, min_width=600, rng=None):
    """Random crop with minimum size (reference :373-449)."""
    rng = rng or np.random
    im_h, im_w = image.shape[0], image.shape[1]
    min_height = min(min_height, im_h - 1)
    min_width = min(min_width, im_w - 1)

    offset_width = rng.randint(0, max(im_w - min_width, 1))
    offset_height = rng.randint(0, max(im_h - min_height, 1))
    target_width = rng.randint(
        min_width, max(im_w - offset_width, min_width + 1)
    )
    target_height = rng.randint(
        min_height, max(im_h - offset_height, min_height + 1)
    )
    return patch_image(
        image, bboxes=bboxes,
        offset_height=offset_height, offset_width=offset_width,
        target_height=target_height, target_width=target_width,
    )


def random_resize(image, bboxes=None, min_size=600, max_size=980, rng=None):
    """Resize to a random size within limits."""
    rng = rng or np.random
    new_h = rng.randint(min_size, max_size)
    new_w = rng.randint(min_size, max_size)
    im_h, im_w = image.shape[0], image.shape[1]
    out = _resize(image, new_h, new_w)
    result = {"image": out}
    if bboxes is not None:
        result["bboxes"] = adjust_bboxes(bboxes, im_h, im_w, new_h, new_w)
    return result


def random_distortion(image, bboxes=None, brightness=None, contrast=None,
                      hue=None, saturation=None, rng=None):
    """Photometric distortion: brightness/contrast/hue/saturation.

    Operates in 0-255 float scale (brightness/hue deltas follow TF's
    convention of being expressed in the [0, 1] scale and are mapped here).
    """
    rng = rng or np.random
    image = np.asarray(image, dtype=np.float32)

    if brightness is not None:
        max_delta = brightness.get("max_delta", 0.3)
        delta = rng.uniform(-max_delta, max_delta) * 255.0
        image = image + delta
    if contrast is not None:
        lower = contrast.get("lower", 0.8)
        upper = contrast.get("upper", 1.2)
        factor = rng.uniform(lower, upper)
        mean = image.mean(axis=(0, 1), keepdims=True)
        image = (image - mean) * factor + mean
    if (hue is not None or saturation is not None) and cv2 is not None:
        hsv = cv2.cvtColor(
            np.clip(image, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV
        ).astype(np.float32)
        if hue is not None:
            max_delta = hue.get("max_delta", 0.2)
            # cv2 hue range is [0, 180); delta in [0, 0.5] of the cycle.
            delta = rng.uniform(-max_delta, max_delta) * 180.0
            hsv[..., 0] = (hsv[..., 0] + delta) % 180.0
        if saturation is not None:
            lower = saturation.get("lower", 0.8)
            upper = saturation.get("upper", 1.2)
            hsv[..., 1] = hsv[..., 1] * rng.uniform(lower, upper)
        hsv = np.clip(hsv, 0, [179.0, 255.0, 255.0])
        image = cv2.cvtColor(
            hsv.astype(np.uint8), cv2.COLOR_HSV2RGB
        ).astype(np.float32)

    image = np.clip(image, 0.0, 255.0)
    result = {"image": image}
    if bboxes is not None:
        result["bboxes"] = np.asarray(bboxes, dtype=np.float32)
    return result


def expand(image, bboxes=None, fill=0, min_ratio=1, max_ratio=4, rng=None):
    """Zoom-out: pad the image into a larger canvas (reference :569-620)."""
    rng = rng or np.random
    image = np.asarray(image)
    height, width = image.shape[0], image.shape[1]
    ratio = rng.uniform(min_ratio, max_ratio)

    new_height = int(height * ratio)
    new_width = int(width * ratio)
    pad_top = int(rng.uniform(0, new_height - height))
    pad_left = int(rng.uniform(0, new_width - width))

    # A fill the image dtype can't represent exactly (fractional mean
    # pixel, out-of-range sentinel) promotes the canvas to float32.
    dtype = image.dtype
    if dtype == np.uint8 and (
        float(fill) != int(fill) or not 0 <= fill <= 255
    ):
        dtype = np.float32
    canvas = np.full((new_height, new_width, image.shape[2]), fill,
                     dtype=dtype)
    canvas[pad_top : pad_top + height, pad_left : pad_left + width] = image

    result = {"image": canvas}
    if bboxes is not None:
        bboxes = np.asarray(bboxes, dtype=np.float32).copy()
        if bboxes.size:
            bboxes[:, [0, 2]] += pad_left
            bboxes[:, [1, 3]] += pad_top
        result["bboxes"] = bboxes
    return result


# Registry mirroring the reference's DATA_AUGMENTATION_STRATEGIES
# (datasets/object_detection_dataset.py:9-15).
DATA_AUGMENTATION_STRATEGIES = {
    "flip": flip_image,
    "patch": random_patch,
    "resize": random_resize,
    "distortion": random_distortion,
    "expand": expand,
}

_RANDOMIZED = {"patch", "resize", "distortion", "expand"}


def apply_data_augmentation(strategies, image, bboxes, rng):
    """Apply the configured augmentation list, each with its probability.

    ``strategies`` is the config's list of single-key dicts, e.g.
    ``[{"flip": {"left_right": True, "prob": 0.5}}]``.
    """
    for entry in strategies or []:
        for name, kwargs in dict(entry).items():
            fn = DATA_AUGMENTATION_STRATEGIES.get(name)
            if fn is None:
                continue
            kwargs = {k: v for k, v in dict(kwargs or {}).items()}
            prob = kwargs.pop("prob", 1.0)
            if rng.uniform() >= prob:
                continue
            if name in _RANDOMIZED:
                kwargs["rng"] = rng
            result = fn(image, bboxes=bboxes, **kwargs)
            image = result["image"]
            bboxes = result.get("bboxes", bboxes)
    return image, bboxes
