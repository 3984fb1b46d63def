"""ROI crop-and-resize tests against a numpy golden implementation.

Mirrors the reference's roi_pool_test.py: crop+maxpool equivalence, with
TF ``crop_and_resize`` sampling semantics verified numerically.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from luminoth_tpu.ops.roi_align import crop_and_resize, roi_crop_pool


def np_crop_and_resize(fm, boxes, size):
    """Golden TF-semantics bilinear crop in numpy."""
    h, w, c = fm.shape
    out = np.zeros((len(boxes), size, size, c), np.float64)
    for r, (y1, x1, y2, x2) in enumerate(boxes):
        for i in range(size):
            if size > 1:
                y = y1 * (h - 1) + i * (y2 - y1) * (h - 1) / (size - 1)
            else:
                y = 0.5 * (y1 + y2) * (h - 1)
            for j in range(size):
                if size > 1:
                    x = x1 * (w - 1) + j * (x2 - x1) * (w - 1) / (size - 1)
                else:
                    x = 0.5 * (x1 + x2) * (w - 1)
                if y < 0 or y > h - 1 or x < 0 or x > w - 1:
                    continue  # extrapolation value 0
                y0, x0 = int(np.floor(y)), int(np.floor(x))
                y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
                fy, fx = y - y0, x - x0
                top = fm[y0, x0] * (1 - fx) + fm[y0, x1i] * fx
                bot = fm[y1i, x0] * (1 - fx) + fm[y1i, x1i] * fx
                out[r, i, j] = top * (1 - fy) + bot * fy
    return out


class TestCropAndResize:
    def test_matches_golden(self, rng):
        fm = rng.randn(16, 20, 3).astype(np.float32)
        boxes = np.asarray(
            [
                [0.0, 0.0, 1.0, 1.0],
                [0.25, 0.1, 0.8, 0.9],
                [0.5, 0.5, 0.55, 0.6],
            ],
            np.float32,
        )
        got = np.asarray(crop_and_resize(jnp.asarray(fm), jnp.asarray(boxes), 8))
        want = np_crop_and_resize(fm, boxes, 8)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_out_of_bounds_extrapolates_zero(self, rng):
        fm = np.abs(rng.randn(10, 10, 2)).astype(np.float32) + 1.0
        boxes = np.asarray([[-0.5, -0.5, 0.2, 0.2]], np.float32)
        got = np.asarray(crop_and_resize(jnp.asarray(fm), jnp.asarray(boxes), 6))
        want = np_crop_and_resize(fm, boxes, 6)
        np.testing.assert_allclose(got, want, atol=1e-4)
        assert got[0, 0, 0, 0] == 0.0  # fully outside corner

    def test_chunked_path_matches(self, rng):
        fm = rng.randn(12, 12, 4).astype(np.float32)
        n = 70
        y1 = rng.uniform(0, 0.5, n)
        x1 = rng.uniform(0, 0.5, n)
        boxes = np.stack(
            [y1, x1, y1 + rng.uniform(0.1, 0.5, n),
             x1 + rng.uniform(0.1, 0.5, n)], axis=1
        ).astype(np.float32)
        full = np.asarray(
            crop_and_resize(jnp.asarray(fm), jnp.asarray(boxes), 4,
                            chunk_size=512)
        )
        chunked = np.asarray(
            crop_and_resize(jnp.asarray(fm), jnp.asarray(boxes), 4,
                            chunk_size=16)
        )
        np.testing.assert_allclose(full, chunked, atol=1e-5)

    def test_identity_crop_size_matches_map(self):
        fm = np.arange(5 * 5 * 1, dtype=np.float32).reshape(5, 5, 1)
        boxes = np.asarray([[0, 0, 1, 1]], np.float32)
        got = np.asarray(crop_and_resize(jnp.asarray(fm), jnp.asarray(boxes), 5))
        np.testing.assert_allclose(got[0], fm, atol=1e-5)


class TestRectangularCrop:
    def test_rect_crop_matches_tf(self, rng):
        tf = pytest.importorskip("tensorflow")
        fm = rng.randn(17, 21, 3).astype(np.float32)
        boxes = np.asarray(
            [[0.1, 0.2, 0.7, 0.9], [0.0, 0.0, 1.0, 1.0]], np.float32
        )
        got = np.asarray(
            crop_and_resize(jnp.asarray(fm), jnp.asarray(boxes), (6, 10))
        )
        want = tf.image.crop_and_resize(
            fm[None], boxes, np.zeros(len(boxes), np.int32), [6, 10]
        ).numpy()
        assert got.shape == (2, 6, 10, 3)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_rect_pool_shape(self, rng):
        fm = rng.randn(16, 16, 2).astype(np.float32)
        rois = jnp.asarray([[0.0, 0.0, 127.0, 127.0]])
        out = np.asarray(
            roi_crop_pool(
                jnp.asarray(fm), rois, (128.0, 128.0), crop_size=(10, 14)
            )
        )
        assert out.shape == (1, 5, 7, 2)


class TestRoiCropPool:
    def test_pool_shape_and_max(self, rng):
        fm = rng.randn(16, 16, 8).astype(np.float32)
        rois = jnp.asarray([[0.0, 0.0, 127.0, 127.0]])  # image coords
        out = np.asarray(
            roi_crop_pool(jnp.asarray(fm), rois, (128.0, 128.0), crop_size=14)
        )
        assert out.shape == (1, 7, 7, 8)
        # Max-pool: each output ≥ the mean of its window (sanity).
        unpooled = np.asarray(
            roi_crop_pool(
                jnp.asarray(fm), rois, (128.0, 128.0), crop_size=14,
                pool=False,
            )
        )
        win = unpooled[0].reshape(7, 2, 7, 2, 8).max(axis=(1, 3))
        np.testing.assert_allclose(out[0], win, atol=1e-6)


class TestAgainstTF:
    """Direct cross-check vs tf.image.crop_and_resize — the exact op the
    reference calls for ROI pooling (roi_pool.py:75)."""

    def test_crop_matches_tf(self, rng):
        tf = pytest.importorskip("tensorflow")
        fm = rng.randn(23, 31, 5).astype(np.float32)
        # Mix of in-bounds, degenerate, and out-of-bounds boxes.
        y1 = rng.uniform(-0.2, 0.9, 40)
        x1 = rng.uniform(-0.2, 0.9, 40)
        boxes = np.stack(
            [y1, x1, y1 + rng.uniform(0.0, 0.5, 40),
             x1 + rng.uniform(0.0, 0.5, 40)], axis=1
        ).astype(np.float32)
        got = np.asarray(
            crop_and_resize(jnp.asarray(fm), jnp.asarray(boxes), 14)
        )
        want = tf.image.crop_and_resize(
            fm[None], boxes, np.zeros(len(boxes), np.int32), [14, 14]
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    def test_roi_crop_pool_matches_tf_chain(self, rng):
        """Full reference chain: normalize by im_shape → crop 14×14 →
        2×2/2 max-pool (roi_pool.py:37-95)."""
        tf = pytest.importorskip("tensorflow")
        fm = rng.randn(38, 50, 4).astype(np.float32)
        im_shape = (608.0, 800.0)
        x1 = rng.uniform(0, 700, 24)
        y1 = rng.uniform(0, 500, 24)
        rois = np.stack(
            [x1, y1, x1 + rng.uniform(10, 100, 24),
             y1 + rng.uniform(10, 100, 24)], axis=1
        ).astype(np.float32)

        got = np.asarray(roi_crop_pool(
            jnp.asarray(fm), jnp.asarray(rois), im_shape, crop_size=14
        ))

        norm = np.stack(
            [rois[:, 1] / im_shape[0], rois[:, 0] / im_shape[1],
             rois[:, 3] / im_shape[0], rois[:, 2] / im_shape[1]], axis=1
        )
        crops = tf.image.crop_and_resize(
            fm[None], norm, np.zeros(len(rois), np.int32), [14, 14]
        )
        want = tf.nn.max_pool2d(crops, ksize=2, strides=2,
                                padding="VALID").numpy()
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
