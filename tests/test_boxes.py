"""Geometry op tests: encode/decode round trip, IoU conventions, clipping.

Mirrors the reference's bbox_transform_test.py / bbox_overlap_test.py
coverage: encode∘decode identity (incl. randomized), known IoU values, and
numpy/jnp agreement.
"""

import numpy as np
import jax.numpy as jnp

from luminoth_tpu.ops import boxes as B
from luminoth_tpu.ops import np_boxes as NB


class TestEncodeDecode:
    def test_round_trip_identity(self, rng):
        anchors = np.array(
            [[10.0, 10.0, 20.0, 22.0], [0.0, 0.0, 255.0, 255.0], [5, 7, 60, 90]],
            dtype=np.float32,
        )
        gt = np.array(
            [[11, 13, 34, 31], [3, 4, 250, 250], [7, 8, 60, 85]], dtype=np.float32
        )
        deltas = B.encode(jnp.asarray(anchors), jnp.asarray(gt))
        decoded = B.decode(jnp.asarray(anchors), deltas)
        np.testing.assert_allclose(np.asarray(decoded), gt, atol=1e-3)

    def test_round_trip_randomized(self, rng):
        n = 64
        x1 = rng.uniform(0, 100, n)
        y1 = rng.uniform(0, 100, n)
        anchors = np.stack(
            [x1, y1, x1 + rng.uniform(1, 100, n), y1 + rng.uniform(1, 100, n)], axis=1
        ).astype(np.float32)
        gx1 = rng.uniform(0, 100, n)
        gy1 = rng.uniform(0, 100, n)
        gt = np.stack(
            [gx1, gy1, gx1 + rng.uniform(1, 100, n), gy1 + rng.uniform(1, 100, n)],
            axis=1,
        ).astype(np.float32)
        deltas = B.encode(jnp.asarray(anchors), jnp.asarray(gt))
        decoded = B.decode(jnp.asarray(anchors), deltas)
        np.testing.assert_allclose(np.asarray(decoded), gt, atol=1e-2)

    def test_variances(self, rng):
        anchors = np.array([[10.0, 10.0, 30.0, 30.0]], dtype=np.float32)
        gt = np.array([[12.0, 14.0, 29.0, 28.0]], dtype=np.float32)
        variances = [0.1, 0.2]
        deltas = B.encode(jnp.asarray(anchors), jnp.asarray(gt), variances)
        plain = B.encode(jnp.asarray(anchors), jnp.asarray(gt))
        np.testing.assert_allclose(
            np.asarray(deltas),
            np.asarray(plain) / np.array([0.1, 0.1, 0.2, 0.2]),
            rtol=1e-5,
        )
        decoded = B.decode(jnp.asarray(anchors), deltas, variances)
        np.testing.assert_allclose(np.asarray(decoded), gt, atol=1e-3)

    def test_numpy_twin_agrees(self, rng):
        anchors = rng.uniform(0, 50, (16, 2))
        anchors = np.concatenate(
            [anchors, anchors + rng.uniform(1, 50, (16, 2))], axis=1
        )
        gt = rng.uniform(0, 50, (16, 2))
        gt = np.concatenate([gt, gt + rng.uniform(1, 50, (16, 2))], axis=1)
        np.testing.assert_allclose(
            np.asarray(B.encode(jnp.asarray(anchors), jnp.asarray(gt))),
            NB.encode(anchors, gt),
            atol=1e-3,
        )
        deltas = NB.encode(anchors, gt)
        np.testing.assert_allclose(
            np.asarray(B.decode(jnp.asarray(anchors), jnp.asarray(deltas))),
            NB.decode(anchors, deltas),
            atol=1e-3,
        )

    def test_batched(self, rng):
        anchors = rng.uniform(0, 50, (2, 8, 4)).astype(np.float32)
        anchors[..., 2:] += 60
        gt = anchors + 3.0
        deltas = B.encode(jnp.asarray(anchors), jnp.asarray(gt))
        assert deltas.shape == (2, 8, 4)
        decoded = B.decode(jnp.asarray(anchors), deltas)
        np.testing.assert_allclose(np.asarray(decoded), gt, atol=1e-2)


class TestClipChangeOrder:
    def test_clip(self):
        bxs = jnp.asarray([[-5.0, -5.0, 120.0, 90.0], [10, 10, 20, 20]])
        out = np.asarray(B.clip_boxes(bxs, (100, 110)))
        np.testing.assert_allclose(out, [[0, 0, 109, 90], [10, 10, 20, 20]])

    def test_change_order_involution(self, rng):
        bxs = jnp.asarray(rng.uniform(0, 10, (5, 4)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(B.change_order(B.change_order(bxs))), np.asarray(bxs)
        )

    def test_numpy_clip_matches_jax(self, rng):
        bxs = rng.uniform(-30, 150, (12, 4)).astype(np.float32)
        np.testing.assert_allclose(
            NB.clip_boxes(bxs, (100, 110)),
            np.asarray(B.clip_boxes(jnp.asarray(bxs), (100, 110))),
            atol=1e-5,
        )

    def test_numpy_unmap(self):
        out = NB.unmap(np.asarray([[1.0, 2.0]]), 3, [1], fill=-1)
        np.testing.assert_allclose(out, [[-1, -1], [1, 2], [-1, -1]])
        out1d = NB.unmap(np.asarray([7.0]), 3, [2], fill=0)
        np.testing.assert_allclose(out1d, [0, 0, 7])


class TestIoU:
    def test_known_values(self):
        a = jnp.asarray([[0.0, 0.0, 9.0, 9.0]])  # 10x10 box (+1 convention)
        b = jnp.asarray([[0.0, 0.0, 9.0, 9.0], [5.0, 5.0, 14.0, 14.0], [20, 20, 30, 30]])
        iou = np.asarray(B.iou_matrix(a, b))[0]
        np.testing.assert_allclose(iou[0], 1.0)
        np.testing.assert_allclose(iou[1], 25.0 / 175.0, rtol=1e-5)
        np.testing.assert_allclose(iou[2], 0.0)

    def test_matches_numpy(self, rng):
        a = rng.uniform(0, 50, (20, 2))
        a = np.concatenate([a, a + rng.uniform(1, 50, (20, 2))], axis=1)
        b = rng.uniform(0, 50, (30, 2))
        b = np.concatenate([b, b + rng.uniform(1, 50, (30, 2))], axis=1)
        np.testing.assert_allclose(
            np.asarray(B.iou_matrix(jnp.asarray(a), jnp.asarray(b))),
            NB.bbox_overlap(a, b),
            atol=1e-5,
        )
