"""Anchor generation + loss tests."""

import numpy as np
import jax.numpy as jnp

from luminoth_tpu.ops.anchors import generate_anchors_reference, generate_anchors_grid
from luminoth_tpu.ops.losses import smooth_l1_loss, softmax_cross_entropy


class TestAnchorsReference:
    def test_shapes_and_centering(self):
        ref = generate_anchors_reference(256, [0.5, 1, 2], [0.25, 0.5, 1, 2])
        assert ref.shape == (12, 4)
        centers_x = (ref[:, 0] + ref[:, 2]) / 2
        centers_y = (ref[:, 1] + ref[:, 3]) / 2
        np.testing.assert_allclose(centers_x, 0, atol=1e-6)
        np.testing.assert_allclose(centers_y, 0, atol=1e-6)

    def test_aspect_ratios(self):
        ref = generate_anchors_reference(64, [0.5, 1, 2], [1.0])
        h = ref[:, 3] - ref[:, 1] + 1
        w = ref[:, 2] - ref[:, 0] + 1
        # ratio = height / width; +1 conventions make it approximate
        np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=0.1)

    def test_area_scaling(self):
        ref = generate_anchors_reference(32, [1.0], [1.0, 2.0])
        w = ref[:, 2] - ref[:, 0]
        assert abs((w[1] + 1) / (w[0] + 1) - 2.0) < 0.1

    def test_too_small_raises(self):
        import pytest

        with pytest.raises(ValueError):
            generate_anchors_reference(1, [4.0], [0.1])


class TestAnchorsGrid:
    def test_grid(self):
        ref = generate_anchors_reference(64, [1.0], [1.0, 2.0])
        grid = np.asarray(generate_anchors_grid(ref, 16, (3, 4)))
        assert grid.shape == (3 * 4 * 2, 4)
        # First cell anchors are the reference itself.
        np.testing.assert_allclose(grid[:2], ref, atol=1e-5)
        # Ordering: x fastest, then y; anchors innermost.
        np.testing.assert_allclose(grid[2], ref[0] + [16, 0, 16, 0], atol=1e-5)
        np.testing.assert_allclose(grid[4 * 2], ref[0] + [0, 16, 0, 16], atol=1e-5)


class TestLosses:
    def test_smooth_l1_regimes(self):
        pred = jnp.asarray([[0.0, 0.0, 0.0, 2.0]])
        target = jnp.asarray([[0.05, 0.0, 0.0, 0.0]])
        # sigma=3: threshold 1/9; 0.05 < 1/9 → quadratic; 2 ≥ 1/9 → linear
        loss = float(smooth_l1_loss(pred, target, sigma=3.0)[0])
        expected = 0.5 * 9 * 0.05**2 + (2.0 - 0.5 / 9)
        np.testing.assert_allclose(loss, expected, rtol=1e-5)

    def test_smooth_l1_zero(self):
        x = jnp.zeros((3, 4))
        np.testing.assert_allclose(np.asarray(smooth_l1_loss(x, x)), 0.0)

    def test_softmax_ce(self):
        logits = jnp.asarray([[10.0, 0.0], [0.0, 10.0]])
        labels = jnp.asarray([[1.0, 0.0], [1.0, 0.0]])
        losses = np.asarray(softmax_cross_entropy(logits, labels))
        assert losses[0] < 1e-3
        assert losses[1] > 5.0
