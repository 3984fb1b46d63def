"""Image resize + augmentation op tests (mirrors reference image_test.py)."""

import numpy as np
import pytest

from luminoth_tpu.utils.image import (
    adjust_bboxes,
    apply_data_augmentation,
    expand,
    flip_image,
    patch_image,
    random_distortion,
    random_patch,
    random_resize,
    resize_image,
    resize_image_fixed,
)


def make_image(h=40, w=60):
    rng = np.random.RandomState(0)
    return rng.uniform(0, 255, (h, w, 3)).astype(np.float32)


BOXES = np.asarray([[10, 5, 30, 25, 1], [40, 20, 55, 35, 0]], np.float32)


class TestResize:
    def test_upscale_min_size(self):
        out = resize_image(make_image(40, 60), BOXES, min_size=80)
        assert out["image"].shape[0] == 80
        assert out["scale_factor"] == 2.0
        np.testing.assert_allclose(out["bboxes"][0, :4], [20, 10, 60, 50])
        np.testing.assert_allclose(out["bboxes"][:, 4], BOXES[:, 4])

    def test_downscale_max_size(self):
        out = resize_image(make_image(40, 60), BOXES, max_size=30)
        assert out["image"].shape[1] == 30
        assert out["scale_factor"] == 0.5

    def test_no_change_within_bounds(self):
        out = resize_image(make_image(40, 60), BOXES, min_size=30, max_size=100)
        assert out["scale_factor"] == 1.0
        assert out["image"].shape == (40, 60, 3)

    def test_max_caps_min_upscale(self):
        # min would upscale 2x but max caps the long side.
        out = resize_image(make_image(40, 60), BOXES, min_size=80, max_size=90)
        assert out["image"].shape[1] == 90
        np.testing.assert_allclose(out["scale_factor"], 1.5)

    def test_fixed(self):
        out = resize_image_fixed(make_image(40, 60), 20, 120, BOXES)
        assert out["image"].shape == (20, 120, 3)
        np.testing.assert_allclose(out["bboxes"][0, :4], [20, 2.5, 60, 12.5])


class TestFlip:
    def test_left_right_box_math(self):
        image = make_image(40, 60)
        out = flip_image(image, BOXES, left_right=True, up_down=False)
        np.testing.assert_allclose(
            out["image"], image[:, ::-1], atol=1e-6
        )
        # x-coords mirror: x1' = W-1-x2, x2' = W-1-x1
        np.testing.assert_allclose(out["bboxes"][0, :4], [29, 5, 49, 25])
        # double flip = identity
        back = flip_image(out["image"], out["bboxes"], left_right=True)
        np.testing.assert_allclose(back["bboxes"], BOXES)

    def test_up_down(self):
        out = flip_image(make_image(40, 60), BOXES, left_right=False,
                         up_down=True)
        np.testing.assert_allclose(out["bboxes"][0, :4], [10, 14, 30, 34])


class TestPatch:
    def test_keeps_boxes_with_center_inside(self):
        image = make_image(40, 60)
        # Patch covering only the first box's center.
        out = patch_image(image, BOXES, offset_height=0, offset_width=0,
                          target_height=30, target_width=35)
        assert out["image"].shape == (40, 60, 3)  # resized back
        assert out["bboxes"].shape[0] == 1
        assert out["bboxes"][0, 4] == 1

    def test_no_surviving_boxes_returns_original(self):
        image = make_image(40, 60)
        out = patch_image(image, BOXES, offset_height=36, offset_width=56,
                          target_height=4, target_width=4)
        np.testing.assert_allclose(out["image"], image)
        np.testing.assert_allclose(out["bboxes"], BOXES)

    def test_random_patch_valid(self):
        rng = np.random.RandomState(3)
        out = random_patch(make_image(40, 60), BOXES, min_height=20,
                           min_width=20, rng=rng)
        assert out["image"].shape == (40, 60, 3)
        assert out["bboxes"].shape[1] == 5

    def test_random_patch_min_larger_than_image(self):
        # Reference testRandomPatchLargerThanImage: min dims above the
        # image size clamp to the image instead of failing.
        rng = np.random.RandomState(5)
        out = random_patch(make_image(40, 60), BOXES, min_height=400,
                           min_width=600, rng=rng)
        assert out["image"].shape == (40, 60, 3)
        assert out["bboxes"].shape[0] >= 1

    def test_patch_without_boxes(self):
        # Reference testRandomPatchOnlyImage: bboxes=None is supported.
        out = patch_image(make_image(40, 60), None, offset_height=5,
                          offset_width=5, target_height=20, target_width=30)
        assert out["image"].shape == (40, 60, 3)
        assert "bboxes" not in out


class TestExpandAndDistort:
    def test_expand_shifts_boxes(self):
        rng = np.random.RandomState(0)
        image = make_image(40, 60)
        out = expand(image, BOXES, min_ratio=2, max_ratio=2, rng=rng)
        assert out["image"].shape[0] == 80
        assert out["image"].shape[1] == 120
        # width/height preserved
        w0 = BOXES[0, 2] - BOXES[0, 0]
        w1 = out["bboxes"][0, 2] - out["bboxes"][0, 0]
        np.testing.assert_allclose(w0, w1)

    def test_distortion_shape_and_range(self):
        rng = np.random.RandomState(0)
        out = random_distortion(
            make_image(), BOXES,
            brightness={"max_delta": 0.2},
            contrast={"lower": 0.8, "upper": 1.2},
            hue={"max_delta": 0.1},
            saturation={"lower": 0.8, "upper": 1.2},
            rng=rng,
        )
        assert out["image"].shape == (40, 60, 3)
        assert out["image"].min() >= 0 and out["image"].max() <= 255
        np.testing.assert_allclose(out["bboxes"], BOXES)

    def test_random_resize_bounds(self):
        rng = np.random.RandomState(0)
        out = random_resize(make_image(), BOXES, min_size=20, max_size=30,
                            rng=rng)
        assert 20 <= out["image"].shape[0] <= 30
        assert 20 <= out["image"].shape[1] <= 30


class TestApplyAugmentation:
    def test_probability_gate(self):
        image = make_image()

        class NeverRng:
            def uniform(self, *a, **k):
                return 0.99  # above any prob

        out_img, out_boxes = apply_data_augmentation(
            [{"flip": {"left_right": True, "prob": 0.5}}],
            image, BOXES, NeverRng(),
        )
        np.testing.assert_allclose(out_img, image)

    def test_chain_runs(self):
        rng = np.random.RandomState(0)
        strategies = [
            {"flip": {"left_right": True, "up_down": False, "prob": 1.0}},
            {"expand": {"prob": 1.0, "min_ratio": 1, "max_ratio": 2}},
        ]
        out_img, out_boxes = apply_data_augmentation(
            strategies, make_image(), BOXES, rng
        )
        assert out_img.shape[0] >= 40
        assert out_boxes.shape == BOXES.shape

    def test_adjust_bboxes_preserves_labels(self):
        out = adjust_bboxes(BOXES, 40, 60, 80, 120)
        np.testing.assert_allclose(out[:, 4], BOXES[:, 4])
        np.testing.assert_allclose(out[0, :4], [20, 10, 60, 50])


class TestTF1ResizeCompat:
    """resize_method: tf1 reproduces the reference's TF1 legacy grid."""

    def test_matches_tf1_resize_bilinear(self):
        tf = pytest.importorskip("tensorflow")

        from luminoth_tpu.utils.image import _resize_tf1

        rng = np.random.RandomState(0)
        for (h, w, nh, nw) in ((37, 53, 600, 800), (300, 300, 120, 90),
                               (48, 64, 48, 64)):
            img = rng.rand(h, w, 3).astype(np.float32) * 255.0
            got = _resize_tf1(img, nh, nw)
            want = tf.compat.v1.image.resize_bilinear(
                img[None], (nh, nw), align_corners=False,
                half_pixel_centers=False,
            ).numpy()[0]
            # Accumulation-order noise only: 0.05 of 255 intensity. A
            # grid misalignment would show up as O(pixel-delta) errors.
            np.testing.assert_allclose(got, want, atol=5e-2, rtol=1e-3)

    def test_config_plumbing(self):
        from luminoth_tpu.datasets.object_detection_dataset import (
            preprocess_image,
        )
        from luminoth_tpu.utils.config import Config
        from luminoth_tpu.utils.image import _resize_tf1

        rng = np.random.RandomState(1)
        img = rng.rand(40, 60, 3).astype(np.float32) * 255.0
        cfg = Config({
            "dataset": {"image_preprocessing": {
                "min_size": 80, "max_size": 120, "resize_method": "tf1",
            }},
        })
        out = preprocess_image(cfg, img)["image"]
        np.testing.assert_allclose(
            out, _resize_tf1(img, out.shape[0], out.shape[1])
        )
