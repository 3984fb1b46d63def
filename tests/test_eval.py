"""Evaluator tests: mAP/mAR computation scenarios."""

import numpy as np

from luminoth_tpu.eval import calculate_metrics


def make_output(dets_per_image, gts_per_image):
    """dets: list of (bboxes, classes, scores); gts: (bboxes, classes)."""
    out = {k: [] for k in
           ("bboxes", "classes", "scores", "gt_bboxes", "gt_classes")}
    for (b, c, s), (gb, gc) in zip(dets_per_image, gts_per_image):
        out["bboxes"].append(np.asarray(b, np.float64).reshape(-1, 4))
        out["classes"].append(np.asarray(c, np.int64))
        out["scores"].append(np.asarray(s, np.float64))
        out["gt_bboxes"].append(np.asarray(gb, np.float64).reshape(-1, 4))
        out["gt_classes"].append(np.asarray(gc, np.int64))
    return out


BOX = [10, 10, 50, 50]
BOX_FAR = [100, 100, 140, 140]


class TestCalculateMetrics:
    def test_perfect_detection(self):
        out = make_output(
            [([BOX], [0], [0.9])],
            [([BOX], [0])],
        )
        ap, ar = calculate_metrics(out, num_classes=1)
        np.testing.assert_allclose(ap, 1.0, atol=0.01)
        np.testing.assert_allclose(ar, 1.0)

    def test_zero_batches(self):
        # An empty split (or max_batches=0) must report zero metrics,
        # not crash on zip(*[]).
        out = make_output([], [])
        ap, ar = calculate_metrics(out, num_classes=3)
        np.testing.assert_allclose(ap, 0.0)
        np.testing.assert_allclose(ar, 0.0)

    def test_completely_missed(self):
        out = make_output(
            [([BOX_FAR], [0], [0.9])],
            [([BOX], [0])],
        )
        ap, ar = calculate_metrics(out, num_classes=1)
        np.testing.assert_allclose(ap, 0.0)
        np.testing.assert_allclose(ar, 0.0)

    def test_duplicate_detection_is_fp(self):
        # Two detections of the same gt: second is a false positive, so
        # precision at rank 2 is 0.5 but AP (interpolated) stays 1.0 at the
        # single recall point... with 1 gt: recall hits 1.0 at rank 1,
        # precision 1.0 → AP 1.0 despite the duplicate.
        out = make_output(
            [([BOX, BOX], [0, 0], [0.9, 0.8])],
            [([BOX], [0])],
        )
        ap, _ = calculate_metrics(out, num_classes=1)
        np.testing.assert_allclose(ap, 1.0, atol=0.01)

    def test_lower_confidence_wrong_box(self):
        # One TP at 0.9 + one FP at 0.95 (higher confidence, wrong place):
        # precision at recall 1.0 is 0.5.
        out = make_output(
            [([BOX_FAR, BOX], [0, 0], [0.95, 0.9])],
            [([BOX], [0])],
        )
        ap, _ = calculate_metrics(out, num_classes=1)
        np.testing.assert_allclose(ap[0], 0.5, atol=0.01)

    def test_iou_threshold_sweep(self):
        # A detection with IoU ~0.6 counts for thresholds <= 0.6 only.
        det = [10, 10, 50, 50]
        gt = [10, 10, 50, 60]  # IoU = 41*41 / (41*51) ≈ 0.80
        out = make_output([([det], [0], [0.9])], [([gt], [0])])
        ap, _ = calculate_metrics(out, num_classes=1)
        # thresholds 0.5..0.8 → TP; 0.85..0.95 → FP
        np.testing.assert_allclose(ap[0, 0], 1.0, atol=1e-6)  # @0.5
        np.testing.assert_allclose(ap[0, -1], 0.0, atol=1e-9)  # @0.95
        assert 0 < ap.mean() < 1

    def test_multiclass_and_empty_class(self):
        out = make_output(
            [([BOX, BOX_FAR], [0, 1], [0.9, 0.8])],
            [([BOX, BOX_FAR], [0, 1])],
        )
        ap, ar = calculate_metrics(out, num_classes=3)
        np.testing.assert_allclose(ap[0], 1.0, atol=0.01)
        np.testing.assert_allclose(ap[1], 1.0, atol=0.01)
        np.testing.assert_allclose(ap[2], 0.0)  # no gt, no detections

    def test_multiple_images_accumulate(self):
        out = make_output(
            [
                ([BOX], [0], [0.9]),
                ([BOX_FAR], [0], [0.8]),
            ],
            [
                ([BOX], [0]),
                ([BOX], [0]),  # second image missed
            ],
        )
        ap, ar = calculate_metrics(out, num_classes=1)
        # Recall 0.5 with precision 1.0 up to that point, then FP.
        assert 0.4 < ap[0, 0] <= 0.51
        np.testing.assert_allclose(ar[0], 0.5)


def test_dp_eval_matches_single_device(tmp_path):
    """evaluate_once over a 2-device mesh == single device: identical
    detections (hence AP) and near-identical mean losses."""
    from test_integration import write_dataset, build_tiny_config

    import jax
    from luminoth_tpu.eval import _eval_mesh, evaluate_once
    from luminoth_tpu.models import get_model
    from luminoth_tpu.utils.config import to_plain

    data_dir = write_dataset(tmp_path)
    config = build_tiny_config(data_dir, str(tmp_path))
    model = get_model("fasterrcnn")(to_plain(config))
    dataset_batch = np.zeros(
        (config.train.batch_size, 96, 96, 3), np.float32
    )
    variables = model.init(jax.random.PRNGKey(0), dataset_batch)

    single = evaluate_once(config, model, variables, max_batches=2)
    mesh = _eval_mesh(int(config.train.batch_size))
    assert mesh is not None and mesh.size == 2
    dp = evaluate_once(
        config, model, variables, max_batches=2, mesh=mesh
    )
    assert dp["images"] == single["images"]
    np.testing.assert_allclose(dp["AP@0.5"], single["AP@0.5"], atol=1e-6)
    np.testing.assert_allclose(
        dp["losses/total_loss"], single["losses/total_loss"], rtol=1e-4
    )


def test_evaluate_once_covers_all_images(tmp_path):
    """7 images at batch 3: the evaluator pads the final batch and skips
    the padded rows — every image evaluated exactly once (the plain
    dataset would drop the remainder)."""
    import jax.numpy as jnp

    from luminoth_tpu.eval import evaluate_once
    from test_dataset import ssd_like_config, write_split

    data_dir = write_split(tmp_path, n=7)
    config = ssd_like_config(data_dir, batch_size=3)
    config.model = type(config)({"network": {"num_classes": 3}})

    def fake_forward(variables, image, gt_boxes, im_shape):
        b = image.shape[0]
        g = gt_boxes.shape[1]
        objects = gt_boxes[:, :, :4]
        labels = gt_boxes[:, :, 4].astype(jnp.int32)
        valid = gt_boxes[:, :, 4] >= 0
        probs = jnp.where(valid, 1.0, 0.0)
        del b, g
        return objects, labels, probs, valid, {"total_loss": jnp.asarray(0.0)}

    metrics = evaluate_once(config, None, None, forward=fake_forward)
    assert metrics["images"] == 7
    np.testing.assert_allclose(metrics["AP@0.5"], 1.0, atol=1e-9)


class TestEvalConfigMutations:
    """Pin reference-eval NMS candidate semantics (reference eval.py:52-89).

    The 512 ``pre_nms_max_candidates`` default is a serving profile;
    eval must NMS all proposals per class like the reference, so the
    mutation helper must force the cap to 0 regardless of config.
    """

    def test_fasterrcnn_eval_uncaps_nms_candidates(self, tmp_path):
        from luminoth_tpu.eval import apply_eval_config_mutations
        from luminoth_tpu.utils.config import get_config

        cfg_file = tmp_path / "c.yml"
        cfg_file.write_text("model:\n  type: fasterrcnn\n")
        config = get_config([str(cfg_file)])
        assert config.model.rcnn.proposals.pre_nms_max_candidates == 512
        apply_eval_config_mutations(config, "val", max_detections=100)
        assert config.model.rcnn.proposals.pre_nms_max_candidates == 0
        assert config.model.rcnn.proposals.min_prob_threshold == 0.0
        assert config.model.rcnn.proposals.total_max_detections == 100
        assert config.dataset.data_augmentation is None
        assert config.train.num_epochs == 1

    def test_ssd_eval_mutations(self, tmp_path):
        from luminoth_tpu.eval import apply_eval_config_mutations
        from luminoth_tpu.utils.config import get_config

        cfg_file = tmp_path / "c.yml"
        cfg_file.write_text("model:\n  type: ssd\n")
        config = get_config([str(cfg_file)])
        apply_eval_config_mutations(config, "val", max_detections=100)
        assert config.model.proposals.min_prob_threshold == 0.0
        assert config.model.proposals.total_max_detections == 100
