"""Streaming evaluator: checkpoint watcher + COCO-style mAP/mAR.

reference: luminoth/eval.py (CLI + watch loop :23-223, get_checkpoints
:226-279, evaluate_once :282-484, calculate_metrics :487-653). The metric
computation stays on host in numpy — the accelerator only runs the forward
pass — matching the reference's split (SURVEY.md §3.3 boundary note).
"""

import logging
import os
import time

import click
import jax
import jax.numpy as jnp
import numpy as np

from luminoth_tpu.datasets import get_dataset
from luminoth_tpu.models import get_model
from luminoth_tpu.ops.np_boxes import bbox_overlap
from luminoth_tpu.utils import fileio
from luminoth_tpu.utils.config import get_config, to_plain
from luminoth_tpu.utils.training import model_dtype

logger = logging.getLogger(__name__)


def calculate_metrics(output_per_batch, num_classes):
    """Per-class AP/AR over IoU 0.50:0.95, 101-point interpolation.

    Greedy score-ordered matching: each detection matches its highest-IoU
    ground truth; a gt can be matched once per IoU threshold; duplicates are
    false positives (reference :487-653).

    Returns:
        ``(ap_per_class, ar_per_class)`` arrays of shape
        (num_classes, num_iou_thresholds).
    """
    iou_thresholds = np.linspace(0.50, 0.95, 10)
    rec_thresholds = np.linspace(0.0, 1.0, 101)

    tp_fp_by_class = [[] for _ in range(num_classes)]
    num_gt_per_class = [0] * num_classes

    num_batches = len(output_per_batch["bboxes"])
    for idx in range(num_batches):
        classes = np.asarray(output_per_batch["classes"][idx])
        bboxes = np.asarray(output_per_batch["bboxes"][idx])
        scores = np.asarray(output_per_batch["scores"][idx])
        gt_classes = np.asarray(output_per_batch["gt_classes"][idx])
        gt_bboxes = np.asarray(output_per_batch["gt_bboxes"][idx])

        for cls in range(num_classes):
            cls_bboxes = bboxes[classes == cls, :]
            cls_scores = scores[classes == cls]
            cls_gt_bboxes = gt_bboxes[gt_classes == cls, :]

            num_gt = cls_gt_bboxes.shape[0]
            num_gt_per_class[cls] += num_gt

            sorted_indices = np.argsort(-cls_scores)
            is_detected = np.zeros((num_gt, len(iou_thresholds)), bool)
            tp_fp = np.zeros((len(cls_scores), len(iou_thresholds)))

            if num_gt == 0:
                tp_fp_by_class[cls].append((tp_fp, cls_scores[sorted_indices]))
                continue

            ious = bbox_overlap(cls_bboxes, cls_gt_bboxes)
            for rank, bbox_idx in enumerate(sorted_indices):
                gt_match = int(np.argmax(ious[bbox_idx, :]))
                match_iou = ious[bbox_idx, gt_match]
                for iou_idx, thresh in enumerate(iou_thresholds):
                    if match_iou >= thresh and not is_detected[
                        gt_match, iou_idx
                    ]:
                        tp_fp[rank, iou_idx] = True
                        is_detected[gt_match, iou_idx] = True

            tp_fp_by_class[cls].append((tp_fp, cls_scores[sorted_indices]))

    ap_per_class = np.zeros((num_classes, len(iou_thresholds)))
    ar_per_class = np.zeros((num_classes, len(iou_thresholds)))
    for cls in range(num_classes):
        if not tp_fp_by_class[cls]:  # zero evaluated batches
            continue
        labels, scores = zip(*tp_fp_by_class[cls])
        labels = np.concatenate(labels)
        scores = np.concatenate(scores)
        num_examples = num_gt_per_class[cls]
        if num_examples == 0:
            continue

        order = np.argsort(-scores)
        true_positives = labels[order, :]
        false_positives = 1 - true_positives
        cum_tp = np.cumsum(true_positives, axis=0)
        cum_fp = np.cumsum(false_positives, axis=0)

        recall = cum_tp.astype(float) / num_examples
        with np.errstate(divide="ignore", invalid="ignore"):
            precision = np.where(
                (cum_tp + cum_fp) > 0, cum_tp / (cum_tp + cum_fp), 0.0
            )

        for iou_idx in range(len(iou_thresholds)):
            p = precision[:, iou_idx].copy()
            r = recall[:, iou_idx]
            # Monotone interpolation of the precision envelope.
            for i in range(len(p) - 1, 0, -1):
                if p[i] > p[i - 1]:
                    p[i - 1] = p[i]

            ap = 0.0
            inds = np.searchsorted(r, rec_thresholds)
            for pidx in inds:
                if pidx >= len(r):
                    break
                ap += p[pidx] / len(rec_thresholds)
            ap_per_class[cls, iou_idx] = ap
            ar_per_class[cls, iou_idx] = r[-1] if len(r) else 0.0

    return ap_per_class, ar_per_class


def get_checkpoints(run_dir, last_step=0):
    """New checkpoint steps in the run dir since ``last_step``."""
    from luminoth_tpu.utils.checkpoint_io import CheckpointManager

    ckpt_dir = fileio.join(run_dir, "ckpt")
    if not fileio.isdir(ckpt_dir):
        return []
    manager = CheckpointManager(ckpt_dir)
    return [s for s in manager.all_steps() if s > last_step]


def _build_forward(model, mesh=None):
    """Jitted eval forward; with a mesh, data-parallel over its devices.

    DP evaluation has no reference counterpart (the TF1 evaluator was a
    single session); here the batch axis shards over every chip of the
    mesh and the host gathers fixed-size detection arrays, so the
    streaming evaluator scales like the trainer does.
    """
    def forward(variables, image, gt_boxes, im_shape):
        if image.dtype == jnp.uint8:
            # dataset.transfer_dtype=uint8: cast back on device.
            image = image.astype(jnp.float32)
        preds = model.apply(
            variables, image, gt_boxes=gt_boxes, im_shape=im_shape,
            train=False,
        )
        cp = preds["classification_prediction"]
        losses = model.loss(preds, return_all=True)
        return (
            cp["objects"], cp["labels"], cp["probs"], cp["valid"], losses
        )

    if mesh is None:
        return jax.jit(forward)

    from luminoth_tpu.parallel.mesh import batch_sharding, replicate_sharding

    repl = replicate_sharding(mesh)
    data = batch_sharding(mesh)
    return jax.jit(forward, in_shardings=(repl, data, data, data))


def _eval_mesh(batch_size):
    """1-D data mesh over the largest device count dividing the batch."""
    n_dev = len(jax.devices())
    while batch_size % n_dev:
        n_dev -= 1
    if n_dev <= 1:
        return None
    from luminoth_tpu.parallel.mesh import make_mesh

    return make_mesh(num_devices=n_dev)


def evaluate_once(config, model, variables, writer=None, global_step=0,
                  forward=None, max_batches=None, files_per_class=0,
                  mesh=None):
    """Evaluate one checkpoint over the configured split.

    Returns a metrics dict (AP/AR aggregates and mean losses). When
    ``files_per_class`` > 0 and a writer is given, up to that many rendered
    detection images per class are written as image summaries (reference
    eval.py:351-380). With ``mesh``, the forward runs data-parallel
    (pass a ``forward`` built with the same mesh, or let this build it).
    """
    num_classes = int(config.model.network.num_classes)
    dataset = get_dataset(config.dataset.type)(
        config, shuffle=False, num_epochs=1, augment=False,
        pad_final_batch=True,
    )
    if forward is None:
        forward = _build_forward(model, mesh=mesh)
    if mesh is not None:
        from luminoth_tpu.parallel.mesh import replicate_sharding

        variables = jax.device_put(variables, replicate_sharding(mesh))

    saved_per_class = {}

    def maybe_save_images(batch, b, objects, labels, probs, keep):
        if writer is None or not files_per_class:
            return
        from luminoth_tpu.utils.image_vis import draw_object_predictions

        for cls in set(labels[keep].astype(int).tolist()):
            if saved_per_class.get(cls, 0) >= files_per_class:
                continue
            saved_per_class[cls] = saved_per_class.get(cls, 0) + 1
            img = draw_object_predictions(
                batch["image"][b],
                prediction_dict={
                    "objects": objects, "labels": labels, "probs": probs,
                    "valid": keep,
                },
                min_prob=0.5,
            )
            writer.add_image(
                f"{cls}/{saved_per_class[cls]}", img, global_step,
                dataformats="HWC",
            )

    output = {k: [] for k in
              ("bboxes", "classes", "scores", "gt_bboxes", "gt_classes")}
    loss_sums = {}
    count = 0
    start = time.time()
    total_images = 0

    from luminoth_tpu.train import prefetch_to_device

    def bounded():
        for batch_idx, batch in enumerate(dataset):
            if max_batches is not None and batch_idx >= max_batches:
                return
            yield batch

    # Two overlaps: batch k+1's upload is staged while k's forward runs
    # (prefetch_to_device), and k+1's forward is DISPATCHED before k's
    # outputs are fetched — JAX dispatch is async, so the device computes
    # k+1 while the host fetches k and accumulates its detections.
    pending = None

    def drain(pending_batch, outs):
        nonlocal count, total_images
        objects, labels, probs, valid, losses = jax.device_get(outs)
        # Final partial batches arrive padded (repeated rows at the
        # tail); skip them so every real image counts exactly once.
        batch_size = objects.shape[0] - int(
            pending_batch.get("pad_count", 0)
        )
        total_images += batch_size
        for b in range(batch_size):
            keep = valid[b].astype(bool)
            output["bboxes"].append(objects[b][keep])
            output["classes"].append(labels[b][keep])
            output["scores"].append(probs[b][keep])
            gt = pending_batch["gt_boxes"][b]
            gt_keep = gt[:, 4] >= 0
            output["gt_bboxes"].append(gt[gt_keep][:, :4])
            output["gt_classes"].append(gt[gt_keep][:, 4].astype(np.int64))
            maybe_save_images(
                pending_batch, b, objects[b], labels[b], probs[b], keep
            )
        # Weight each batch's mean loss by its REAL image count so a
        # padded final batch (whose mean over-represents the repeated
        # last image) doesn't count like a full batch; exact when the
        # final batch holds a single real image.
        for name, value in losses.items():
            loss_sums[name] = (
                loss_sums.get(name, 0.0) + float(value) * batch_size
            )
        count += 1
        if count % 10 == 0:
            rate = total_images / (time.time() - start)
            logger.info("%d images evaluated (%.2f images/s)",
                        total_images, rate)

    for batch, device_batch in prefetch_to_device(bounded(), mesh):
        outs = forward(
            variables,
            device_batch["image"],
            device_batch["gt_boxes"],
            device_batch["im_shape"],
        )
        if pending is not None:
            drain(*pending)
        pending = (batch, outs)
    if pending is not None:
        drain(*pending)

    elapsed = time.time() - start
    logger.info(
        "Evaluated %d images in %.2fs (%.2f images/s)",
        total_images, elapsed, total_images / max(elapsed, 1e-6),
    )

    ap_per_class, ar_per_class = calculate_metrics(output, num_classes)
    map_0_5 = float(np.mean(ap_per_class[:, 0]))
    map_0_75 = float(np.mean(ap_per_class[:, 5]))
    map_all = float(np.mean(ap_per_class))
    mar_all = float(np.mean(ar_per_class))

    metrics = {
        "AP@0.5": map_0_5,
        "AP@0.75": map_0_75,
        "AP@[0.5:0.95]": map_all,
        "AR@[0.5:0.95]": mar_all,
        "images": total_images,
        "images_per_second": total_images / max(elapsed, 1e-6),
    }
    for name, total in loss_sums.items():
        metrics[f"losses/{name}"] = total / max(total_images, 1)

    if writer is not None:
        for name, value in metrics.items():
            writer.add_scalar(f"validation/{name}", value, global_step)
        writer.flush()

    logger.info("Validation metrics at step %d: %s", global_step, {
        k: round(v, 4) for k, v in metrics.items()
    })
    return metrics


def apply_eval_config_mutations(config, dataset_split, max_detections=100):
    """Evaluation-mode config mutations (reference eval.py:52-89).

    Disables augmentation/shuffle, zeroes the score floor, and — for
    Faster R-CNN — forces ``pre_nms_max_candidates=0``: reference eval
    NMS-es ALL post-RPN proposals per class (eval.py:52-89 sets
    min_prob=0; rcnn_proposal.py:77-135 never caps candidates). The 512
    candidate cap in base_config is a serving profile only — eval must
    run uncapped so the mAP measured here is reference-semantics mAP.
    """
    config.dataset.split = dataset_split
    config.train.num_epochs = 1
    config.dataset.data_augmentation = None
    config.train.random_shuffle = False
    if config.model.type == "fasterrcnn":
        config.model.rcnn.proposals.total_max_detections = max_detections
        config.model.rcnn.proposals.min_prob_threshold = 0.0
        config.model.rcnn.proposals.pre_nms_max_candidates = 0
    else:
        config.model.proposals.total_max_detections = max_detections
        config.model.proposals.min_prob_threshold = 0.0
    return config


@click.command(help="Evaluate trained (or training) models")
@click.option(
    "dataset_split", "--split", default="val", help="Dataset split to use.")
@click.option(
    "config_files", "--config", "-c", required=True, multiple=True,
    help="Config to use.")
@click.option(
    "--watch/--no-watch", default=True,
    help="Keep watching checkpoint directory for new files.")
@click.option(
    "--from-global-step", type=int, default=None,
    help="Consider only checkpoints after this step.")
@click.option(
    "override_params", "--override", "-o", multiple=True,
    help="Override model config params.")
@click.option(
    "--files-per-class", type=int, default=10,
    help="How many files per class to save (visualization).")
@click.option(
    "--max-detections", type=int, default=100,
    help="Maximum detections considered per image.")
def eval(dataset_split, config_files, watch, from_global_step,
         override_params, files_per_class, max_detections):
    """``lumi eval`` (reference: eval.py:23-223)."""
    from luminoth_tpu.utils.compilation_cache import warm_start

    warm_start()  # persistent compile cache + async first-fetch
    logging.basicConfig(level=logging.INFO)
    config = get_config(list(config_files), override_params=override_params)

    apply_eval_config_mutations(config, dataset_split, max_detections)

    model = get_model(config.model.type)(
        to_plain(config), dtype=model_dtype(config)
    )
    mesh = _eval_mesh(int(config.train.get("batch_size", 1)))
    if mesh is not None:
        logger.info(
            "Evaluating data-parallel over %d devices", mesh.size
        )
    forward = _build_forward(model, mesh=mesh)

    job_dir = config.train.get("job_dir", "jobs/")
    run_name = config.train.get("run_name") or "default"
    run_dir = fileio.join(job_dir, run_name)

    # tensorboardX only writes locally; remote job_dirs mirror their
    # eval summaries under the toolkit home (same policy as train.py).
    tb_dir = os.path.join(run_dir, dataset_split)
    if fileio.is_remote(run_dir):
        from luminoth_tpu.utils.homedir import get_home

        tb_dir = os.path.join(
            get_home(), "tensorboard", run_name, dataset_split
        )
    writer = None
    try:
        from tensorboardX import SummaryWriter

        writer = SummaryWriter(tb_dir)
    except Exception:
        pass

    watch_checkpoints(
        config, model, run_dir, watch=watch,
        from_global_step=from_global_step, writer=writer,
        forward=forward, files_per_class=files_per_class, mesh=mesh,
    )


def watch_checkpoints(config, model, run_dir, watch=True,
                      from_global_step=None, writer=None, forward=None,
                      files_per_class=0, mesh=None):
    """Evaluate each new checkpoint in ``run_dir`` (the eval loop body).

    reference: eval.py:168-223 — the same watch semantics, incl.
    tolerating partially-written checkpoints (eval.py:205-215): an
    unreadable newest file is retried (it may still be mid-transfer);
    unreadable older files are skipped (they will never heal).
    """
    from flax import serialization
    from luminoth_tpu.utils.checkpoint_io import CheckpointManager

    manager = CheckpointManager(fileio.join(run_dir, "ckpt"))
    last_step = from_global_step or 0

    while True:
        steps = get_checkpoints(run_dir, last_step)
        if not steps:
            if not watch:
                break
            time.sleep(5)
            continue
        for step in steps:
            try:
                with fileio.open_file(manager._path(step), "rb") as f:
                    state = serialization.msgpack_restore(f.read())
            except FileNotFoundError:
                continue  # checkpoint rotated away while watching
            except Exception as e:
                if watch and step == steps[-1]:
                    logger.warning(
                        "Checkpoint step %d unreadable (%s); retrying",
                        step, e,
                    )
                    time.sleep(5)
                    break
                logger.warning(
                    "Checkpoint step %d unreadable (%s); skipping",
                    step, e,
                )
                last_step = step
                continue
            variables = {"params": state["params"]}
            if state.get("batch_stats"):
                variables["batch_stats"] = state["batch_stats"]
            logger.info("Evaluating checkpoint at step %d", step)
            evaluate_once(
                config, model, variables, writer=writer,
                global_step=step, forward=forward,
                files_per_class=files_per_class, mesh=mesh,
            )
            last_step = step
        if not watch:
            break
