"""SSD: Single Shot MultiBox Detector, TPU-native.

reference: luminoth/models/ssd/ssd.py:37-334. Differences by design:

* Batched: images are (B, H, W, 3) — the reference hardcodes batch 1
  (ssd.py:65); padded static shapes make batching free under XLA.
* Ground truth is padded (B, G, 5) with label < 0 on padding rows.
* Target assignment / hard mining produce dense label arrays and the loss
  consumes masks — no boolean_mask anywhere.
* The proposal stage (inference) emits fixed-size detections with a validity
  mask, with the per-class loop vmapped.

The forward returns a prediction dict mirroring the reference's keys:
``cls_pred``, ``loc_pred``, ``anchors``, ``target/{cls,bbox_offsets}`` when
training, ``classification_prediction`` at inference.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from luminoth_tpu.models.base.base_network import subtract_channel_means
from luminoth_tpu.models.ssd.anchors import generate_ssd_anchors
from luminoth_tpu.models.ssd.feature_extractor import SSDFeatureExtractor
from luminoth_tpu.models.ssd.proposal import ssd_proposal
from luminoth_tpu.models.ssd.target import ssd_target_assign
from luminoth_tpu.ops.losses import smooth_l1_loss, softmax_cross_entropy


class SSD(nn.Module):
    """Single-shot detector over a truncated VGG-16 trunk."""

    config: Any
    dtype: Any = jnp.float32

    @property
    def cfg(self):
        # flax freezes dict attributes into FrozenDicts; restore attr access.
        from luminoth_tpu.utils.config import Config

        return Config(self.config)

    @property
    def num_classes(self):
        return self.cfg.model.network.num_classes

    @property
    def image_shape(self):
        prep = self.cfg.dataset.image_preprocessing
        return (prep.fixed_height, prep.fixed_width)

    @nn.compact
    def __call__(self, images, gt_boxes=None, im_shape=None, train=False,
                 debug=False):
        """Run the detector.

        Args:
            images: (B, H, W, 3) float images (0-255 scale).
            gt_boxes: optional (B, G, 5) padded ground truth.
            train: training mode flag.

        Returns:
            prediction dict (all entries batched on axis 0).
        """
        model_cfg = self.cfg.model
        num_classes = self.num_classes
        anchors_per_point = list(model_cfg.anchors.anchors_per_point)

        x = subtract_channel_means(images)
        feature_maps = SSDFeatureExtractor(
            model_cfg.base_network, dtype=self.dtype, name="feature_extractor"
        )(x, train=train)

        if len(feature_maps) != len(anchors_per_point):
            raise ValueError(
                "anchors_per_point must have one entry per feature map"
            )

        # MultiBox heads: per-map 3x3 convs for offsets and class logits.
        bbox_offsets_list = []
        class_scores_list = []
        batch = images.shape[0]
        for i, feat_map in enumerate(feature_maps):
            a = anchors_per_point[i]
            offsets = nn.Conv(
                a * 4, (3, 3), padding="SAME", dtype=self.dtype,
                name=f"MultiBox_{i}_offsets_conv",
            )(feat_map)
            bbox_offsets_list.append(
                offsets.astype(jnp.float32).reshape(batch, -1, 4)
            )
            scores = nn.Conv(
                a * (num_classes + 1), (3, 3), padding="SAME", dtype=self.dtype,
                name=f"MultiBox_{i}_classes_conv",
            )(feat_map)
            class_scores_list.append(
                scores.astype(jnp.float32).reshape(batch, -1, num_classes + 1)
            )

        bbox_offsets = jnp.concatenate(bbox_offsets_list, axis=1)  # (B, A, 4)
        class_scores = jnp.concatenate(class_scores_list, axis=1)  # (B, A, C+1)
        class_probabilities = jax.nn.softmax(class_scores, axis=-1)

        # Anchors: static shapes -> generated in numpy, folded as a constant.
        fm_shapes = [tuple(fm.shape[1:3]) for fm in feature_maps]
        anchors = jnp.asarray(
            generate_ssd_anchors(
                fm_shapes,
                model_cfg.anchors.min_scale,
                model_cfg.anchors.max_scale,
                np.asarray(model_cfg.anchors.ratios, dtype=np.float64),
                anchors_per_point,
                self.image_shape,
            )
        )

        prediction_dict = {
            "cls_pred": class_scores,
            "loc_pred": bbox_offsets,
            "anchors": anchors,
        }

        if gt_boxes is not None:
            target_cfg = model_cfg.target
            assign = jax.vmap(
                lambda probs, gt: ssd_target_assign(
                    probs,
                    anchors,
                    gt,
                    num_classes,
                    target_cfg.foreground_threshold,
                    target_cfg.background_threshold_high,
                    target_cfg.hard_negative_ratio,
                    tuple(model_cfg.variances),
                )
            )
            class_targets, bbox_offsets_targets = assign(
                class_probabilities, gt_boxes.astype(jnp.float32)
            )
            prediction_dict["target"] = {
                "cls": class_targets,
                "bbox_offsets": bbox_offsets_targets,
            }

        if not train or debug:
            proposals_cfg = model_cfg.proposals
            prediction_dict["classification_prediction"] = ssd_proposal(
                class_probabilities,
                bbox_offsets,
                anchors,
                jnp.asarray(self.image_shape, dtype=jnp.float32),
                num_classes,
                float(proposals_cfg.class_nms_threshold),
                proposals_cfg.class_max_detections,
                proposals_cfg.total_max_detections,
                proposals_cfg.min_prob_threshold or 0.0,
                tuple(model_cfg.variances),
                proposals_cfg.get("pre_nms_max_candidates", 1000),
            )

        if debug:
            prediction_dict["cls_prob"] = class_probabilities

        return prediction_dict

    def loss(self, prediction_dict, return_all=False):
        """SSD multibox loss (reference: ssd.py:197-300).

        Per image: ``(Σ CE over selected anchors + α·Σ smooth-L1 over
        positives) / num_positives`` (0 when no positives), then mean over
        the batch.
        """
        num_classes = self.num_classes
        loc_weight = self.cfg.model.loss.localization_loss_weight

        cls_pred = prediction_dict["cls_pred"]  # (B, A, C+1)
        cls_target = prediction_dict["target"]["cls"]  # (B, A)
        loc_pred = prediction_dict["loc_pred"]  # (B, A, 4)
        loc_target = prediction_dict["target"]["bbox_offsets"]

        selected = cls_target >= 0
        positive = cls_target > 0

        target_one_hot = jax.nn.one_hot(
            jnp.maximum(cls_target, 0).astype(jnp.int32), num_classes + 1
        )
        ce = softmax_cross_entropy(cls_pred, target_one_hot)  # (B, A)
        cls_loss = jnp.sum(jnp.where(selected, ce, 0.0), axis=1)  # (B,)

        reg = smooth_l1_loss(loc_pred, loc_target)  # (B, A)
        bbox_loss = jnp.sum(jnp.where(positive, reg, 0.0), axis=1)  # (B,)

        num_pos = jnp.sum(positive, axis=1).astype(jnp.float32)
        per_image = jnp.where(
            num_pos > 0,
            (cls_loss + bbox_loss * loc_weight) / jnp.maximum(num_pos, 1.0),
            0.0,
        )
        total_loss = jnp.mean(per_image)

        if return_all:
            return {
                "total_loss": total_loss,
                "cls_loss": jnp.mean(cls_loss),
                "bbox_loss": jnp.mean(bbox_loss),
            }
        return total_loss
