"""Faster R-CNN, TPU-native.

reference: luminoth/models/fasterrcnn/fasterrcnn.py:70-364. Orchestrates
backbone → anchors → RPN → (stop_gradient) proposals → ROI pool → tail →
RCNN head → final detections. Redesigned for XLA:

* Batched end to end: images (B, H, W, 3) with per-image actual sizes in
  ``im_shape`` (B, 2) (images may be padded to a bucket size). The reference
  hardcodes batch 1 (fasterrcnn.py:101-103).
* Every stage is static-shape: proposals (post_nms_top_n, 4) + valid mask;
  the training ROI stage computes only the fixed-size target minibatch.
* Anchor grid is generated at trace time from the static feature-map shape
  and folded into the program as a constant.
* Target subsampling uses a flax "target" PRNG collection.

Prediction-dict keys mirror the reference for tooling parity.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from luminoth_tpu.models.base.base_network import (
    BaseNetworkTail,
    TruncatedBaseNetwork,
)
from luminoth_tpu.models.fasterrcnn.rcnn import RCNNHead
from luminoth_tpu.models.fasterrcnn.rcnn_proposal import rcnn_proposal
from luminoth_tpu.models.fasterrcnn.rcnn_target import (
    rcnn_target_assign,
    select_minibatch,
)
from luminoth_tpu.models.fasterrcnn.rpn import RPN
from luminoth_tpu.models.fasterrcnn.rpn_proposal import rpn_proposal
from luminoth_tpu.models.fasterrcnn.rpn_target import rpn_target_assign
from luminoth_tpu.ops.anchors import (
    generate_anchors_grid,
    generate_anchors_reference,
)
from luminoth_tpu.ops.losses import smooth_l1_loss, softmax_cross_entropy
from luminoth_tpu.ops.roi_align import roi_crop_pool_batch


def _masked_mean(values, mask):
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.maximum(jnp.sum(mask), 1.0)


class FasterRCNN(nn.Module):
    """Two-stage detector with RPN + RCNN over a truncated backbone."""

    config: Any
    dtype: Any = jnp.float32

    @property
    def cfg(self):
        from luminoth_tpu.utils.config import Config

        return Config(self.config)

    @property
    def num_classes(self):
        return self.cfg.model.network.num_classes

    @property
    def with_rcnn(self):
        return bool(self.cfg.model.network.with_rcnn)

    def _target_keys(self, batch, stage):
        if self.has_rng("target"):
            key = self.make_rng("target")
        else:
            # No 'target' rng collection (eval-with-targets paths). Fold
            # in the stage so the RPN and RCNN subsampling stay
            # decorrelated even on the deterministic fallback.
            key = jax.random.fold_in(jax.random.PRNGKey(0), stage)
        return jax.random.split(key, batch)

    @nn.compact
    def __call__(self, images, gt_boxes=None, im_shape=None, train=False):
        """Run the detector.

        Args:
            images: (B, H, W, 3) float images, 0-255 scale, padded to a
                static bucket size.
            gt_boxes: optional (B, G, 5) padded ground truth.
            im_shape: optional (B, 2) actual (height, width) per image;
                defaults to the padded size.
            train: training mode.

        Returns:
            Nested prediction dict (see module docstring).
        """
        cfg = self.cfg
        model_cfg = cfg.model
        batch, full_h, full_w = images.shape[0], images.shape[1], images.shape[2]
        if im_shape is None:
            im_shape = jnp.tile(
                jnp.asarray([[full_h, full_w]], dtype=jnp.float32), (batch, 1)
            )
        im_shape = im_shape.astype(jnp.float32)

        anchors_cfg = model_cfg.anchors
        anchor_reference = generate_anchors_reference(
            anchors_cfg.base_size,
            np.asarray(anchors_cfg.ratios, dtype=np.float64),
            np.asarray(anchors_cfg.scales, dtype=np.float64),
        )
        num_anchors_per_point = anchor_reference.shape[0]

        feature_map = TruncatedBaseNetwork(
            model_cfg.base_network, dtype=self.dtype, name="base_network"
        )(images, train=train)

        fm_shape = feature_map.shape[1:3]
        all_anchors = generate_anchors_grid(
            anchor_reference, anchors_cfg.stride, fm_shape
        )

        rpn_out = RPN(
            num_anchors_per_point, model_cfg.rpn, dtype=self.dtype, name="rpn"
        )(feature_map, train=train)

        proposals_cfg = model_cfg.rpn.proposals
        proposal_pred = rpn_proposal(
            rpn_out["rpn_cls_prob"],
            rpn_out["rpn_bbox_pred"],
            all_anchors,
            im_shape,
            pre_nms_top_n=proposals_cfg.pre_nms_top_n,
            post_nms_top_n=proposals_cfg.post_nms_top_n,
            nms_threshold=float(proposals_cfg.nms_threshold),
            min_size=proposals_cfg.min_size,
            apply_nms=bool(proposals_cfg.apply_nms),
            clip_after_nms=bool(proposals_cfg.clip_after_nms),
            filter_outside_anchors=bool(proposals_cfg.filter_outside_anchors),
            min_prob_threshold=float(proposals_cfg.min_prob_threshold),
        )

        rpn_prediction = dict(rpn_out)
        rpn_prediction["proposals"] = proposal_pred["proposals"]
        rpn_prediction["scores"] = proposal_pred["scores"]
        rpn_prediction["proposals_valid"] = proposal_pred["valid"]

        if gt_boxes is not None:
            gt_boxes = gt_boxes.astype(jnp.float32)
            target_cfg = model_cfg.rpn.target
            keys = self._target_keys(batch, stage=0)
            assign = jax.vmap(
                lambda gt, shape, key: rpn_target_assign(
                    all_anchors,
                    gt,
                    shape,
                    key,
                    allowed_border=target_cfg.allowed_border,
                    clobber_positives=bool(target_cfg.clobber_positives),
                    foreground_threshold=target_cfg.foreground_threshold,
                    background_threshold_high=target_cfg.background_threshold_high,
                    foreground_fraction=target_cfg.foreground_fraction,
                    minibatch_size=target_cfg.minibatch_size,
                )
            )
            rpn_cls_target, rpn_bbox_target, rpn_max_overlap = assign(
                gt_boxes, im_shape, keys
            )
            rpn_prediction["rpn_cls_target"] = rpn_cls_target
            rpn_prediction["rpn_bbox_target"] = rpn_bbox_target
            rpn_prediction["rpn_max_overlap"] = rpn_max_overlap

        prediction_dict = {"rpn_prediction": rpn_prediction}

        if not self.with_rcnn:
            return prediction_dict

        proposals = jax.lax.stop_gradient(proposal_pred["proposals"])
        proposals_valid = proposal_pred["valid"]

        rcnn_cfg = model_cfg.rcnn
        variances = tuple(rcnn_cfg.target_normalization_variances)
        classification = {}

        if gt_boxes is not None:
            t_cfg = rcnn_cfg.target
            keys = self._target_keys(batch, stage=1)
            assign = jax.vmap(
                lambda props, valid, gt, key: rcnn_target_assign(
                    props,
                    valid,
                    gt,
                    key,
                    foreground_threshold=t_cfg.foreground_threshold,
                    background_threshold_high=t_cfg.background_threshold_high,
                    background_threshold_low=t_cfg.background_threshold_low,
                    foreground_fraction=t_cfg.foreground_fraction,
                    minibatch_size=t_cfg.minibatch_size,
                    variances=variances,
                )
            )
            proposals_label, bbox_offsets_target = assign(
                proposals, proposals_valid, gt_boxes, keys
            )

            if train:
                # Gather the fixed-size minibatch for the ROI stage.
                minibatch = int(t_cfg.minibatch_size)
                sel = jax.vmap(lambda lab: select_minibatch(lab, minibatch))
                sel_idx, sel_mask = sel(proposals_label)
                take = jax.vmap(lambda a, i: a[i])
                proposals = take(proposals, sel_idx)
                proposals_valid = sel_mask
                proposals_label = take(proposals_label, sel_idx)
                bbox_offsets_target = take(bbox_offsets_target, sel_idx)

            classification["target"] = {
                "cls": proposals_label,
                "bbox_offsets": bbox_offsets_target,
                "selected_mask": proposals_valid,
            }

        # ROI crop-and-resize from the padded-image coordinate frame.
        roi_cfg = rcnn_cfg.roi
        # The reference passes [pooled_width*2, pooled_height*2] as
        # tf.image.crop_and_resize's [crop_height, crop_width]
        # (roi_pool.py:75-78) — pooled_width sets the crop HEIGHT there;
        # mirrored verbatim for parity (irrelevant at the square default).
        # Square sizes take the fused Pallas kernel, rectangular the XLA
        # path.
        crop_h = int(roi_cfg.pooled_width) * 2
        crop_w = int(roi_cfg.pooled_height) * 2
        crop_size = crop_h if crop_h == crop_w else (crop_h, crop_w)
        pooled = roi_crop_pool_batch(
            feature_map, proposals, (float(full_h), float(full_w)),
            crop_size=crop_size,
        )  # (B, R, S/2, S/2, C)

        b, r = pooled.shape[0], pooled.shape[1]
        flat = pooled.reshape((b * r,) + pooled.shape[2:])
        tail_out = BaseNetworkTail(
            model_cfg.base_network, dtype=self.dtype, name="base_network_tail"
        )(flat, train=train)

        cls_score, cls_prob, bbox_offsets = RCNNHead(
            self.num_classes, rcnn_cfg, dtype=self.dtype, name="rcnn"
        )(tail_out, train=train)
        cls_score = cls_score.reshape(b, r, -1)
        cls_prob = cls_prob.reshape(b, r, -1)
        bbox_offsets = bbox_offsets.reshape(b, r, -1)

        classification["rcnn"] = {
            "cls_score": cls_score,
            "cls_prob": cls_prob,
            "bbox_offsets": bbox_offsets,
        }
        classification["proposals"] = proposals
        classification["proposals_valid"] = proposals_valid

        if not train:
            p_cfg = rcnn_cfg.proposals
            detections = rcnn_proposal(
                proposals,
                bbox_offsets,
                cls_prob,
                proposals_valid,
                im_shape,
                self.num_classes,
                class_max_detections=p_cfg.class_max_detections,
                class_nms_threshold=float(p_cfg.class_nms_threshold),
                total_max_detections=p_cfg.total_max_detections,
                min_prob_threshold=float(p_cfg.min_prob_threshold or 0.0),
                variances=variances,
                pre_nms_max_candidates=int(
                    p_cfg.get("pre_nms_max_candidates") or 0
                ),
            )
            classification["objects"] = detections["objects"]
            classification["labels"] = detections["labels"]
            classification["probs"] = detections["probs"]
            classification["valid"] = detections["valid"]

        prediction_dict["classification_prediction"] = classification
        return prediction_dict

    def loss(self, prediction_dict, return_all=False):
        """Weighted 4-part Faster R-CNN loss (fasterrcnn.py:158-259)."""
        cfg = self.cfg
        loss_cfg = cfg.model.loss
        rpn_pred = prediction_dict["rpn_prediction"]

        # RPN losses.
        cls_target = rpn_pred["rpn_cls_target"]  # (B, A) in {-1, 0, 1}
        cls_score = rpn_pred["rpn_cls_score"]  # (B, A, 2)
        not_ignored = cls_target >= 0
        one_hot = jax.nn.one_hot(
            jnp.maximum(cls_target, 0).astype(jnp.int32), 2
        )
        ce = softmax_cross_entropy(cls_score, one_hot)
        rpn_cls_loss = _masked_mean(ce, not_ignored)

        positives = cls_target == 1
        reg = smooth_l1_loss(
            rpn_pred["rpn_bbox_pred"],
            rpn_pred["rpn_bbox_target"],
            sigma=cfg.model.rpn.l1_sigma,
        )
        rpn_reg_loss = _masked_mean(reg, positives)

        losses = {
            "rpn_cls_loss": rpn_cls_loss * loss_cfg.rpn_cls_loss_weight,
            "rpn_reg_loss": rpn_reg_loss * loss_cfg.rpn_reg_loss_weights,
        }

        if self.with_rcnn:
            num_classes = self.num_classes
            cls_pred = prediction_dict["classification_prediction"]
            target = cls_pred["target"]
            rcnn = cls_pred["rcnn"]

            rc_target = target["cls"]  # (B, M)
            labeled = (rc_target >= 0) & target["selected_mask"]
            one_hot = jax.nn.one_hot(
                jnp.maximum(rc_target, 0).astype(jnp.int32), num_classes + 1
            )
            ce = softmax_cross_entropy(rcnn["cls_score"], one_hot)
            rcnn_cls_loss = _masked_mean(ce, labeled)

            fg = (rc_target > 0) & target["selected_mask"]
            # Pick the predicted deltas of the target class.
            cls_idx = jnp.maximum(rc_target - 1, 0).astype(jnp.int32)
            deltas = rcnn["bbox_offsets"].reshape(
                rc_target.shape + (num_classes, 4)
            )
            picked = jnp.take_along_axis(
                deltas, cls_idx[..., None, None].repeat(4, axis=-1), axis=-2
            )[..., 0, :]
            reg = smooth_l1_loss(
                picked, target["bbox_offsets"], sigma=cfg.model.rcnn.l1_sigma
            )
            rcnn_reg_loss = _masked_mean(reg, fg)

            losses["rcnn_cls_loss"] = (
                rcnn_cls_loss * loss_cfg.rcnn_cls_loss_weight
            )
            losses["rcnn_reg_loss"] = (
                rcnn_reg_loss * loss_cfg.rcnn_reg_loss_weights
            )

        total = sum(losses.values())
        if return_all:
            losses["total_loss"] = total
            losses["no_reg_loss"] = total
            return losses
        return total
