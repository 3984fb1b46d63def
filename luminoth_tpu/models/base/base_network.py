"""Config-driven backbone wrapper (the reference's Base/TruncatedBaseNetwork).

reference: luminoth/models/base/base_network.py:30-259 and
truncated_base_network.py:19-144. Responsibilities reproduced here:

* architecture registry (resnet v1/v2 {50,101,152}, vgg_16, truncated_vgg_16);
* RGB-mean-subtraction preprocessing (123.68 / 116.78 / 103.94);
* endpoint truncation yielding the detection feature map (`block3` for
  resnets at output-stride 16, `conv5/conv5_3` for VGG);
* the ROI "tail" (`block4`) used as the RCNN head trunk;
* fine-tune trainability boundaries (``fine_tune_from``, ``freeze_tail``,
  ``trainable``) — expressed in JAX as an optimizer parameter mask instead of
  variable-collection surgery.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from luminoth_tpu.models.base.resnet import ResNet, ResNetTail
from luminoth_tpu.models.base.vgg import VGG16

_R_MEAN = 123.68
_G_MEAN = 116.78
_B_MEAN = 103.94

VALID_ARCHITECTURES = {
    "resnet_v1_50",
    "resnet_v1_101",
    "resnet_v1_152",
    "resnet_v2_50",
    "resnet_v2_101",
    "resnet_v2_152",
    "vgg_16",
    "truncated_vgg_16",
}

DEFAULT_ENDPOINTS = {
    "resnet_v1_50": "block3",
    "resnet_v1_101": "block3",
    "resnet_v1_152": "block3",
    "resnet_v2_50": "block3",
    "resnet_v2_101": "block3",
    "resnet_v2_152": "block3",
    "vgg_16": "conv5/conv5_3",
    "truncated_vgg_16": "conv5/conv5_3",
}


def subtract_channel_means(images):
    """ImageNet RGB mean subtraction (float32 images, 0-255 range)."""
    means = jnp.asarray([_R_MEAN, _G_MEAN, _B_MEAN], dtype=jnp.float32)
    return images.astype(jnp.float32) - means


def _parse_architecture(architecture):
    if architecture not in VALID_ARCHITECTURES:
        raise ValueError('Invalid architecture: "{}"'.format(architecture))
    if architecture.startswith("resnet"):
        version = 1 if architecture.startswith("resnet_v1") else 2
        depth = int(architecture.rsplit("_", 1)[1])
        return "resnet", version, depth
    if architecture == "truncated_vgg_16":
        return "truncated_vgg", None, 16
    return "vgg", None, 16


class TruncatedBaseNetwork(nn.Module):
    """Backbone truncated at an endpoint, producing the detection feature map.

    Config keys honored (reference base_config.yml `model.base_network`):
    ``architecture``, ``endpoint``, ``output_stride``, ``train_batch_norm``,
    ``use_tail``, ``freeze_tail`` (mask concern), ``arg_scope.weight_decay``
    (optimizer concern).
    """

    config: Any
    dtype: Any = jnp.float32

    @property
    def architecture(self):
        return self.config.get("architecture")

    @property
    def endpoint_name(self):
        return self.config.get("endpoint") or DEFAULT_ENDPOINTS[self.architecture]

    @nn.compact
    def __call__(self, images, train=False, return_endpoints=False):
        """(B, H, W, 3) raw-scale images -> (B, H', W', C) feature map."""
        kind, version, depth = _parse_architecture(self.architecture)
        x = subtract_channel_means(images)

        if kind == "resnet":
            if (
                self.config.get("int8_trunk")
                and not train
                and version == 1
            ):
                # Opt-in serving profile twin of the float trunk (same
                # parameter pytree; see quantized_tail.py).
                from luminoth_tpu.models.base.quantized_tail import (
                    Int8ResNetTrunk,
                )

                feature_map, endpoints = Int8ResNetTrunk(
                    depth=depth,
                    version=version,
                    output_stride=self.config.get("output_stride"),
                    endpoint=self.endpoint_name,
                    stride_first=bool(
                        self.config.get("torchvision_compat")
                    ),
                    static_scales=bool(self.config.get("int8_static")),
                    dtype=self.dtype,
                    name=self.architecture,
                )(x)
                if return_endpoints:
                    return feature_map, endpoints
                return feature_map
            train_bn = bool(train and self.config.get("train_batch_norm"))
            feature_map, endpoints = ResNet(
                depth=depth,
                version=version,
                output_stride=self.config.get("output_stride"),
                endpoint=self.endpoint_name,
                train_bn=train_bn,
                stride_first=bool(self.config.get("torchvision_compat")),
                remat=bool(self.config.get("remat")),
                dtype=self.dtype,
                name=self.architecture,
            )(x)
        else:
            feature_map, endpoints = VGG16(
                truncated=(kind == "truncated_vgg"),
                endpoint=(
                    self.endpoint_name if kind == "vgg" else None
                ),
                dtype=self.dtype,
                name="vgg_16",
            )(x, train=train)

        if return_endpoints:
            return feature_map, endpoints
        return feature_map


class BaseNetworkTail(nn.Module):
    """ROI-head trunk: ResNet ``block4`` over pooled ROI crops.

    For non-resnet architectures the tail is the identity, as in the
    reference (truncated_base_network.py:93-95).
    """

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_features, train=False):
        architecture = self.config.get("architecture")
        if not self.config.get("use_tail", True):
            return roi_features
        kind, version, depth = _parse_architecture(architecture)
        if kind != "resnet":
            return roi_features
        if (
            self.config.get("int8_tail")
            and not train
            and version == 1
        ):
            # Opt-in serving profile: same parameter pytree, int8 MXU
            # dots (2x the bf16 rate) with BN folded and dynamic
            # activation quantization. See quantized_tail.py.
            from luminoth_tpu.models.base.quantized_tail import (
                Int8ResNetTail,
            )

            return Int8ResNetTail(
                depth=depth,
                version=version,
                static_scales=bool(self.config.get("int8_static")),
                dtype=self.dtype,
                name=architecture,
            )(roi_features)
        train_bn = bool(train and self.config.get("train_batch_norm"))
        return ResNetTail(
            depth=depth,
            version=version,
            train_bn=train_bn,
            dtype=self.dtype,
            name=architecture,
        )(roi_features)
