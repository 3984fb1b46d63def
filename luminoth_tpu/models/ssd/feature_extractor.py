"""SSD multi-scale feature extractor: truncated VGG-16 + extra layers.

reference: luminoth/models/ssd/feature_extractor.py:27-132. Produces six
feature maps: L2-normalized conv4_3 (learned per-channel scale, init 20.0),
conv7 (the dilated-conv6/conv7 pair replacing VGG's FC layers), and the
stride-reducing extras conv8_2..conv11_2.

TPU notes: all convs are static-shape NHWC; the whole extractor fuses into a
single XLA program with the MultiBox heads. Feature map sizes for the fixed
300x300 input: 37, 18, 9, 5, 3, 1 (slim uses VALID pooling, so conv4_3 is
37x37 rather than the paper's 38x38 — kept for parity).
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from luminoth_tpu.models.base.vgg import VGG16


class L2Normalize(nn.Module):
    """Channel-wise L2 normalization with a learned scale (init 20.0)."""

    init_scale: float = 20.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.full(shape, self.init_scale, jnp.float32),
            (1, 1, 1, x.shape[-1]),
        )
        norm = jnp.sqrt(
            jnp.sum(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
            + 1e-12
        )
        return (x / norm * gamma).astype(x.dtype)


class SSDFeatureExtractor(nn.Module):
    """Truncated VGG-16 trunk + SSD extra feature layers."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, train=False):
        """(B, H, W, 3) mean-subtracted images -> list of 6 feature maps."""
        architecture = self.config.get("architecture", "truncated_vgg_16")
        if architecture != "truncated_vgg_16":
            raise ValueError(
                'Invalid SSD architecture "{}"'.format(architecture)
            )

        if self.config.get("int8_trunk") and not train:
            # Opt-in serving profile twin (same parameter pytree; see
            # quantized_extractor.py). Inert in training.
            return self._int8_maps(images)

        _, endpoints = VGG16(truncated=True, dtype=self.dtype, name="vgg_16")(
            images, train=train
        )
        conv4_3 = endpoints["conv4/conv4_3"]
        conv5_3 = endpoints["conv5/conv5_3"]

        feature_maps = [L2Normalize(name="conv4_3_norm", dtype=self.dtype)(conv4_3)]

        def conv(x, features, kernel, name, stride=1, rate=1, padding="SAME"):
            x = nn.Conv(
                features,
                (kernel, kernel),
                strides=(stride, stride),
                kernel_dilation=(rate, rate),
                padding=padding,
                dtype=self.dtype,
                name=name,
            )(x)
            return nn.relu(x)

        # pool5: 3x3 stride 1 SAME, then the dilated conv6 / conv7 pair.
        net = nn.max_pool(
            conv5_3, (3, 3), strides=(1, 1), padding="SAME"
        )
        net = conv(net, 1024, 3, "conv6", rate=6)
        net = conv(net, 1024, 1, "conv7")
        feature_maps.append(net)

        net = conv(net, 256, 1, "conv8_1")
        net = conv(net, 512, 3, "conv8_2", stride=2)
        feature_maps.append(net)

        net = conv(net, 128, 1, "conv9_1")
        net = conv(net, 256, 3, "conv9_2", stride=2)
        feature_maps.append(net)

        net = conv(net, 128, 1, "conv10_1")
        net = conv(net, 256, 3, "conv10_2", padding="VALID")
        feature_maps.append(net)

        net = conv(net, 128, 1, "conv11_1")
        net = conv(net, 256, 3, "conv11_2", padding="VALID")
        feature_maps.append(net)

        return feature_maps

    def _int8_maps(self, images):
        """Serving-only int8 recomputation of the float path above.

        Declares the identical parameter pytree (shared ``vgg_16`` /
        ``conv*`` / ``conv4_3_norm`` names), so either path loads any
        checkpoint. Only one branch ever traces, so the reused names
        never collide.
        """
        from luminoth_tpu.models.ssd.quantized_extractor import (
            Int8VGG16, _ConvParams, int8_conv,
        )

        static = bool(self.config.get("int8_static"))
        conv4_3, conv5_3 = Int8VGG16(
            static_scales=static, dtype=self.dtype, name="vgg_16"
        )(images)
        feature_maps = [
            L2Normalize(name="conv4_3_norm", dtype=jnp.float32)(conv4_3)
        ]

        def conv(x, features, kernel, name, stride=1, rate=1,
                 padding="SAME"):
            k, b = _ConvParams((kernel, kernel, x.shape[-1], features),
                               name=name)()
            return nn.relu(int8_conv(
                x, k, b, stride=stride, rate=rate,
                padding=padding.lower(),
                module=self, qname=f"{name}_amax", static=static,
            ))

        net = nn.max_pool(conv5_3, (3, 3), strides=(1, 1), padding="SAME")
        net = conv(net, 1024, 3, "conv6", rate=6)
        net = conv(net, 1024, 1, "conv7")
        feature_maps.append(net)

        net = conv(net, 256, 1, "conv8_1")
        net = conv(net, 512, 3, "conv8_2", stride=2)
        feature_maps.append(net)

        net = conv(net, 128, 1, "conv9_1")
        net = conv(net, 256, 3, "conv9_2", stride=2)
        feature_maps.append(net)

        net = conv(net, 128, 1, "conv10_1")
        net = conv(net, 256, 3, "conv10_2", padding="VALID")
        feature_maps.append(net)

        net = conv(net, 128, 1, "conv11_1")
        net = conv(net, 256, 3, "conv11_2", padding="VALID")
        feature_maps.append(net)

        return [f.astype(self.dtype) for f in feature_maps]
