"""Int8 twin of the SSD feature extractor for serving.

The SSD step is ~56% VGG trunk (docs/usage/performance.md); the TPU MXU
runs int8 at twice the bf16 rate. Like the Faster R-CNN twins
(``models/base/quantized_tail.py``), this module recomputes the SAME
network — identical parameter pytree, any trained or converted
checkpoint works unchanged — with:

* per-output-channel symmetric int8 weight quantization computed from
  the float params inside the jitted forward;
* dynamic per-tensor activation quantization (no calibration data);
* int8×int8→int32 MXU dots with a fused dequant+bias+relu epilogue.

Quantization hygiene: ``conv1``/``conv2`` stay float (their 64/128-deep
contractions under-fill the MXU in any precision, and keeping the first
layers full-precision is standard post-training-quantization practice);
``conv3``..``conv5`` and the extras (``conv6``..``conv11_2``) run int8.
The ``conv4_3`` L2-normalization and the MultiBox heads stay float.

Opt-in via ``model.base_network.int8_trunk`` (serving only — the flag
is ignored when ``train=True``; see ``SSDFeatureExtractor``).

reference context: the network being quantized mirrors
luminoth/models/ssd/feature_extractor.py:27-132.
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from luminoth_tpu.models.base.quantized_tail import (
    _int8_conv3x3,
    _int8_matmul_1x1,
    activation_quant,
    quantize_per_tensor,
    quantize_weight_per_channel,
)
from luminoth_tpu.models.base.vgg import _STAGES

_FLOAT_STAGES = ("conv1", "conv2")


class _ConvParams(nn.Module):
    """Declares the same ``kernel``/``bias`` params an ``nn.Conv`` would."""

    shape: tuple

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.shape[-1],)
        )
        return kernel, bias


def int8_conv(x, kernel, bias, stride=1, rate=1, padding="same",
              module=None, qname=None, static=False):
    """Float-in/float-out int8 conv (+bias) for 1x1 or 3x3 kernels.

    With ``module``/``qname``/``static`` the activation scale comes from
    the calibrated ``int8_stats`` collection instead of an in-graph max
    pass (see ``activation_quant``).
    """
    if module is not None:
        x_q, x_scale = activation_quant(module, x, qname, static)
    else:
        x_q, x_scale = quantize_per_tensor(x)
    w_q, w_scales = quantize_weight_per_channel(kernel)
    if kernel.shape[0] == 1:
        return _int8_matmul_1x1(x_q, x_scale, w_q, w_scales, bias)
    return _int8_conv3x3(
        x_q, x_scale, w_q, w_scales, bias,
        stride=stride, rate=rate, padding=padding,
    )


class Int8VGG16(nn.Module):
    """Int8 inference twin of the truncated ``VGG16`` trunk.

    Same module names and parameter pytree as the float trunk under the
    shared ``vgg_16`` scope. Returns ``(conv4_3, conv5_3)`` — the two
    endpoints the SSD extractor consumes — as float32. The unquantized
    ``conv1``/``conv2`` stages run in ``dtype`` (bf16 when serving),
    like the float path would.
    """

    static_scales: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        conv4_3 = None
        for reps, features, stage in _STAGES:
            for i in range(1, reps + 1):
                kernel, bias = _ConvParams(
                    (3, 3, x.shape[-1], features),
                    name=f"{stage}/{stage}_{i}",
                )()
                if stage in _FLOAT_STAGES:
                    x = jax.lax.conv_general_dilated(
                        x.astype(self.dtype), kernel.astype(self.dtype),
                        (1, 1), "SAME",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    ) + bias.astype(self.dtype)
                else:
                    x = int8_conv(
                        x, kernel, bias, module=self,
                        qname=f"{stage}_{i}_amax",
                        static=self.static_scales,
                    )
                x = nn.relu(x)
            if stage == "conv4":
                conv4_3 = x
            if stage != "conv5":
                x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
        return conv4_3, x
