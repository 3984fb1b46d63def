"""Int8 twins of the ResNet tail and trunk for serving.

The parity-budget inference profile is bound by the block4 tail over
pooled ROIs — bf16 matmuls already near roofline (docs/usage/
performance.md) — with the block1-3 trunk most of the rest. The TPU MXU
runs int8 at twice the bf16 rate, so these modules recompute the SAME
networks (same parameter pytree, any converted or trained checkpoint
works unchanged) with:

* batch-norm folded into the conv weights at apply time (inference BN
  is an affine transform per output channel);
* per-output-channel symmetric int8 weight quantization, computed from
  the float params inside the jitted forward (a one-pass read of the
  ~15M tail weights, negligible against the tail matmuls);
* dynamic per-tensor activation quantization (``max|x|/127``) — no
  calibration data needed;
* int8×int8→int32 MXU dots with a fused dequant+bias+relu epilogue;
  residual adds stay in float.

These are opt-in SERVING profiles (``model.base_network.int8_tail`` /
``int8_trunk``): post-training int8 typically costs a few tenths of a
point of mAP, so they are never enabled by default and never used in
training (the flags are ignored when ``train=True``).

reference context: the tail being quantized mirrors
luminoth/models/base/truncated_base_network.py:56-95 (_build_tail).
"""

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from luminoth_tpu.models.base.resnet import RESNET_BLOCK_DEFS, _plan_units

_BN_EPS = 1e-5  # slim resnet default, matches resnet._BatchNorm


def quantize_per_tensor(x):
    """Symmetric dynamic per-tensor quantization to int8.

    Returns ``(x_q, scale)`` with ``x ≈ x_q * scale``.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def activation_quant(module, x, name, static):
    """Quantize an activation tensor, statically or dynamically.

    Dynamic mode (default) computes ``max|x|`` on the fly — zero
    calibration, but each quant point costs a full extra pass over the
    tensor (measured ~5 ms on (4000,7,7,512) ROI activations, which is
    what keeps dynamic int8 from beating bf16 on the FRCNN tail).

    Static mode reads a calibrated per-point ``amax`` from the
    ``int8_stats`` flax collection; the round/clip/cast then fuses into
    the producing op's epilogue and the extra pass disappears.
    Calibration = any forward with ``mutable=["int8_stats"]``: the
    variable accumulates the running max (the forward itself still uses
    the dynamic scale, so calibration outputs stay exact). The
    predictor runs one automatically when ``int8_static`` is on.
    """
    if not static:
        return quantize_per_tensor(x)
    amax_v = module.variable(
        "int8_stats", name, lambda: jnp.zeros((), jnp.float32)
    )
    if module.is_mutable_collection("int8_stats"):
        cur = jnp.max(jnp.abs(x.astype(jnp.float32)))
        amax_v.value = jnp.maximum(amax_v.value, cur)
        scale = jnp.maximum(cur, 1e-8) / 127.0
    else:
        scale = jnp.maximum(amax_v.value, 1e-8) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / scale), -127, 127
    ).astype(jnp.int8)
    return q, scale


def quantize_weight_per_channel(w):
    """Symmetric int8 quantization with one scale per output channel.

    ``w`` is (..., out); returns ``(w_q, scales (out,))``.
    """
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w.reshape(-1, w.shape[-1])), axis=0)
    scales = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scales), -127, 127)
    return q.astype(jnp.int8), scales


def fold_bn(kernel, gamma, beta, mean, var, eps=_BN_EPS):
    """Fold an inference-mode BatchNorm into the preceding conv.

    conv(x, W) then BN ≡ conv(x, W·γ/σ) + (β − μ·γ/σ).
    """
    inv_sigma = gamma.astype(jnp.float32) / jnp.sqrt(
        var.astype(jnp.float32) + eps
    )
    folded_kernel = kernel.astype(jnp.float32) * inv_sigma
    folded_bias = beta.astype(jnp.float32) - mean.astype(
        jnp.float32
    ) * inv_sigma
    return folded_kernel, folded_bias


def _int8_matmul_1x1(x_q, x_scale, w_q, w_scales, bias):
    """(N, H, W, Cin) int8 × folded 1x1 kernel → float (N, H, W, Cout).

    Uses the native int8 convolution lowering: measured on v5e (r3,
    R=4000 ROI-tail shapes) it runs 1.3-1.5x the bf16 rate, where the
    earlier reshape+``dot_general`` formulation failed to fuse its
    int32→f32 epilogue and lost to bf16 outright.
    """
    acc = jax.lax.conv_general_dilated(
        x_q, w_q.reshape(1, 1, *w_q.shape[-2:]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * w_scales) + bias


def _conv_pads(size, kernel_eff, stride, padding):
    """(pad_beg, pad_end, out_size) for one spatial dim.

    ``conv2d_same``: slim's explicit symmetric pad + VALID (stride-
    independent total of ``kernel_eff - 1``), used by the ResNet trunk.
    ``same``: TF/XLA SAME (``out = ceil(size/stride)``, minimal total,
    extra pixel on the end), used by ``nn.Conv(padding="SAME")`` — the
    VGG/SSD float path. The two agree at stride 1.
    ``valid``: no padding.
    """
    if padding == "conv2d_same":
        pad_total = kernel_eff - 1
    elif padding == "same":
        out = -(-size // stride)
        pad_total = max((out - 1) * stride + kernel_eff - size, 0)
    elif padding == "valid":
        pad_total = 0
    else:
        raise ValueError(f"Unknown padding {padding!r}")
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    out = (size + pad_total - kernel_eff) // stride + 1
    return pad_beg, pad_end, out


def _int8_conv3x3(x_q, x_scale, w_q, w_scales, bias, stride=1, rate=1,
                  padding="conv2d_same"):
    """3x3 conv via XLA's native int8 convolution lowering.

    Measured on v5e (r3 piecewise probe, (4000,7,7,512) tail shapes):
    native int8 conv 5.4 ms vs bf16 8.0 ms vs the previous 9-shifted-
    dots formulation's 23.7 ms — the decomposition materialized nine
    int32 partial accumulators in HBM, swamping the MXU win, while the
    native lowering keeps accumulation on-chip. ``padding`` picks the
    spatial semantics (see ``_conv_pads``): ``conv2d_same`` matches the
    float ``resnet.conv2d_same`` path, ``same``/``valid`` match
    ``nn.Conv``; explicit pad + VALID keeps int arithmetic exact.
    """
    n, h, w, cin = x_q.shape
    kernel_eff = 3 + 2 * (rate - 1)
    ph0, ph1, _ = _conv_pads(h, kernel_eff, stride, padding)
    pw0, pw1, _ = _conv_pads(w, kernel_eff, stride, padding)
    acc = jax.lax.conv_general_dilated(
        jnp.pad(x_q, ((0, 0), (ph0, ph1), (pw0, pw1), (0, 0))),
        w_q, (stride, stride), "VALID",
        rhs_dilation=(rate, rate),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (x_scale * w_scales) + bias


class _ConvKernel(nn.Module):
    """Declares the same ``kernel`` param an ``nn.Conv`` would."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel", nn.initializers.lecun_normal(), self.shape
        )


class _BNVars(nn.Module):
    """Declares the same params/stats ``resnet._BatchNorm`` would."""

    features: int

    @nn.compact
    def __call__(self):
        return _BNInner(self.features, name="BatchNorm")()


class _BNInner(nn.Module):
    features: int

    @nn.compact
    def __call__(self):
        f = self.features
        scale = self.param("scale", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        return scale, bias, mean.value, var.value


class Int8BottleneckV1(nn.Module):
    """Int8 inference twin of ``resnet.BottleneckV1``.

    Declares parameters under the exact names/shapes of the float
    bottleneck so both paths share one checkpoint. ``stride``/``rate``
    mirror the float unit (stride on the 3x3 conv and the shortcut,
    conv2d_same padding semantics).
    """

    depth: int
    depth_bottleneck: int
    stride: int = 1
    rate: int = 1
    static_scales: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        depth_in = x.shape[-1]
        x_q, x_scale = activation_quant(
            self, x, "in_amax", self.static_scales
        )

        if depth_in == self.depth:
            if self.stride == 1:
                shortcut = x.astype(jnp.float32)
            else:
                # float path uses max_pool((1,1), stride) == subsample.
                shortcut = x[:, ::self.stride, ::self.stride, :].astype(
                    jnp.float32
                )
        else:
            sc_kernel = _ConvKernel(
                (1, 1, depth_in, self.depth), name="shortcut"
            )()
            sc_bn = _BNVars(self.depth, name="shortcut_bn")()
            k, b = fold_bn(sc_kernel, *sc_bn)
            k_q, k_s = quantize_weight_per_channel(k)
            shortcut = _int8_matmul_1x1(
                x_q[:, ::self.stride, ::self.stride, :], x_scale, k_q, k_s, b
            )

        k1 = _ConvKernel(
            (1, 1, depth_in, self.depth_bottleneck), name="conv1"
        )()
        bn1 = _BNVars(self.depth_bottleneck, name="conv1_bn")()
        k, b = fold_bn(k1, *bn1)
        k_q, k_s = quantize_weight_per_channel(k)
        residual = nn.relu(_int8_matmul_1x1(x_q, x_scale, k_q, k_s, b))

        r_q, r_scale = activation_quant(
            self, residual, "conv1_amax", self.static_scales
        )
        k2 = _ConvKernel(
            (3, 3, self.depth_bottleneck, self.depth_bottleneck),
            name="conv2",
        )()
        bn2 = _BNVars(self.depth_bottleneck, name="conv2_bn")()
        k, b = fold_bn(k2, *bn2)
        k_q, k_s = quantize_weight_per_channel(k)
        residual = nn.relu(_int8_conv3x3(
            r_q, r_scale, k_q, k_s, b, stride=self.stride, rate=self.rate
        ))

        r_q, r_scale = activation_quant(
            self, residual, "conv2_amax", self.static_scales
        )
        k3 = _ConvKernel(
            (1, 1, self.depth_bottleneck, self.depth), name="conv3"
        )()
        bn3 = _BNVars(self.depth, name="conv3_bn")()
        k, b = fold_bn(k3, *bn3)
        k_q, k_s = quantize_weight_per_channel(k)
        residual = _int8_matmul_1x1(r_q, r_scale, k_q, k_s, b)

        return nn.relu(shortcut + residual).astype(self.dtype)


class Int8ResNetTail(nn.Module):
    """Int8 inference twin of ``resnet.ResNetTail`` (v1 only).

    Same module names (``block4/unit_N``) and parameter pytree as the
    float tail; output dtype follows ``dtype`` like the float path.
    """

    depth: int = 101
    version: int = 1
    static_scales: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.version != 1:
            raise ValueError("int8_tail supports resnet v1 tails only")
        base_depth, num_units, _ = RESNET_BLOCK_DEFS[self.depth][-1]
        for u in range(1, num_units + 1):
            x = Int8BottleneckV1(
                depth=base_depth * 4,
                depth_bottleneck=base_depth,
                static_scales=self.static_scales,
                name=f"block4/unit_{u}",
            )(x)
        return x.astype(self.dtype)


class Int8ResNetTrunk(nn.Module):
    """Int8 inference twin of ``resnet.ResNet`` (v1 only).

    Same module names and parameter pytree as the float trunk, so either
    path loads any checkpoint. The root 7x7 conv stays in float (3 input
    channels — no MXU win, and keeping the first layer full-precision is
    the standard post-training-quantization hygiene); every bottleneck
    runs int8. Returns ``(feature_map, endpoints)`` like the float trunk.
    """

    depth: int = 101
    version: int = 1
    output_stride: Any = None
    endpoint: Any = None
    stride_first: bool = False
    static_scales: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.version != 1:
            raise ValueError("int8_trunk supports resnet v1 only")
        endpoints = {}
        x = x.astype(jnp.float32)

        # Root: conv2d_same(7x7, stride 2) + folded BN + relu, in float.
        kernel = _ConvKernel((7, 7, x.shape[-1], 64), name="conv1")()
        bn = _BNVars(64, name="conv1_bn")()
        k, b = fold_bn(kernel, *bn)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        x = jax.lax.conv_general_dilated(
            x, k, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        x = nn.relu(x)
        if self.stride_first:
            x = jnp.pad(
                x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf,
            )
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        endpoints["root"] = x

        for block_name, units in _plan_units(
            RESNET_BLOCK_DEFS[self.depth], self.output_stride,
            self.stride_first,
        ):
            for u, (base_depth, stride, rate) in enumerate(units, start=1):
                x = Int8BottleneckV1(
                    depth=base_depth * 4,
                    depth_bottleneck=base_depth,
                    stride=stride,
                    rate=rate,
                    static_scales=self.static_scales,
                    name=f"{block_name}/unit_{u}",
                )(x)
            endpoints[block_name] = x
            if self.endpoint == block_name:
                return x.astype(self.dtype), endpoints

        raise ValueError(
            f"int8_trunk requires a block endpoint; got {self.endpoint!r} "
            f"(expected one of {sorted(n for n in endpoints if n != 'root')})"
        )
