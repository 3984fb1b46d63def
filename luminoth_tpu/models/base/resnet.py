"""ResNet v1/v2 backbones in Flax, with slim-compatible structure.

Built to mirror the *behavior* of the reference's slim ResNets
(reference: luminoth/models/base/base_network.py:18-27 wraps
``tf.contrib.slim.nets.resnet_v1/v2``), because checkpoint-zoo parity depends
on them: stride is applied on the **last** unit of each block, ``output_stride``
switches to atrous (dilated) convolution once the target stride is reached, and
stride-2 convs use explicit ("conv2d_same") padding so spatial dims match TF.

TPU-first details:
* NHWC layout; convs run in ``dtype`` (bfloat16 by default in model configs)
  with float32 params and float32 batch-norm statistics.
* Fixed static shapes — backbones are jit-compiled once per input bucket.
* The detection models truncate at ``block3`` (stride 16 with
  ``output_stride=16``) and run ``block4`` as a "tail" over pooled ROIs
  (reference: luminoth/models/base/truncated_base_network.py:8-16,56-95).
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

# (base_depth, num_units, stride) per block; stride applies to the LAST unit.
RESNET_BLOCK_DEFS = {
    50: ((64, 3, 2), (128, 4, 2), (256, 6, 2), (512, 3, 1)),
    101: ((64, 3, 2), (128, 4, 2), (256, 23, 2), (512, 3, 1)),
    152: ((64, 3, 2), (128, 8, 2), (256, 36, 2), (512, 3, 1)),
}


def conv2d_same(x, features, kernel_size, stride, rate, name, dtype,
                use_bias=False):
    """TF-slim ``conv2d_same``: explicit pad + VALID for strided convs."""
    if stride == 1:
        return nn.Conv(
            features,
            (kernel_size, kernel_size),
            strides=(1, 1),
            kernel_dilation=(rate, rate),
            padding="SAME",
            use_bias=use_bias,
            dtype=dtype,
            name=name,
        )(x)
    kernel_eff = kernel_size + (kernel_size - 1) * (rate - 1)
    pad_total = kernel_eff - 1
    pad_beg = pad_total // 2
    pad_end = pad_total - pad_beg
    x = jnp.pad(x, ((0, 0), (pad_beg, pad_end), (pad_beg, pad_end), (0, 0)))
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        kernel_dilation=(rate, rate),
        padding="VALID",
        use_bias=use_bias,
        dtype=dtype,
        name=name,
    )(x)


class _BatchNorm(nn.Module):
    """Batch norm with slim's resnet defaults (eps 1e-5, scale on)."""

    train: bool = False
    dtype: Any = jnp.float32
    scale: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.BatchNorm(
            use_running_average=not self.train,
            momentum=0.997,
            epsilon=1e-5,
            use_scale=self.scale,
            use_bias=True,
            dtype=self.dtype,
            name="BatchNorm",
        )(x)


class BottleneckV1(nn.Module):
    """ResNet v1 bottleneck: 1x1 / 3x3(stride, rate) / 1x1, post-add relu."""

    depth: int
    depth_bottleneck: int
    stride: int
    rate: int = 1
    train_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        depth_in = x.shape[-1]
        if depth_in == self.depth:
            if self.stride == 1:
                shortcut = x
            else:
                shortcut = nn.max_pool(
                    x, (1, 1), strides=(self.stride, self.stride), padding="VALID"
                )
        else:
            shortcut = nn.Conv(
                self.depth,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                name="shortcut",
            )(x)
            shortcut = _BatchNorm(self.train_bn, self.dtype, name="shortcut_bn")(
                shortcut
            )

        residual = nn.Conv(
            self.depth_bottleneck, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        residual = _BatchNorm(self.train_bn, self.dtype, name="conv1_bn")(residual)
        residual = nn.relu(residual)

        residual = conv2d_same(
            residual, self.depth_bottleneck, 3, self.stride, self.rate,
            "conv2", self.dtype,
        )
        residual = _BatchNorm(self.train_bn, self.dtype, name="conv2_bn")(residual)
        residual = nn.relu(residual)

        residual = nn.Conv(
            self.depth, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(residual)
        residual = _BatchNorm(self.train_bn, self.dtype, name="conv3_bn")(residual)

        return nn.relu(shortcut + residual)


class BottleneckV2(nn.Module):
    """ResNet v2 pre-activation bottleneck."""

    depth: int
    depth_bottleneck: int
    stride: int
    rate: int = 1
    train_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        depth_in = x.shape[-1]
        preact = _BatchNorm(self.train_bn, self.dtype, name="preact")(x)
        preact = nn.relu(preact)

        if depth_in == self.depth:
            if self.stride == 1:
                shortcut = x
            else:
                shortcut = nn.max_pool(
                    x, (1, 1), strides=(self.stride, self.stride), padding="VALID"
                )
        else:
            # slim builds the v2 shortcut/conv3 with normalizer_fn=None,
            # which leaves the default bias on — the pretrained
            # checkpoints carry those biases (unlike v1, where BatchNorm
            # replaces them).
            shortcut = nn.Conv(
                self.depth,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=True,
                dtype=self.dtype,
                name="shortcut",
            )(preact)

        residual = nn.Conv(
            self.depth_bottleneck, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv1",
        )(preact)
        residual = _BatchNorm(self.train_bn, self.dtype, name="conv1_bn")(residual)
        residual = nn.relu(residual)

        residual = conv2d_same(
            residual, self.depth_bottleneck, 3, self.stride, self.rate,
            "conv2", self.dtype,
        )
        residual = _BatchNorm(self.train_bn, self.dtype, name="conv2_bn")(residual)
        residual = nn.relu(residual)

        residual = nn.Conv(
            self.depth, (1, 1), use_bias=True, dtype=self.dtype, name="conv3"
        )(residual)

        return shortcut + residual


def _plan_units(block_defs, output_stride, stride_first=False):
    """Expand block defs into per-unit (block, unit, stride, rate) schedules.

    Implements slim's ``stack_blocks_dense`` atrous bookkeeping: once the
    accumulated stride reaches ``output_stride``, further strides become
    dilation rates. The root conv+pool contribute stride 4.

    ``stride_first`` switches to torchvision's convention so converted
    torchvision-pretrained weights compute the features they were trained
    for. That convention differs from slim's in two ways: downsampling
    happens on the FIRST unit of a block (slim: last), and it happens at
    stage ENTRY, so the slim per-block strides shift one block later —
    (2, 2, 2, 1) becomes (1, 2, 2, 2). Both yield the same overall stride.
    """
    plan = []
    current_stride = 4
    rate = 1
    if stride_first:
        shifted = (1,) + tuple(s for _, _, s in block_defs[:-1])
        block_defs = tuple(
            (bd, nu, st) for (bd, nu, _), st in zip(block_defs, shifted)
        )
    for b, (base_depth, num_units, block_stride) in enumerate(block_defs, start=1):
        units = []
        for u in range(num_units):
            stride_unit = 0 if stride_first else num_units - 1
            unit_stride = block_stride if u == stride_unit else 1
            if output_stride is not None and current_stride == output_stride:
                units.append((base_depth, 1, rate))
                rate *= unit_stride
            else:
                units.append((base_depth, unit_stride, 1))
                current_stride *= unit_stride
        plan.append((f"block{b}", units))
        if output_stride is not None and current_stride > output_stride:
            raise ValueError("output_stride not reachable with these blocks")
    return plan


class ResNet(nn.Module):
    """ResNet v1/v2 trunk with endpoints dict output.

    Attributes:
        depth: 50 / 101 / 152.
        version: 1 or 2.
        output_stride: optional atrous output stride (detection uses 16).
        endpoint: stop after this block (e.g. ``"block3"``); ``None`` = full.
        num_classes: adds a logits head when set (classification use).
        global_pool: average-pool the final feature map.
    """

    depth: int = 101
    version: int = 1
    output_stride: Optional[int] = None
    endpoint: Optional[str] = None
    num_classes: Optional[int] = None
    global_pool: bool = False
    train_bn: bool = False
    stride_first: bool = False
    remat: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        block_defs = RESNET_BLOCK_DEFS[self.depth]
        unit_cls = BottleneckV1 if self.version == 1 else BottleneckV2
        if self.remat:
            # Per-unit rematerialization: the backward pass recomputes one
            # bottleneck at a time instead of keeping every intermediate
            # live — the structured remat a detector trunk needs (a single
            # whole-function jax.checkpoint still peaks at full activation
            # liveness during the backward sweep).
            unit_cls = nn.remat(unit_cls)
        endpoints = {}

        x = x.astype(self.dtype)
        # v2's root conv has no normalizer in slim, so it carries a bias.
        x = conv2d_same(
            x, 64, 7, 2, 1, "conv1", self.dtype,
            use_bias=self.version == 2,
        )
        if self.version == 1:
            x = _BatchNorm(self.train_bn, self.dtype, name="conv1_bn")(x)
            x = nn.relu(x)
        if self.stride_first:
            # torchvision: MaxPool2d(3, stride=2, padding=1) — implicit
            # -inf padding.
            x = jnp.pad(
                x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf,
            )
        # else slim: max_pool2d(3, stride=2) defaults to VALID, no padding.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        endpoints["root"] = x

        for block_name, units in _plan_units(
            block_defs, self.output_stride, self.stride_first
        ):
            for u, (base_depth, stride, rate) in enumerate(units, start=1):
                x = unit_cls(
                    depth=base_depth * 4,
                    depth_bottleneck=base_depth,
                    stride=stride,
                    rate=rate,
                    train_bn=self.train_bn,
                    dtype=self.dtype,
                    name=f"{block_name}/unit_{u}",
                )(x)
            endpoints[block_name] = x
            if self.endpoint == block_name:
                return x, endpoints

        if self.endpoint is not None:
            # A typo'd endpoint would silently return the full stride-32
            # trunk and break every downstream geometry assumption.
            raise ValueError(
                f"Unknown endpoint {self.endpoint!r}; expected one of "
                f"{sorted(n for n in endpoints if n != 'root')}"
            )

        if self.version == 2:
            x = _BatchNorm(self.train_bn, self.dtype, name="postnorm")(x)
            x = nn.relu(x)
        endpoints["postnorm"] = x

        if self.global_pool:
            x = jnp.mean(x, axis=(1, 2), keepdims=True)
        if self.num_classes:
            x = nn.Conv(
                self.num_classes, (1, 1), dtype=self.dtype, name="logits"
            )(x)
            x = jnp.squeeze(x, axis=(1, 2)) if self.global_pool else x
        endpoints["output"] = x
        return x, endpoints


class ResNetTail(nn.Module):
    """The detached ``block4`` run over pooled ROI crops.

    Mirrors the reference's ``_build_tail``
    (truncated_base_network.py:56-95): three stride-1 bottlenecks at depth
    2048 / bottleneck 512, applied to (R, S, S, C) ROI features.
    """

    depth: int = 101
    version: int = 1
    train_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        base_depth, num_units, _ = RESNET_BLOCK_DEFS[self.depth][-1]
        unit_cls = BottleneckV1 if self.version == 1 else BottleneckV2
        x = x.astype(self.dtype)
        for u in range(1, num_units + 1):
            x = unit_cls(
                depth=base_depth * 4,
                depth_bottleneck=base_depth,
                stride=1,
                rate=1,
                train_bn=self.train_bn,
                dtype=self.dtype,
                name=f"block4/unit_{u}",
            )(x)
        return x
