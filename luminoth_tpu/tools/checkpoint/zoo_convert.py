"""Reference detector-checkpoint conversion: full TF model → native ckpt.

Converts complete trained detector checkpoints from the reference (e.g.
the zoo's ``accurate`` Faster R-CNN/COCO and ``fast`` SSD/VOC bundles,
reference: luminoth/tools/checkpoint/__init__.py:21-24, or any
``lumi train`` output) into a native msgpack checkpoint that
``lumi predict`` / ``lumi eval`` load directly.

Name resolution is by **suffix matching**: sonnet/TF variable names carry
outer scopes that vary with how the graph was built
(``fasterrcnn/truncated_base_network/resnet_v1_101/...``), so every
wanted relative name (``rpn/cls_conv/w``, ``resnet_v1_101/conv1/weights``)
is located by its trailing path components instead of an absolute path.

Head layers need no value transforms: sonnet ``Conv2D`` kernels are HWIO
and ``snt.Linear`` weights are (in, out), both matching flax.
"""

import logging

import numpy as np

logger = logging.getLogger(__name__)


class SuffixResolver:
    """Resolve checkpoint variables by trailing path components."""

    def __init__(self, ckpt_path):
        import tensorflow as tf

        self._reader = tf.train.load_checkpoint(ckpt_path)
        self.names = sorted(self._reader.get_variable_to_shape_map())

    def find(self, suffix):
        """Full variable name ending in ``suffix`` (None if absent)."""
        matches = [
            n for n in self.names
            if n == suffix or n.endswith("/" + suffix)
        ]
        if not matches:
            return None
        if len(matches) > 1:
            raise ValueError(
                f"ambiguous suffix {suffix!r}: {matches}"
            )
        return matches[0]

    def read(self, suffix):
        name = self.find(suffix)
        if name is None:
            return None
        return np.asarray(self._reader.get_tensor(name), dtype=np.float32)


def _head_conv(flat, resolver, flax_prefix, slim_suffix):
    """Map a sonnet Conv2D/Linear ``{w,b}`` pair onto flax kernel/bias."""
    w = resolver.read(f"{slim_suffix}/w")
    if w is None:
        return False
    flat[f"params/{flax_prefix}/kernel"] = w
    b = resolver.read(f"{slim_suffix}/b")
    if b is not None:
        flat[f"params/{flax_prefix}/bias"] = b
    return True


def convert_reference_fasterrcnn(resolver, architecture="resnet_v1_101"):
    """Flat dict for a reference Faster R-CNN training checkpoint."""
    from luminoth_tpu.tools.checkpoint.slim_convert import (
        convert_slim_resnet,
    )

    flat = convert_slim_resnet(resolver.read, architecture)
    for name in ("conv", "cls_conv", "bbox_conv"):
        if not _head_conv(flat, resolver, f"rpn/{name}", f"rpn/{name}"):
            raise KeyError(f"rpn/{name}/w not found in checkpoint")
    for name in ("fc_classifier", "fc_bbox"):
        if not _head_conv(flat, resolver, f"rcnn/{name}", f"rcnn/{name}"):
            raise KeyError(f"rcnn/{name}/w not found in checkpoint")
    i = 0
    while _head_conv(flat, resolver, f"rcnn/fc_{i}", f"rcnn/fc_{i}"):
        i += 1
    return flat


def convert_reference_ssd(resolver):
    """Flat dict for a reference SSD training checkpoint."""
    from luminoth_tpu.tools.checkpoint.slim_convert import (
        convert_slim_vgg16,
    )

    flat = convert_slim_vgg16(resolver.read, scopes=("feature_extractor",))
    extras = ("conv6", "conv7", "conv8_1", "conv8_2", "conv9_1", "conv9_2",
              "conv10_1", "conv10_2", "conv11_1", "conv11_2")
    for name in extras:
        if not _head_conv(
            flat, resolver, f"feature_extractor/{name}", name
        ):
            raise KeyError(f"{name}/w not found in checkpoint")
    scale = resolver.read("conv_4_3_norm/scale")
    if scale is None:
        scale = resolver.read("conv_4_3_norm/gamma")
    if scale is not None:
        flat["params/feature_extractor/conv4_3_norm/gamma"] = scale
    i = 0
    while _head_conv(
        flat, resolver,
        f"MultiBox_{i}_offsets_conv", f"MultiBox_{i}_offsets_conv",
    ):
        _head_conv(
            flat, resolver,
            f"MultiBox_{i}_classes_conv", f"MultiBox_{i}_classes_conv",
        )
        i += 1
    if i == 0:
        raise KeyError("no MultiBox_* heads found in checkpoint")
    return flat


def convert_zoo_checkpoint(ckpt_path, out_dir, config):
    """Convert a reference detector checkpoint into a native one.

    Args:
        ckpt_path: TF checkpoint prefix of the trained reference model.
        out_dir: directory to write the native ``ckpt/`` layout into;
            point ``train.job_dir`` there (or bundle with
            ``lumi checkpoint create``) to predict/evaluate.
        config: model config (native), used to build the variable tree.

    Returns (n_loaded, n_total) leaf counts.
    """
    import jax
    import jax.numpy as jnp

    from luminoth_tpu.models import get_model
    from luminoth_tpu.utils.checkpoint_io import (
        CheckpointManager,
        merge_flat_params,
    )
    from luminoth_tpu.utils.config import to_plain

    resolver = SuffixResolver(ckpt_path)
    model_type = config.model.type
    if model_type == "fasterrcnn":
        flat = convert_reference_fasterrcnn(
            resolver, config.model.base_network.architecture
        )
        init_args = dict(
            images=jnp.zeros((1, 128, 128, 3), jnp.float32)
        )
    else:
        flat = convert_reference_ssd(resolver)
        init_args = dict(
            images=jnp.zeros((1, 300, 300, 3), jnp.float32)
        )

    model = get_model(model_type)(to_plain(config))
    variables = jax.eval_shape(
        lambda: model.init(
            jax.random.PRNGKey(0), init_args["images"], train=False
        )
    )
    variables = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), variables
    )
    params, n_params = merge_flat_params(
        dict(variables["params"]),
        {k[len("params/"):]: v for k, v in flat.items()
         if k.startswith("params/")},
    )
    batch_stats = dict(variables.get("batch_stats", {}))
    n_stats = 0
    if batch_stats:
        batch_stats, n_stats = merge_flat_params(
            batch_stats,
            {k[len("batch_stats/"):]: v for k, v in flat.items()
             if k.startswith("batch_stats/")},
        )
    n_total = len(jax.tree_util.tree_leaves(params)) + len(
        jax.tree_util.tree_leaves(batch_stats)
    )
    n_loaded = n_params + n_stats
    logger.info("Converted %d/%d arrays", n_loaded, n_total)
    if n_loaded < n_total:
        # Surface exactly what didn't map — a partial detector is useless.
        from luminoth_tpu.utils.checkpoint_io import flatten_params

        missing = [
            k for k in flatten_params(
                {"params": params, "batch_stats": batch_stats}
            )
            if k not in flat
        ]
        logger.warning("Unmapped variables: %s", missing[:20])

    manager = CheckpointManager(out_dir)
    manager.save(
        {"step": 0, "params": params, "batch_stats": batch_stats}, 0
    )
    return n_loaded, n_total
