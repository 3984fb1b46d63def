"""Optimizer / learning-rate-schedule factory on optax.

reference: luminoth/utils/training.py:6-120 — same config surface
(``train.optimizer`` kwargs-style dict, ``train.learning_rate`` with
``decay_method``), built on optax so the optimizer state lives in the train
state pytree and shards with it.
"""

import jax.numpy as jnp
import optax

OPTIMIZERS = {"momentum", "adam", "gradient_descent", "rmsprop", "sgd"}


def model_dtype(config):
    """The model's compute dtype from ``model.compute_dtype``.

    Single source of truth for the trainer, evaluator, and predictor.
    """
    name = config.model.get("compute_dtype", "float32")
    try:
        return {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]
    except KeyError:
        raise ValueError(
            f"model.compute_dtype must be float32 or bfloat16, got {name!r}"
        ) from None


def get_learning_rate(train_config):
    """Build the LR schedule from ``train.learning_rate``.

    Supported ``decay_method``: none/(empty), ``piecewise_constant``,
    ``exponential_decay``, ``polynomial_decay``.
    """
    lr_config = dict(train_config.get("learning_rate") or {})
    method = lr_config.pop("decay_method", None)

    if not method or method == "none":
        value = lr_config.get("learning_rate", lr_config.get("value", 0.0003))
        # float() everywhere a rate enters: YAML 1.1 parses `1e-4` as a
        # STRING, and `learning_rate: {_replace: True}` in the base
        # config bypasses the merge-time type check for this subtree.
        return optax.constant_schedule(float(value))

    if method == "piecewise_constant":
        boundaries = [int(b) for b in lr_config["boundaries"]]
        values = [float(v) for v in lr_config["values"]]
        # optax expects {step: scale}; use absolute values via join.
        schedules = [optax.constant_schedule(v) for v in values]
        return optax.join_schedules(schedules, boundaries)

    if method == "exponential_decay":
        return optax.exponential_decay(
            init_value=float(
                lr_config.get(
                    "learning_rate",
                    lr_config.get("initial_learning_rate", 0.0003),
                )
            ),
            transition_steps=int(lr_config.get("decay_steps", 100000)),
            decay_rate=float(lr_config.get("decay_rate", 0.96)),
            staircase=bool(lr_config.get("staircase", False)),
        )

    if method == "polynomial_decay":
        init = float(
            lr_config.get(
                "learning_rate",
                lr_config.get("initial_learning_rate", 0.0003),
            )
        )
        return optax.polynomial_schedule(
            init_value=init,
            end_value=float(lr_config.get("end_learning_rate", 0.0001)),
            power=float(lr_config.get("power", 1.0)),
            transition_steps=int(lr_config.get("decay_steps", 100000)),
        )

    raise ValueError('Invalid learning_rate method "{}"'.format(method))


def get_optimizer(train_config, trainable_mask=None, weight_decay=0.0,
                  weight_decay_mask=None):
    """Build the optax optimizer chain from ``train.optimizer``.

    Args:
        train_config: the ``train`` section of the config.
        trainable_mask: optional pytree of bools — False entries get zero
            updates (replaces the reference's trainable-variable collections,
            e.g. ``fine_tune_from`` boundaries).
        weight_decay: optional L2 coefficient (the reference's slim
            regularizers, applied in the optimizer instead of the loss).
        weight_decay_mask: pytree-of-bools / callable restricting decay to
            kernel weights.

    Returns:
        ``(optax transformation, lr schedule)``.
    """
    opt_config = dict(train_config.get("optimizer") or {})
    opt_type = opt_config.pop("type", "momentum")
    if opt_type not in OPTIMIZERS:
        raise ValueError('Invalid optimizer type "{}"'.format(opt_type))

    schedule = get_learning_rate(train_config)

    chain = []
    if train_config.get("clip_by_norm"):
        chain.append(optax.clip_by_global_norm(10.0))
    # Weight decay sits OUTSIDE the trainable/freeze partition (which
    # replaces frozen leaves with MaskedNode); frozen params get zero decay
    # via their coefficient instead.
    if weight_decay is not None and not isinstance(weight_decay, (int, float)):
        if trainable_mask is not None:
            import jax

            weight_decay = jax.tree_util.tree_map(
                lambda c, t: c if t else 0.0, weight_decay, trainable_mask
            )
        chain.append(add_decayed_weights_per_param(weight_decay))
    elif weight_decay:
        chain.append(
            optax.add_decayed_weights(weight_decay, mask=weight_decay_mask)
        )

    # float() every rate-like kwarg: YAML 1.1 parses `1e-8` as a string,
    # and `optimizer: {_replace: True}` bypasses the merge type check.
    if opt_type == "momentum":
        opt = optax.sgd(
            schedule, momentum=float(opt_config.get("momentum", 0.9))
        )
    elif opt_type in ("gradient_descent", "sgd"):
        opt = optax.sgd(schedule)
    elif opt_type == "adam":
        opt = optax.adam(
            schedule,
            b1=float(opt_config.get("beta1", 0.9)),
            b2=float(opt_config.get("beta2", 0.999)),
            eps=float(opt_config.get("epsilon", 1e-8)),
        )
    elif opt_type == "rmsprop":
        opt = optax.rmsprop(
            schedule,
            decay=float(opt_config.get("decay", 0.9)),
            momentum=float(opt_config.get("momentum", 0.0)),
            eps=float(opt_config.get("epsilon", 1e-10)),
        )

    if trainable_mask is not None:
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()},
            param_labels=lambda params: _mask_to_labels(
                trainable_mask, params
            ),
        )
    chain.append(opt)
    return optax.chain(*chain), schedule


def _mask_to_labels(mask, params):
    import jax

    return jax.tree_util.tree_map(
        lambda m: "train" if m else "freeze", mask
    )


# Depth order of backbone stage scopes, for ordering leaves the way TF
# creation order did in the reference. Only relative order within one
# family matters (a params tree holds either resnet block scopes or vgg
# conv/fc scopes, never both); SSD's extras conv6..conv11 are created
# after the vgg trunk (feature_extractor.py), mirroring the reference.
_FINETUNE_STAGE_ORDER = [
    "conv1", "conv2", "conv3", "conv4", "conv5",
    "fc6", "conv6", "fc7", "conv7", "fc8",
    "conv8", "conv9", "conv10", "conv11",
    "block1", "block2", "block3", "block4",
]

def _finetune_natural(s):
    """Natural-sort tuple: digit runs compare numerically (unit_10 after
    unit_9), with a type tag so ints and strs never compare directly."""
    import re

    return tuple(
        ("d", int(t)) if t.isdigit() else ("s", t)
        for t in re.split(r"(\d+)", s)
        if t
    )


def _finetune_depth_key(path_str):
    """Depth key of a backbone leaf path, or None if it holds no stage
    scope (e.g. resnet postnorm): (stage index, natural order of the
    path from the stage scope onward) — sub-stage precision, so
    'conv4/conv4_2' or 'block4/unit_2' boundaries land mid-stage exactly
    as the reference's variable-order substring match does."""
    segments = path_str.split("/")
    for i, seg in enumerate(segments):
        stage = seg if seg in _FINETUNE_STAGE_ORDER else seg.split("_")[0]
        if stage in _FINETUNE_STAGE_ORDER:
            return (
                _FINETUNE_STAGE_ORDER.index(stage),
                _finetune_natural("/".join(segments[i:])),
            )
    return None


def build_trainable_mask(params, model_config):
    """Pytree mask of trainable params from the reference's flags.

    reference semantics (base_network.py:211-241,
    truncated_base_network.py:97-144):
    * ``base_network.trainable: False`` freezes the whole backbone;
    * ``fine_tune_from: <scope>`` orders the backbone variables by depth
      (the reference's creation order) and trains STARTING FROM the
      first whose name contains the string — the named scope itself is
      trainable, everything before it is frozen (reference
      base_network.py:232-241: ``all_variables[index:]``); a string
      matching nothing raises ValueError, as the reference does;
    * ``freeze_tail: True`` freezes the block4 tail.
    """
    import re

    import jax

    cfg = model_config.get("base_network", {})
    trainable = cfg.get("trainable", True)
    fine_tune_from = cfg.get("fine_tune_from")
    freeze_tail = cfg.get("freeze_tail", False)

    def names_of(path):
        return [getattr(p, "key", str(p)) for p in path]

    def is_backbone(names):
        # Backbone scopes: FRCNN's "base_network", SSD's
        # "feature_extractor"; the block4 tail is handled separately.
        return (
            "base_network" in names[0] or "feature_extractor" in names[0]
        ) and "tail" not in names[0]

    trainable_leaves = None
    if fine_tune_from:
        # Reference variable names carry module/arch prefixes our param
        # paths don't ("vgg_16/fc6" → "fc6"); strip them from the query.
        arch_re = re.compile(
            r"vgg_16|truncated_vgg_16|resnet_v[12]_\d+"
            r"|truncated_base_network|fasterrcnn|ssd"
        )
        stripped = "/".join(
            c for c in str(fine_tune_from).split("/")
            if c and not arch_re.fullmatch(c)
        )
        queries = [q for q in {str(fine_tune_from), stripped} if q]

        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        staged = []
        for path, _leaf in flat:
            names = names_of(path)
            if not is_backbone(names):
                continue
            joined = "/".join(names)
            key = _finetune_depth_key(joined)
            if key is not None:
                staged.append((key, joined))
        staged.sort()
        ordered = [joined for _, joined in staged]
        boundary = next(
            (i for i, joined in enumerate(ordered)
             if any(q in joined for q in queries)),
            None,
        )
        if boundary is None:
            raise ValueError(
                '"{}" is an invalid value of fine_tune_from for this '
                "architecture.".format(fine_tune_from)
            )
        trainable_leaves = set(ordered[boundary:])

    def path_trainable(path):
        names = names_of(path)
        if "tail" in names[0]:
            return not freeze_tail
        if not is_backbone(names):
            return True
        if not trainable:
            return False
        if trainable_leaves is not None:
            joined = "/".join(names)
            if _finetune_depth_key(joined) is None:
                # Scopes outside the ordered trunk (postnorm, logits)
                # have no reference boundary position; keep them
                # trainable, as the pre-boundary freeze targets the
                # early trunk.
                return True
            return joined in trainable_leaves
        return True

    return jax.tree_util.tree_map_with_path(
        lambda path, _: path_trainable(path), params
    )


def l2_regularization_loss(params, coefficients):
    """The reference's reported L2 regularization term.

    slim attaches ``l2_regularizer(scale)`` per module and sums
    ``scale * ||w||^2 / 2`` into the train total
    (reference: fasterrcnn.py:158-259 reports ``no_reg_loss`` =
    total - regularization). Here decay is applied by the optimizer
    (optax add_decayed_weights), so this term exists purely so the
    reported ``total_loss``/``no_reg_loss`` curves mean the same thing
    they do in the reference.
    """
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(
            lambda w, c: (
                0.5 * float(c) * jnp.sum(jnp.square(w.astype(jnp.float32)))
                if c else jnp.zeros((), jnp.float32)
            ),
            params, coefficients,
        )
    )
    return sum(leaves) if leaves else jnp.zeros((), jnp.float32)


def build_weight_decay_mask(params):
    """Decay only kernel/weight matrices (not biases, scales, BN params)."""
    import jax

    def is_kernel(path, _):
        last = getattr(path[-1], "key", str(path[-1]))
        return last in ("kernel", "w")

    return jax.tree_util.tree_map_with_path(is_kernel, params)


def build_weight_decay_coefficients(params, model_config):
    """Per-parameter L2 coefficients from the reference's three knobs.

    reference: slim regularizers attach per-module — the backbone arg_scope
    ``weight_decay`` (base_config.yml arg_scope), ``rpn.
    l2_regularization_scale`` and ``rcnn.l2_regularization_scale``. Returns
    a pytree of floats (0.0 for non-kernel params).
    """
    import jax

    base_wd = float(
        (model_config.get("base_network") or {})
        .get("arg_scope", {})
        .get("weight_decay", 0.0)
        or 0.0
    )
    rpn_wd = float(
        (model_config.get("rpn") or {}).get("l2_regularization_scale", base_wd)
        or 0.0
    )
    rcnn_wd = float(
        (model_config.get("rcnn") or {}).get(
            "l2_regularization_scale", base_wd
        )
        or 0.0
    )

    def coeff(path, _):
        last = getattr(path[-1], "key", str(path[-1]))
        if last not in ("kernel", "w"):
            return 0.0
        root = getattr(path[0], "key", str(path[0]))
        if root == "rpn":
            return rpn_wd
        if root == "rcnn":
            return rcnn_wd
        return base_wd

    return jax.tree_util.tree_map_with_path(coeff, params)


def add_decayed_weights_per_param(coefficients):
    """Optax transformation: per-parameter decoupled L2 coefficients."""
    import jax

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("add_decayed_weights_per_param needs params")
        updates = jax.tree_util.tree_map(
            lambda g, p, c: g + c * p, updates, params, coefficients
        )
        return updates, state

    return optax.GradientTransformation(init_fn, update_fn)
