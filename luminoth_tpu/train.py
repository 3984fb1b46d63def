"""Training loop: jitted data-parallel train step + checkpointing + summaries.

reference: luminoth/train.py:19-326. The TF1 machinery maps as follows:

* ``MonitoredTrainingSession`` (auto-restore, periodic checkpoint) →
  orbax ``CheckpointManager`` with resume-from-latest and
  ``save_checkpoint_secs`` cadence;
* queue runners → the dataset's threaded prefetch loader;
* ``replica_device_setter`` PS/worker async data parallelism →
  a 1-D device mesh with the batch sharded on the data axis; XLA
  all-reduces gradients over ICI inside the jitted step;
* summaries → tensorboardX event files (same TensorBoard UI);
* chief-only side effects → ``jax.process_index() == 0``.

Like the reference's ``run()`` (train.py:19-21), ``run(config)`` accepts
injectable ``get_model_fn`` / ``get_dataset_fn`` seams for testing.
"""

import collections
import logging
import os
import time
from typing import Any

import click
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import unfreeze

from luminoth_tpu.datasets import get_dataset
from luminoth_tpu.models import get_model
from luminoth_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)
from luminoth_tpu.utils import fileio
from luminoth_tpu.utils.config import get_config, to_plain
from luminoth_tpu.utils.experiments import save_run
from luminoth_tpu.utils.training import (
    build_trainable_mask,
    build_weight_decay_mask,
    get_optimizer,
    model_dtype,
)

logger = logging.getLogger("luminoth_tpu.train")


@struct.dataclass
class TrainState:
    step: Any
    params: Any
    opt_state: Any
    batch_stats: Any


def init_model(model, config, batch_spec, rng):
    """Initialize model variables from a synthetic batch of the right shape."""
    images = jnp.zeros(batch_spec["image"], jnp.float32)
    gt = jnp.zeros(batch_spec["gt_boxes"], jnp.float32)
    variables = model.init(
        {"params": rng, "target": rng, "dropout": rng},
        images,
        gt_boxes=gt,
        train=True,
    )
    variables = unfreeze(variables)
    return variables.get("params"), variables.get("batch_stats", {})


def load_pretrained_backbone(params, batch_stats, config):
    """Load backbone weights from a native flat ``.npz`` file.

    Replaces the reference's slim-checkpoint restore + variable remapping
    (train.py:114-129, base_network.py:243-259). The file is produced by
    ``lumi checkpoint convert-backbone``; keys are ``params/<path>`` and
    ``batch_stats/<path>`` flattened variable paths.
    """
    weights_file = config.model.base_network.get("weights")
    if not weights_file:
        return params, batch_stats, False
    from luminoth_tpu.utils.checkpoint_io import (
        load_params_npz,
        merge_flat_params,
    )

    flat = load_params_npz(weights_file)
    layout = str(flat.pop("__meta__/layout", ""))
    if layout == "torchvision" and not config.model.base_network.get(
        "torchvision_compat"
    ):
        raise ValueError(
            f"{weights_file} holds torchvision-layout ResNet weights "
            "(stride on the first unit of each stage); set "
            "model.base_network.torchvision_compat: True so the network "
            "computes the features these weights were trained for."
        )
    if layout == "slim" and config.model.base_network.get(
        "torchvision_compat"
    ):
        raise ValueError(
            f"{weights_file} holds slim-layout ResNet weights (stride on "
            "the last unit of each block); remove "
            "model.base_network.torchvision_compat from the config."
        )
    flat_params = {
        k[len("params/"):]: v for k, v in flat.items()
        if k.startswith("params/")
    }
    flat_stats = {
        k[len("batch_stats/"):]: v for k, v in flat.items()
        if k.startswith("batch_stats/")
    }
    if not flat_params and not flat_stats:
        flat_params = flat  # un-prefixed layout
    params, n_params = merge_flat_params(params, flat_params)
    n_stats = 0
    if batch_stats and flat_stats:
        batch_stats, n_stats = merge_flat_params(batch_stats, flat_stats)
    logger.info(
        "Loaded %d param + %d batch-stat arrays from %s",
        n_params, n_stats, weights_file,
    )
    return params, batch_stats, n_params > 0


def make_train_step(model, tx, mesh=None, train_batch_norm=False,
                    remat=False, reg_fn=None, trainable_mask=None):
    """Build the jitted train step (sharded when a mesh is given).

    ``train_batch_norm`` updates running BN statistics during training
    (reference: base_network.py train_batch_norm flag; off by default for
    detection fine-tuning).

    ``remat`` (config ``train.remat``) rematerializes the forward pass
    during the backward pass instead of keeping every activation live —
    ~1/3 more forward FLOPs for a large cut in peak HBM (and compiler
    scheduling pressure), unlocking larger per-chip batches.

    ``trainable_mask`` (pytree of bools matching params) restricts
    differentiation to the trainable partition, matching the reference's
    ``compute_gradients(loss, var_list=trainable_vars)``
    (reference: train.py:79-83 + base_network.py:211-241). Without it the
    frozen subtree (``fine_tune_from``) would still get gradients computed
    every step AND those gradients would inflate ``clip_by_global_norm``'s
    norm relative to the reference. Frozen leaves get zero gradients, so
    the optax chain (clip -> decay -> update) sees the same global norm
    the reference clips by.
    """
    from flax import traverse_util

    trainable_keys = None
    if trainable_mask is not None:
        flat_mask = traverse_util.flatten_dict(trainable_mask)
        if not all(flat_mask.values()):
            trainable_keys = frozenset(
                k for k, v in flat_mask.items() if v
            )

    def train_step(state, batch, rng):
        if batch["image"].dtype == jnp.uint8:
            # uint8 transfer path (dataset.transfer_dtype): cast back to
            # float on device, where the conversion fuses into the first
            # conv instead of quadrupling host->device traffic.
            batch = dict(batch, image=batch["image"].astype(jnp.float32))
        rng_target, rng_dropout = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            apply_kwargs = dict(
                gt_boxes=batch["gt_boxes"],
                im_shape=batch.get("im_shape"),
                train=True,
                rngs={"target": rng_target, "dropout": rng_dropout},
            )
            new_stats = state.batch_stats
            if train_batch_norm and state.batch_stats:
                preds, mutated = model.apply(
                    variables, batch["image"], mutable=["batch_stats"],
                    **apply_kwargs,
                )
                new_stats = mutated["batch_stats"]
            else:
                preds = model.apply(variables, batch["image"], **apply_kwargs)
            losses = model.loss(preds, return_all=True)
            return losses["total_loss"], (losses, new_stats)

        if trainable_keys is not None:
            # Differentiate wrt the trainable partition only: XLA then
            # dead-code-eliminates the backward chain through the frozen
            # early blocks entirely (they are upstream of everything
            # trainable, so no input grads are needed either).
            flat = traverse_util.flatten_dict(state.params)
            flat_t = {k: v for k, v in flat.items() if k in trainable_keys}
            flat_f = {k: v for k, v in flat.items()
                      if k not in trainable_keys}

            def loss_fn_trainable(flat_t):
                return loss_fn(
                    traverse_util.unflatten_dict({**flat_f, **flat_t})
                )

            if remat:
                loss_fn_trainable = jax.checkpoint(loss_fn_trainable)
            (loss, (losses, new_stats)), grads_t = jax.value_and_grad(
                loss_fn_trainable, has_aux=True
            )(flat_t)
            grads = traverse_util.unflatten_dict({
                **{k: jnp.zeros_like(v) for k, v in flat_f.items()},
                **grads_t,
            })
        else:
            if remat:
                loss_fn = jax.checkpoint(loss_fn)
            (loss, (losses, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=new_stats,
        )
        metrics = dict(losses)
        if reg_fn is not None:
            # Report totals the way the reference does: total_loss
            # includes L2 regularization, no_reg_loss excludes it
            # (reference: fasterrcnn.py:158-259). The optimization
            # objective is unchanged — decay is applied by the
            # optimizer; this only makes the curves comparable.
            reg = reg_fn(state.params)
            metrics["reg_loss"] = reg
            metrics["no_reg_loss"] = losses["total_loss"]
            metrics["total_loss"] = losses["total_loss"] + reg
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    from luminoth_tpu.parallel.mesh import SPACE_AXIS

    repl = replicate_sharding(mesh)
    # On a 2-D (data, space) mesh the batch dict's leaves carry
    # different specs (images also shard H) — the arrays arrive
    # committed by _device_batch, so let jit infer their shardings.
    data = None if SPACE_AXIS in mesh.axis_names else batch_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def _device_batch(batch, mesh):
    keep = {"image", "gt_boxes", "im_shape"}
    out = {k: v for k, v in batch.items() if k in keep}
    if mesh is not None:
        return shard_batch(out, mesh)
    # Explicit device_put (instead of letting jit transfer at call time)
    # so prefetch_to_device can issue batch k+1's upload while step k is
    # still executing.
    return {k: jax.device_put(v) for k, v in out.items()}


def prefetch_to_device(batch_iter, mesh=None, depth=2):
    """Yield ``(host_batch, device_batch)`` with uploads issued ahead.

    Keeps ``depth`` batches in flight on device so the host->device
    transfer of batch k+1 overlaps the (async-dispatched) step k. The
    host dict is kept alongside for logging metadata (filenames, counts).
    Replaces the reference's StagingArea-less feed_dict (its queue
    runners stop at host memory; this stages onto the chip).
    """
    buf = collections.deque()
    it = iter(batch_iter)
    exhausted = False
    while True:
        while not exhausted and len(buf) < depth:
            try:
                b = next(it)
            except StopIteration:
                exhausted = True
                break
            buf.append((b, _device_batch(b, mesh)))
        if not buf:
            return
        yield buf.popleft()


def run(config, get_model_fn=get_model, get_dataset_fn=get_dataset,
        environment=None, max_steps=None):
    """Train a model per config. Returns the final TrainState."""
    from luminoth_tpu.utils.compilation_cache import warm_start

    warm_start()  # persistent compile cache + async first-fetch
    train_cfg = config.train
    if train_cfg.get("remat"):
        # One user-facing knob: per-unit backbone remat (the part that
        # actually cuts peak HBM) plus the coarse step checkpoint below.
        config.model.base_network.remat = True
    model = get_model_fn(config.model.type)(
        to_plain(config), dtype=model_dtype(config)
    )
    dataset = get_dataset_fn(config.dataset.type)(config)

    job_dir = train_cfg.get("job_dir", "jobs/")
    run_name = train_cfg.get("run_name") or "default"
    run_dir = fileio.join(job_dir, run_name)
    no_log = bool(train_cfg.get("no_log"))
    is_chief = jax.process_index() == 0

    batch_iter = iter(dataset)
    first_batch = next(batch_iter)
    batch_size = first_batch["image"].shape[0]

    # Mesh: shard the batch over as many devices as divide it. With
    # train.spatial_shards: N, each example's image height additionally
    # splits across N chips (2-D data x space mesh) — for canvases too
    # large for one chip or batches smaller than the chip count.
    devices = jax.devices()
    space = int(train_cfg.get("spatial_shards") or 1)
    n_dev = len(devices)
    if space > 1:
        if n_dev % space:
            # An explicit spatial request that can't be honored (not
            # enough devices / not divisible) must not silently no-op:
            # the user asked for it because the canvas doesn't fit.
            raise ValueError(
                f"train.spatial_shards={space} requires a device count "
                f"divisible by it; have {n_dev} device(s)"
            )
        data_par = n_dev // space
        while data_par > 1 and batch_size % data_par:
            data_par -= 1
        n_dev = data_par * space
        mesh = (
            make_mesh(num_devices=n_dev, space=space)
            if n_dev > 1 else None
        )
        logger.info(
            "Training on %d device(s) (%d data x %d space), batch %d",
            n_dev, max(data_par, 1), space, batch_size,
        )
    else:
        while batch_size % n_dev:
            n_dev -= 1
        mesh = make_mesh(num_devices=n_dev) if n_dev > 1 else None
        logger.info(
            "Training on %d device(s), batch %d", n_dev, batch_size
        )

    rng = jax.random.PRNGKey(train_cfg.get("seed") or 0)
    batch_spec = {
        "image": first_batch["image"].shape,
        "gt_boxes": first_batch["gt_boxes"].shape,
    }
    params, batch_stats = init_model(model, config, batch_spec, rng)
    params, batch_stats, _ = load_pretrained_backbone(
        params, batch_stats, config
    )

    trainable_mask = build_trainable_mask(params, config.model)
    from luminoth_tpu.utils.training import build_weight_decay_coefficients

    decay_coeffs = build_weight_decay_coefficients(params, config.model)
    tx, lr_schedule = get_optimizer(
        train_cfg,
        trainable_mask=trainable_mask,
        weight_decay=decay_coeffs,
        weight_decay_mask=build_weight_decay_mask(params),
    )
    opt_state = tx.init(params)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=opt_state,
        batch_stats=batch_stats,
    )

    # Checkpointing (resume if a checkpoint exists in run_dir).
    manager = None
    if not no_log:
        from luminoth_tpu.utils.checkpoint_io import CheckpointManager

        manager = CheckpointManager(
            fileio.join(run_dir, "ckpt"),
            max_to_keep=int(train_cfg.get("checkpoints_max_keep", 1)),
        )
        restored = manager.restore_latest(
            state, ignore_scope=train_cfg.get("ignore_scope")
        )
        if restored is not None:
            state = restored
            logger.info("Resumed from step %d", int(state.step))
        from luminoth_tpu.parallel.distributed import sync_state_from_chief

        state = sync_state_from_chief(state)

    writer = None
    if not no_log and is_chief:
        fileio.makedirs(run_dir, exist_ok=True)
        # tensorboardX writes through the local filesystem only; with a
        # remote job_dir (gs://…) summaries land in a local mirror under
        # the toolkit home instead (checkpoints still go remote).
        tb_dir = run_dir
        if fileio.is_remote(run_dir):
            from luminoth_tpu.utils.homedir import get_home

            tb_dir = os.path.join(get_home(), "tensorboard", run_name)
            logger.info("Remote job_dir: writing summaries to %s", tb_dir)
        try:
            from tensorboardX import SummaryWriter

            writer = SummaryWriter(tb_dir)
        except Exception:
            writer = None

    if mesh is not None:
        repl = replicate_sharding(mesh)
        state = jax.device_put(state, repl)

    from luminoth_tpu.utils.training import l2_regularization_loss

    train_step = make_train_step(
        model, tx, mesh,
        train_batch_norm=bool(
            config.model.get("base_network", {}).get("train_batch_norm")
        ),
        remat=bool(train_cfg.get("remat")),
        reg_fn=lambda p: l2_regularization_loss(p, decay_coeffs),
        trainable_mask=trainable_mask,
    )

    if is_chief and not no_log:
        try:
            save_run(config, environment=environment)
        except Exception:
            pass

    save_secs = train_cfg.get("save_checkpoint_secs") or 600
    summary_secs = train_cfg.get("save_summaries_secs") or 30
    summary_steps = train_cfg.get("save_summaries_steps")
    last_save = time.time()
    last_summary = time.time()

    # Observability hooks (reference train.py:192-216, chief-only).
    hooks = []
    image_vis_mode = train_cfg.get("image_vis")
    if writer is not None and image_vis_mode:
        from luminoth_tpu.utils.hooks import ImageVisHook

        monitor_state = {"fn": None}

        def monitor_forward(state, device_batch):
            if monitor_state["fn"] is None:
                def fwd(params, batch_stats, batch):
                    variables = {"params": params}
                    if batch_stats:
                        variables["batch_stats"] = batch_stats
                    image = batch["image"]
                    if image.dtype == jnp.uint8:
                        image = image.astype(jnp.float32)
                    return model.apply(
                        variables, image,
                        gt_boxes=batch["gt_boxes"],
                        im_shape=batch.get("im_shape"),
                        train=False,
                    )
                monitor_state["fn"] = jax.jit(fwd)
            return monitor_state["fn"](
                state.params, state.batch_stats, device_batch
            )

        vis_variances = config.model.get("variances") or (
            config.model.get("rcnn") or {}
        ).get("target_normalization_variances")
        vis_hook = ImageVisHook(
            writer,
            config.model.type,
            image_vis_mode=image_vis_mode,
            every_secs=train_cfg.get("display_every_secs"),
            every_steps=train_cfg.get("display_every_steps"),
            variances=tuple(vis_variances) if vis_variances else None,
        )
        hooks.append(("image_vis", vis_hook, monitor_forward))
    var_vis_mode = train_cfg.get("var_vis")
    if writer is not None and var_vis_mode:
        from luminoth_tpu.utils.hooks import VarVisHook

        var_hook = VarVisHook(
            writer,
            mode=var_vis_mode,
            every_secs=train_cfg.get("display_every_secs") or 300,
            every_steps=train_cfg.get("display_every_steps"),
        )
        hooks.append(("var_vis", var_hook, None))

    def batches():
        yield first_batch
        yield from batch_iter

    # Numeric debugging (reference train.py:163-168: tfdbg session hook
    # with the has_inf_or_nan filter): jax_debug_nans re-runs the
    # offending computation eagerly and raises at the first non-finite
    # value with its location.
    debug_nans_prev = None
    if train_cfg.get("tf_debug"):
        debug_nans_prev = bool(jax.config.jax_debug_nans)
        jax.config.update("jax_debug_nans", True)
        logger.info("tf_debug: jax_debug_nans enabled")

    # Profiler trace capture (reference train.py:133-137 full_trace →
    # tf.RunOptions(FULL_TRACE); here: a jax.profiler trace of the first
    # few steps, viewable in TensorBoard's profile tab — including the
    # per-op timeline the reference's save_timeline knob pointed at).
    trace_dir = None
    trace_stop_step = None
    if (
        train_cfg.get("full_trace") or train_cfg.get("save_timeline")
    ) and is_chief:
        trace_dir = os.path.join(run_dir, "profile")
        jax.profiler.start_trace(trace_dir)
        trace_stop_step = int(state.step) + 5
        logger.info("Profiler trace started → %s", trace_dir)

    log_every = int(train_cfg.get("log_every_steps") or 1)
    step = int(state.step)
    try:
        staged = prefetch_to_device(
            (b for b in batches() if b["image"].shape[0] == batch_size),
            mesh,
        )
        for batch, device_batch in staged:
            t0 = time.time()
            state, metrics = train_step(state, device_batch, rng)
            step += 1
            dt = time.time() - t0

            # Materializing the loss synchronizes with the device; do it on
            # the logging cadence only so steps pipeline (the dispatch above
            # is async).
            if step % log_every == 0:
                loss = float(metrics["total_loss"])
                if not np.isfinite(loss):
                    raise FloatingPointError(
                        f"non-finite loss at step {step}: {loss}"
                    )
                logger.info(
                    "step: %d, file: %s, train_loss: %.4f, in %.2fs",
                    step, batch.get("filename", [""])[0], loss, dt,
                )

            if writer is not None and (
                (summary_steps and step % summary_steps == 0)
                or (not summary_steps and time.time() - last_summary > summary_secs)
            ):
                for name, value in metrics.items():
                    writer.add_scalar(
                        f"losses/{name}", float(value), step
                    )
                writer.add_scalar(
                    "training/learning_rate", float(lr_schedule(step)), step
                )
                writer.flush()
                last_summary = time.time()

            if manager is not None and is_chief and (
                time.time() - last_save > save_secs
            ):
                # Async by default: secures the (donated) state with an
                # on-device copy, then fetches/serializes/writes on a
                # background thread so the step loop never stalls on
                # checkpoint IO. train.async_checkpoints: False reverts
                # to the blocking save.
                if train_cfg.get("async_checkpoints", True):
                    manager.save_async(state, step)
                else:
                    manager.save(state, step)
                last_save = time.time()

            for kind, hook, monitor in hooks:
                if kind == "image_vis":
                    if hook._timer.should_trigger(step):
                        preds = monitor(state, device_batch)
                        hook.after_step(step, batch, preds)
                elif kind == "var_vis":
                    hook.after_step(step, state.params)

            if trace_dir is not None and step >= trace_stop_step:
                jax.profiler.stop_trace()
                logger.info("Profiler trace saved to %s", trace_dir)
                trace_dir = None

            if max_steps is not None and step >= max_steps:
                break
    except KeyboardInterrupt:
        logger.info("Interrupted at step %d", step)
    finally:
        if debug_nans_prev is not None:
            jax.config.update("jax_debug_nans", debug_nans_prev)
        if trace_dir is not None:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass
        if manager is not None and is_chief and step > 0:
            manager.wait_for_async()
            manager.save(state, step)
        if writer is not None:
            writer.close()

    return state


@click.command(help="Train models")
@click.option(
    "config_files", "--config", "-c", required=True, multiple=True,
    help="Config to use.")
@click.option("--job-dir", help="Job directory.")
@click.option(
    "override_params", "--override", "-o", multiple=True,
    help="Override model config params.")
@click.option(
    "--max-steps", type=int, default=None,
    help="Stop after this many steps (default: run all epochs).")
def train(config_files, job_dir, override_params, max_steps):
    """``lumi train`` (reference: train.py:271-326)."""
    logging.basicConfig(level=logging.INFO)
    config = get_config(list(config_files), override_params=override_params)
    if job_dir:
        config.train.job_dir = job_dir

    # Multi-host: initialize the distributed runtime when configured.
    from luminoth_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()

    return run(config, max_steps=max_steps)
