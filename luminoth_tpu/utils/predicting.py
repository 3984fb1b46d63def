"""Inference harness: checkpoint restore + jitted per-bucket forward.

reference: luminoth/utils/predicting.py:10-148 (``PredictorNetwork``). The
TF placeholder/session pair becomes a jit-compiled forward cached per input
canvas shape; restore reads the latest training checkpoint from
``train.job_dir/run_name`` (or explicit weights from a zoo bundle).
"""

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from luminoth_tpu.utils import fileio
from luminoth_tpu.datasets.object_detection_dataset import (
    canvas_shape,
    pad_to_canvas,
    preprocess_image,
)
from luminoth_tpu.utils.image import (
    compose_scale,
    fit_to_canvas,
    settle_transfer_dtype,
)
from luminoth_tpu.models import get_model
from luminoth_tpu.utils.config import to_plain
from luminoth_tpu.utils.training import model_dtype

logger = logging.getLogger(__name__)


def load_checkpoint_variables(config):
    """Restore {params, batch_stats} from the newest training checkpoint.

    Searches, in order: the training layout ``job_dir/run_name/ckpt``,
    ``job_dir/ckpt`` and ``job_dir`` itself (zoo-bundle layout).
    """
    job_dir = config.train.get("job_dir", "jobs/")
    run_name = config.train.get("run_name") or "default"

    from luminoth_tpu.utils.checkpoint_io import CheckpointManager

    state = None
    step = None
    for ckpt_dir in (
        fileio.join(job_dir, run_name, "ckpt"),
        fileio.join(job_dir, "ckpt"),
        job_dir,
    ):
        if not fileio.isdir(ckpt_dir):
            continue
        # Falls back to an older checkpoint if the newest is unreadable.
        state, step = CheckpointManager(ckpt_dir).latest_state_dict()
        if state is not None:
            break
    if state is None:
        raise FileNotFoundError(
            f"no checkpoint found under {job_dir}"
        )
    logger.info("Restored checkpoint at step %d from %s", step, ckpt_dir)
    variables = {"params": state["params"]}
    if state.get("batch_stats"):
        variables["batch_stats"] = state["batch_stats"]
    return variables


class PredictorNetwork:
    """Loads a model + checkpoint and predicts objects in images."""

    def __init__(self, config, variables=None, class_labels=None,
                 mesh="auto"):
        """``mesh``: ``"auto"`` spans every visible device with a 1-D
        data mesh (single-device setups are unaffected); ``None`` forces
        single-device; or pass an explicit ``jax.sharding.Mesh``.
        Batches round up to a device multiple, so serving throughput
        scales over a pod slice with no API change (the reference ran
        one sess.run per image on one device, predicting.py:110-112).
        """
        from luminoth_tpu.utils.compilation_cache import warm_start

        warm_start()  # persistent compile cache + async first-fetch
        self._config = config
        self._model = get_model(config.model.type)(
            to_plain(config), dtype=model_dtype(config)
        )
        self._canvas = canvas_shape(config)
        if variables is None:
            variables = load_checkpoint_variables(config)
        bn_cfg = config.model.base_network
        if bool(bn_cfg.get("int8_static")) and (
            bn_cfg.get("int8_tail") or bn_cfg.get("int8_trunk")
        ) and "int8_stats" not in variables:
            variables = self._calibrate_int8(variables)
        if mesh == "auto":
            if jax.device_count() > 1:
                from luminoth_tpu.parallel.mesh import make_mesh

                mesh = make_mesh(num_devices=jax.device_count())
            else:
                mesh = None
        self._mesh = mesh
        # Pin the weights on device once — passing host arrays into the
        # jitted forward would re-transfer the whole model every call.
        if mesh is not None:
            from luminoth_tpu.parallel.mesh import replicate_sharding

            self._variables = jax.device_put(
                variables, replicate_sharding(mesh)
            )
        else:
            self._variables = jax.device_put(variables)
        self.class_labels = class_labels

        transfer = str(config.dataset.get("transfer_dtype", "float32"))
        self._transfer_dtype = (
            np.uint8 if transfer == "uint8" else np.float32
        )

        def forward(variables, image, im_shape):
            if image.dtype == jnp.uint8:
                image = image.astype(jnp.float32)
            preds = self._model.apply(
                variables, image, im_shape=im_shape, train=False
            )
            cp = preds["classification_prediction"]
            return cp["objects"], cp["labels"], cp["probs"], cp["valid"]

        if mesh is None:
            # Single device: serve through the AOT executable cache so a
            # fresh process skips tracing AND compiling for shapes it has
            # served before (see utils/aot_cache.py).
            import json

            from luminoth_tpu.utils.aot_cache import AotCachedFunction

            self._forward = AotCachedFunction(
                forward,
                key_material=json.dumps(
                    {
                        "model": to_plain(config.model),
                        "dataset": to_plain(config.get("dataset", {})),
                    },
                    sort_keys=True, default=str,
                ),
            )
        else:
            from luminoth_tpu.parallel.mesh import (
                batch_sharding, replicate_sharding,
            )

            repl = replicate_sharding(mesh)
            data = batch_sharding(mesh)
            self._forward = jax.jit(
                forward, in_shardings=(repl, data, data)
            )

    def _calibrate_int8(self, variables):
        """One-shot activation-range calibration for int8_static serving.

        Runs the int8 forward with the ``int8_stats`` collection mutable
        so each quant point records its running activation max; serving
        then uses those static scales, eliminating the per-layer dynamic
        max passes from the hot path (see
        ``models/base/quantized_tail.py:activation_quant``).

        Calibration inputs come from
        ``model.base_network.int8_calibration_images`` (file paths, run
        one at a time through the real preprocessing); without them one
        synthetic random canvas is used — fine for bring-up, calibrate
        on real data for accuracy-sensitive serving.
        """
        import logging

        from luminoth_tpu.datasets.object_detection_dataset import (
            pad_to_canvas, preprocess_image,
        )

        logger = logging.getLogger(__name__)
        h, w = self._canvas
        batches = []
        for path in (
            self._config.model.base_network.get(
                "int8_calibration_images"
            ) or []
        ):
            from luminoth_tpu.io import read_image

            result = preprocess_image(
                self._config, read_image(path).astype(np.float32)
            )
            padded, (ih, iw) = pad_to_canvas(result["image"], self._canvas)
            batches.append((padded[None], [[float(ih), float(iw)]]))
        if not batches:
            logger.info(
                "int8_static: calibrating on a synthetic canvas (set "
                "model.base_network.int8_calibration_images for real-"
                "data ranges)."
            )
            rng = np.random.RandomState(0)
            batches = [(
                rng.randint(0, 255, (1, h, w, 3)).astype(np.float32),
                [[float(h), float(w)]],
            )]

        @jax.jit
        def calibrate(variables, image, im_shape):
            return self._model.apply(
                variables, image, im_shape=im_shape, train=False,
                mutable=["int8_stats"],
            )

        stats = None
        for image, im_shape in batches:
            v = dict(variables)
            if stats is not None:
                v["int8_stats"] = stats
            _, updated = calibrate(
                v, jnp.asarray(image),
                jnp.asarray(im_shape, jnp.float32),
            )
            stats = updated["int8_stats"]
        logger.info(
            "int8_static: calibrated %d activation scale(s) over %d "
            "image(s)",
            len(jax.tree_util.tree_leaves(stats)), len(batches),
        )
        return {**variables, "int8_stats": stats}

    def predict_image(self, image):
        """Detect objects in one RGB ndarray image.

        Returns a list of dicts ``{bbox, label, prob}`` with boxes in the
        original image's coordinates, sorted by probability.
        """
        return self.predict_batch([image])[0]

    def predict_batch(self, images, pad_to=None):
        """Detect objects in a list of images with ONE device forward.

        The reference loops single-image sess.run calls (tasks.py:149-154);
        here images share the padded canvas so they batch into a single
        compiled program. ``pad_to`` rounds the batch up (duplicate last
        image) to avoid re-compiles for ragged final batches.

        Returns a list (per image) of lists of ``{bbox, label, prob}``.
        """
        n = len(images)
        if n == 0:
            return []

        padded_images = []
        shapes = []
        scales = []
        for image in images:
            # uint8 transfer: integer-native resize + 4x smaller upload;
            # float transfer: reference float32 interpolation semantics.
            arr = settle_transfer_dtype(
                np.asarray(image), self._transfer_dtype
            )
            result = preprocess_image(self._config, arr)
            im = result["image"]
            if (
                im.shape[0] > self._canvas[0]
                or im.shape[1] > self._canvas[1]
            ):
                # Doesn't fit the compiled canvas (e.g. portrait image,
                # landscape canvas): downscale rather than crop so no
                # content is lost; fold the factor into scale_factor.
                refit = fit_to_canvas(
                    im, self._canvas,
                    method=self._config.dataset.image_preprocessing.get(
                        "resize_method"
                    ),
                )
                im = refit["image"]
                result["scale_factor"] = compose_scale(
                    result["scale_factor"], refit["scale"]
                )
            padded, (h, w) = pad_to_canvas(im, self._canvas)
            padded_images.append(padded)
            shapes.append((float(h), float(w)))
            scales.append(result["scale_factor"])

        batch = n if pad_to is None else max(pad_to, n)
        if self._mesh is not None:
            # Round up to a device multiple so the batch shards evenly.
            size = self._mesh.size
            batch = -(-batch // size) * size
        while len(padded_images) < batch:
            padded_images.append(padded_images[-1])
            shapes.append(shapes[-1])
            scales.append(scales[-1])

        batch_image = jnp.asarray(np.stack(padded_images))
        im_shape = jnp.asarray(shapes, dtype=jnp.float32)
        objects_b, labels_b, probs_b, valid_b = jax.device_get(
            self._forward(self._variables, batch_image, im_shape)
        )

        all_results = []
        for b in range(n):
            keep = valid_b[b].astype(bool)
            objects = objects_b[b][keep]
            labels = labels_b[b][keep]
            probs = probs_b[b][keep]

            scale = scales[b]
            if isinstance(scale, tuple):
                sy, sx = scale
                objects = objects / np.asarray([sx, sy, sx, sy])
            else:
                objects = objects / scale

            order = np.argsort(-probs)
            results = []
            for i in order:
                label = int(labels[i])
                if self.class_labels is not None and label < len(
                    self.class_labels
                ):
                    label = self.class_labels[label]
                results.append(
                    {
                        "bbox": [float(v) for v in objects[i]],
                        "label": label,
                        "prob": round(float(probs[i]), 4),
                    }
                )
            all_results.append(results)
        return all_results
