"""Checkpoint persistence for train state and weight pytrees.

Replaces the reference's ``tf.train.Saver`` machinery (train.py:93-129):

* :class:`CheckpointManager` — periodic train-state checkpoints with
  ``max_to_keep`` rotation and resume-from-latest, serialized with flax
  msgpack (parameters are replicated under data parallelism, so a single
  host-side byte stream is exact; the chief is the only writer).
* flat ``.npz`` pytree import/export — the native equivalent of slim's
  pretrained-checkpoint restore with variable remapping
  (base_network.py:243-259), also used by the checkpoint-zoo bundles.
"""

import json
import logging
import re

import jax
import numpy as np
from flax import serialization

from luminoth_tpu.utils import fileio

CHECKPOINT_PREFIX = "ckpt_step_"

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Step-numbered msgpack checkpoints with rotation."""

    def __init__(self, directory, max_to_keep=1):
        self.directory = directory
        self.max_to_keep = max_to_keep
        fileio.makedirs(directory, exist_ok=True)

    def _path(self, step):
        return fileio.join(
            self.directory, f"{CHECKPOINT_PREFIX}{step}.msgpack"
        )

    def all_steps(self):
        steps = []
        pattern = re.compile(rf"{CHECKPOINT_PREFIX}(\d+)\.msgpack$")
        for name in fileio.listdir(self.directory):
            m = pattern.match(name)
            if m:
                steps.append(int(m.group(1)))
        return sorted(steps)

    def latest_step(self):
        steps = self.all_steps()
        return steps[-1] if steps else None

    def save(self, state, step):
        state = jax.device_get(state)
        data = serialization.to_bytes(state)
        tmp = self._path(step) + ".tmp"
        with fileio.open_file(tmp, "wb") as f:
            f.write(data)
        fileio.replace(tmp, self._path(step))
        with fileio.open_file(
            fileio.join(self.directory, "checkpoint"), "w"
        ) as f:
            json.dump({"latest_step": step}, f)
        # Rotate.
        steps = self.all_steps()
        while len(steps) > self.max_to_keep:
            victim = steps.pop(0)
            try:
                fileio.remove(self._path(victim))
            except OSError:
                pass

    def save_async(self, state, step):
        """Checkpoint without stalling the train loop.

        The train step donates its input buffers, so ``state`` must be
        secured before the next step dispatches — but that only needs an
        ON-DEVICE copy (async, ~free next to a train step), not a
        device→host fetch. The copy is enqueued here; the fetch,
        serialization and file write run on a background thread while
        training continues. One save in flight at a time: a new call
        joins the previous one first (it has had a full save interval to
        finish). Call :meth:`wait_for_async` before the final
        synchronous save or before reading ``latest_step`` locally.
        """
        import threading

        import jax.numpy as jnp

        snapshot = jax.tree_util.tree_map(
            lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x,
            state,
        )
        self.wait_for_async()
        thread = threading.Thread(
            target=self._save_logged, args=(snapshot, step), daemon=True
        )
        self._async_thread = thread
        thread.start()

    def wait_for_async(self):
        """Join the in-flight async save, if any."""
        thread = getattr(self, "_async_thread", None)
        if thread is not None:
            thread.join()
            self._async_thread = None

    def _save_logged(self, snapshot, step):
        try:
            self.save(snapshot, step)
        except Exception:
            # A failed periodic save must not kill training; the next
            # interval (or the final synchronous save) retries.
            logger.exception("async checkpoint save at step %d failed",
                             step)

    def restore(self, state_template, step, ignore_scope=None):
        with fileio.open_file(self._path(step), "rb") as f:
            data = f.read()
        if not ignore_scope:
            return serialization.from_bytes(state_template, data)
        # Partial restore (reference train.py `ignore_scope`: e.g. train the
        # RPN first, then resume into the full model): merge whatever paths
        # match, skip the ignored scope, keep template values elsewhere.
        restored = serialization.msgpack_restore(data)
        template_dict = serialization.to_state_dict(state_template)
        merged = _merge_state(template_dict, restored, ignore_scope)
        return serialization.from_state_dict(state_template, merged)

    def restore_latest(self, state_template, ignore_scope=None):
        """Restore the newest readable checkpoint.

        An unreadable newest file (truncated copy, interrupted transfer
        from remote storage — our own saves are atomic) falls back to
        the next-older one, mirroring the reference's tolerant recovery
        around partially-written checkpoints (eval.py:205-215). Raises
        only if every existing checkpoint is unreadable; returns None
        when there are none at all.
        """
        steps = self.all_steps()
        last_err = None
        for step in reversed(steps):
            try:
                return self.restore(
                    state_template, step, ignore_scope=ignore_scope
                )
            except Exception as e:  # corrupt/truncated: try older
                last_err = e
                logger.warning(
                    "Checkpoint %s unreadable (%s); falling back to an "
                    "older one", self._path(step), e,
                )
        if last_err is not None:
            raise last_err
        return None

    def latest_state_dict(self):
        """(raw state dict, step) of the newest readable checkpoint.

        Same fallback semantics as :meth:`restore_latest`, for callers
        without a state template (the predictor). ``(None, None)`` when
        nothing is readable.
        """
        for step in reversed(self.all_steps()):
            try:
                with fileio.open_file(self._path(step), "rb") as f:
                    return serialization.msgpack_restore(f.read()), step
            except Exception as e:
                logger.warning(
                    "Checkpoint %s unreadable (%s); falling back to an "
                    "older one", self._path(step), e,
                )
        return None, None


def _merge_state(template, restored, ignore_scope, path=""):
    """Merge ``restored`` into ``template`` by matching paths.

    Paths whose dotted/slashed name contains ``ignore_scope`` keep the
    template value; mismatched structures also fall back to the template.
    """
    if not isinstance(template, dict):
        if ignore_scope and ignore_scope in path:
            return template
        if restored is None:
            return template
        if np.shape(template) != np.shape(restored):
            return template
        return restored
    out = {}
    restored = restored if isinstance(restored, dict) else {}
    for key, value in template.items():
        out[key] = _merge_state(
            value, restored.get(key), ignore_scope, f"{path}/{key}"
        )
    return out


# ---------------------------------------------------------------- flat npz


def flatten_params(params, prefix=""):
    """Nested param dict → {"a/b/c": array}."""
    flat = {}
    for key, value in params.items():
        path = f"{prefix}/{key}" if prefix else key
        if isinstance(value, dict):
            flat.update(flatten_params(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def unflatten_params(flat):
    """{"a/b/c": array} → nested dict."""
    nested = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = nested
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = value
    return nested


def save_params_npz(path, params):
    np.savez(path, **flatten_params(jax.device_get(params)))


def load_params_npz(path):
    with np.load(path, allow_pickle=False) as data:
        return {key: data[key] for key in data.files}


def merge_flat_params(params, flat):
    """Merge flat arrays into a nested param tree by path; returns count.

    Shapes must match; unknown paths are skipped (logged by caller). This is
    the restore-with-remap seam for pretrained backbones.
    """
    loaded = 0
    params = dict(params)

    def merge(node, path):
        nonlocal loaded
        out = {}
        for key, value in node.items():
            sub_path = f"{path}/{key}" if path else key
            if isinstance(value, dict):
                out[key] = merge(value, sub_path)
            elif sub_path in flat and flat[sub_path].shape == tuple(
                np.shape(value)
            ):
                out[key] = flat[sub_path].astype(value.dtype)
                loaded += 1
            else:
                out[key] = value
        return out

    return merge(params, ""), loaded
