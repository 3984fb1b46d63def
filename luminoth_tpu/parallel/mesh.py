"""Device mesh + sharding helpers for synchronous data parallelism.

Replaces the reference's TF1 parameter-server asynchronous data parallelism
(reference: luminoth/train.py:46,282-326 — ``TF_CONFIG``-driven ClusterSpec,
``replica_device_setter``, gRPC PS/worker) with the TPU-native design:

* a 1-D ``jax.sharding.Mesh`` over all local (or distributed) devices with a
  single ``"data"`` axis;
* parameters replicated, batches sharded on the leading axis;
* gradients all-reduced implicitly by XLA over ICI when the jitted train
  step computes a mean loss over the sharded batch — no explicit collective
  calls needed, no parameter server;
* multi-host extension via ``jax.distributed.initialize`` over DCN (the
  mesh simply spans all processes' devices).

Chief semantics (checkpoint/summary writers only on one process) map to
``jax.process_index() == 0``.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"


def make_mesh(num_devices=None, devices=None, space=1):
    """Build the device mesh.

    ``space=1`` (default): a 1-D data-parallel mesh. ``space=N``: a 2-D
    ``(data, space)`` mesh — images are additionally sharded along their
    height axis, so each example's convolutions split across ``N`` chips
    (XLA GSPMD inserts the halo exchanges). Use for canvases too large
    for one chip's HBM, or when the global batch is smaller than the
    chip count; there is no reference counterpart (batch-1 TF1).
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    space = int(space or 1)
    if space == 1:
        return Mesh(np.asarray(devices), (DATA_AXIS,))
    if len(devices) % space:
        raise ValueError(
            f"{len(devices)} devices not divisible by space={space}"
        )
    grid = np.asarray(devices).reshape(len(devices) // space, space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def batch_sharding(mesh, ndim=None):
    """Sharding for batch-leading arrays.

    On a 2-D mesh, image-like arrays (``ndim >= 4``: B, H, W, C) also
    shard H over the space axis; lower-rank arrays (gt boxes, shapes)
    shard only the batch axis. Rank-0 leaves (scalars like a step
    counter) have no batch axis to shard and are replicated.
    """
    if ndim is not None and ndim < 1:
        return NamedSharding(mesh, P())
    if SPACE_AXIS in mesh.axis_names and (ndim is None or ndim >= 4):
        return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh):
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Device-put a pytree of host NUMERIC arrays, batch axis sharded.

    Leaves must be arrays/scalars device_put accepts — filter out
    host-only entries (filenames, python lists) first, the way
    ``train._device_batch`` does.
    """
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, batch_sharding(mesh, ndim=np.ndim(x))
        ),
        batch,
    )


def is_chief():
    """Single-writer semantics: process 0 is the chief."""
    return jax.process_index() == 0
