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


def make_mesh(num_devices=None, devices=None):
    """Build a 1-D data-parallel mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh):
    """Sharding for arrays whose leading axis is the batch."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate_sharding(mesh):
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def is_chief():
    """Single-writer semantics: process 0 is the chief."""
    return jax.process_index() == 0
