"""Multi-host (DCN) runtime initialization from the LUMI_* environment.

Single source of truth for the env protocol between the cloud launcher
(`tools/cloud/tpu.py` writes these vars into each worker's launch command)
and the trainer (`train.py` reads them before building the mesh). Replaces
the reference's TF_CONFIG ClusterSpec plumbing
(reference: luminoth/train.py:282-326) with `jax.distributed`: every
process joins the coordination service, after which `jax.devices()` spans
all hosts and the data-parallel mesh simply covers them.
"""

import os

ENV_COORDINATOR = "LUMI_COORDINATOR"
ENV_NUM_PROCESSES = "LUMI_NUM_PROCESSES"
ENV_PROCESS_ID = "LUMI_PROCESS_ID"
ENV_AUTO = "LUMI_DISTRIBUTED_AUTO"


def initialize_from_env(environ=None):
    """Join the distributed runtime when the environment asks for it.

    Two modes:

    * ``LUMI_COORDINATOR=host:port`` (+ ``LUMI_NUM_PROCESSES`` /
      ``LUMI_PROCESS_ID``) — explicit wiring, used by the CPU multi-host
      tests and any launcher that knows a resolvable coordinator
      address.
    * ``LUMI_DISTRIBUTED_AUTO=1`` — ``jax.distributed.initialize()``
      with no arguments: on Cloud TPU VMs JAX resolves the coordinator
      (worker 0's internal address), process count, and process id from
      the TPU metadata server. This is what the cloud launcher sets —
      a hostname fabricated on the submitter (e.g. ``<tpu-name>-0``)
      is NOT resolvable on the workers, so auto-detection is the only
      address source that works there.

    Returns True if `jax.distributed.initialize` ran, False when the
    environment selects single-process mode. On the CPU backend (virtual
    meshes, tests) cross-process collectives need the gloo implementation;
    TPU backends ignore the setting and use ICI/DCN natively.
    """
    environ = os.environ if environ is None else environ
    coordinator = environ.get(ENV_COORDINATOR)
    auto = environ.get(ENV_AUTO, "").lower() in ("1", "true", "yes")
    if not coordinator and not auto:
        return False

    import jax

    platforms = jax.config.jax_platforms or environ.get("JAX_PLATFORMS", "")
    if "cpu" in platforms:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(environ.get(ENV_NUM_PROCESSES, "1")),
            process_id=int(environ.get(ENV_PROCESS_ID, "0")),
        )
    else:
        jax.distributed.initialize()
    return True


def sync_state_from_chief(state):
    """Broadcast a (possibly checkpoint-restored) state from process 0.

    Only the chief saves checkpoints (no shared filesystem is assumed
    across TPU VM hosts), so after a restart the chief restores step-N
    state while workers keep their fresh init. Replicated-sharding math
    assumes identical values on every process; this makes that true —
    values AND step, since a per-process step desynchronizes the epoch
    end and hangs the next collective. No-op in single-process runs.
    """
    import jax

    if jax.process_count() <= 1:
        return state
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(state)


def worker_env(coordinator_host, coordinator_port, num_processes, process_id):
    """The env assignments a launcher must set on worker `process_id`."""
    return {
        ENV_COORDINATOR: f"{coordinator_host}:{coordinator_port}",
        ENV_NUM_PROCESSES: str(num_processes),
        ENV_PROCESS_ID: str(process_id),
    }


def worker_env_auto():
    """The env for Cloud TPU workers: JAX metadata auto-detection.

    Used by ``lumi cloud tpu train`` for multi-host pods, where only
    the workers themselves (via the TPU metadata server) know worker
    0's resolvable address.
    """
    return {ENV_AUTO: "1"}
