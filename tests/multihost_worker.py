"""Worker process for the 2-process DCN test (tests/test_multihost.py).

Joins the distributed runtime through the SAME code path `lumi train`
uses (parallel.distributed.initialize_from_env reading LUMI_* env vars),
builds the global data-parallel mesh, and runs a few synchronous DP steps
of a tiny model with the batch sharded across both processes' devices.
Prints one JSON line with the observed topology and loss trajectory.

Not collected by pytest (no test_ prefix); launched as a subprocess.
"""

import json
import os
import sys


def main():
    # The test harness sets LUMI_* + JAX_PLATFORMS=cpu +
    # xla_force_host_platform_device_count before launching us.
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", "cpu")

    from luminoth_tpu.parallel import initialize_from_env

    joined = initialize_from_env()

    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import linen as nn

    from luminoth_tpu.parallel import (
        batch_sharding,
        is_chief,
        make_mesh,
        replicate_sharding,
    )

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3))(x)
            x = nn.relu(x)
            x = jnp.mean(x, axis=(1, 2))
            return nn.Dense(1)(x)

    # Deterministic global batch; every process materializes the full
    # arrays and contributes its local slice (the per-host loader pattern).
    model = TinyNet()
    key = jax.random.PRNGKey(0)
    x = np.asarray(jax.random.uniform(key, (8, 16, 16, 3)))
    y = np.asarray(jax.random.uniform(jax.random.fold_in(key, 1), (8, 1)))
    params = model.init(key, jnp.asarray(x))["params"]
    tx = optax.sgd(0.05, momentum=0.9)
    opt_state = tx.init(params)

    mesh = make_mesh()
    repl = replicate_sharding(mesh)
    data = batch_sharding(mesh)

    pid = jax.process_index()
    nproc = jax.process_count()
    rows = x.shape[0] // nproc

    def local(arr):
        return jax.make_array_from_process_local_data(
            data, arr[pid * rows:(pid + 1) * rows], arr.shape
        )

    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    sharded = jax.jit(
        step,
        in_shardings=(repl, repl, data, data),
        out_shardings=(repl, repl, repl),
    )
    params = jax.device_put(params, repl)
    opt_state = jax.device_put(opt_state, repl)
    xg, yg = local(x), local(y)

    losses = []
    for _ in range(4):
        params, opt_state, loss = sharded(params, opt_state, xg, yg)
        losses.append(float(loss))

    # Simulate a post-restart resume: only the chief restored step-N
    # state from its checkpoint (no shared filesystem), workers still
    # hold fresh init. sync_state_from_chief must leave every process
    # with the chief's values — and be a no-op in the single-process
    # control run.
    from luminoth_tpu.parallel.distributed import sync_state_from_chief

    resume = {
        "step": np.int32(7 if pid == 0 else 0),
        "w": np.float32(1.5 if pid == 0 else -2.0),
    }
    resume = sync_state_from_chief(resume)

    print(json.dumps({
        "joined": joined,
        "process_id": pid,
        "process_count": nproc,
        "global_devices": jax.device_count(),
        "local_devices": jax.local_device_count(),
        "is_chief": is_chief(),
        "losses": losses,
        "resume_step": int(resume["step"]),
        "resume_w": float(resume["w"]),
    }))


if __name__ == "__main__":
    sys.exit(main())
