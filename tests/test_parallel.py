"""Data-parallel equivalence: 8-device mesh == single device, same math.

Synchronous DP with replicated params and a mean loss must produce the same
loss trajectory as single-device execution (up to float reassociation) —
the property the reference's async PS design could NOT guarantee.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from luminoth_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicate_sharding,
    shard_batch,
)


class TinyNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Conv(8, (3, 3))(x)
        x = nn.relu(x)
        x = jnp.mean(x, axis=(1, 2))
        return nn.Dense(1)(x)


def build(seed=0):
    model = TinyNet()
    key = jax.random.PRNGKey(seed)
    x = jax.random.uniform(key, (8, 16, 16, 3))
    y = jax.random.uniform(jax.random.fold_in(key, 1), (8, 1))
    params = model.init(key, x)["params"]
    tx = optax.sgd(0.05, momentum=0.9)
    opt_state = tx.init(params)

    def step(params, opt_state, x, y):
        def loss_fn(p):
            pred = model.apply({"params": p}, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return params, opt_state, step, x, y


def run_steps(step_fn, params, opt_state, x, y, n=5):
    losses = []
    for _ in range(n):
        params, opt_state, loss = step_fn(params, opt_state, x, y)
        losses.append(float(loss))
    return losses


def test_mesh_helpers():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)
    batch = {"image": np.zeros((8, 4, 4, 3), np.float32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["image"].sharding.spec == batch_sharding(mesh).spec


def test_dp_matches_single_device():
    params, opt_state, step, x, y = build()

    single = jax.jit(step)
    losses_1 = run_steps(single, params, opt_state, x, y)

    mesh = make_mesh()
    repl = replicate_sharding(mesh)
    data = batch_sharding(mesh)
    sharded = jax.jit(
        step,
        in_shardings=(repl, repl, data, data),
        out_shardings=(repl, repl, repl),
    )
    params8 = jax.device_put(params, repl)
    opt8 = jax.device_put(opt_state, repl)
    x8 = jax.device_put(x, data)
    y8 = jax.device_put(y, data)
    losses_8 = run_steps(sharded, params8, opt8, x8, y8)

    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-4)
    # Losses actually decrease.
    assert losses_1[-1] < losses_1[0]
