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


def test_shard_batch_replicates_scalars():
    # Rank-0 leaves (step counters etc.) have no batch axis; shard_batch
    # must replicate them instead of raising on P('data') vs ndim 0.
    mesh = make_mesh()
    batch = {
        "image": np.zeros((8, 4, 4, 3), np.float32),
        "step": np.int32(5),
    }
    sharded = shard_batch(batch, mesh)
    assert int(sharded["step"]) == 5
    assert sharded["step"].sharding.is_fully_replicated


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


def test_spatial_mesh_helpers():
    mesh = make_mesh(space=4)
    assert mesh.axis_names == ("data", "space")
    assert mesh.devices.shape == (2, 4)
    batch = {
        "image": np.zeros((2, 16, 16, 3), np.float32),
        "gt_boxes": np.zeros((2, 4, 5), np.float32),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["image"].sharding.spec == ("data", "space")
    # Lower-rank arrays shard only the batch axis.
    assert tuple(sharded["gt_boxes"].sharding.spec) == ("data",)


def test_spatial_sharding_matches_single_device():
    """2-D (data x space) mesh: convolutions split along H via GSPMD
    halo exchange; the training math must be unchanged."""
    params, opt_state, step, x, y = build()

    single = jax.jit(step)
    losses_1 = run_steps(single, params, opt_state, x, y)

    mesh = make_mesh(space=4)  # 2 data x 4 space
    repl = replicate_sharding(mesh)
    sharded = jax.jit(
        step,
        in_shardings=(repl, repl, None, None),
        out_shardings=(repl, repl, repl),
    )
    from luminoth_tpu.parallel import batch_sharding

    params8 = jax.device_put(params, repl)
    opt8 = jax.device_put(opt_state, repl)
    x8 = jax.device_put(x, batch_sharding(mesh, ndim=x.ndim))
    y8 = jax.device_put(y, batch_sharding(mesh, ndim=y.ndim))
    losses_8 = run_steps(sharded, params8, opt8, x8, y8)

    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-4)


def test_fasterrcnn_spatial_train_step_matches_single_device():
    """One FRCNN training step under the 2-D mesh == single device."""
    import optax as _optax

    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.train import TrainState, _device_batch, make_train_step
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 3
    cfg.model.base_network.architecture = "resnet_v1_50"
    cfg.model.rpn.proposals.pre_nms_top_n = 64
    cfg.model.rpn.proposals.post_nms_top_n = 16
    cfg.model.rpn.target.minibatch_size = 16
    cfg.model.rcnn.target.minibatch_size = 8
    model = FasterRCNN(cfg)

    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (2, 64, 64, 3)) * 255.0
    gt = jnp.tile(
        jnp.asarray([[[5.0, 5, 40, 40, 0], [20, 20, 60, 60, 2]]]), (2, 1, 1)
    )
    variables = model.init(
        {"params": key, "target": key}, images, gt_boxes=gt, train=True
    )
    tx = _optax.sgd(1e-3)
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=variables["params"],
        opt_state=tx.init(variables["params"]),
        batch_stats=variables.get("batch_stats", {}),
    )
    batch = {"image": np.asarray(images), "gt_boxes": np.asarray(gt)}

    # The train step donates its state: give each run its own copy.
    state_host = jax.tree_util.tree_map(np.asarray, state)

    step_1 = make_train_step(model, tx)
    _, metrics_1 = step_1(
        jax.tree_util.tree_map(jnp.asarray, state_host),
        _device_batch(batch, None), key,
    )
    loss_1 = float(metrics_1["total_loss"])

    mesh = make_mesh(space=4)
    step_s = make_train_step(model, tx, mesh=mesh)
    state_s = jax.device_put(state_host, replicate_sharding(mesh))
    _, metrics_s = step_s(state_s, _device_batch(batch, mesh), key)
    loss_s = float(metrics_s["total_loss"])

    np.testing.assert_allclose(loss_1, loss_s, rtol=1e-4)
