"""Decompose the FRCNN train step (batch 8 @ 608x800) into stages.

Ablations, each independently jitted and fenced with a real output fetch
(block_until_ready is not a fence on the tunneled attachment — see
bench.py:_bench):

  full        the shipped train step (fwd + bwd + optimizer)
  fwd         forward + loss only
  vag         value_and_grad, no optimizer update
  opt         tx.update + apply_updates on precomputed grads

The gap (vag - fwd) is the backward pass; (full - vag) is optimizer +
state bookkeeping.  Reference counterpart of the path being profiled:
/root/reference/luminoth/train.py:79-91 (compute→clip→apply).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from luminoth_tpu.models.fasterrcnn import FasterRCNN
from luminoth_tpu.train import TrainState, make_train_step
from luminoth_tpu.utils.config import Config, get_base_config, get_model_config

B, H, W = 8, 608, 800

cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
cfg.model.network.num_classes = 80
cfg.model.base_network.architecture = "resnet_v1_101"
model = FasterRCNN(cfg, dtype=jnp.bfloat16)

key = jax.random.PRNGKey(0)
images = jax.random.uniform(key, (B, H, W, 3)) * 255.0
rng = np.random.RandomState(0)
gt = np.full((B, 8, 5), -1.0, np.float32)
for b in range(B):
    for i in range(4):
        x1, y1 = rng.uniform(0, W - 80), rng.uniform(0, H - 80)
        gt[b, i] = [x1, y1, x1 + rng.uniform(40, 80), y1 + rng.uniform(40, 80),
                    rng.randint(0, 80)]
gt_boxes = jnp.asarray(gt)

variables = jax.jit(
    lambda k: model.init({"params": k, "target": k, "dropout": k},
                         images[:1], gt_boxes=gt_boxes[:1], train=True)
)(key)
params = variables["params"]

tx = optax.chain(optax.clip_by_global_norm(10.0), optax.sgd(1e-4, momentum=0.9))
state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                   opt_state=tx.init(params),
                   batch_stats=variables.get("batch_stats", {}))
batch = {"image": images, "gt_boxes": gt_boxes}

# poison the tunnel once up front so all fences are cheap
jax.device_get(jnp.zeros(()))


def timeit(label, fn, *args, iters=8):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])  # compile + fence
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:<42s} {dt:8.1f} ms")
    return out


BATCH_STATS = variables.get("batch_stats", {})


def loss_fn(p, b, r):
    rt, rd = jax.random.split(r)
    v = {"params": p}
    if BATCH_STATS:
        v["batch_stats"] = BATCH_STATS
    preds = model.apply(v, b["image"], gt_boxes=b["gt_boxes"],
                        train=True, rngs={"target": rt, "dropout": rd})
    losses = model.loss(preds, return_all=True)
    return losses["total_loss"], losses


# Non-donating equivalent of make_train_step (donation invalidates the
# argument buffers, which a repeated-timing loop reuses).
def full_step(st, b, r):
    (loss, losses), grads = jax.value_and_grad(
        lambda p: loss_fn(p, b, r), has_aux=True)(st.params)
    updates, new_opt = tx.update(grads, st.opt_state, st.params)
    new_params = optax.apply_updates(st.params, updates)
    return st.replace(step=st.step + 1, params=new_params,
                      opt_state=new_opt), losses


full = jax.jit(full_step)
timeit("full train step (no donation)", full, state, batch, key)

fwd = jax.jit(loss_fn)
timeit("forward + loss", fwd, params, batch, key)

vag = jax.jit(lambda p, b, r: jax.value_and_grad(loss_fn, has_aux=True)(p, b, r))
(_, _), grads = timeit("value_and_grad", vag, params, batch, key)

opt = jax.jit(lambda g, s: tx.update(g, s.opt_state, s.params))
timeit("optimizer update (clip+sgd)", opt, grads, state)

# Backward decomposition: grad wrt the feature map only (truncates the
# backbone backward), vs grad wrt params of individual submodules.
def fwd_from_features(p, fm, b, r):
    # rerun the full model but treat the backbone output as the leaf
    rt, rd = jax.random.split(r)
    preds = model.apply({"params": p}, b["image"], gt_boxes=b["gt_boxes"],
                        train=True, rngs={"target": rt, "dropout": rd})
    return preds

# Cheaper proxy: grads wrt only the RCNN-head params (backbone/tail frozen
# as constants) — isolates the head backward from the trunk backward.
head_keys = [k for k in params if "rcnn" in k.lower() or "rpn" in k.lower()]
print("head param groups:", head_keys)
trunk = {k: v for k, v in params.items() if k not in head_keys}
head = {k: v for k, v in params.items() if k in head_keys}


def head_loss(hp, tp, b, r):
    return loss_fn({**tp, **hp}, b, r)


vag_head = jax.jit(lambda hp, tp, b, r:
                   jax.value_and_grad(head_loss, has_aux=True)(hp, tp, b, r))
timeit("value_and_grad (heads only)", vag_head, head, trunk, batch, key)
