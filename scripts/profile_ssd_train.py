"""Decompose the SSD train step (batch 32 @ 300x300) into stages.

Counterpart of scripts/profile_train.py for the SSD family — run once
on hardware to locate (or rule out) a train-step lever. Stages, each
independently jitted and fenced with a real output fetch
(block_until_ready is not a fence on the tunneled attachment):

  full        fwd + bwd + optimizer (non-donating)
  fwd         forward + loss only (includes SSDTarget + hard-neg mining)
  fwd-infer   forward WITHOUT targets (inference graph at train batch)
  vag         value_and_grad, no optimizer update
  opt         tx.update + apply_updates on precomputed grads

(fwd - fwd-infer) isolates the target-assignment + hard-negative-mining
cost; (vag - fwd) is the backward. Reference counterpart of the path:
/root/reference/luminoth/models/ssd/ssd.py:135-171 (targets) and
train.py:79-91 (compute->clip->apply).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from luminoth_tpu.models.ssd import SSD
from luminoth_tpu.train import TrainState
from luminoth_tpu.utils.config import Config, get_base_config, get_model_config

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32

cfg = get_model_config(get_base_config(SSD), Config({}), [])
cfg.model.network.num_classes = 20

model = SSD(cfg, dtype=jnp.bfloat16)
key = jax.random.PRNGKey(0)
images = jax.random.uniform(key, (B, 300, 300, 3)) * 255.0
rng = np.random.RandomState(0)
gt = np.full((B, 8, 5), -1.0, np.float32)
for b in range(B):
    for i in range(4):
        x1, y1 = rng.uniform(0, 220), rng.uniform(0, 220)
        gt[b, i] = [x1, y1, x1 + rng.uniform(40, 80),
                    y1 + rng.uniform(40, 80), rng.randint(0, 20)]
gt_boxes = jnp.asarray(gt)

variables = jax.jit(
    lambda k: model.init({"params": k, "target": k, "dropout": k},
                         images[:1], gt_boxes=gt_boxes[:1], train=True)
)(key)
params = variables["params"]
BATCH_STATS = variables.get("batch_stats", {})

tx = optax.chain(optax.clip_by_global_norm(10.0),
                 optax.sgd(1e-4, momentum=0.9))
state = TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                   opt_state=tx.init(params), batch_stats=BATCH_STATS)
batch = {"image": images, "gt_boxes": gt_boxes}

jax.device_get(jnp.zeros(()))  # poison the tunnel once; fences cheap after


def timeit(label, fn, *args, iters=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:<42s} {dt:8.1f} ms", flush=True)
    return out


def loss_fn(p, b, r):
    rt, rd = jax.random.split(r)
    v = {"params": p}
    if BATCH_STATS:
        v["batch_stats"] = BATCH_STATS
    preds = model.apply(v, b["image"], gt_boxes=b["gt_boxes"],
                        train=True, rngs={"target": rt, "dropout": rd})
    losses = model.loss(preds, return_all=True)
    return losses["total_loss"], losses


def full_step(st, b, r):
    (loss, losses), grads = jax.value_and_grad(
        lambda p: loss_fn(p, b, r), has_aux=True)(st.params)
    updates, new_opt = tx.update(grads, st.opt_state, st.params)
    new_params = optax.apply_updates(st.params, updates)
    return st.replace(step=st.step + 1, params=new_params,
                      opt_state=new_opt), losses


timeit("full train step (no donation)", jax.jit(full_step),
       state, batch, key)
timeit("forward + loss (targets + hard-neg)", jax.jit(loss_fn),
       params, batch, key)


def fwd_infer(p, b):
    v = {"params": p}
    if BATCH_STATS:
        v["batch_stats"] = BATCH_STATS
    out = model.apply(v, b["image"], train=False)
    cp = out["classification_prediction"]
    return cp["objects"], cp["probs"]


timeit("forward inference graph (same batch)", jax.jit(fwd_infer),
       params, batch)

vag = jax.jit(lambda p, b, r: jax.value_and_grad(
    loss_fn, has_aux=True)(p, b, r))
(_, _), grads = timeit("value_and_grad", vag, params, batch, key)

timeit("optimizer update (clip+sgd)",
       jax.jit(lambda g, s: tx.update(g, s.opt_state, s.params)),
       grads, state)
