"""Decompose the FRCNN backward: which stage owns the ~119 ms?

Ablations (all batch 8 @ 608x800, bf16, default train config):
  A vag wrt tail+rcnn only      -> tail/rcnn weight grads, no ROI scatter
  B vag wrt trunk only          -> full input-grad chain incl. ROI scatter
  C vag wrt trunk, rpn loss only-> trunk backward via RPN head alone
  D roi_align fwd+bwd alone     -> the crop kernel's VJP in isolation

Measured (v5e, r3): A 85.8 ms / B 146.6 ms / C 74.7 ms, forward 49 ms.
With trunk+rpn backward ~26 ms (C-fwd) and tail+rcnn weight grads
~37 ms (A-fwd), the residual of B put the ROI-align VJP at ~35 ms in
context; standalone A/B (2048 train ROIs): XLA chunked backward
54.3 ms vs 25.4 ms for the fused Pallas backward kernel that replaced
it (ops/pallas/roi_align_kernel.py::_roi_bwd_kernel). D1's number is a
tunnel artifact: fetching the 1.6 GB unpooled crop dominates.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from luminoth_tpu.models.fasterrcnn import FasterRCNN
from luminoth_tpu.utils.config import Config, get_base_config, get_model_config

B, H, W = 8, 608, 800

cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
cfg.model.network.num_classes = 80
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
BATCH_STATS = variables.get("batch_stats", {})
batch = {"image": images, "gt_boxes": gt_boxes}

jax.device_get(jnp.zeros(()))


def timeit(label, fn, *args, iters=8):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:<52s} {dt:8.1f} ms", flush=True)
    return out


def loss_from(p, b, r, which="total_loss"):
    rt, rd = jax.random.split(r)
    v = {"params": p}
    if BATCH_STATS:
        v["batch_stats"] = BATCH_STATS
    preds = model.apply(v, b["image"], gt_boxes=b["gt_boxes"],
                        train=True, rngs={"target": rt, "dropout": rd})
    losses = model.loss(preds, return_all=True)
    if which == "rpn":
        return losses["rpn_cls_loss"] + losses["rpn_reg_loss"], losses
    return losses["total_loss"], losses


flat_p = traverse_util.flatten_dict(params)
groups = sorted({k[0] for k in flat_p})
print("top-level groups:", groups)


def split_by(pred):
    a = {k: v for k, v in flat_p.items() if pred(k[0])}
    b = {k: v for k, v in flat_p.items() if not pred(k[0])}
    return a, b


def vag_over(pred, which="total_loss"):
    tp, fp = split_by(pred)

    def f(tp, fp, b, r):
        merged = traverse_util.unflatten_dict({**fp, **tp})
        return loss_from(merged, b, r, which)

    return jax.jit(lambda tp, fp, b, r:
                   jax.value_and_grad(f, has_aux=True)(tp, fp, b, r)), tp, fp


f, tp, fp = vag_over(lambda g: "tail" in g or g == "rcnn")
timeit("A vag tail+rcnn only", f, tp, fp, batch, key)

f, tp, fp = vag_over(lambda g: g == "base_network")
timeit("B vag trunk only (total loss)", f, tp, fp, batch, key)

f, tp, fp = vag_over(lambda g: g == "base_network", which="rpn")
timeit("C vag trunk only (rpn loss only)", f, tp, fp, batch, key)

# D: roi_align fwd/bwd in isolation at train shapes (2048 rois, 14x14).
from luminoth_tpu.ops.roi_align import crop_and_resize

fm = jax.random.uniform(key, (B, H // 16, W // 16, 1024), jnp.bfloat16)
boxes = jnp.concatenate([
    jax.random.uniform(key, (2048, 1)) * (W - 120),
    jax.random.uniform(key, (2048, 1)) * (H - 120),
    jnp.full((2048, 1), 100.0), jnp.full((2048, 1), 100.0),
], axis=1)
boxes = boxes.at[:, 2].set(boxes[:, 0] + 100).at[:, 3].set(boxes[:, 1] + 100)
bidx = jnp.zeros((2048,), jnp.int32)


def roi_fwd(fm):
    # batch index folded the way the model does: crop per image via vmap
    # is model-internal; here single-image repeated suffices for cost.
    return crop_and_resize(fm[0], boxes, crop_size=14)


jfwd = jax.jit(roi_fwd)
timeit("D1 roi crop fwd (2048 rois)", jfwd, fm)

jbwd = jax.jit(lambda fm: jax.grad(
    lambda f: jnp.sum(roi_fwd(f).astype(jnp.float32)))(fm))
timeit("D2 roi crop fwd+bwd (2048 rois)", jbwd, fm)
