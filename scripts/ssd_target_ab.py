"""Same-process hardware A/B: top_k_mask vs argsort-of-argsort ranks.

The dynamic-k selections in SSD hard-negative mining and RPN
subsampling were rank-based (two stable variadic argsorts); they now
use ``ops.select.top_k_mask`` (one value-only ``lax.sort`` + threshold
+ tie fill). Cross-process timings vary with the tunnel attachment
(STATUS.md round-5 note 6), so this A/B runs BOTH formulations in one
process, at the stage level and composed into the full SSD train step.

Usage: python scripts/ssd_target_ab.py [batch]
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from luminoth_tpu.models.ssd.target import ssd_target_assign
from luminoth_tpu.ops.select import top_k_mask

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
A, C = 8732, 20

key = jax.random.PRNGKey(0)
probs = jax.random.uniform(key, (B, A, C + 1))
anchors = jnp.abs(jax.random.normal(key, (A, 4))) * 50
anchors = jnp.concatenate([anchors[:, :2], anchors[:, :2] + 20], axis=1)
rng = np.random.RandomState(0)
gt = np.full((B, 8, 5), -1.0, np.float32)
for b in range(B):
    for i in range(4):
        x1, y1 = rng.uniform(0, 220), rng.uniform(0, 220)
        gt[b, i] = [x1, y1, x1 + 60, y1 + 60, rng.randint(0, 20)]
gt = jnp.asarray(gt)

jax.device_get(jnp.zeros(()))  # poison tunnel once; fences cheap after


def timeit(label, fn, *args, iters=30):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0])
    dt = (time.time() - t0) / iters * 1000
    print(f"{label:<44s} {dt:8.2f} ms", flush=True)
    return out


# --- stage level: the two selection formulations in isolation --------
scores = jax.random.uniform(key, (B, A))
ks = jnp.full((B,), 48, jnp.int32)


def rank_select(s, k):
    order = jnp.argsort(-s, stable=True)
    ranks = jnp.argsort(order, stable=True)
    return ranks < k


timeit("rank select (argsort-of-argsort)",
       jax.jit(jax.vmap(rank_select)), scores, ks)
timeit("top_k_mask (sort + threshold)",
       jax.jit(jax.vmap(top_k_mask)), scores, ks)

# --- full target assignment (the shipped path uses top_k_mask) -------
target = jax.jit(jax.vmap(partial(
    ssd_target_assign, num_classes=C, foreground_threshold=0.5,
    background_threshold_high=0.2, hard_negative_ratio=3.0,
    variances=(0.1, 0.2)), in_axes=(0, None, 0)))
timeit("ssd_target_assign (shipped)", target, probs, anchors, gt)
