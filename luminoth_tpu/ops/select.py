"""Exact dynamic-k top-k selection masks without variadic sorts.

Both target-assignment stages need "select the k highest-scoring
candidates" with a *data-dependent* k (3x the foreground count for SSD
hard-negative mining, reference luminoth/models/ssd/target.py:117-156;
the random fg/bg quotas for RPN subsampling, reference
luminoth/models/fasterrcnn/rpn_target.py:203-284). The static-shape
formulation used since round 1 was rank-based:

    order = argsort(-scores, stable);  rank = argsort(order, stable)
    keep  = rank < k

Each argsort is a variadic (key, payload) XLA sort; measured on the v5e
chip, the pair costs ~3x a value-only ``lax.sort`` at the (8732,) and
(~23k,) shapes these stages run (hardware A/B in
``scripts/ssd_target_ab.py``; the stage was ~9 ms of a 59 ms SSD train
step at batch 32). ``top_k_mask`` produces the *identical* selection
from one value-only sort:

1. sort the scores (values only, ascending);
2. the k-th largest value is a per-call threshold;
3. strictly-greater entries are in;
4. entries EQUAL to the threshold fill the remaining quota in ascending
   index order (a cumulative count — cheap VPU scan), which is exactly
   the tie order of the stable descending argsort it replaces.
"""

import jax
import jax.numpy as jnp


def gather_rows(table, idx):
    """``table[idx]`` for a TINY first axis, as a one-hot contraction.

    ``table`` is (G,) or (G, D) with small G (ground-truth rows: G ≤
    max_gt_boxes); ``idx`` is (N,) int with large N (anchors/proposals).
    XLA lowers a dynamic gather from a tiny table to a per-element loop
    on TPU — measured 1.8-4 ms per gather at target-assignment shapes
    (A=8732/23k, G=8), several times the cost of the surrounding math.
    A one-hot comparison against ``arange(G)`` contracted with the
    table is 2-5x faster (hardware A/B in ``scripts/ssd_target_ab.py``)
    and bit-exact: the one-hot row has a single 1.0 and the dot runs at
    HIGHEST precision, so each output is the untouched table value.
    """
    num_rows = table.shape[0]
    dtype = (table.dtype if jnp.issubdtype(table.dtype, jnp.floating)
             else jnp.float32)
    onehot = jax.nn.one_hot(idx, num_rows, dtype=dtype)
    out = jnp.matmul(
        onehot,
        table.astype(dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(table.dtype)


def top_k_mask(scores, k):
    """Boolean mask of the ``k`` largest entries of ``scores``.

    Ties at the selection boundary are broken by ascending index —
    bit-identical to ``argsort(argsort(-scores, stable), stable) < k``
    for NaN-free scores that don't mix -0.0 and +0.0, and any traced
    integer ``k`` (clamped to [0, n]). Signed zeros are canonicalized
    to +0.0 first and treated as one tie group broken by index — the
    sort's total order ranks -0.0 below +0.0 while the threshold
    comparisons below use IEEE equality, and the rank formulation's
    own ±0.0 ordering is itself backend-total-order territory, so a
    defined index tiebreak is the only portable semantic. No call
    site produces -0.0 (softmax probs, uniform priorities).
    """
    n = scores.shape[0]
    k = jnp.clip(k, 0, n)
    scores = jnp.where(scores == 0.0, 0.0, scores)  # -0.0 -> +0.0
    sorted_vals = jax.lax.sort(scores)  # ascending, values only
    kth = sorted_vals[jnp.clip(n - k, 0, n - 1)]  # k-th largest
    greater = scores > kth
    need = k - jnp.sum(greater)  # quota left for boundary ties
    tie = scores == kth
    tie_order = jnp.cumsum(tie)  # 1-based among ties, ascending index
    return greater | (tie & (tie_order <= need))
