"""Detection losses (pure jnp).

reference: luminoth/utils/losses.py:4-32 (σ-parameterized smooth-L1).
"""

import jax.numpy as jnp


def smooth_l1_loss(bbox_prediction, bbox_target, sigma=3.0):
    """σ-parameterized smooth-L1, summed over the last axis.

    ``0.5·σ²·x²`` when ``|x| < 1/σ²`` else ``|x| − 0.5/σ²``, reduced with a
    sum over the trailing (coordinate) axis, matching the reference's
    ``reduce_sum(..., [1])`` on (N, 4) inputs.
    """
    sigma2 = sigma**2
    diff = bbox_prediction - bbox_target
    abs_diff = jnp.abs(diff)
    loss = jnp.where(
        abs_diff < 1.0 / sigma2,
        0.5 * sigma2 * jnp.square(abs_diff),
        abs_diff - 0.5 / sigma2,
    )
    return jnp.sum(loss, axis=-1)


def softmax_cross_entropy(logits, labels_one_hot):
    """Per-row softmax cross-entropy; labels are one-hot (possibly smoothed)."""
    log_probs = logits - jnp.max(logits, axis=-1, keepdims=True)
    log_probs = log_probs - jnp.log(
        jnp.sum(jnp.exp(log_probs), axis=-1, keepdims=True)
    )
    return -jnp.sum(labels_one_hot * log_probs, axis=-1)
