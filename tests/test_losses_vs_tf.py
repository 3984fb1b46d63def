"""Cross-check loss ops against the TF kernels the reference calls.

The reference's losses are ``tf.nn.softmax_cross_entropy_with_logits``
(rpn.py:229-249, rcnn.py:300-330) and a hand-written σ-parameterized
smooth-L1 (utils/losses.py:4-32) built from TF primitives; with TF
installed, both are executable oracles.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from luminoth_tpu.ops.losses import (  # noqa: E402
    smooth_l1_loss,
    softmax_cross_entropy,
)


def _tf_smooth_l1(pred, target, sigma):
    """The reference's formula (utils/losses.py:4-32), in TF."""
    sigma2 = sigma**2
    diff = tf.subtract(pred, target)
    abs_diff = tf.abs(diff)
    below = tf.cast(tf.less(abs_diff, 1.0 / sigma2), tf.float32)
    loss = (
        0.5 * sigma2 * tf.square(abs_diff) * below
        + (abs_diff - 0.5 / sigma2) * (1.0 - below)
    )
    return tf.reduce_sum(loss, axis=1)


def test_smooth_l1_matches_reference_formula():
    rng = np.random.RandomState(0)
    pred = rng.randn(64, 4).astype(np.float32) * 3
    target = rng.randn(64, 4).astype(np.float32) * 3
    for sigma in (1.0, 3.0):
        got = np.asarray(
            smooth_l1_loss(jnp.asarray(pred), jnp.asarray(target),
                           sigma=sigma)
        )
        want = _tf_smooth_l1(pred, target, sigma).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_softmax_cross_entropy_matches_tf():
    rng = np.random.RandomState(1)
    logits = rng.randn(128, 21).astype(np.float32) * 5
    labels = np.eye(21, dtype=np.float32)[rng.randint(0, 21, 128)]
    got = np.asarray(
        softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    )
    want = tf.nn.softmax_cross_entropy_with_logits(
        labels=labels, logits=logits
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_softmax_cross_entropy_smoothed_labels():
    rng = np.random.RandomState(2)
    logits = rng.randn(32, 5).astype(np.float32)
    labels = rng.dirichlet(np.ones(5), 32).astype(np.float32)
    got = np.asarray(
        softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    )
    want = tf.nn.softmax_cross_entropy_with_logits(
        labels=labels, logits=logits
    ).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
