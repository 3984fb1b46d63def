"""ops.select.top_k_mask: exact equivalence with the rank formulation.

The helper replaces `argsort(argsort(-scores, stable), stable) < k` in
the SSD hard-negative and RPN subsampling stages (a ~3x hardware win,
scripts/ssd_target_ab.py); these tests pin bit-identical selection —
including boundary ties, k=0, k=n, and k beyond the candidate count.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminoth_tpu.ops.select import top_k_mask


def rank_formulation(scores, k):
    order = jnp.argsort(-scores, stable=True)
    ranks = jnp.argsort(order, stable=True)
    return ranks < k


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("k", [0, 1, 7, 100, 8732])
def test_matches_rank_formulation_random(seed, k):
    rng = np.random.RandomState(seed)
    scores = jnp.asarray(rng.uniform(size=8732).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(top_k_mask(scores, k)),
        np.asarray(rank_formulation(scores, k)),
    )


@pytest.mark.parametrize("k", [0, 1, 3, 5, 9, 20])
def test_matches_rank_formulation_with_ties(k):
    # Heavy ties, including at the selection boundary and a -1 floor
    # (the SSD mining sentinel).
    scores = jnp.asarray(
        [0.5, -1.0, 0.5, 0.9, 0.5, -1.0, 0.9, 0.1, 0.5, -1.0],
        jnp.float32,
    )
    np.testing.assert_array_equal(
        np.asarray(top_k_mask(scores, k)),
        np.asarray(rank_formulation(scores, k)),
    )


def test_traced_k():
    scores = jnp.asarray([3.0, 1.0, 2.0, 2.0], jnp.float32)

    @jax.jit
    def f(s, k):
        return top_k_mask(s, k)

    np.testing.assert_array_equal(
        np.asarray(f(scores, jnp.asarray(2))),
        np.asarray([True, False, True, False]),
    )
    # k beyond n clamps to everything selected.
    assert np.asarray(f(scores, jnp.asarray(99))).all()


def test_vmapped_batch():
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.uniform(size=(4, 500)).astype(np.float32))
    ks = jnp.asarray([0, 10, 250, 500])
    got = jax.vmap(top_k_mask)(scores, ks)
    want = jax.vmap(rank_formulation)(scores, ks)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(
        np.asarray(got).sum(axis=1), np.asarray(ks)
    )


class TestGatherRows:
    def test_scalar_table_exact(self):
        rng = np.random.RandomState(0)
        table = jnp.asarray(rng.uniform(-5, 5, size=16).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 16, size=1000))
        from luminoth_tpu.ops.select import gather_rows

        np.testing.assert_array_equal(
            np.asarray(gather_rows(table, idx)), np.asarray(table[idx])
        )

    def test_row_table_exact(self):
        rng = np.random.RandomState(1)
        table = jnp.asarray(rng.uniform(-100, 100, size=(8, 5)).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 8, size=2000))
        from luminoth_tpu.ops.select import gather_rows

        np.testing.assert_array_equal(
            np.asarray(gather_rows(table, idx)), np.asarray(table[idx])
        )

    def test_under_jit_and_vmap(self):
        from luminoth_tpu.ops.select import gather_rows

        rng = np.random.RandomState(2)
        tables = jnp.asarray(rng.uniform(size=(4, 8, 4)).astype(np.float32))
        idxs = jnp.asarray(rng.randint(0, 8, size=(4, 100)))
        got = jax.jit(jax.vmap(gather_rows))(tables, idxs)
        want = jax.vmap(lambda t, i: t[i])(tables, idxs)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_signed_zero_boundary():
    # ±0.0 at the selection boundary: canonicalized to one tie group,
    # broken by ascending index (the rank formulation's ±0.0 order is
    # backend total-order territory — see the op docstring).
    scores = jnp.asarray([-0.0, +0.0, -1.0], jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(top_k_mask(scores, 1)), [True, False, False]
    )
    np.testing.assert_array_equal(
        np.asarray(top_k_mask(scores, 2)), [True, True, False]
    )
