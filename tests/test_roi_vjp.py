"""Validate the Pallas ROI kernel's custom VJP math on CPU.

The forward kernel only runs on TPU, but the hand-written backward
(_roi_align_bwd) is pure jnp — compare it against autodiff through the
einsum formulation of the same computation.
"""

import jax
import jax.numpy as jnp
import numpy as np

from luminoth_tpu.ops.pallas.roi_align_kernel import _roi_align_bwd
from luminoth_tpu.ops.roi_align import crop_and_resize, interp_weights


def einsum_crop_pool(fm, boxes, crop_size, pool):
    crops = crop_and_resize(fm, boxes, crop_size)
    if not pool:
        return crops
    r, s, _, c = crops.shape
    return jnp.max(
        crops.reshape(r, s // 2, 2, s // 2, 2, c), axis=(2, 4)
    )


def check(pool, seed=0):
    rng = np.random.RandomState(seed)
    fm = jnp.asarray(rng.randn(10, 12, 8).astype(np.float32))
    n = 7
    y1 = rng.uniform(0, 0.5, n)
    x1 = rng.uniform(0, 0.5, n)
    boxes = jnp.asarray(
        np.stack(
            [y1, x1, y1 + rng.uniform(0.2, 0.5, n),
             x1 + rng.uniform(0.2, 0.5, n)], axis=1
        ).astype(np.float32)
    )
    crop_size = 4
    g = jnp.asarray(
        rng.randn(*einsum_crop_pool(fm, boxes, crop_size, pool).shape)
        .astype(np.float32)
    )

    # Reference gradient through autodiff of the einsum path.
    def scalar_loss(fm_):
        return jnp.sum(einsum_crop_pool(fm_, boxes, crop_size, pool) * g)

    want = jax.grad(scalar_loss)(fm)

    # Hand-written backward.
    wy, wx = interp_weights(boxes, fm.shape[0], fm.shape[1], crop_size)
    d_fm, d_wy, d_wx = _roi_align_bwd(
        crop_size, pool, False, (fm, wy, wx), g
    )
    np.testing.assert_allclose(
        np.asarray(d_fm), np.asarray(want), atol=2e-4, rtol=1e-3
    )
    assert d_wy.shape == wy.shape and d_wx.shape == wx.shape


def test_vjp_no_pool():
    check(pool=False)


def test_vjp_with_pool():
    check(pool=True)


def test_vjp_with_pool_other_seed():
    check(pool=True, seed=3)


def check_pallas_bwd(pool, dtype=jnp.float32, seed=0, b=2, n=7):
    """The fused Pallas backward (interpret mode) matches the XLA path."""
    from luminoth_tpu.ops.pallas.roi_align_kernel import (
        _roi_align_bwd_pallas, _roi_align_bwd_xla,
    )

    rng = np.random.RandomState(seed)
    fm = jnp.asarray(rng.randn(b, 10, 12, 8).astype(np.float32)).astype(dtype)
    crop_size = 4
    y1 = rng.uniform(0, 0.5, (b, n))
    x1 = rng.uniform(0, 0.5, (b, n))
    boxes = np.stack(
        [y1, x1, y1 + rng.uniform(0.2, 0.5, (b, n)),
         x1 + rng.uniform(0.2, 0.5, (b, n))], axis=2
    ).astype(np.float32)
    wy, wx = jax.vmap(
        lambda bx: interp_weights(bx, fm.shape[1], fm.shape[2], crop_size)
    )(jnp.asarray(boxes))
    out_s = crop_size // 2 if pool else crop_size
    g = jnp.asarray(
        rng.randn(b, n, out_s, out_s, 8).astype(np.float32)
    ).astype(dtype)

    want, _, _ = _roi_align_bwd_xla(crop_size, pool, (fm, wy, wx), g)
    got = _roi_align_bwd_pallas(
        fm, wy, wx, g, crop_size, pool=pool, interpret=True
    ).astype(fm.dtype)
    assert got.shape == fm.shape
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-4 if dtype == jnp.float32 else 2e-2,
        rtol=1e-3 if dtype == jnp.float32 else 2e-2,
    )


def test_pallas_bwd_no_pool():
    check_pallas_bwd(pool=False)


def test_pallas_bwd_with_pool():
    # f32 halves tile_r to 4, so n=7 also exercises the multi-tile
    # accumulation path (2 tiles) and the zero-padded tail ROI.
    check_pallas_bwd(pool=True)


def test_pallas_bwd_with_pool_bf16():
    check_pallas_bwd(pool=True, dtype=jnp.bfloat16, seed=2)


def test_pallas_bwd_batched_many_tiles():
    check_pallas_bwd(pool=True, b=3, n=19, seed=1)
