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
