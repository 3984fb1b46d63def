"""Fused Pallas ROI kernel (interpret mode) vs the XLA einsum path.

Runs the kernel on CPU via the Pallas interpreter, so the fused
crop(+maxpool) and its custom VJP are exercised in CI, not only on
hardware. Forward must match crop_and_resize(+pool); the VJP must match
XLA autodiff through the reference formulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from luminoth_tpu.ops.pallas.roi_align_kernel import roi_align_pallas
from luminoth_tpu.ops.roi_align import crop_and_resize, interp_weights


S = 8  # crop size (even, for the fused 2x2 pool)


def make_inputs(rng, b=2, h=17, w=23, c=5, r=13, dtype=np.float32):
    fm = rng.randn(b, h, w, c).astype(dtype)
    y1 = rng.uniform(0, 0.6, (b, r))
    x1 = rng.uniform(0, 0.6, (b, r))
    boxes = np.stack(
        [y1, x1, y1 + rng.uniform(0.05, 0.4, (b, r)),
         x1 + rng.uniform(0.05, 0.4, (b, r))], axis=-1
    ).astype(np.float32)
    wy, wx = jax.vmap(lambda bx: interp_weights(bx, h, w, S))(
        jnp.asarray(boxes)
    )
    return jnp.asarray(fm), jnp.asarray(boxes), wy, wx


def xla_crop_pool(fm, boxes, pool=True):
    def one(f, bx):
        crops = crop_and_resize(f, bx, S)
        if not pool:
            return crops
        r, s, _, c = crops.shape
        return jnp.max(crops.reshape(r, s // 2, 2, s // 2, 2, c), (2, 4))

    return jax.vmap(one)(fm, boxes)


class TestForwardInterpret:
    @pytest.mark.parametrize("pool", [True, False])
    def test_matches_xla_path(self, rng, pool):
        fm, boxes, wy, wx = make_inputs(rng)
        got = roi_align_pallas(fm, wy, wx, S, pool, True)
        want = xla_crop_pool(fm, boxes, pool=pool)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_unbatched(self, rng):
        fm, boxes, wy, wx = make_inputs(rng, b=1)
        got = roi_align_pallas(fm[0], wy[0], wx[0], S, True, True)
        want = xla_crop_pool(fm, boxes)[0]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )

    def test_roi_padding_to_tile(self, rng):
        # r not a multiple of the ROI tile exercises the pad+slice path.
        fm, boxes, wy, wx = make_inputs(rng, r=3)
        got = roi_align_pallas(fm, wy, wx, S, True, True)
        want = xla_crop_pool(fm, boxes)
        assert got.shape == want.shape
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
        )


class TestBf16VJPInterpret:
    def test_bf16_grad_matches_bf16_mimic(self, rng):
        """On the bf16 path the backward recompute must pool the SAME
        intermediate values as the forward kernel (wx contraction first,
        f32 accumulator cast to bf16 before the wy contraction) — an f32
        recompute can pick different window maxima near bf16 rounding."""
        fm, boxes, wy, wx = make_inputs(rng, b=1, r=5)
        fm16 = fm.astype(jnp.bfloat16)
        cot = jnp.asarray(
            rng.randn(1, 5, S // 2, S // 2, fm.shape[-1]).astype(np.float32)
        )

        def mimic(f):
            # The kernel's exact arithmetic in plain XLA.
            cols = jnp.einsum(
                "brtw,bhwc->brthc", wx.astype(jnp.bfloat16), f,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
            crop = jnp.einsum(
                "brsh,brthc->brstc", wy.astype(jnp.bfloat16), cols,
                preferred_element_type=jnp.float32,
            )
            b, r = crop.shape[0], crop.shape[1]
            c = crop.shape[-1]
            win = crop.reshape(b, r, S // 2, 2, S // 2, 2, c)
            return jnp.vdot(jnp.max(win, axis=(3, 5)), cot)

        def via_kernel(f):
            return jnp.vdot(
                roi_align_pallas(f, wy, wx, S, True, True).astype(
                    jnp.float32
                ),
                cot,
            )

        g_kernel = jax.grad(via_kernel)(fm16).astype(np.float32)
        g_mimic = jax.grad(mimic)(fm16).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(g_kernel), np.asarray(g_mimic), atol=2e-2, rtol=2e-2
        )


class TestVJPInterpret:
    @pytest.mark.parametrize("pool", [True, False])
    def test_grad_matches_xla_autodiff(self, rng, pool):
        fm, boxes, wy, wx = make_inputs(rng)
        cot = jnp.asarray(
            rng.randn(
                *(fm.shape[0], wy.shape[1], S // 2 if pool else S,
                  S // 2 if pool else S, fm.shape[-1])
            ).astype(np.float32)
        )

        def via_kernel(f):
            return jnp.vdot(roi_align_pallas(f, wy, wx, S, pool, True), cot)

        def via_xla(f):
            return jnp.vdot(xla_crop_pool(f, boxes, pool=pool), cot)

        g_kernel = jax.grad(via_kernel)(fm)
        g_xla = jax.grad(via_xla)(fm)
        np.testing.assert_allclose(
            np.asarray(g_kernel), np.asarray(g_xla), atol=1e-4, rtol=1e-4
        )
