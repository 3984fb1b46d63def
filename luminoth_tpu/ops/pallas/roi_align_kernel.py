"""Fused ROI crop-and-resize(+maxpool) Pallas TPU kernel.

The XLA formulation of separable bilinear cropping writes the (R, S, W, C)
"rows" intermediate to HBM between the two interpolation matmuls — several
GB per image at R=2000 proposals, which makes the stage HBM-bound. This
kernel keeps the entire feature map and the per-tile intermediate in VMEM:

    per tile: cols = Wx_stacked (T·S, W) @ fmᵀ (W, H·C)   (MXU, M=T·S)
    per ROI:  crop = Wy (S, H) @ colsᵀ (H, S·C)           (MXU)
              out  = maxpool2x2(crop)                     (VPU, fused)

Only the pooled (S/2, S/2, C) crops ever touch HBM. The grid tiles the ROI
axis; the feature map block is re-used across programs (constant index
map → it stays resident). Shape choices (ROI stacking into M, W-first
contraction order, bf16 intermediate) are hardware-measured — see the
kernel body.

Measured decomposition at the parity shape (batch 8, R=2000, 38x50x1024
fm, S=14; v5e): 74 ms total = 13 ms stage-1 matmul (K=W=50 caps MXU
utilization at ~0.33) + ~12 ms per-ROI corner turns (inherent to
separable interpolation: the second contraction needs H on sublanes)
+ ~37 ms second-stage matmuls (M=S=14 → each (14,38)@(38,S*C) dot is
latency-bound, ~2.3 us vs a 0.24 us pass-bound floor) + pool/writes.
Alternatives measured on hardware and REJECTED (all slower end to end):
  * larger ROI tiles (tile_r 16/32): 82.5/84.4 ms — stage-2 cost is
    per-ROI, stage-1 gains nothing past M=112;
  * block-diagonal stage 2 (one (tile_r*S, tile_r*H) matmul per tile,
    both in-kernel pads and XLA-precomputed): 84.7 ms; with 2- or
    4-ROI blocks isolated stage-2 A/B still loses (7.9/8.5 vs 6.1 ms
    per image) — the K-axis zero-padding waste grows faster than the
    M-axis utilization gain at every block size;
  * in-kernel jnp-padded block construction: lane-misaligned (offsets
    of H=38) relayouts dominate.
  * stored-routing-mask backward (forward emits a uint8 is-window-max
    mask per pre-pool element; backward routes cotangents through it
    instead of recomputing the crop): the mask write alone costs
    +70.6 ms on the forward (75.2 → 145.8 ms at the train shape) —
    a (B, R, S, S, C) uint8 HBM stream the recompute path never
    touches — and the masked backward kernel does not lower on the
    TPU Mosaic backend at all (uint8→f32 `astype` inside the kernel is
    an unsupported cast; it only ever ran under interpret=True). The
    recompute backward (:func:`_roi_bwd_kernel`) wins outright, so the
    masked formulation was measured, recorded here, and deleted
    (round 4; it last existed at commit 818af01).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _roi_kernel(wy_ref, wx_ref, fmt_ref, out_ref, *, tile_r, s, pool):
    h = wy_ref.shape[-1]
    w = wx_ref.shape[-1]
    c = fmt_ref.shape[-1] // h

    fmt = fmt_ref[0]  # (W, H*C) — feature map with W leading

    # Column interpolation for the WHOLE tile in one matmul. Two shape
    # choices matter (both measured on hardware):
    #  * stacking the tile's ROIs lifts M from S (14 — 11% of the
    #    128-row MXU) to tile_r*S;
    #  * contracting the LARGER spatial dim (W) first makes the
    #    intermediate (S, H*C) instead of (S, W*C) — the kernel is
    #    VMEM-traffic-bound on this array, and H < W for wide canvases.
    # The f32 accumulator is cast back to the feature map's dtype: bf16
    # halves the traffic on the bf16 compute path, while an f32 model
    # keeps full precision. The backward pass's pre-pool recompute
    # mirrors this exact cast + contraction order so maxpool argmaxes
    # agree in both dtypes.
    wx_all = wx_ref[0].reshape(tile_r * s, w)  # (tile_r*S, W)
    cols_all = jnp.dot(
        wx_all, fmt, preferred_element_type=jnp.float32
    ).astype(fmt.dtype)  # (tile_r*S_x, H*C)

    for j in range(tile_r):
        # (S_x, H, C) → (H, S_x, C) → (H, S_x*C): contraction axis front.
        cols = cols_all[j * s:(j + 1) * s]
        cols = cols.reshape(s, h, c).transpose(1, 0, 2).reshape(h, s * c)
        wy = wy_ref[0, j]  # (S_y, H)
        crop = jnp.dot(
            wy, cols, preferred_element_type=jnp.float32
        ).reshape(s, s, c)  # (y, x, c) — already in output order
        if pool:
            win = crop.reshape(s // 2, 2, s // 2, 2, c)
            crop = jnp.max(win, axis=(1, 3))
        out_ref[0, j] = crop.astype(out_ref.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def roi_align_pallas(feature_map, wy, wx, crop_size, pool=True,
                     interpret=False):
    """Differentiable wrapper — see :func:`_roi_align_impl`.

    Custom VJP because pallas_call has no autodiff rule: the crop is linear
    in the feature map, so the backward pass is the transposed pair of
    interpolation contractions; the fused maxpool backprops by recomputing
    the pre-pool crop and routing cotangents to the window maxima. On TPU
    the backward is its own fused Pallas kernel (:func:`_roi_bwd_kernel`,
    measured 25.4 ms vs 54.3 ms for the chunked-einsum XLA formulation at
    the train shape: batch 8, 2048 ROIs, 38x50x1024 bf16); elsewhere the
    XLA path runs. Gradients w.r.t. the interpolation weights are not
    propagated (proposals are stop_gradient'd in the detector, matching
    the reference's design — fasterrcnn.py:147).
    """
    return _roi_align_impl(
        feature_map, wy, wx, crop_size, pool=pool, interpret=interpret
    )


def _roi_align_fwd(feature_map, wy, wx, crop_size, pool, interpret):
    out = _roi_align_impl(
        feature_map, wy, wx, crop_size, pool=pool, interpret=interpret
    )
    return out, (feature_map, wy, wx)


def _roi_bwd_kernel(wy_ref, wx_ref, g_ref, fmt_ref, dout_ref, *,
                    tile_r, s, pool):
    """Transposed interpolation pair, accumulated into the d_fm block.

    The output BlockSpec's index map is constant along the ROI-tile grid
    axis (the innermost one), so the (W, H*C) f32 cotangent block stays
    resident in VMEM across a whole image's tiles and is written to HBM
    once per image — the XLA formulation instead re-read and re-wrote the
    full feature-map cotangent every fori_loop chunk. The pre-pool crop
    is recomputed per tile with the forward kernel's exact arithmetic
    (same contraction order, same f32→fm-dtype cast between stages) so
    the max-pool argmax routing agrees bit-for-bit.
    """
    h = wy_ref.shape[-1]
    w = wx_ref.shape[-1]
    c = dout_ref.shape[-1] // h
    i = pl.program_id(1)

    fmt = fmt_ref[0]  # (W, H*C), feature-map dtype
    cdt = fmt.dtype
    wx_all = wx_ref[0].reshape(tile_r * s, w)  # f32
    if pool:
        cols_all = jnp.dot(
            wx_all.astype(cdt), fmt, preferred_element_type=jnp.float32
        ).astype(cdt)  # (tile_r*S_x, H*C) — forward's stage-1 replay

    d_cols_rows = []
    for j in range(tile_r):
        wy = wy_ref[0, j]  # (S_y, H) f32
        if pool:
            cols = cols_all[j * s:(j + 1) * s]
            cols = cols.reshape(s, h, c).transpose(1, 0, 2).reshape(h, s * c)
            crop = jnp.dot(
                wy.astype(cdt), cols, preferred_element_type=jnp.float32
            ).reshape(s, s, c)
            win = crop.reshape(s // 2, 2, s // 2, 2, c)
            win_max = jnp.max(win, axis=(1, 3), keepdims=True)
            is_max = (win == win_max).astype(jnp.float32)
            ties = jnp.sum(is_max, axis=(1, 3), keepdims=True)
            g_win = g_ref[0, j].astype(jnp.float32).reshape(
                s // 2, 1, s // 2, 1, c
            )
            g_crop = (is_max / ties * g_win).reshape(s, s * c)
        else:
            g_crop = g_ref[0, j].astype(jnp.float32).reshape(s, s * c)
        # crop = Wy @ cols  =>  d_cols = Wyᵀ @ g_crop   (H, S_x*C)
        d_cols = jnp.dot(
            wy.T, g_crop, preferred_element_type=jnp.float32
        )
        d_cols_rows.append(
            d_cols.reshape(h, s, c).transpose(1, 0, 2).reshape(s, h * c)
        )
    d_cols_all = jnp.concatenate(d_cols_rows, axis=0)  # (tile_r*S_x, H*C)
    # cols = Wx_all @ fmt  =>  d_fmt += Wx_allᵀ @ d_cols_all   (W, H*C)
    d_fmt = jnp.dot(
        wx_all.T, d_cols_all, preferred_element_type=jnp.float32
    )

    @pl.when(i == 0)
    def _init():
        dout_ref[...] = jnp.zeros(dout_ref.shape, dout_ref.dtype)

    dout_ref[...] += d_fmt[None]


@partial(
    jax.jit, static_argnames=("crop_size", "tile_r", "pool", "interpret")
)
def _roi_align_bwd_pallas(feature_map, wy, wx, g, crop_size, tile_r=8,
                          pool=True, interpret=False):
    """d_feature_map via the fused backward kernel. Returns f32 (B,H,W,C)."""
    b, h, w, c = feature_map.shape
    r = wy.shape[1]
    s = crop_size

    if feature_map.dtype == jnp.float32:
        tile_r = max(2, tile_r // 2)  # mirror the forward's VMEM bound

    num_tiles = -(-r // tile_r)
    pad = num_tiles * tile_r - r
    if pad:
        wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad)) + ((0, 0),) * (g.ndim - 2))

    fmt2d = feature_map.transpose(0, 2, 1, 3).reshape(b, w, h * c)
    wy = wy.astype(jnp.float32)
    wx = wx.astype(jnp.float32)
    out_s = g.shape[2]

    d_fmt = pl.pallas_call(
        partial(_roi_bwd_kernel, tile_r=tile_r, s=s, pool=pool),
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile_r, s, h), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_r, s, w), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_r, out_s, out_s, c),
                lambda bi, i: (bi, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, w, h * c), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, w, h * c), lambda bi, i: (bi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, w, h * c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * r * s * (h + s) * w * c,
            bytes_accessed=(
                b * (h * w * c * 6 + r * out_s * out_s * c * 4)
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(wy, wx, g, fmt2d)
    return d_fmt.reshape(b, w, h, c).transpose(0, 2, 1, 3)


def _roi_align_bwd(crop_size, pool, interpret, residuals, g):
    feature_map, wy, wx = residuals
    from luminoth_tpu.ops.dispatch import on_tpu as _on_tpu

    if _on_tpu() or interpret:
        unbatched = feature_map.ndim == 3
        fm_b = feature_map[None] if unbatched else feature_map
        wy_b = wy[None] if unbatched else wy
        wx_b = wx[None] if unbatched else wx
        g_b = g[None] if unbatched else g
        d_fm = _roi_align_bwd_pallas(
            fm_b, wy_b, wx_b, g_b, crop_size, pool=pool,
            interpret=interpret,
        ).astype(feature_map.dtype)
        if unbatched:
            d_fm = d_fm[0]
        return d_fm, jnp.zeros_like(wy), jnp.zeros_like(wx)
    return _roi_align_bwd_xla(crop_size, pool, residuals, g)


def _roi_align_bwd_xla(crop_size, pool, residuals, g):
    feature_map, wy, wx = residuals
    unbatched = feature_map.ndim == 3
    if unbatched:
        feature_map = feature_map[None]
        wy, wx, g = wy[None], wx[None], g[None]

    s = crop_size
    b, h, w, c = feature_map.shape
    r = wy.shape[1]
    # The recomputed pre-pool crop is (b, chunk, s, s, c) f32 — bound
    # b*chunk so the transient stays ~hundreds of MB at any batch
    # (chunk=256 at batch 16 allocated 3+ GB per buffer and OOM'd HBM).
    chunk = min(max(16, 512 // b), r)
    num_chunks = -(-r // chunk)
    pad = num_chunks * chunk - r

    wy_p = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0))).astype(jnp.float32)
    wx_p = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0))).astype(jnp.float32)
    g_p = jnp.pad(
        g, ((0, 0), (0, pad)) + ((0, 0),) * (g.ndim - 2)
    ).astype(jnp.float32)

    def chunk_slices(i):
        start = i * chunk
        take = partial(
            jax.lax.dynamic_slice_in_dim, start_index=start,
            slice_size=chunk, axis=1,
        )
        return take(wy_p), take(wx_p), take(g_p)

    def body(i, d_fm):
        wy_c, wx_c, g_c = chunk_slices(i)
        if pool:
            # Recompute the pre-pool crop for this chunk to find the
            # window maxima, replicating the forward kernel's arithmetic:
            # the wx contraction runs FIRST and its f32 accumulator is
            # cast back to the feature map's dtype before the wy
            # contraction (the kernel's VMEM-traffic cast), so bf16
            # models pool the same intermediate values in both passes and
            # the argmax routing agrees.
            cdt = feature_map.dtype
            cols = jnp.einsum(
                "brtw,bhwc->brthc", wx_c.astype(cdt), feature_map,
                preferred_element_type=jnp.float32,
            ).astype(cdt)
            crop = jnp.einsum(
                "brsh,brthc->brstc", wy_c.astype(cdt), cols,
                preferred_element_type=jnp.float32,
            )
            win = crop.reshape(b, chunk, s // 2, 2, s // 2, 2, c)
            win_max = jnp.max(win, axis=(3, 5), keepdims=True)
            is_max = (win == win_max).astype(jnp.float32)
            ties = jnp.sum(is_max, axis=(3, 5), keepdims=True)
            g_win = g_c.reshape(b, chunk, s // 2, 1, s // 2, 1, c)
            g_crop = (is_max / ties * g_win).reshape(b, chunk, s, s, c)
        else:
            g_crop = g_c
        d_rows = jnp.einsum("brtw,brstc->brswc", wx_c, g_crop)
        return d_fm + jnp.einsum("brsh,brswc->bhwc", wy_c, d_rows)

    d_fm = jax.lax.fori_loop(
        0, num_chunks, body, jnp.zeros((b, h, w, c), jnp.float32)
    )
    d_fm = d_fm.astype(feature_map.dtype)
    d_wy = jnp.zeros_like(wy)
    d_wx = jnp.zeros_like(wx)
    if unbatched:
        d_fm, d_wy, d_wx = d_fm[0], d_wy[0], d_wx[0]
    return d_fm, d_wy, d_wx


roi_align_pallas.defvjp(_roi_align_fwd, _roi_align_bwd)


@partial(
    jax.jit, static_argnames=("crop_size", "tile_r", "pool", "interpret")
)
def _roi_align_impl(feature_map, wy, wx, crop_size, tile_r=8, pool=True,
                    interpret=False):
    """Fused crop(+pool) over precomputed interpolation matrices.

    Batched natively: the grid is (batch, roi_tiles) — no vmap needed (and
    none wanted: batching a pallas_call by vmap costs a much slower
    compile). The feature-map block's index map only depends on the batch
    index, so it stays resident across a whole image's ROI tiles.

    Args:
        feature_map: (B, H, W, C) or (H, W, C).
        wy: (B, R, S, H) / (R, S, H) row-interpolation weights.
        wx: (B, R, S, W) / (R, S, W) column-interpolation weights.
        crop_size: S (must be even when pooling).
        tile_r: ROIs per grid program.
        pool: fuse the 2x2/2 max-pool.

    Returns:
        (B, R, S/2, S/2, C) (or unbatched if inputs were unbatched; S
        instead of S/2 when not pooling).
    """
    unbatched = feature_map.ndim == 3
    if unbatched:
        feature_map = feature_map[None]
        wy = wy[None]
        wx = wx[None]

    b, h, w, c = feature_map.shape
    r = wy.shape[1]
    s = crop_size
    out_s = s // 2 if pool else s

    if feature_map.dtype == jnp.float32:
        # The f32 path keeps a full-precision intermediate (tile*S, H*C);
        # halve the ROI tile so it stays within VMEM.
        tile_r = max(2, tile_r // 2)

    num_tiles = -(-r // tile_r)
    pad = num_tiles * tile_r - r
    if pad:
        wy = jnp.pad(wy, ((0, 0), (0, pad), (0, 0), (0, 0)))
        wx = jnp.pad(wx, ((0, 0), (0, pad), (0, 0), (0, 0)))

    # W-leading layout for the kernel's first contraction (one cheap HBM
    # transpose per call, done by XLA outside the kernel).
    fmt2d = feature_map.transpose(0, 2, 1, 3).reshape(b, w, h * c)
    dtype = feature_map.dtype
    wy = wy.astype(dtype)
    wx = wx.astype(dtype)

    out_specs = pl.BlockSpec(
        (1, tile_r, out_s, out_s, c),
        lambda bi, i: (bi, i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_shape = jax.ShapeDtypeStruct(
        (b, num_tiles * tile_r, out_s, out_s, c), dtype
    )

    out = pl.pallas_call(
        partial(_roi_kernel, tile_r=tile_r, s=s, pool=pool),
        grid=(b, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, tile_r, s, h), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_r, s, w), lambda bi, i: (bi, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, w, h * c), lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * r * s * (h + s) * w * c,
            bytes_accessed=(
                b * (h * w * c * 2 + r * out_s * out_s * c * 2)
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(wy, wx, fmt2d)
    out = out[:, :r]
    return out[0] if unbatched else out
