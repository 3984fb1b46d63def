"""Grouped greedy-NMS suppression kernel (Pallas TPU).

The XLA partitioned NMS (ops/nms.py) dispatches one fused region per tile —
tens of sequential XLA loop iterations whose latency dominates the stage.
This kernel runs the whole sweep inside ONE pallas_call:

* grid = (groups, tiles): groups are images (RPN) or image×class pairs
  (final detection NMS); tiles partition the score-sorted candidate axis.
* The alive-mask state lives in a VMEM scratch buffer that persists across
  the sequential grid steps of a group (re-initialized when a group's first
  tile runs).
* Per tile: an in-tile greedy fixpoint (suppression matrix × alive-vector
  products on the MXU until convergence), then one (T × T) suppression
  sweep against every later tile.
* Boxes are consumed in transposed (4, N) layout so coordinate rows load as
  native (1, N) lanes.

The output is the per-candidate alive mask; score ordering/top-k stays in
XLA. Exactly greedy-equivalent (same semantics as ops/nms.py, verified
against the numpy golden in tests via interpret mode).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pair_iou(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2):
    """IoU between (T, 1) tile coords and (1, C) chunk coords → (T, C).

    No-+1 convention: matches ``tf.image.non_max_suppression`` (the
    reference's NMS), not the +1 overlap its target assignment uses.
    """
    xi1 = jnp.maximum(ax1, bx1)
    yi1 = jnp.maximum(ay1, by1)
    xi2 = jnp.minimum(ax2, bx2)
    yi2 = jnp.minimum(ay2, by2)
    inter = jnp.maximum(xi2 - xi1, 0.0) * jnp.maximum(yi2 - yi1, 0.0)
    area_a = (ax2 - ax1) * (ay2 - ay1)
    area_b = (bx2 - bx1) * (by2 - by1)
    # Degenerate (e.g. padding) boxes have zero area: guard the 0/0.
    return inter / jnp.maximum(area_a + area_b - inter, 1e-8)


def _nms_kernel(boxes_ref, valid_ref, out_ref, alive_ref, *, tile, n,
                iou_threshold):
    """One (group, tile) grid step."""
    i = pl.program_id(1)
    num_tiles = pl.num_programs(1)
    start = i * tile

    # First tile of the group: reset the persistent alive state.
    @pl.when(i == 0)
    def _():
        alive_ref[:] = valid_ref[:]

    # Tile coordinates as (T, 1) columns.
    def tile_coord(k, s):
        row = boxes_ref[0, k : k + 1, pl.ds(s, tile)]  # (1, T)
        return jnp.transpose(row, (1, 0))  # (T, 1)

    ax1 = tile_coord(0, start)
    ay1 = tile_coord(1, start)
    ax2 = tile_coord(2, start)
    ay2 = tile_coord(3, start)

    # In-tile greedy fixpoint. mask[i, j] = 1 where row i suppresses col j
    # (strictly-upper triangle: earlier rows have higher scores).
    iou_tt = _pair_iou(
        ax1, ay1, ax2, ay2,
        jnp.transpose(ax1, (1, 0)), jnp.transpose(ay1, (1, 0)),
        jnp.transpose(ax2, (1, 0)), jnp.transpose(ay2, (1, 0)),
    )
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, tile), 1)
    mask_tt = jnp.where(
        (iou_tt > iou_threshold) & (rows < cols), 1.0, 0.0
    )

    init_alive = alive_ref[0, 0:1, pl.ds(start, tile)]  # (1, T)

    def fix_cond(state):
        _, changed = state
        return changed

    def fix_body(state):
        alive, _ = state
        killed = (
            jnp.dot(alive, mask_tt, preferred_element_type=jnp.float32)
            > 0.0
        )
        new_alive = jnp.where(killed, 0.0, init_alive)
        return new_alive, jnp.any(new_alive != alive)

    tile_alive, _ = jax.lax.while_loop(
        fix_cond, fix_body, (init_alive, True)
    )
    alive_ref[0, 0:1, pl.ds(start, tile)] = tile_alive

    # Suppress all later tiles with this tile's survivors.
    def cross_body(j, _):
        cstart = j * tile
        bx1 = boxes_ref[0, 0:1, pl.ds(cstart, tile)]
        by1 = boxes_ref[0, 1:2, pl.ds(cstart, tile)]
        bx2 = boxes_ref[0, 2:3, pl.ds(cstart, tile)]
        by2 = boxes_ref[0, 3:4, pl.ds(cstart, tile)]
        iou_tc = _pair_iou(ax1, ay1, ax2, ay2, bx1, by1, bx2, by2)
        mask_tc = jnp.where(iou_tc > iou_threshold, 1.0, 0.0)
        suppressed = (
            jnp.dot(tile_alive, mask_tc, preferred_element_type=jnp.float32)
            > 0.0
        )
        chunk_alive = alive_ref[0, 0:1, pl.ds(cstart, tile)]
        alive_ref[0, 0:1, pl.ds(cstart, tile)] = jnp.where(
            suppressed, 0.0, chunk_alive
        )
        return 0

    jax.lax.fori_loop(i + 1, num_tiles, cross_body, 0)

    # Last tile: publish the group's final mask.
    @pl.when(i == num_tiles - 1)
    def _():
        out_ref[:] = alive_ref[:]


@partial(
    jax.jit,
    static_argnames=("iou_threshold", "tile", "interpret"),
)
def nms_alive_pallas(boxes_t, valid, iou_threshold, tile=512,
                     interpret=False):
    """Greedy-NMS alive masks for score-sorted candidate groups.

    Args:
        boxes_t: (G, 4, N) boxes in transposed layout, score-sorted within
            each group (descending), padded to a multiple of ``tile``.
        valid: (G, N) float32 1.0/0.0 validity.
        iou_threshold: suppression threshold (strictly greater suppresses).
        tile: candidates per grid step.
        interpret: run in interpreter mode (CPU tests).

    Returns:
        (G, N) float32 alive mask (1.0 = kept).
    """
    g, _, n = boxes_t.shape
    assert n % tile == 0, (n, tile)
    num_tiles = n // tile

    valid = valid.reshape(g, 1, n).astype(jnp.float32)
    boxes_t = boxes_t.astype(jnp.float32)

    out = pl.pallas_call(
        partial(
            _nms_kernel, tile=tile, n=n, iou_threshold=float(iou_threshold)
        ),
        grid=(g, num_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 4, n), lambda gi, ti: (gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, n), lambda gi, ti: (gi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, n), lambda gi, ti: (gi, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((g, 1, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 1, n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(boxes_t, valid)
    return out.reshape(g, n)
