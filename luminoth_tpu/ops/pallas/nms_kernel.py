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


def _nms_kernel(boxes_ref, valid_ref, out_ref, alive_ref, count_ref, *,
                tile, n, iou_threshold, max_survivors):
    """One (group, tile) grid step.

    Two EXACT early exits (both data-dependent, VERDICT r3 #4):

    * ``max_survivors > 0``: the candidate axis is score-sorted, so once
      the processed prefix holds at least ``max_survivors`` survivors,
      no later candidate can enter the consumer's
      top-``max_survivors`` (later candidates are lower-scored and can
      only BE suppressed — they never suppress earlier tiles).
      Remaining tiles then skip all suppression work; their alive
      entries are left as-is, which the top-k consumer never reads.
      Pays off in the many-survivors regime (sparse scenes).
    * Dead-tile skip: a tile whose candidates are ALL already suppressed
      (by earlier tiles' cross sweeps) has no survivors, so its fixpoint
      and its own cross sweep are no-ops — skipped outright. Pays off in
      the few-survivors regime (dense suppression, e.g. uncapped
      eval-semantics per-class NMS where most of a class's 2000
      candidates die to the first tile's sweep).
    """
    i = pl.program_id(1)
    num_tiles = pl.num_programs(1)
    start = i * tile
    track_count = max_survivors > 0 and max_survivors < n

    # First tile of the group: reset the persistent alive state.
    @pl.when(i == 0)
    def _():
        alive_ref[:] = valid_ref[:]
        if track_count:
            count_ref[0, 0] = 0.0

    init_alive = alive_ref[0, 0:1, pl.ds(start, tile)]  # (1, T)
    run_tile = jnp.sum(init_alive) > 0.0  # dead-tile skip
    if track_count:
        prefix_done = count_ref[0, 0] >= float(max_survivors)
        run_tile = jnp.logical_and(run_tile, jnp.logical_not(prefix_done))

    @pl.when(run_tile)
    def _tile_work():
        # Tile coordinates as (T, 1) columns.
        def tile_coord(k, s):
            row = boxes_ref[0, k : k + 1, pl.ds(s, tile)]  # (1, T)
            return jnp.transpose(row, (1, 0))  # (T, 1)

        ax1 = tile_coord(0, start)
        ay1 = tile_coord(1, start)
        ax2 = tile_coord(2, start)
        ay2 = tile_coord(3, start)

        # In-tile greedy fixpoint. mask[i, j] = 1 where row i suppresses
        # col j (strictly-upper triangle: earlier rows score higher).
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

        if track_count:
            count_ref[0, 0] += jnp.sum(tile_alive)
            # The prefix may have crossed the threshold with THIS tile's
            # survivors — the cross sweep below is then dead work too.
            sweep_needed = count_ref[0, 0] < float(max_survivors)
        else:
            sweep_needed = True

        # Suppress all later tiles with this tile's survivors.
        @pl.when(sweep_needed)
        def _cross_sweep():
            def cross_body(j, _):
                cstart = j * tile
                chunk_alive = alive_ref[0, 0:1, pl.ds(cstart, tile)]

                # An already-dead chunk can't lose anyone: skip its IoU.
                @pl.when(jnp.sum(chunk_alive) > 0.0)
                def _sweep_chunk():
                    bx1 = boxes_ref[0, 0:1, pl.ds(cstart, tile)]
                    by1 = boxes_ref[0, 1:2, pl.ds(cstart, tile)]
                    bx2 = boxes_ref[0, 2:3, pl.ds(cstart, tile)]
                    by2 = boxes_ref[0, 3:4, pl.ds(cstart, tile)]
                    iou_tc = _pair_iou(
                        ax1, ay1, ax2, ay2, bx1, by1, bx2, by2
                    )
                    mask_tc = jnp.where(iou_tc > iou_threshold, 1.0, 0.0)
                    suppressed = (
                        jnp.dot(
                            tile_alive, mask_tc,
                            preferred_element_type=jnp.float32,
                        )
                        > 0.0
                    )
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
    static_argnames=("iou_threshold", "tile", "max_survivors", "interpret"),
)
def nms_alive_pallas(boxes_t, valid, iou_threshold, tile=512,
                     max_survivors=0, interpret=False):
    """Greedy-NMS alive masks for score-sorted candidate groups.

    Args:
        boxes_t: (G, 4, N) boxes in transposed layout, score-sorted within
            each group (descending), padded to a multiple of ``tile``.
        valid: (G, N) float32 1.0/0.0 validity.
        iou_threshold: suppression threshold (strictly greater suppresses).
        tile: candidates per grid step.
        max_survivors: if > 0, the consumer only reads the
            ``max_survivors`` highest-scored alive entries per group —
            enables the exact prefix early exit (see ``_nms_kernel``).
            The returned mask is then only guaranteed correct for
            selecting those top entries; alive bits past the exit point
            are unspecified.
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
            _nms_kernel, tile=tile, n=n,
            iou_threshold=float(iou_threshold),
            max_survivors=int(max_survivors),
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
        scratch_shapes=[
            pltpu.VMEM((1, 1, n), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(boxes_t, valid)
    return out.reshape(g, n)
