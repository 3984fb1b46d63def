"""Static-shape greedy non-maximum suppression for TPU.

The reference relies on ``tf.image.non_max_suppression`` with variable-length
outputs (reference: luminoth/models/fasterrcnn/rpn_proposal.py:145-171,
rcnn_proposal.py:77-135, ssd/proposal.py). Variable shapes don't compile under
XLA, so this module implements greedy NMS with **fixed-size padded outputs**:

* Candidates are sorted by score (descending, stable).
* Suppression runs in score-sorted blocks of ``block_size``: within a block an
  iterative fixpoint resolves the greedy recursion ("a box survives iff no
  higher-scored *surviving* box overlaps it above the threshold"); then the
  block's survivors suppress all later candidates in one dense
  (block × N) IoU pass. This keeps the sequential depth at ``N / block_size``
  tiles instead of one step per box, and memory at O(block · N) instead of
  O(N²) — the same partitioned scheme TPU TF uses for its padded NMS.
* The result is exactly greedy-NMS-equivalent (verified against a numpy
  golden implementation in tests).

Per-class NMS is just ``jax.vmap`` over a leading class axis — replacing the
reference's per-class python loop (rcnn_proposal.py:77-135).
"""

from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from luminoth_tpu.ops.boxes import iou_matrix
from luminoth_tpu.ops.dispatch import on_tpu as _on_tpu

# A host-side numpy scalar, NOT jnp: a module-level jnp scalar becomes an
# eagerly-committed device array, and embedding it as an MLIR constant at
# lowering time forces a device->host sync that can stall lowering for
# tens of seconds behind queued work (catastrophic through a TPU tunnel).
NEG_INF = np.float32(-1e37)


def _self_suppression(iou_mask, alive0):
    """Resolve greedy suppression within one block.

    Args:
        iou_mask: (T, T) bool, ``iou > threshold`` strictly-upper-triangular
            (row suppresses column; row index = higher score).
        alive0: (T,) bool, which block entries are still candidates.

    Returns:
        (T,) bool of block survivors under exact greedy semantics.
    """

    def cond(state):
        alive, changed = state
        return changed

    def body(state):
        alive, _ = state
        # A box dies iff any alive earlier box suppresses it.
        killed = jnp.any(iou_mask & alive[:, None], axis=0)
        new_alive = alive0 & ~killed
        return new_alive, jnp.any(new_alive != alive)

    alive, _ = jax.lax.while_loop(cond, body, (alive0, jnp.bool_(True)))
    return alive


def _default_block(n):
    """Tile size heuristic: larger tiles cut sequential depth (the cost on
    TPU is per-tile dispatch latency, not the IoU FLOPs)."""
    if n >= 4096:
        return 512
    if n >= 1024:
        return 256
    return min(128, n)


def nms_padded(boxes, scores, iou_threshold, max_outputs, valid=None,
               block_size=None):
    """Greedy NMS over a fixed-size candidate set.

    Single-group convenience wrapper over :func:`nms_padded_batch` (one
    shared implementation — including the TPU kernel path).

    Args:
        boxes: (N, 4) xyxy boxes (padding rows arbitrary).
        scores: (N,) scores; padding entries should carry very low scores, or
            pass ``valid`` explicitly.
        iou_threshold: suppression threshold (strictly greater suppresses).
        max_outputs: static number of survivors to emit.
        valid: optional (N,) bool mask of real candidates.
        block_size: tile size of the partitioned suppression sweep.

    Returns:
        ``(indices, keep_mask)``: (max_outputs,) indices into the input arrays
        in descending-score order, and a bool mask of which outputs are real
        (un-suppressed, valid) detections. Indices of masked-out slots point
        at arbitrary rows and must not be used.
    """
    indices, keep_mask = nms_padded_batch(
        boxes[None], scores[None], float(iou_threshold), max_outputs,
        valid=None if valid is None else valid[None],
        block_size=block_size,
    )
    return indices[0], keep_mask[0]


def _alive_sorted_xla(boxes_s, valid_s, iou_threshold, block):
    """Partitioned greedy sweep over score-sorted candidates (XLA loops).

    Returns the (padded) alive mask over the sorted order.
    """
    n = boxes_s.shape[0]
    num_blocks = -(-n // block)
    pad = num_blocks * block - n
    if pad:
        boxes_s = jnp.pad(boxes_s, ((0, pad), (0, 0)))
        valid_s = jnp.pad(valid_s, (0, pad))

    n_padded = num_blocks * block
    col_idx = jnp.arange(n_padded)
    tri = jnp.triu(jnp.ones((block, block), dtype=bool), k=1)

    def tile_step(i, alive):
        start = i * block
        tile_boxes = jax.lax.dynamic_slice(boxes_s, (start, 0), (block, 4))
        tile_alive = jax.lax.dynamic_slice(alive, (start,), (block,))

        # Within-tile greedy fixpoint. NMS uses the no-+1 IoU: the
        # reference's NMS is tf.image.non_max_suppression, whose overlap
        # has no +1 (unlike its target-assignment bbox_overlap_tf).
        tile_iou = iou_matrix(tile_boxes, tile_boxes, offset=0.0)
        tile_mask = (tile_iou > iou_threshold) & tri
        tile_alive = _self_suppression(tile_mask, tile_alive)

        # Tile survivors suppress every later candidate.
        cross_iou = iou_matrix(tile_boxes, boxes_s, offset=0.0)
        suppress = jnp.any(
            (cross_iou > iou_threshold) & tile_alive[:, None], axis=0
        )
        later = col_idx >= start + block
        alive = alive & ~(suppress & later)
        alive = jax.lax.dynamic_update_slice(alive, tile_alive, (start,))
        return alive

    return jax.lax.fori_loop(0, num_blocks, tile_step, valid_s)


@partial(
    jax.jit,
    static_argnames=("iou_threshold", "max_outputs", "presorted",
                     "block_size"),
)
def nms_padded_batch(boxes, scores, iou_threshold, max_outputs, valid=None,
                     presorted=False, block_size=None):
    """Grouped greedy NMS: (G, N) candidate groups in one pass.

    On TPU the whole sweep runs in one grouped Pallas kernel (grid over
    groups × tiles with the alive mask resident in VMEM); elsewhere it
    falls back to the vmapped XLA partitioned sweep. Semantics identical
    to per-group :func:`nms_padded`.

    Args:
        boxes: (G, N, 4); scores: (G, N); valid: optional (G, N) bool.
        presorted: the caller guarantees per-group scores (with invalid
            entries masked low) are already non-increasing — true after a
            ``top_k`` candidate cap, which every proposal stage applies.
            Skips the stable argsort and its gathers (measured several ms
            at the detection shapes).
        block_size: XLA-fallback sweep tile size override (the TPU
            kernel path picks its own tiling).

    Returns:
        ``(indices, keep_mask)`` of shape (G, max_outputs): per group,
        indices into the group's input arrays in descending-score order.
    """
    g, n = scores.shape
    if n == 0:
        # Degenerate candidate set (e.g. a top-n clamped to zero): all
        # outputs masked, nothing to suppress.
        return (
            jnp.zeros((g, max_outputs), jnp.int32),
            jnp.zeros((g, max_outputs), bool),
        )
    scores = scores.astype(jnp.float32)
    if valid is None:
        valid = jnp.ones((g, n), dtype=bool)

    masked_scores = jnp.where(valid, scores, NEG_INF)
    if presorted:
        order = None
        boxes_s = boxes
        valid_s = valid
    else:
        order = jnp.argsort(-masked_scores, axis=1, stable=True)
        boxes_s = jnp.take_along_axis(boxes, order[..., None], axis=1)
        valid_s = jnp.take_along_axis(valid, order, axis=1)

    if _on_tpu():
        from luminoth_tpu.ops.pallas.nms_kernel import nms_alive_pallas

        tile = 512 if n >= 512 else max(128, -(-n // 128) * 128)
        n_padded = -(-n // tile) * tile
        pad = n_padded - n
        boxes_p = jnp.pad(boxes_s, ((0, 0), (0, pad), (0, 0)))
        valid_p = jnp.pad(valid_s, ((0, 0), (0, pad)))
        # Greedy suppression is a discrete selection — non-differentiable by
        # construction (the reference's tf NMS likewise only emits indices).
        # Cutting tangents here keeps autodiff from tracing into the kernel.
        boxes_p = jax.lax.stop_gradient(boxes_p)
        alive = nms_alive_pallas(
            boxes_p.transpose(0, 2, 1),
            valid_p.astype(jnp.float32),
            float(iou_threshold),
            tile=tile,
            # This function only ever reads the top ``max_outputs`` alive
            # entries (the top_k below): the kernel's exact prefix early
            # exit skips suppression work once that many survivors exist
            # in the processed score-sorted prefix. Biggest on uncapped
            # eval-semantics per-class NMS (N ≫ max_outputs).
            max_survivors=int(max_outputs),
        )[:, :n] > 0.5
    else:
        block = min(block_size or _default_block(n), n)
        alive = jax.vmap(
            lambda b, v: _alive_sorted_xla(b, v, iou_threshold, block)[:n]
        )(boxes_s, valid_s)

    sorted_scores = (
        masked_scores if presorted
        else jnp.take_along_axis(masked_scores, order, axis=1)
    )
    alive_scores = jnp.where(alive, sorted_scores, NEG_INF)
    k = min(max_outputs, n)
    top_scores, top_pos = jax.lax.top_k(alive_scores, k)
    keep_mask = top_scores > NEG_INF
    indices = (
        top_pos if presorted
        else jnp.take_along_axis(order, top_pos, axis=1)
    )

    if max_outputs > n:
        extra = max_outputs - n
        indices = jnp.pad(indices, ((0, 0), (0, extra)))
        keep_mask = jnp.pad(keep_mask, ((0, 0), (0, extra)))
    return indices, keep_mask


def nms_per_class(boxes, scores, iou_threshold, max_per_class, valid=None):
    """Per-class NMS: classes are just groups of the grouped sweep.

    Args:
        boxes: (C, N, 4) per-class decoded boxes.
        scores: (C, N) per-class scores.
        valid: optional (C, N) bool.

    Returns:
        ``(indices, keep_mask)`` with shapes (C, max_per_class).
    """
    return nms_padded_batch(
        boxes, scores, float(iou_threshold), max_per_class, valid=valid
    )
