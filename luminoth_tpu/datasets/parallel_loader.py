"""Multi-process data loader: per-worker shards + shared-memory batches.

reference: luminoth/datasets/base_dataset.py:53-76 — the reference
parallelizes input with 20 enqueue ops on a TF queue, all inside one
process. Our thread-pool loader (object_detection_dataset.py) mirrors
that and tops out near one python process's worth of JPEG decode
(~165 img/s on this host): enough for one chip (~48 img/s training
steps) but not for an 8-chip data-parallel mesh (~380 img/s needed).

This module scales the loader across host cores the TPU-native way:

* **Worker processes** (spawn, never fork — the parent owns a live TPU
  client whose fds must not be duplicated) each run the full prepare
  chain — TFRecord framing → native C record parse → JPEG decode →
  augment → resize → canvas pad → batch assembly — on a disjoint shard
  of the dataset. Workers import only the numpy data layer; they never
  import JAX, so they cannot touch the TPU.
* **Sharding**: files are round-robined per worker when there are
  enough files; otherwise each worker reads every file but keeps only
  records with ``index % num_workers == worker_id`` (record framing is
  a cheap byte walk next to JPEG decode). Epoch file order reshuffles
  with a per-epoch seed computed identically in every worker.
* **Shared-memory transport**: finished batch images are written into
  a pool of ``multiprocessing.shared_memory`` slabs — the image bytes
  cross the process boundary with two memcpys total; only small
  metadata (gt boxes, shapes, filenames, slab name) goes through the
  result queue. At 400+ img/s of uint8 canvases this is ~600 MB/s,
  which a pickle-through-pipe queue cannot sustain.

Ordering: deterministic per worker under a fixed seed; batches from
different workers interleave by completion (the batch *multiset* is
deterministic, the order is not). Each worker flushes remainders
per-epoch; with ``pad_final_batch`` every image is still yielded
exactly once per epoch (eval coverage).
"""

import logging
import multiprocessing as mp
import os
import queue as queue_mod
import time
import traceback
from multiprocessing import shared_memory

import numpy as np

logger = logging.getLogger(__name__)

# Worker→parent control sentinels. Clean completion and failure are
# DISTINCT (a crashed worker must not read as "epoch finished" — that
# would silently drop 1/N of the data), and both carry the worker id so
# the parent can tell a reported worker from one that died hard
# (SIGKILL/OOM) without managing to send anything.
_DONE = "__done__"
_ERROR = "__error__"


class WorkerError(RuntimeError):
    """A loader worker process failed; carries the child's traceback."""


def _epoch_file_shard(files, num_workers, worker_id, epoch, seed, shuffle):
    """The worker's file list for one epoch.

    Every worker computes the identical seeded permutation and takes its
    ``worker_id``-th slice, so shards are disjoint and exhaustive without
    any coordination.
    """
    files = list(files)
    if shuffle:
        rng = np.random.RandomState(
            ((seed if seed is not None else 0) + 9973 * epoch) % (2**31)
        )
        rng.shuffle(files)
    return files[worker_id::num_workers]


def _worker_main(worker_id, num_workers, config_plain, dataset_kwargs,
                 files, slab_q, result_q, stop):
    """Worker process entry: prepare batches, publish via shared memory.

    Runs the same ``ObjectDetectionDataset`` machinery as the
    single-process path (so semantics — augmentation, bucketing, gt
    padding — are identical by construction), over this worker's shard.
    """
    # Guard: the data layer is numpy-only, but make double sure that an
    # accidental transitive jax import in a worker can never grab the
    # parent's TPU.
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    from luminoth_tpu.datasets.object_detection_dataset import (
        ObjectDetectionDataset,
    )
    from luminoth_tpu.utils.config import Config

    config = Config(config_plain)
    seed = dataset_kwargs.get("seed")
    if seed is None:
        seed = config.train.get("seed")
    num_epochs = dataset_kwargs.get("num_epochs")
    if num_epochs is None:
        num_epochs = int(config.train.get("num_epochs", 1))
    shuffle = dataset_kwargs.get("shuffle")
    if shuffle is None:
        shuffle = bool(config.train.get("random_shuffle", True))

    shard_files = len(files) >= num_workers

    dataset = ObjectDetectionDataset(
        config,
        shuffle=shuffle,
        num_epochs=1,
        augment=dataset_kwargs.get("augment", True),
        # in-process threads still overlap file IO with decode
        num_workers=int(dataset_kwargs.get("threads_per_worker", 2)),
        seed=0,  # replaced per epoch below
        pad_final_batch=dataset_kwargs.get("pad_final_batch", False),
    )

    attached = {}

    def slab_view(name, shape, dtype):
        """Attach once per slab and cache.

        Attaching registers with the resource tracker (CPython 3.12
        attach-also-registers; ``track=False`` is 3.13+), but spawn
        children inherit the PARENT's tracker process, so the register
        is idempotent there and cleanup stays with the parent's
        explicit ``unlink()`` — unregistering here would strip the
        shared tracker's entry out from under the parent instead."""
        shm = attached.get(name)
        if shm is None:
            shm = shared_memory.SharedMemory(name=name)
            attached[name] = shm
        return np.ndarray(shape, dtype=dtype, buffer=shm.buf)

    try:
        for epoch in range(num_epochs):
            if stop.is_set():
                return
            if shard_files:
                dataset._files = _epoch_file_shard(
                    files, num_workers, worker_id, epoch, seed, shuffle
                )
                dataset._record_stride = None
            else:
                # few files: every worker reads all of them, keeps
                # records with index % num_workers == worker_id
                dataset._files = list(files)
                dataset._record_stride = (num_workers, worker_id)
            # distinct, deterministic augmentation stream per
            # (seed, worker, epoch)
            dataset._seed = (
                ((seed if seed is not None else 0)
                 + 7919 * worker_id + 104729 * epoch) % (2**31)
            )
            for batch in dataset._batch_stream():
                # block for a free slab (bounded memory), abandoning
                # promptly if the consumer went away
                while True:
                    if stop.is_set():
                        return
                    try:
                        slab_name = slab_q.get(timeout=0.25)
                        break
                    except queue_mod.Empty:
                        continue
                images = batch["image"]
                view = slab_view(slab_name, images.shape, images.dtype)
                view[:] = images
                del view
                meta = {
                    "slab": slab_name,
                    "shape": images.shape,
                    "dtype": images.dtype.str,
                    "gt_boxes": batch["gt_boxes"],
                    "im_shape": batch["im_shape"],
                    "scale_factor": batch["scale_factor"],
                    "filename": batch["filename"],
                    "raw_gt_counts": batch["raw_gt_counts"],
                    "pad_count": batch["pad_count"],
                }
                while True:
                    if stop.is_set():
                        return
                    try:
                        result_q.put(meta, timeout=0.25)
                        break
                    except queue_mod.Full:
                        continue
        result_q.put({_DONE: worker_id})
    except Exception:  # ship the traceback to the parent, which re-raises
        logger.exception("loader worker %d died", worker_id)
        try:
            result_q.put({_ERROR: traceback.format_exc(),
                          "worker": worker_id})
        except Exception:
            pass
    finally:
        for shm in attached.values():
            try:
                shm.close()
            except Exception:
                pass


class MultiprocessLoader:
    """Iterable over batches produced by a pool of worker processes.

    Drop-in for ``ObjectDetectionDataset`` iteration when
    ``dataset.num_worker_processes > 0``; constructed by
    ``ObjectDetectionDataset.__iter__`` (which owns all config parsing).
    """

    def __init__(self, config_plain, files, num_workers, batch_size,
                 buckets, transfer_itemsize, dataset_kwargs,
                 prefetch_batches=4):
        self._config_plain = config_plain
        self._files = list(files)
        self._num_workers = max(1, int(num_workers))
        self._dataset_kwargs = dict(dataset_kwargs)
        self._prefetch = prefetch_batches
        max_hw = max((h * w for h, w in buckets))
        self._slab_bytes = int(batch_size) * max_hw * 3 * transfer_itemsize
        self._n_slabs = self._num_workers + max(2, prefetch_batches)

    def __iter__(self):
        ctx = mp.get_context("spawn")
        slab_q = ctx.Queue()
        result_q = ctx.Queue(maxsize=self._n_slabs)
        stop = ctx.Event()
        slabs = {}
        procs = []
        try:
            for i in range(self._n_slabs):
                shm = shared_memory.SharedMemory(
                    create=True, size=self._slab_bytes
                )
                slabs[shm.name] = shm
                slab_q.put(shm.name)
            for wid in range(self._num_workers):
                p = ctx.Process(
                    target=_worker_main,
                    args=(wid, self._num_workers, self._config_plain,
                          self._dataset_kwargs, self._files, slab_q,
                          result_q, stop),
                    daemon=True,
                )
                p.start()
                procs.append(p)

            reported = set()  # worker ids that sent _DONE or _ERROR
            first_seen_dead = {}  # wid → when we first saw it dead

            def _check_liveness(grace_s):
                # A hard-killed worker (OOM killer, SIGKILL) never sends
                # anything — without this the parent would block forever
                # on an empty queue, or silently finish an epoch missing
                # 1/N of the data. The grace period absorbs the race
                # where a worker died right after queueing its sentinel
                # but the feeder pipe hasn't surfaced it to us yet.
                now = time.monotonic()
                for wid, p in enumerate(procs):
                    if p.is_alive() or wid in reported:
                        first_seen_dead.pop(wid, None)
                        continue
                    t0 = first_seen_dead.setdefault(wid, now)
                    if now - t0 > grace_s:
                        raise WorkerError(
                            f"loader worker {wid} exited without "
                            "reporting (killed? OOM?); batch stream is "
                            "incomplete"
                        )

            while len(reported) < self._num_workers:
                try:
                    meta = result_q.get(timeout=5.0)
                except queue_mod.Empty:
                    _check_liveness(grace_s=8.0)
                    continue
                # Queue busy: still bound how long a silently-dead
                # worker can go unnoticed behind live producers.
                _check_liveness(grace_s=30.0)
                if isinstance(meta, dict) and _DONE in meta:
                    reported.add(meta[_DONE])
                    continue
                if isinstance(meta, dict) and _ERROR in meta:
                    reported.add(meta["worker"])
                    raise WorkerError(
                        f"loader worker {meta['worker']} failed:\n"
                        f"{meta[_ERROR]}"
                    )
                shm = slabs[meta["slab"]]
                view = np.ndarray(
                    meta["shape"], dtype=np.dtype(meta["dtype"]),
                    buffer=shm.buf,
                )
                batch = {
                    "image": view.copy(),
                    "gt_boxes": meta["gt_boxes"],
                    "im_shape": meta["im_shape"],
                    "scale_factor": meta["scale_factor"],
                    "filename": meta["filename"],
                    "raw_gt_counts": meta["raw_gt_counts"],
                    "pad_count": meta["pad_count"],
                }
                slab_q.put(meta["slab"])  # slab free again
                yield batch
        finally:
            stop.set()
            # drain so no worker stays pinned on a full result queue
            try:
                while True:
                    result_q.get_nowait()
            except queue_mod.Empty:
                pass
            for p in procs:
                p.join(timeout=5)
            for p in procs:
                if p.is_alive():  # direct handle, never pattern-kill
                    p.terminate()
                    p.join(timeout=5)
            for shm in slabs.values():
                try:
                    shm.close()
                    shm.unlink()
                except FileNotFoundError:
                    pass
