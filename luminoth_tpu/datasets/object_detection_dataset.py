"""Object-detection dataset: TFRecord loader with host-side preprocessing.

reference: luminoth/datasets/object_detection_dataset.py (record schema
:40-54, read_record :85-139, preprocess = augment→resize :71-83) and
base_dataset.py (queue-runner input pipeline :43-76).

TPU-first redesign:

* The TF1 queue-runner graph pipeline becomes a host-side loader: records
  are parsed with the TF-free codec, images decoded with cv2/PIL,
  augmentation runs in numpy, and a background prefetch thread keeps a
  small queue of ready batches while the accelerator trains (replacing
  ``QueueRunner``/``Coordinator``).
* Variable-size images are padded to a static canvas (SSD: the fixed input;
  Faster R-CNN: the ``max_size`` square by default) and ground truth is
  padded to ``max_gt_boxes`` rows with label -1 — XLA compiles one program
  per canvas instead of one per image shape.

Record schema (TF-compatible with reference-written datasets):
context: image_raw/filename/width/height/depth; sequence lists:
label, xmin, ymin, xmax, ymax (one int64 per gt box).
"""

import logging
import os
import queue
import threading

import numpy as np

from luminoth_tpu.datasets.exceptions import InvalidDataDirectory
from luminoth_tpu.formats.example_pb import decode_sequence_example
from luminoth_tpu.formats.native_example import parse_od_record
from luminoth_tpu.utils import fileio
from luminoth_tpu.formats.tfrecord import find_split_files, read_tfrecords
from luminoth_tpu.utils.image import (
    apply_data_augmentation,
    compose_scale,
    fit_to_canvas,
    resize_image,
    resize_image_fixed,
    settle_transfer_dtype,
)

logger = logging.getLogger(__name__)


def decode_image_bytes(data):
    """Decode JPEG/PNG bytes to an RGB uint8 (H, W, 3) array.

    Stays uint8: the resize/flip/pad ops are dtype-preserving, so the
    host pipeline moves 4x fewer bytes end to end; the final dtype is
    settled once per example in ``_prepare``.
    """
    try:
        import cv2

        arr = np.frombuffer(data, dtype=np.uint8)
        img = cv2.imdecode(arr, cv2.IMREAD_COLOR)
        if img is None:
            raise ValueError("cv2 could not decode image")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    except Exception:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def parse_record(record_bytes):
    """SequenceExample bytes → (image uint8, bboxes (N, 5), filename).

    Prefers the native C parser (one pass over the record, no python
    protobuf walk — ``formats/native_example.py``); the python codec is
    the no-compiler fallback and the semantics oracle for its tests.
    """
    parsed = parse_od_record(record_bytes)
    if parsed is not None:
        image_bytes, bboxes, filename, _ = parsed
        return decode_image_bytes(image_bytes), bboxes, filename
    context, lists = decode_sequence_example(record_bytes)
    image = decode_image_bytes(context["image_raw"][0])
    num = len(lists.get("label", []))
    bboxes = np.zeros((num, 5), dtype=np.float32)
    for i in range(num):
        bboxes[i] = [
            lists["xmin"][i][0],
            lists["ymin"][i][0],
            lists["xmax"][i][0],
            lists["ymax"][i][0],
            lists["label"][i][0],
        ]
    filename = context.get("filename", [b""])[0].decode("utf-8", "replace")
    return image, bboxes, filename


def _round_up(value, multiple):
    return int(-(-value // multiple) * multiple)


def preprocess_image(config, image, bboxes=None, rng=None, augment=False):
    """Apply the dataset's preprocessing to a raw image (reference :71-83).

    Returns a dict with the resized (not yet padded) ``image``, adjusted
    ``bboxes``, and ``scale_factor`` for mapping boxes back.
    """
    prep = config.dataset.image_preprocessing

    if augment and rng is not None:
        image, bboxes = apply_data_augmentation(
            config.dataset.get("data_augmentation"), image, bboxes, rng
        )

    # "tf1" selects the reference's TF1 legacy resize grid (for
    # reference-checkpoint parity evals); default is cv2/TF2 bilinear.
    method = prep.get("resize_method")
    if prep.get("fixed_height"):
        result = resize_image_fixed(
            image, prep.fixed_height, prep.fixed_width, bboxes=bboxes,
            method=method,
        )
    else:
        result = resize_image(
            image,
            bboxes=bboxes,
            min_size=prep.get("min_size"),
            max_size=prep.get("max_size"),
            method=method,
        )
    return result


def canvas_shape(config):
    """The static (height, width) canvas images are padded to.

    Defaults to the square ``max_size`` canvas; override with explicit
    ``canvas_height`` / ``canvas_width`` (e.g. a 608x1024 landscape canvas
    for datasets with a dominant orientation — less padding, same single
    compiled program).
    """
    prep = config.dataset.image_preprocessing
    if prep.get("canvas_height"):
        return (
            _round_up(int(prep.canvas_height), 32),
            _round_up(int(prep.canvas_width), 32),
        )
    if prep.get("fixed_height"):
        return int(prep.fixed_height), int(prep.fixed_width)
    size = int(prep.get("max_size") or prep.get("min_size") or 1024)
    return _round_up(size, 32), _round_up(size, 32)


def canvas_buckets(config):
    """The list of candidate canvases (multi-bucket batching).

    ``dataset.image_preprocessing.canvases: [[608, 1024], [1024, 608]]``
    enables orientation buckets: each image pads to the smallest canvas it
    fits, batches are homogeneous per bucket, and XLA compiles one program
    per bucket instead of wasting FLOPs on a worst-case square. The default
    single canvas always remains as a fallback bucket.
    """
    prep = config.dataset.image_preprocessing
    fallback = canvas_shape(config)
    buckets = []
    for entry in prep.get("canvases") or []:
        buckets.append(
            (_round_up(int(entry[0]), 32), _round_up(int(entry[1]), 32))
        )
    if fallback not in buckets:
        buckets.append(fallback)
    return buckets


def pick_bucket(buckets, h, w):
    """Smallest-area bucket that fits an (h, w) image.

    When no bucket fits, returns the one needing the least downscale
    (the caller then shrinks the image to fit — see ``_prepare``).
    """
    best = None
    for canvas in buckets:
        if h <= canvas[0] and w <= canvas[1]:
            if best is None or canvas[0] * canvas[1] < best[0] * best[1]:
                best = canvas
    if best is not None:
        return best
    return max(buckets, key=lambda c: min(c[0] / h, c[1] / w))


def pad_to_canvas(image, canvas_hw):
    """Zero-pad bottom/right to the canvas; returns (padded, (h, w)).

    dtype-preserving (uint8 canvases stay uint8 for the slim transfer
    path; float inputs keep the reference's float32 semantics).
    """
    h, w = image.shape[0], image.shape[1]
    ch, cw = canvas_hw
    if h > ch or w > cw:
        image = image[:ch, :cw]
        h, w = image.shape[0], image.shape[1]
    dtype = image.dtype if image.dtype == np.uint8 else np.float32
    out = np.zeros((ch, cw, image.shape[2]), dtype=dtype)
    out[:h, :w] = image
    return out, (h, w)


def pad_gt_boxes(bboxes, max_gt):
    """Pad (N, 5) boxes to (max_gt, 5) with label -1 on padding rows."""
    out = np.full((max_gt, 5), -1.0, dtype=np.float32)
    out[:, :4] = 0.0
    n = min(len(bboxes), max_gt)
    if n:
        out[:n] = np.asarray(bboxes, dtype=np.float32)[:n]
    return out


class ObjectDetectionDataset:
    """Iterable dataset yielding padded, batched training examples."""

    def __init__(self, config, shuffle=None, num_epochs=None,
                 augment=True, prefetch_batches=4, seed=None,
                 num_workers=None, pad_final_batch=False,
                 num_worker_processes=None):
        self._config = config
        self._dataset_config = config.dataset
        self._batch_size = int(config.train.get("batch_size", 1))
        self._augment = augment
        if shuffle is None:
            shuffle = bool(config.train.get("random_shuffle", True))
        self._shuffle = shuffle
        if num_epochs is None:
            num_epochs = int(config.train.get("num_epochs", 1))
        self._num_epochs = num_epochs
        self._max_gt = int(config.dataset.get("max_gt_boxes", 64))
        self._prefetch = prefetch_batches
        self._pad_final = bool(pad_final_batch)
        self._seed = seed if seed is not None else config.train.get("seed")
        if num_workers is None:
            num_workers = int(config.dataset.get("num_workers", 4))
        self._num_workers = max(1, num_workers)
        if num_worker_processes is None:
            num_worker_processes = int(
                config.dataset.get("num_worker_processes", 0)
            )
        self._num_procs = max(0, int(num_worker_processes))
        self._record_stride = None
        # "uint8" ships quantized canvases to the device (4x less
        # host->device traffic); the train step casts back to float.
        transfer = str(config.dataset.get("transfer_dtype", "float32"))
        if transfer not in ("float32", "uint8"):
            raise ValueError(
                "dataset.transfer_dtype must be float32 or uint8, got "
                f"{transfer!r}"
            )
        self._transfer_dtype = np.uint8 if transfer == "uint8" else np.float32

        data_dir = self._dataset_config.dir
        if not fileio.isdir(data_dir):
            raise InvalidDataDirectory(
                "{} is not a valid directory".format(data_dir)
            )
        self._files = find_split_files(data_dir, self._dataset_config.split)
        self._canvas = canvas_shape(config)
        self._buckets = canvas_buckets(config)

    @property
    def canvas(self):
        return self._canvas

    @property
    def buckets(self):
        return self._buckets

    def _example_stream(self):
        """Yield (record_bytes, per-record seed) pairs.

        Per-record seeds keep augmentation deterministic under ``seed``
        while letting the parse/augment pool run examples concurrently.

        ``_record_stride = (n, i)`` restricts the stream to records with
        ``index % n == i`` — used by the multi-process loader to shard a
        dataset with fewer files than workers (record framing is a cheap
        byte walk next to JPEG decode, so re-reading files is fine).
        """
        rng = np.random.RandomState(self._seed)
        counter = 0
        base = self._seed if self._seed is not None else 0
        stride = getattr(self, "_record_stride", None)

        def tag(record):
            nonlocal counter
            counter += 1
            return record, (base + counter) % (2**31)

        def shard(records):
            if stride is None:
                return records
            n, i = stride
            return (
                r for idx, r in enumerate(records) if idx % n == i
            )

        for _ in range(self._num_epochs):
            files = list(self._files)
            if self._shuffle:
                rng.shuffle(files)
            for path in files:
                records = shard(read_tfrecords(path))
                if self._shuffle:
                    # Buffered shuffle (the reference's RandomShuffleQueue
                    # with capacity 100).
                    buffer = []
                    for record in records:
                        buffer.append(record)
                        if len(buffer) >= 100:
                            idx = rng.randint(len(buffer))
                            buffer[idx], buffer[-1] = buffer[-1], buffer[idx]
                            yield tag(buffer.pop())
                    rng.shuffle(buffer)
                    yield from (tag(r) for r in buffer)
                else:
                    yield from (tag(r) for r in records)

    def _make_batch(self, examples):
        # Pad directly into the batch buffer: one copy of each resized
        # image instead of a per-example canvas pad + a stack copy.
        ch, cw = examples[0]["bucket"]
        dtype = examples[0]["image"].dtype
        if dtype != np.uint8:
            dtype = np.float32
        images = np.zeros((len(examples), ch, cw, 3), dtype=dtype)
        for i, e in enumerate(examples):
            im = e["image"][:ch, :cw]
            images[i, : im.shape[0], : im.shape[1]] = im
        gt = np.stack([e["gt_boxes"] for e in examples])
        im_shape = np.asarray(
            [e["im_shape"] for e in examples], dtype=np.float32
        )
        scale = np.asarray(
            [e["scale_factor"] for e in examples], dtype=np.float32
        )
        return {
            "image": images,
            "gt_boxes": gt,
            "im_shape": im_shape,
            "scale_factor": scale,
            "filename": [e["filename"] for e in examples],
            "raw_gt_counts": np.asarray(
                [e["num_gt"] for e in examples], dtype=np.int32
            ),
        }

    def _prepare(self, record, seed):
        rng = np.random.RandomState(seed)
        image, bboxes, filename = parse_record(record)
        if self._transfer_dtype != np.uint8:
            # Reference parity on the default path: interpolate in
            # float32 (the reference resized float images). Only the
            # opt-in uint8 path runs the faster integer pipeline.
            image = image.astype(np.float32)
        result = preprocess_image(
            self._config, image, bboxes, rng=rng, augment=self._augment
        )
        resized = result["image"]
        canvas = pick_bucket(
            self._buckets, resized.shape[0], resized.shape[1]
        )
        if resized.shape[0] > canvas[0] or resized.shape[1] > canvas[1]:
            # No bucket fits (e.g. portrait image, landscape-only
            # canvas): downscale to fit instead of cropping — a crop
            # would leave gt boxes pointing at removed content.
            refit = fit_to_canvas(
                resized, canvas, bboxes=result.get("bboxes"),
                method=self._config.dataset.image_preprocessing.get(
                    "resize_method"
                ),
            )
            resized = refit["image"]
            if refit.get("bboxes") is not None:
                result["bboxes"] = refit["bboxes"]
            result["scale_factor"] = compose_scale(
                result.get("scale_factor", 1.0), refit["scale"]
            )
        # Settle the transfer dtype BEFORE padding (smaller array). The
        # uint8 pipeline stays integer end to end unless a photometric
        # augmentation promoted it; quantizing back costs <0.5 intensity,
        # below augmentation noise, and ships 4x less host->device.
        resized = settle_transfer_dtype(resized, self._transfer_dtype)
        h = min(resized.shape[0], canvas[0])
        w = min(resized.shape[1], canvas[1])
        scale = result.get("scale_factor", 1.0)
        if isinstance(scale, tuple):
            scale = float(np.mean(scale))
        final_boxes = result.get("bboxes")
        if final_boxes is None:
            final_boxes = bboxes
        return {
            "image": resized,
            "bucket": canvas,
            "gt_boxes": pad_gt_boxes(final_boxes, self._max_gt),
            "im_shape": (float(h), float(w)),
            "scale_factor": float(scale),
            "filename": filename,
            # Count of boxes actually shipped (augmentations like
            # random_patch can drop boxes relative to the raw record, and
            # pad_gt_boxes truncates anything beyond max_gt rows).
            "num_gt": min(len(final_boxes), self._max_gt),
        }

    def _prepared_stream(self):
        """Decode/augment examples, optionally on a worker pool.

        A bounded in-flight window keeps memory flat; results come back in
        stream order (deterministic batches for a fixed seed). Replaces the
        reference's 20 parallel enqueue ops (base_dataset.py:71-74).
        """
        skipped = 0

        def note_skip(exc):
            # Surface systematic failures (wrong schema, undecodable
            # images) instead of silently yielding an empty dataset:
            # full traceback for the first, counts every 100 after.
            nonlocal skipped
            skipped += 1
            if skipped == 1:
                logger.warning(
                    "Skipping unreadable example (%s: %s); further skips "
                    "logged every 100.", type(exc).__name__, exc,
                    exc_info=True,
                )
            elif skipped % 100 == 0:
                logger.warning("Skipped %d unreadable examples.", skipped)

        if self._num_workers <= 1:
            for record, seed in self._example_stream():
                try:
                    yield self._prepare(record, seed)
                except Exception as exc:
                    note_skip(exc)
            return

        import collections
        from concurrent.futures import ThreadPoolExecutor

        window = self._num_workers * 2
        pending = collections.deque()
        with ThreadPoolExecutor(self._num_workers) as pool:
            for record, seed in self._example_stream():
                pending.append(pool.submit(self._prepare, record, seed))
                if len(pending) >= window:
                    try:
                        yield pending.popleft().result()
                    except Exception as exc:
                        note_skip(exc)
            while pending:
                try:
                    yield pending.popleft().result()
                except Exception as exc:
                    note_skip(exc)

    def _batch_stream(self):
        """Accumulate per-bucket so batches stay shape-homogeneous."""
        pending = {}
        for example in self._prepared_stream():
            bucket = example["bucket"]
            batch = pending.setdefault(bucket, [])
            batch.append(example)
            if len(batch) == self._batch_size:
                out = self._make_batch(batch)
                out["pad_count"] = 0
                yield out
                pending[bucket] = []
        if self._pad_final:
            # Evaluation must cover every image (the reference streams
            # all of them): fill each bucket's leftover batch by
            # repeating its last example and mark how many rows are
            # padding so consumers can skip them.
            for batch in pending.values():
                if not batch:
                    continue
                real = len(batch)
                batch = batch + [batch[-1]] * (self._batch_size - real)
                out = self._make_batch(batch)
                out["pad_count"] = self._batch_size - real
                yield out
        # else: drop remainders (static batch shapes only).

    def _iter_multiprocess(self):
        """Iterate batches from a pool of worker processes.

        Scales the prepare chain (parse → JPEG decode → augment →
        resize → batch) across host cores; see
        ``datasets/parallel_loader.py`` for the transport design.
        """
        from luminoth_tpu.datasets.parallel_loader import MultiprocessLoader
        from luminoth_tpu.utils.config import to_plain

        loader = MultiprocessLoader(
            to_plain(self._config),
            self._files,
            num_workers=self._num_procs,
            batch_size=self._batch_size,
            buckets=self._buckets,
            transfer_itemsize=np.dtype(self._transfer_dtype).itemsize,
            dataset_kwargs={
                "shuffle": self._shuffle,
                "num_epochs": self._num_epochs,
                "augment": self._augment,
                "seed": self._seed,
                "pad_final_batch": self._pad_final,
                "threads_per_worker": 2,
            },
            prefetch_batches=self._prefetch,
        )
        return iter(loader)

    def __iter__(self):
        """Iterate batches with background prefetching.

        Abandoning the iterator early (``break`` out of the loop, or a
        bounded eval) stops the worker promptly: puts are bounded waits
        against a stop flag, and the consumer's ``finally`` sets the flag
        and drains the queue so no thread stays pinned on a full queue.
        """
        if self._num_procs > 0:
            yield from self._iter_multiprocess()
            return
        q = queue.Queue(maxsize=self._prefetch)
        sentinel = object()
        stop = threading.Event()
        error = []

        def put(item):
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.25)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for batch in self._batch_stream():
                    if not put(batch):
                        return
            except Exception as e:  # surface loader errors
                error.append(e)
            finally:
                put(sentinel)

        thread = threading.Thread(target=worker, daemon=True)
        thread.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if error:
                        raise error[0]
                    return
                yield item
        finally:
            stop.set()
            try:  # wake a producer blocked on a full queue
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
