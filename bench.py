"""Benchmark suite: detector throughput on one chip, realistic weights.

Prints the result JSON line {"metric", "value", "unit", "vs_baseline",
"summary"} INCREMENTALLY: a fresh, complete snapshot line is printed
and flushed after every finished entry, so the LAST line on stdout is
always the most complete result — a driver that times the suite out
mid-run still captures everything measured so far (round 3 lost all
its numbers to exactly that: rc=124, parsed null). The stdout line
stays COMPACT (<1 KB, pinned by tests/test_bench_emission.py): the
driver json-parses only the tail of stdout, and round 4 lost its
numbers to a final line that inlined the full detail dict and got
truncated mid-line (rc=0, parsed null). Full per-entry detail goes to
stderr and ``BENCH_partial.json`` (one JSON document:
{"result": ..., "detail": ...}); a SIGTERM/SIGINT handler emits one
final snapshot before dying.

The headline metric is Faster R-CNN ResNet-101 (COCO config) inference
images/sec/chip vs the reference's published eval throughput of ~1.6
images/s (BASELINE.md, docs/tutorial/05-evaluating-models.rst:79-81),
and it runs FIRST. Entries are ordered headline → train → ssd → int8 →
serving/eval → pipeline/loader, and a wall-clock budget
(``BENCH_BUDGET_S`` env, default 1200 s) skips entries that no longer
fit — skipped names land in ``detail.skipped_for_budget``.

All benchmarks run with genuinely random-initialized weights (real
``model.init`` on device): NMS/suppression work is data-dependent, so
zero-filled weights (uniform scores, identical boxes) would understate
the real suppression cost.
"""

import json
import math
import os
import signal
import sys
import time


def _bench(fn, args, iters):
    # Timing fences use device_get (a real output fetch), not
    # block_until_ready: on this tunneled PJRT platform the latter
    # returns immediately regardless of execution state (measured: 0.0 ms
    # for a chained 4096x4096 matmul loop), so it is not a fence at all.
    # Executions are dispatched async and serialize on the device, so
    # fetching the last output is an honest fence for the whole loop.
    # main() pays the tunnel's catastrophic first-fetch cost up front
    # (see _tunnel_sync), after which a fetch costs ~31-40 ms of fixed
    # RPC latency (varying with the degraded post-poison bandwidth,
    # 14-27 MB/s measured across runs). Amortized over `iters` that is
    # noise against 100+ ms steps, but it inflated SSD's ~20 ms steps
    # by 15-25% and the run-to-run fence variance flipped the r4
    # int8-vs-bf16 comparison (driver: int8 1366 < bf16 1583 img/s).
    # Provenance of the A/B numbers: the PRE-fix same-process A/B
    # (still 10-iter, fence-inflated) read int8 1790 > bf16 1432;
    # with this amortization the steady numbers are int8 2215-2224 >
    # bf16 1814-1830 (scripts/ssd_int8_ab.py, STATUS.md r5 table).
    # When the first timed loop is fence-dominated, re-time with iters
    # grown until the loop body runs >= ~2 s so the fence is <2% of it.
    import jax

    t0 = time.time()
    run, flops = fn, None
    try:
        compiled = fn.lower(*args).compile()
        run = compiled
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) or None
    except Exception:
        pass  # backend without lower/cost_analysis: time fn directly
    out = run(*args)
    jax.device_get(out)
    compile_s = time.time() - t0

    def run_n(n):
        t0 = time.time()
        for _ in range(n):
            out = run(*args)
        jax.device_get(out)
        return time.time() - t0

    step_s, _ = _amortized_time(run_n, iters, cap=2000)
    return compile_s, step_s, flops


def _amortized_time(run_n, iters, cap):
    """Time ``run_n(n)`` (n iterations + one fence) with the fence cost
    amortized: if the first window is fence-dominated, keep growing the
    iteration count until the loop body runs >= ~2 s (so a ~40 ms fence
    is <2% of it) or ``cap`` is reached. The growth factor uses the
    still-inflated per-iter estimate, so it can undershoot once — hence
    the loop, not a single retime. Returns (per_iter_s, iters_used)."""
    elapsed = run_n(iters)
    while elapsed < 1.5 and iters < cap:
        iters = min(cap, max(iters + 1, int(iters * 2.0 / max(elapsed, 1e-3))))
        elapsed = run_n(iters)
    return elapsed / iters, iters


# Peak dense-matmul rates per chip (public spec sheets), for the MFU
# denominator. Keys match substrings of jax's device_kind/str(device).
_PEAK_FLOPS = {
    "v5 lite": {"bf16": 197e12, "int8": 394e12},  # TPU v5e
    "v5e": {"bf16": 197e12, "int8": 394e12},
    "v5p": {"bf16": 459e12, "int8": 918e12},
    "v4": {"bf16": 275e12, "int8": 275e12},
    "v6": {"bf16": 918e12, "int8": 1836e12},  # Trillium
}


def _peak_flops(dtype="bf16"):
    import jax

    name = str(jax.devices()[0]).lower()
    for key, peaks in _PEAK_FLOPS.items():
        if key in name:
            return peaks.get(dtype)
    return None


def _mfu(flops, step_s, dtype="bf16"):
    """Model FLOPs utilization: analytic HLO flops / wall / chip peak.

    ``flops`` comes from XLA's own cost analysis of the compiled
    executable — an auditable denominator for "fast" (VERDICT r2 #6).
    Returns None when either side is unavailable.
    """
    peak = _peak_flops(dtype)
    if not flops or not step_s or not peak:
        return None
    return round(flops / step_s / peak, 4)


def _flops_of(fn, *args):
    """XLA cost-analysis flops of a jitted fn at these args (or None)."""
    try:
        ca = fn.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _maybe_calibrate_int8(model, variables, images, overrides):
    """Calibrate int8_static activation scales (what --profile fast
    serves): one forward with the int8_stats collection mutable, like
    PredictorNetwork does at load."""
    import jax

    if not any("int8_static=True" in o for o in overrides):
        return variables

    @jax.jit
    def calibrate(v, img):
        return model.apply(v, img, train=False, mutable=["int8_stats"])

    _, updated = calibrate(variables, images[:1])
    return {**variables, "int8_stats": updated["int8_stats"]}


def bench_frcnn_inference(batch=8, height=608, width=800, iters=10,
                          overrides=()):
    import jax
    import jax.numpy as jnp

    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    cfg = get_model_config(
        get_base_config(FasterRCNN), Config({}), list(overrides)
    )
    cfg.model.network.num_classes = 80  # COCO
    cfg.model.base_network.architecture = "resnet_v1_101"

    model = FasterRCNN(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (batch, height, width, 3)) * 255.0

    variables = jax.jit(
        lambda k: model.init(k, images[:1], train=False)
    )(key)
    variables = _maybe_calibrate_int8(model, variables, images, overrides)

    @jax.jit
    def forward(variables, images):
        out = model.apply(variables, images, train=False)
        cp = out["classification_prediction"]
        return cp["objects"], cp["labels"], cp["probs"], cp["valid"]

    compile_s, step_s, flops = _bench(forward, (variables, images), iters)
    dtype = "int8" if any("int8" in o for o in overrides) else "bf16"
    return {
        "images_per_sec": round(batch / step_s, 3),
        "batch": batch,
        "input": [height, width],
        "compile_s": round(compile_s, 1),
        "batch_latency_ms": round(1000 * step_s, 1),
        "tflops_per_step": round(flops / 1e12, 2) if flops else None,
        "mfu": _mfu(flops, step_s, dtype),
    }


def bench_ssd_inference(batch=32, iters=10, overrides=()):
    import jax
    import jax.numpy as jnp

    from luminoth_tpu.models.ssd import SSD
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    cfg = get_model_config(get_base_config(SSD), Config({}), list(overrides))
    cfg.model.network.num_classes = 20  # Pascal VOC

    model = SSD(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (batch, 300, 300, 3)) * 255.0

    variables = jax.jit(
        lambda k: model.init(k, images[:1], train=False)
    )(key)
    variables = _maybe_calibrate_int8(model, variables, images, overrides)

    @jax.jit
    def forward(variables, images):
        out = model.apply(variables, images, train=False)
        cp = out["classification_prediction"]
        return cp["objects"], cp["labels"], cp["probs"], cp["valid"]

    compile_s, step_s, flops = _bench(forward, (variables, images), iters)
    dtype = "int8" if any("int8" in o for o in overrides) else "bf16"
    return {
        "images_per_sec": round(batch / step_s, 3),
        "batch": batch,
        "input": [300, 300],
        "compile_s": round(compile_s, 1),
        "batch_latency_ms": round(1000 * step_s, 1),
        "tflops_per_step": round(flops / 1e12, 2) if flops else None,
        "mfu": _mfu(flops, step_s, dtype),
    }


def bench_frcnn_train(batch=8, height=608, width=800, iters=10,
                      remat=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.train import TrainState, make_train_step
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 80
    cfg.model.base_network.architecture = "resnet_v1_101"
    if remat is None:
        # Batches up to 16 at 608x800 fit without rematerialization once
        # the ROI VJP bounds its recompute chunk (measured 46.1 img/s at
        # batch 16 plain vs 35.8 remat); keep remat for headroom beyond.
        remat = batch >= 32
    cfg.model.base_network.remat = bool(remat)

    model = FasterRCNN(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (batch, height, width, 3)) * 255.0
    # A couple of plausible GT boxes per image, padded to a static max.
    rng = np.random.RandomState(0)
    gt = np.full((batch, 8, 5), -1.0, np.float32)
    for b in range(batch):
        for i in range(4):
            x1, y1 = rng.uniform(0, width - 80), rng.uniform(0, height - 80)
            gt[b, i] = [x1, y1, x1 + rng.uniform(40, 80),
                        y1 + rng.uniform(40, 80), rng.randint(0, 80)]
    gt_boxes = jnp.asarray(gt)

    variables = jax.jit(
        lambda k: model.init(
            {"params": k, "target": k, "dropout": k},
            images[:1], gt_boxes=gt_boxes[:1], train=True,
        )
    )(key)

    # Framework-default clip-by-norm 10 + a conservative LR: random-init
    # heads diverge under the full fine-tuning LR, and a NaN loss would
    # both skew the data-dependent NMS work and break strict-JSON parsers.
    tx = optax.chain(
        optax.clip_by_global_norm(10.0), optax.sgd(1e-4, momentum=0.9)
    )
    params = variables["params"]
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
    )
    train_step = make_train_step(model, tx, remat=remat)
    train_batch = {"image": images, "gt_boxes": gt_boxes}

    t0 = time.time()
    flops = _flops_of(train_step, state, train_batch, key)
    state, metrics = train_step(state, train_batch, key)
    jax.device_get(metrics["total_loss"])  # honest fence, see _bench
    compile_s = time.time() - t0

    loss_box = {}

    def run_n(n):
        nonlocal state
        t0 = time.time()
        for _ in range(n):
            state, metrics = train_step(state, train_batch, key)
        loss_box["v"] = float(jax.device_get(metrics["total_loss"]))
        return time.time() - t0

    step_s, _ = _amortized_time(run_n, iters, cap=200)
    final_loss = loss_box["v"]
    return {
        "images_per_sec": round(batch / step_s, 3),
        "batch": batch,
        "input": [height, width],
        "remat": bool(remat),
        "compile_s": round(compile_s, 1),
        "step_ms": round(1000 * step_s, 1),
        "tflops_per_step": round(flops / 1e12, 2) if flops else None,
        "mfu": _mfu(flops, step_s),
        "final_loss": round(final_loss, 3) if math.isfinite(final_loss)
        else None,
    }


def bench_serving(calls=20, profile=None):
    """End-to-end single-image serving latency through PredictorNetwork.

    Covers the full user path: host preprocessing (uint8-native resize +
    canvas pad), upload, jitted forward, NMS, result fetch, box rescale.
    ``profile="fast"`` additionally applies the serving profile (uint8
    transfer + 6000/1000 proposal budget) — the composed `serving: fast`
    preset entry (VERDICT r2 #7).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )
    from luminoth_tpu.utils.predicting import PredictorNetwork

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 80
    cfg.model.base_network.architecture = "resnet_v1_101"
    cfg.dataset.transfer_dtype = "uint8"
    cfg.dataset.image_preprocessing = Config({
        "min_size": 600, "max_size": 800,
        "canvas_height": 608, "canvas_width": 800,
    })
    if profile:
        from luminoth_tpu.utils.serving import apply_serving_profile

        cfg = apply_serving_profile(cfg, profile)

    model = FasterRCNN(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros((1, 608, 800, 3)), train=False)
    )(jax.random.PRNGKey(0))
    network = PredictorNetwork(cfg, variables=variables)

    rng = np.random.RandomState(0)
    image = rng.randint(0, 255, (480, 640, 3), np.uint8)

    t0 = time.time()
    network.predict_image(image)  # compile + first transfer
    first_s = time.time() - t0

    lat = []
    for _ in range(calls):
        t0 = time.time()
        network.predict_image(image)
        lat.append(time.time() - t0)
    lat.sort()
    return {
        "p50_ms": round(1000 * lat[len(lat) // 2], 1),
        "p90_ms": round(1000 * lat[int(len(lat) * 0.9)], 1),
        "first_call_s": round(first_s, 1),
        "input": [480, 640],
        "transfer": "uint8",
    }


def bench_ssd_train(batch=32, iters=10):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from luminoth_tpu.models.ssd import SSD
    from luminoth_tpu.train import TrainState, make_train_step
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    cfg = get_model_config(get_base_config(SSD), Config({}), [])
    cfg.model.network.num_classes = 20  # Pascal VOC

    model = SSD(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (batch, 300, 300, 3)) * 255.0
    rng = np.random.RandomState(0)
    gt = np.full((batch, 8, 5), -1.0, np.float32)
    for b in range(batch):
        for i in range(4):
            x1, y1 = rng.uniform(0, 220), rng.uniform(0, 220)
            gt[b, i] = [x1, y1, x1 + rng.uniform(40, 80),
                        y1 + rng.uniform(40, 80), rng.randint(0, 20)]
    gt_boxes = jnp.asarray(gt)

    variables = jax.jit(
        lambda k: model.init(
            {"params": k, "target": k, "dropout": k},
            images[:1], gt_boxes=gt_boxes[:1], train=True,
        )
    )(key)
    tx = optax.chain(
        optax.clip_by_global_norm(10.0), optax.sgd(1e-4, momentum=0.9)
    )
    params = variables["params"]
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
    )
    train_step = make_train_step(model, tx)
    train_batch = {"image": images, "gt_boxes": gt_boxes}

    t0 = time.time()
    flops = _flops_of(train_step, state, train_batch, key)
    state, metrics = train_step(state, train_batch, key)
    jax.device_get(metrics["total_loss"])  # honest fence, see _bench
    compile_s = time.time() - t0

    loss_box = {}

    def run_n(n):
        nonlocal state
        t0 = time.time()
        for _ in range(n):
            state, metrics = train_step(state, train_batch, key)
        loss_box["v"] = float(jax.device_get(metrics["total_loss"]))
        return time.time() - t0

    step_s, _ = _amortized_time(run_n, iters, cap=200)
    final_loss = loss_box["v"]
    return {
        "images_per_sec": round(batch / step_s, 3),
        "batch": batch,
        "input": [300, 300],
        "compile_s": round(compile_s, 1),
        "step_ms": round(1000 * step_s, 1),
        "tflops_per_step": round(flops / 1e12, 2) if flops else None,
        "mfu": _mfu(flops, step_s),
        "final_loss": round(final_loss, 3) if math.isfinite(final_loss)
        else None,
    }


def _write_synthetic_coco_records(path, n=160, num_classes=80, seed=0,
                                  split="train"):
    """COCO-sized JPEG records through the real TFRecord codec."""
    import io
    import os

    import numpy as np
    from PIL import Image

    from luminoth_tpu.formats.example_pb import encode_sequence_example
    from luminoth_tpu.formats.tfrecord import TFRecordWriter

    rng = np.random.RandomState(seed)
    sizes = [(480, 640), (375, 500), (426, 640), (612, 612)]
    with TFRecordWriter(os.path.join(path, f"{split}.tfrecords")) as w:
        for i in range(n):
            h, wd = sizes[i % len(sizes)]
            arr = rng.randint(0, 255, (h, wd, 3), dtype=np.uint8)
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="JPEG", quality=90)
            nb = int(rng.randint(1, 8))
            x1 = rng.randint(0, wd - 60, nb)
            y1 = rng.randint(0, h - 60, nb)
            w.write(encode_sequence_example(
                {"image_raw": buf.getvalue(),
                 "filename": f"i{i}.jpg".encode(),
                 "width": wd, "height": h, "depth": 3},
                {"label": [[int(v)] for v in rng.randint(0, num_classes, nb)],
                 "xmin": [[int(v)] for v in x1],
                 "ymin": [[int(v)] for v in y1],
                 "xmax": [[int(v + rng.randint(30, 60))] for v in x1],
                 "ymax": [[int(v + rng.randint(30, 60))] for v in y1]},
            ))


def bench_train_pipeline(batch=8, iters=10, warmup=2,
                         compute_step_ms=None, h2d_clean_mbps=None):
    """Faster R-CNN training fed by the REAL input pipeline.

    End-to-end `lumi train` data path: TFRecord read → protobuf decode →
    JPEG decode → augment → resize → canvas pad → batch → uint8 transfer
    → device cast, with the loader's background thread and the
    device-prefetch stage (``prefetch_to_device``) overlapping host work
    and uploads with device steps. Comparable to ``bench_frcnn_train``
    (same model/canvas, random in-memory data) — the gap between the two
    is the input-pipeline cost that isn't hidden by the accelerator.

    On this tunneled TPU the measurement necessarily runs with the
    process's transfer path degraded ~34x (see _tunnel_sync: the fences
    earlier benches need poison it), so ``images_per_sec`` here is a
    tunnel lower bound. ``composed_images_per_sec`` reads the same
    pipeline against the CLEAN transfer bandwidth recorded in
    detail.h2d_clean_MBps: steady state = slowest pipeline stage of
    {loader, upload, train step}.
    """
    import tempfile

    import jax
    import jax.numpy as jnp
    import optax

    from luminoth_tpu.datasets.object_detection_dataset import (
        ObjectDetectionDataset,
    )
    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.train import (
        TrainState, make_train_step, _device_batch, prefetch_to_device,
    )
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    tmp = tempfile.mkdtemp(prefix="lumi_bench_data_")
    _write_synthetic_coco_records(tmp, n=160)

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 80
    cfg.model.base_network.architecture = "resnet_v1_101"
    cfg.dataset.dir = tmp
    cfg.dataset.transfer_dtype = "uint8"
    cfg.dataset.image_preprocessing = Config({
        "min_size": 600, "max_size": 800,
        "canvas_height": 608, "canvas_width": 800,
    })
    cfg.train.batch_size = batch
    cfg.train.num_epochs = 4 + (batch * (warmup + iters)) // 160

    dataset = ObjectDetectionDataset(cfg, seed=0)
    batches = iter(dataset)

    # Loader-only rate (decode+augment+batch, no device work).
    first = next(batches)
    t0 = time.time()
    loader_n = 0
    for _ in range(6):
        loader_n += next(batches)["image"].shape[0]
    loader_rate = loader_n / (time.time() - t0)

    model = FasterRCNN(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda k, img, gt: model.init(
            {"params": k, "target": k, "dropout": k},
            img, gt_boxes=gt, train=True,
        )
    )(key, first["image"][:1].astype(jnp.float32),
      first["gt_boxes"][:1])
    tx = optax.chain(
        optax.clip_by_global_norm(10.0), optax.sgd(1e-4, momentum=0.9)
    )
    params = variables["params"]
    state = TrainState(
        step=jnp.asarray(0, jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats", {}),
    )
    train_step = make_train_step(model, tx)

    t0 = time.time()
    state, metrics = train_step(state, _device_batch(first, None), key)
    jax.device_get(metrics["total_loss"])  # honest fence, see _bench
    compile_s = time.time() - t0

    # Timed end-to-end: loader thread + staged uploads + train steps.
    staged = prefetch_to_device(batches, mesh=None, depth=2)
    for _ in range(warmup - 1):
        _, db = next(staged)
        state, metrics = train_step(state, db, key)

    t0 = time.time()
    n = 0
    for _ in range(iters):
        b, db = next(staged)
        n += b["image"].shape[0]
        state, metrics = train_step(state, db, key)
    jax.device_get(metrics["total_loss"])  # honest fence, see _bench
    elapsed = time.time() - t0

    out = {
        "images_per_sec": round(n / elapsed, 3),
        "loader_only_images_per_sec": round(loader_rate, 3),
        "batch": batch,
        "canvas": [608, 800],
        "transfer": "uint8",
        "compile_s": round(compile_s, 1),
        "step_ms": round(1000 * elapsed / iters, 1),
    }
    if compute_step_ms and h2d_clean_mbps:
        upload_bytes = batch * 608 * 800 * 3  # uint8 canvas
        upload_ms = 1000 * upload_bytes / (h2d_clean_mbps * 1e6)
        stage_ms = max(
            compute_step_ms, upload_ms, 1000 * batch / loader_rate
        )
        out["composed_images_per_sec"] = round(batch / (stage_ms / 1000), 3)
        out["composed_stage_ms"] = {
            "train_step": compute_step_ms,
            "upload_clean": round(upload_ms, 1),
            "loader": round(1000 * batch / loader_rate, 1),
        }
    return out


def bench_loader_scaling(batch=8, workers=None, images_per_point=96):
    """Loader-only throughput vs worker-process count (no device work).

    Measures the full host prepare chain (TFRecord read → native parse →
    JPEG decode → resize → canvas pad → batch) through the thread-pool
    loader (workers=0) and the multi-process shared-memory loader
    (datasets/parallel_loader.py) at each worker count. An 8-chip DP
    mesh at ~48 img/s/chip training steps needs ~380 img/s of loading;
    this curve shows where this host tops out (``host_cpus`` records
    the core budget — scaling past it is impossible by construction).
    """
    import multiprocessing
    import tempfile

    from luminoth_tpu.datasets.object_detection_dataset import (
        ObjectDetectionDataset,
    )
    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    cpus = multiprocessing.cpu_count()
    if workers is None:
        # Sweep to 2x the core count (oversubscription point) — on a
        # 1-core host that is (0, 1, 2); on 8 cores (0, 1, 2, 4, 8, 16).
        # Spawning further procs on a saturated host proves nothing and
        # costs bench wall-clock (each spawn re-imports numpy/PIL).
        workers = sorted({0, 1} | {
            w for w in (2, 4, 8, 16) if w <= 2 * cpus
        })

    tmp = tempfile.mkdtemp(prefix="lumi_bench_loader_")
    _write_synthetic_coco_records(tmp, n=160)

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.dataset.dir = tmp
    cfg.dataset.transfer_dtype = "uint8"
    cfg.dataset.image_preprocessing = Config({
        "min_size": 600, "max_size": 800,
        "canvas_height": 608, "canvas_width": 800,
    })
    cfg.train.batch_size = batch
    cfg.train.num_epochs = 50  # plenty; we stop after images_per_point

    curve = {}
    for w in workers:
        dataset = ObjectDetectionDataset(
            cfg, seed=0, num_worker_processes=w
        )
        it = iter(dataset)
        next(it)  # absorb startup (spawn + first decode wave)
        t0 = time.time()
        n = 0
        while n < images_per_point:
            n += next(it)["image"].shape[0]
        curve[str(w)] = round(n / (time.time() - t0), 1)
        it.close()  # GeneratorExit → loader cleanup (stop workers/slabs)
    return {
        "images_per_sec_by_workers": curve,
        "host_cpus": multiprocessing.cpu_count(),
        "batch": batch,
        "canvas": [608, 800],
    }


def bench_eval(batch=8, n_images=160):
    """The full streaming evaluator (`lumi eval` path): TFRecord read →
    decode → resize/pad → jitted forward+loss → host detections → 101-pt
    COCO AP/AR. Directly comparable to the reference's eval throughput
    baseline (1.6 img/s, docs/tutorial/05-evaluating-models.rst:79-81) —
    same kind of loop, real input pipeline included.
    """
    import tempfile

    import jax
    import jax.numpy as jnp

    from luminoth_tpu.eval import evaluate_once
    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    tmp = tempfile.mkdtemp(prefix="lumi_bench_eval_")
    _write_synthetic_coco_records(tmp, n=n_images, split="val")

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 80
    cfg.model.base_network.architecture = "resnet_v1_101"
    cfg.dataset.dir = tmp
    cfg.dataset.transfer_dtype = "uint8"
    cfg.dataset.image_preprocessing = Config({
        "min_size": 600, "max_size": 800,
        "canvas_height": 608, "canvas_width": 800,
    })
    cfg.train.batch_size = batch
    # The exact `lumi eval` semantics (min_prob 0, UNCAPPED per-class
    # NMS — reference eval.py:52-89): this entry must measure the real
    # eval path, not the serving-capped config.
    from luminoth_tpu.eval import apply_eval_config_mutations

    apply_eval_config_mutations(cfg, "val")

    model = FasterRCNN(cfg, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda k: model.init(
            k, jnp.zeros((1, 608, 800, 3)),
            gt_boxes=jnp.zeros((1, 8, 5)), train=False,
        )
    )(jax.random.PRNGKey(0))

    # One-batch warmup so the steady-state number excludes compilation
    # (shared jitted forward: the real watch loop reuses it per ckpt too).
    from luminoth_tpu.eval import _build_forward

    forward = _build_forward(model)
    t0 = time.time()
    evaluate_once(cfg, model, variables, forward=forward, max_batches=1)
    compile_s = time.time() - t0

    metrics = evaluate_once(cfg, model, variables, forward=forward)
    return {
        # Through this tunnel the number is H2D-bound: evaluation MUST
        # fetch detections every batch, and the first fetch degrades the
        # process's uploads ~30x (see _tunnel_sync) — an 11.7 MB uint8
        # canvas batch then costs ~300 ms to ship. main() attaches the
        # composed clean-transfer steady state next to it.
        "images_per_sec": round(metrics["images_per_second"], 3),
        "batch": batch,
        "n_images": n_images,
        "compile_s": round(compile_s, 1),
        "map_at_50_random_weights": round(metrics["AP@0.5"], 4),
    }


def bench_mesh_singlechip(batch=2, height=608, width=800):
    """Mesh-annotated jit on the REAL chip (VERDICT r3 #6).

    The CPU test suite and the driver's dry run validate sharding on
    virtual CPU devices, where Pallas kernels take the XLA fallback —
    this entry jits the Faster R-CNN forward under a real
    ``jax.sharding.Mesh`` with GSPMD partitioning annotations on the
    TPU platform, so the NMS/ROI Pallas kernels compile under a mesh at
    least once per round.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.parallel import make_mesh
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 80
    cfg.model.base_network.architecture = "resnet_v1_101"

    model = FasterRCNN(cfg, dtype=jnp.bfloat16)
    mesh = make_mesh(num_devices=min(1, jax.device_count()) or 1)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (batch, height, width, 3)) * 255.0
    variables = jax.jit(
        lambda k: model.init(k, images[:1], train=False)
    )(key)

    forward = jax.jit(
        lambda v, img: model.apply(v, img, train=False)[
            "classification_prediction"
        ]["objects"],
        in_shardings=(repl, data),
        out_shardings=data,
    )
    with mesh:
        variables = jax.device_put(variables, repl)
        images = jax.device_put(images, data)
        t0 = time.time()
        out = forward(variables, images)
        jax.device_get(out)
        compile_s = time.time() - t0
        t0 = time.time()
        jax.device_get(forward(variables, images))
        step_s = time.time() - t0
    return {
        "ok": True,
        "devices": mesh.size,
        "batch": batch,
        "compile_s": round(compile_s, 1),
        "step_ms": round(1000 * step_s, 1),
    }


def _h2d_mbps(nbytes=46_000_000, reps=3):
    """Host->device bandwidth via device_put (block_until_ready on a
    transfer reflects real completion: measured times scale with size)."""
    import numpy as np
    import jax

    x = np.random.rand(nbytes // 4).astype(np.float32)
    d = jax.device_put(x)
    d.block_until_ready()  # warm the path
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        d = jax.device_put(x)
        d.block_until_ready()
        best = min(best, time.time() - t0)
    return nbytes / best / 1e6


def _tunnel_sync():
    """Pay the tunnel's first device->host fetch up front, timed.

    On this environment's tunneled TPU the FIRST D2H fetch in a process
    takes 12-300 s (any size, any provenance) and permanently degrades
    transfer bandwidth ~34x for the process; block_until_ready is not a
    fence (returns immediately) and host callbacks are unimplemented, so
    a fetch is the only sync primitive. Doing one here keeps that cost
    out of every compile_s / step timing below. Real (non-tunneled) TPU
    attachments do not behave this way; the clean-path H2D bandwidth is
    recorded separately so the pipeline numbers can be read against it.
    """
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    jax.device_get(jnp.zeros(()))
    return time.time() - t0


def _probe_device(timeout_s=420):
    """Bounded device-availability probe in a subprocess.

    PJRT client creation can hang indefinitely on a wedged remote
    attachment (a killed client's session lingers server-side); probing
    in a throwaway subprocess turns that into a clean, diagnosable
    failure instead of a silent hang of the whole benchmark.
    """
    import subprocess

    try:
        result = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert len(jax.devices()) >= 1"],
            capture_output=True, timeout=timeout_s,
        )
        return result.returncode == 0, result.stderr.decode()[-500:]
    except subprocess.TimeoutExpired:
        return False, f"device probe timed out after {timeout_s}s"


_BASELINE_IMG_S = 1.6  # reference eval throughput, images/s (BASELINE.md)


class _Snapshot:
    """The incrementally-emitted result: always a COMPLETE JSON line.

    ``emit()`` prints the current state as one line and flushes, and
    mirrors it to BENCH_partial.json. The driver parses the tail of
    stdout, so whatever entry finished last defines what it sees — a
    mid-suite timeout no longer zeroes the round (VERDICT r3 #1).
    """

    # Short aliases for the stdout summary: the driver captures only the
    # TAIL of stdout (~2-3 KB) and json-parses the last line. Round 4's
    # bench embedded the full detail dict in that line; it grew past the
    # capture window, got truncated mid-line, and parsed as null despite
    # rc=0 — a full round of verified numbers lost to line length. The
    # final line is now compact (<600 chars); the full detail goes to
    # stderr and BENCH_partial.json instead.
    _SUMMARY_KEYS = (
        ("fasterrcnn_train", "frcnn_train"),
        ("ssd_train", "ssd_train"),
        ("ssd_inference", "ssd_inf"),
        ("fasterrcnn_inference_int8_tail", "frcnn_int8"),
        ("ssd_inference_int8", "ssd_int8"),
        ("ssd_inference_b128", "ssd_b128"),
        ("ssd_inference_int8_b128", "ssd_int8_b128"),
        ("fasterrcnn_inference_serving1000", "serving1000"),
        ("fasterrcnn_inference_evalnms", "evalnms"),
    )

    def __init__(self, detail):
        self.detail = detail
        self.value = 0.0

    def _summary(self):
        s = {}
        for key, alias in self._SUMMARY_KEYS:
            entry = self.detail.get(key)
            if isinstance(entry, dict) and "images_per_sec" in entry:
                s[alias] = entry["images_per_sec"]
        fast = self.detail.get("fasterrcnn_serving_fast_profile")
        if isinstance(fast, dict) and "p50_ms" in fast:
            s["fast_p50_ms"] = fast["p50_ms"]
        ev = self.detail.get("fasterrcnn_eval")
        if isinstance(ev, dict) and "composed_images_per_sec" in ev:
            s["eval_composed"] = ev["composed_images_per_sec"]
        mesh = self.detail.get("mesh_singlechip_gspmd")
        if isinstance(mesh, dict):
            s["mesh_gspmd_ok"] = bool(mesh.get("ok"))
        if self.detail.get("skipped_for_budget"):
            s["skipped"] = len(self.detail["skipped_for_budget"])
        # Entries that raised store {"error": ...} and carry no
        # images_per_sec, so the loop above skips them — surface their
        # names so a failed entry is distinguishable from one never run.
        failed = [k for k, v in self.detail.items()
                  if isinstance(v, dict) and "error" in v]
        if failed:
            s["failed"] = failed[:6]
        if "error" in self.detail:
            s["error"] = self.detail["error"][:120]
        return s

    def to_json(self):
        return json.dumps({
            "metric": "fasterrcnn_r101_coco_inference_throughput",
            "value": self.value,
            "unit": "images/sec/chip",
            "vs_baseline": round(self.value / _BASELINE_IMG_S, 2),
            "summary": self._summary(),
        })

    def emit(self):
        self._compose_eval()
        line = self.to_json()
        detail_line = json.dumps({"detail": self.detail})
        print(f"bench detail: {detail_line}", file=sys.stderr, flush=True)
        print(line, flush=True)
        try:
            # One JSON document, so json.load() on the file keeps working.
            with open("BENCH_partial.json", "w") as f:
                f.write(json.dumps(
                    {"result": json.loads(line), "detail": self.detail}
                ) + "\n")
        except OSError:
            pass

    def _compose_eval(self):
        # Compose the eval loop's clean-transfer steady state (the tunnel
        # degrades its measured rate; real attachments don't — see
        # bench_eval): slowest of {forward (≈ the inference batch
        # latency; the loss adds little), clean upload, loader}.
        ev = self.detail.get("fasterrcnn_eval")
        # The eval forward runs the exact `lumi eval` semantics
        # (uncapped per-class NMS): compose against that entry when
        # measured, else the parity-budget headline as a lower bound.
        fr = self.detail.get("fasterrcnn_inference_evalnms") or \
            self.detail.get("fasterrcnn_inference")
        if not (ev and fr and self.detail.get("h2d_clean_MBps")):
            return
        b = ev["batch"]
        stages = {
            "forward": fr["batch_latency_ms"],
            "upload_clean": round(
                1000 * b * 608 * 800 * 3
                / (self.detail["h2d_clean_MBps"] * 1e6), 1
            ),
        }
        loader_rate = self.detail.get("fasterrcnn_train_pipeline", {}).get(
            "loader_only_images_per_sec"
        )
        if loader_rate:
            stages["loader"] = round(1000 * b / loader_rate, 1)
        ev["composed_images_per_sec"] = round(
            b / (max(stages.values()) / 1000.0), 3
        )
        ev["composed_stage_ms"] = stages


def main():
    t_start = time.time()
    # Wall-clock budget for the whole suite, including device probing and
    # the tunnel's first-fetch cost. Entries that no longer fit are
    # skipped (recorded in detail.skipped_for_budget) rather than risking
    # a driver timeout that loses every number.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", 1200))

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = sys.argv[2] if len(sys.argv) > 2 else "all"

    detail = {"budget_s": budget_s, "skipped_for_budget": [],
              "entry_wall_s": {}}
    snap = _Snapshot(detail)

    def _on_term(signum, frame):
        detail["terminated_by_signal"] = signum
        snap.emit()
        sys.exit(1)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)

    # Bound the probe by the budget too: a wedged attachment must leave
    # room to emit the failure line, not eat the driver's whole window.
    probe_timeout = min(420, max(60, int(budget_s * 0.3)))
    ok, why = _probe_device(timeout_s=probe_timeout)
    if not ok:
        # One retry after a short cool-down: a wedged tunnel session
        # sometimes gets reaped server-side within a minute (observed:
        # killing a client mid-creation wedges the pool for later
        # processes). Kept short — r3's 120 s sleep helped blow the
        # driver's budget.
        time.sleep(30)
        ok, why = _probe_device(timeout_s=probe_timeout)
    if not ok:
        detail["error"] = f"accelerator unavailable: {why}"
        snap.emit()
        sys.exit(1)

    import jax

    from luminoth_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    detail["device"] = str(jax.devices()[0])
    snap.emit()  # skeleton: device up, no numbers yet
    detail["h2d_clean_MBps"] = round(_h2d_mbps(), 1)

    # Pay the tunnel's first-fetch cost (see _tunnel_sync: 12-300+ s on
    # this attachment, and a required sync primitive for every timing
    # below) on a daemon thread so it OVERLAPS the headline entry's
    # model build + XLA compile instead of preceding it serially — r3's
    # bench spent its whole driver budget on exactly this serialization.
    # Backend init already happened on this thread (jax.devices() above),
    # so the secondary-thread client-creation hang cannot trigger.
    import threading

    fetch_t = {}

    def _first_fetch():
        t0 = time.time()
        try:
            _tunnel_sync()
        except Exception:
            pass
        fetch_t["s"] = round(time.time() - t0, 1)

    fetch_thread = threading.Thread(target=_first_fetch, daemon=True)
    fetch_thread.start()
    snap.emit()

    def _set_headline(result):
        detail["fasterrcnn_inference"] = result
        snap.value = result["images_per_sec"]

    def _serving1000():
        # Same model with the serving-oriented proposal budget (the
        # original Faster R-CNN paper's test-time setting is 300; 1000
        # is detectron's default). Config knob, not a default change:
        # the headline keeps the reference's 12000/2000 budget.
        r = bench_frcnn_inference(
            batch=batch,
            overrides=["model.rpn.proposals.post_nms_top_n=1000",
                       "model.rpn.proposals.pre_nms_top_n=6000"],
        )
        r["post_nms_top_n"] = 1000
        return r

    def _pipeline():
        train_detail = detail.get("fasterrcnn_train") or {}
        return bench_train_pipeline(
            batch=batch,
            compute_step_ms=train_detail.get("step_ms"),
            h2d_clean_mbps=detail.get("h2d_clean_MBps"),
        )

    # (key, group, est_s, thunk, sink) in priority order — headline
    # first, then the cheap ssd/int8/b128/mesh entries, then FRCNN
    # train, then serving/eval, and the slow pipeline/loader sweeps
    # last. est_s are measured wall costs (compile-dominated) + margin.
    #
    # Why FRCNN train sits AFTER the b128/mesh entries: its ~600 s
    # cold compile is the single biggest budget hazard, and whether
    # the persistent cache hits depends on which remote pool host the
    # process attaches to (the backend fingerprint is part of JAX's
    # cache key; the computation hash itself was verified bit-stable
    # across processes and source-line shifts). On a warm attachment
    # the entry costs ~90 s and everything downstream still runs; on a
    # cold one it must not starve the entries no driver run has
    # captured yet. est_s 400 splits the hit/miss costs so the budget
    # check skips it when the remaining window clearly can't afford a
    # cold compile.
    entries = [
        ("fasterrcnn_inference", ("frcnn",), 150,
         lambda: bench_frcnn_inference(batch=batch), _set_headline),
        ("ssd_inference", ("ssd",), 90,
         lambda: bench_ssd_inference(), None),
        ("ssd_train", ("train",), 110,
         lambda: bench_ssd_train(), None),
        # int8 entries measure the SHIPPED static-calibrated path (what
        # `--profile fast` composes). History, so the finding stays
        # visible: the first int8 formulation (9-shifted-dots conv +
        # dynamic per-tensor activation quant) measured ~2x SLOWER than
        # bf16 on v5e (FRCNN 16.7 vs 34.1 img/s, SSD 548 vs 959);
        # XLA's native int8 conv lowering + static calibrated scales
        # (model.base_network.int8_static) turned that into a win
        # (r3 builder-measured: FRCNN 36.8 vs 34.2, SSD 1053 vs 963).
        ("fasterrcnn_inference_int8_tail", ("int8",), 150,
         lambda: bench_frcnn_inference(
             batch=batch,
             overrides=["model.base_network.int8_tail=True",
                        "model.base_network.int8_static=True"]), None),
        ("ssd_inference_int8", ("int8",), 90,
         lambda: bench_ssd_inference(
             overrides=["model.base_network.int8_trunk=True",
                        "model.base_network.int8_static=True"]), None),
        # SSD throughput scales past batch 32 once the proposal stage
        # is fused (r5 sweep, fence-amortized: bf16 1815/1862/2280/2240
        # img/s at b32/64/128/256, int8-static 2924 at b128 — MFU 0.67
        # bf16 / 0.45 int8 basis at b128; b256 bf16 is flat and b256
        # int8 trips the tunnel's remote-compile payload limit). Batch
        # 32 entries stay for cross-round comparability; these record
        # the offline/batch-serving optimum.
        ("ssd_inference_b128", ("ssd",), 60,
         lambda: bench_ssd_inference(batch=128), None),
        ("ssd_inference_int8_b128", ("int8",), 120,
         lambda: bench_ssd_inference(
             batch=128,
             overrides=["model.base_network.int8_trunk=True",
                        "model.base_network.int8_static=True"]), None),
        # GSPMD-partitioned compile of the Pallas kernels on the real
        # chip (the CPU dry run exercises sharding with XLA fallbacks).
        # Standalone-measured 163.6 s wall, of which ~100 s was that
        # fresh process's first D2H tunnel fetch — already paid here.
        # Ordered before the serving entries: those were captured by
        # the round-4 driver run; this one was skipped for budget then
        # and still needs driver evidence.
        ("mesh_singlechip_gspmd", ("mesh",), 160,
         lambda: bench_mesh_singlechip(), None),
        # est 400 = midpoint of warm-attachment (~90 s) vs cold-compile
        # (~650 s) cost — see the ordering note above.
        ("fasterrcnn_train", ("train",), 400,
         lambda: bench_frcnn_train(batch=batch), None),
        ("fasterrcnn_inference_serving1000", ("serving",), 120,
         _serving1000, None),
        ("fasterrcnn_serving_fast_profile", ("predict",), 150,
         lambda: bench_serving(profile="fast"), None),
        # Device-only forward at exact eval semantics (min_prob 0,
        # uncapped per-class NMS) — the compute stage `lumi eval`
        # composes against (the streaming entry below is tunnel-bound).
        ("fasterrcnn_inference_evalnms", ("eval",), 120,
         lambda: bench_frcnn_inference(
             batch=batch,
             overrides=[
                 "model.rcnn.proposals.pre_nms_max_candidates=0",
                 "model.rcnn.proposals.min_prob_threshold=0.0",
             ]), None),
        ("fasterrcnn_eval", ("eval",), 200,
         lambda: bench_eval(batch=batch), None),
        ("fasterrcnn_serving_latency", ("predict",), 140,
         lambda: bench_serving(), None),
        ("fasterrcnn_train_pipeline", ("pipeline",), 200,
         _pipeline, None),
        ("loader_scaling", ("pipeline", "loader"), 160,
         lambda: bench_loader_scaling(batch=batch), None),
    ]
    if only == "int8":
        entries += [
            ("fasterrcnn_inference_int8_dynamic", ("int8",), 150,
             lambda: bench_frcnn_inference(
                 batch=batch,
                 overrides=["model.base_network.int8_tail=True"]), None),
            ("fasterrcnn_inference_int8_full", ("int8",), 150,
             lambda: bench_frcnn_inference(
                 batch=batch,
                 overrides=["model.base_network.int8_tail=True",
                            "model.base_network.int8_trunk=True"]), None),
        ]

    for key, groups, est_s, thunk, sink in entries:
        if only != "all" and only not in groups:
            continue
        elapsed = time.time() - t_start
        if elapsed + est_s > budget_s:
            detail["skipped_for_budget"].append(key)
            continue
        t0 = time.time()
        try:
            result = thunk()
        except Exception as e:  # one broken entry must not zero the rest
            result = {"error": f"{type(e).__name__}: {e}"[:500]}
        detail["entry_wall_s"][key] = round(time.time() - t0, 1)
        if sink is not None and "error" not in result:
            sink(result)
        else:
            detail[key] = result
        if "s" in fetch_t and "tunnel_first_fetch_s" not in detail:
            detail["tunnel_first_fetch_s"] = fetch_t["s"]
            detail["h2d_poisoned_MBps"] = round(_h2d_mbps(), 1)
        if only == "int8" and snap.value == 0.0 and "error" not in result \
                and key == "fasterrcnn_inference_int8_tail":
            snap.value = result["images_per_sec"]
        snap.emit()

    if detail["skipped_for_budget"]:
        print(
            f"bench: skipped for budget ({budget_s:.0f}s): "
            f"{detail['skipped_for_budget']}", file=sys.stderr,
        )
        # The last per-entry snapshot predates the skip records — emit
        # once more so the final (tail) JSON line carries them.
        snap.emit()


if __name__ == "__main__":
    main()
