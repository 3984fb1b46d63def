"""Benchmark suite: detector throughput on one chip, realistic weights.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
The headline metric is Faster R-CNN ResNet-101 (COCO config) inference
images/sec/chip vs the reference's published eval throughput of ~1.6
images/s (BASELINE.md, docs/tutorial/05-evaluating-models.rst:79-81).
``detail`` carries the SSD inference and Faster R-CNN train-step
sub-benchmarks.

All benchmarks run with genuinely random-initialized weights (real
``model.init`` on device): NMS/suppression work is data-dependent, so
zero-filled weights (uniform scores, identical boxes) would understate
the real suppression cost.
"""

import json
import math
import sys
import time


def _bench(fn, args, iters):
    # Timing fences use device_get (a real output fetch), not
    # block_until_ready: on tunneled/experimental PJRT platforms the
    # latter can return before execution finishes, reporting impossible
    # sub-millisecond batch latencies. Executions are dispatched async
    # and serialize on the device, so fetching the last output is an
    # honest fence for the whole loop.
    import jax

    t0 = time.time()
    out = fn(*args)
    jax.device_get(out)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    elapsed = time.time() - t0
    return compile_s, elapsed / iters


def bench_frcnn_inference(batch=8, height=608, width=800, iters=10):
    import jax
    import jax.numpy as jnp

    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 80  # COCO
    cfg.model.base_network.architecture = "resnet_v1_101"

    model = FasterRCNN(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (batch, height, width, 3)) * 255.0

    variables = jax.jit(
        lambda k: model.init(k, images[:1], train=False)
    )(key)

    @jax.jit
    def forward(variables, images):
        out = model.apply(variables, images, train=False)
        cp = out["classification_prediction"]
        return cp["objects"], cp["labels"], cp["probs"], cp["valid"]

    compile_s, step_s = _bench(forward, (variables, images), iters)
    return {
        "images_per_sec": round(batch / step_s, 3),
        "batch": batch,
        "input": [height, width],
        "compile_s": round(compile_s, 1),
        "batch_latency_ms": round(1000 * step_s, 1),
    }


def bench_ssd_inference(batch=32, iters=10):
    import jax
    import jax.numpy as jnp

    from luminoth_tpu.models.ssd import SSD
    from luminoth_tpu.utils.config import (
        Config, get_base_config, get_model_config,
    )

    cfg = get_model_config(get_base_config(SSD), Config({}), [])
    cfg.model.network.num_classes = 20  # Pascal VOC

    model = SSD(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (batch, 300, 300, 3)) * 255.0

    variables = jax.jit(
        lambda k: model.init(k, images[:1], train=False)
    )(key)

    @jax.jit
    def forward(variables, images):
        out = model.apply(variables, images, train=False)
        cp = out["classification_prediction"]
        return cp["objects"], cp["labels"], cp["probs"], cp["valid"]

    compile_s, step_s = _bench(forward, (variables, images), iters)
    return {
        "images_per_sec": round(batch / step_s, 3),
        "batch": batch,
        "input": [300, 300],
        "compile_s": round(compile_s, 1),
        "batch_latency_ms": round(1000 * step_s, 1),
    }


def bench_frcnn_train(batch=8, height=608, width=800, iters=10):
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
    train_step = make_train_step(model, tx)
    train_batch = {"image": images, "gt_boxes": gt_boxes}

    t0 = time.time()
    state, metrics = train_step(state, train_batch, key)
    jax.device_get(metrics["total_loss"])  # honest fence, see _bench
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(iters):
        state, metrics = train_step(state, train_batch, key)
    final_loss = float(jax.device_get(metrics["total_loss"]))
    step_s = (time.time() - t0) / iters
    return {
        "images_per_sec": round(batch / step_s, 3),
        "batch": batch,
        "input": [height, width],
        "compile_s": round(compile_s, 1),
        "step_ms": round(1000 * step_s, 1),
        "final_loss": round(final_loss, 3) if math.isfinite(final_loss)
        else None,
    }


def main():
    import jax

    from luminoth_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = sys.argv[2] if len(sys.argv) > 2 else "all"

    detail = {"device": str(jax.devices()[0])}
    frcnn = None
    if only in ("all", "frcnn"):
        frcnn = bench_frcnn_inference(batch=batch)
        detail["fasterrcnn_inference"] = frcnn
    if only in ("all", "ssd"):
        detail["ssd_inference"] = bench_ssd_inference()
    if only in ("all", "train"):
        detail["fasterrcnn_train"] = bench_frcnn_train(batch=batch)

    baseline = 1.6  # reference eval throughput, images/s
    value = frcnn["images_per_sec"] if frcnn else 0.0
    print(
        json.dumps(
            {
                "metric": "fasterrcnn_r101_coco_inference_throughput",
                "value": value,
                "unit": "images/sec/chip",
                "vs_baseline": round(value / baseline, 2),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
