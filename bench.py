"""Benchmark: Faster R-CNN ResNet-101 (COCO config) inference images/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published eval throughput of ~1.6 images/s
(BASELINE.md, docs/tutorial/05-evaluating-models.rst:79-81).
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp

    from luminoth_tpu.models.fasterrcnn import FasterRCNN
    from luminoth_tpu.utils.config import (
        Config,
        get_base_config,
        get_model_config,
    )

    cfg = get_model_config(get_base_config(FasterRCNN), Config({}), [])
    cfg.model.network.num_classes = 80  # COCO
    cfg.model.base_network.architecture = "resnet_v1_101"

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    height, width = 608, 800

    model = FasterRCNN(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(key, (batch, height, width, 3)) * 255.0

    # Throughput benchmark → weight values don't matter; build zero-filled
    # variables from shape inference (full random init on-device is slow
    # through the TPU tunnel).
    t0 = time.time()
    variables = jax.eval_shape(lambda: model.init(key, images[:1], train=False))
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables
    )
    init_s = time.time() - t0

    @jax.jit
    def forward(variables, images):
        out = model.apply(variables, images, train=False)
        cp = out["classification_prediction"]
        return cp["objects"], cp["labels"], cp["probs"], cp["valid"]

    # Warmup / compile.
    t0 = time.time()
    out = forward(variables, images)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # Timed runs.
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        out = forward(variables, images)
    jax.block_until_ready(out)
    elapsed = time.time() - t0

    images_per_sec = batch * iters / elapsed
    baseline = 1.6  # reference eval throughput, images/s

    print(
        json.dumps(
            {
                "metric": "fasterrcnn_r101_coco_inference_throughput",
                "value": round(images_per_sec, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(images_per_sec / baseline, 2),
                "detail": {
                    "batch": batch,
                    "input": [height, width],
                    "compile_s": round(compile_s, 1),
                    "init_s": round(init_s, 1),
                    "p50_batch_latency_ms": round(1000 * elapsed / iters, 1),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
