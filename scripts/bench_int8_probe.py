"""Feasibility probe: does int8 hit the MXU's 2x rate through XLA here?

The inference headline is bound by the ROI tail — bf16 matmuls already
near roofline (docs/usage/performance.md). TPU v5e's MXU runs int8 at
twice the bf16 rate, so a post-training-quantized tail could in theory
~halve tail time. Before building any of that, this probe measures what
XLA actually delivers on this chip for:

  1. bf16 x bf16 -> f32 dot (baseline, MXU shapes)
  2. int8 x int8 -> int32 dot (the quantized candidate)
  3. int8 dot + dequant-rescale fused epilogue (realistic serving op)

plus the same comparison at the ROI-tail's real shape profile
(per-ROI 1x1 convs as (R*49, 1024) x (1024, 512) style matmuls).

Usage: python scripts/bench_int8_probe.py [iters]
Prints one JSON line. Keep runs bounded; one process at a time on the
tunneled TPU (see STATUS.md tunnel notes).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, args, iters):
    out = fn(*args)
    jax.device_get(out)  # fence (block_until_ready is not one here)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(out)
    return (time.time() - t0) / iters


def bench_shape(m, k, n, iters=30):
    key = jax.random.PRNGKey(0)
    a_f = jax.random.normal(key, (m, k), jnp.bfloat16)
    b_f = jax.random.normal(jax.random.fold_in(key, 1), (k, n), jnp.bfloat16)
    a_i = (jax.random.normal(key, (m, k)) * 30).astype(jnp.int8)
    b_i = (jax.random.normal(jax.random.fold_in(key, 1), (k, n)) * 30).astype(
        jnp.int8
    )
    scale = jnp.float32(1.0 / (127.0 * 127.0))

    @jax.jit
    def dot_bf16(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @jax.jit
    def dot_int8(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    @jax.jit
    def dot_int8_dequant(a, b):
        acc = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * scale).astype(jnp.bfloat16)

    flops = 2.0 * m * k * n
    t_bf16 = _time(dot_bf16, (a_f, b_f), iters)
    t_int8 = _time(dot_int8, (a_i, b_i), iters)
    t_deq = _time(dot_int8_dequant, (a_i, b_i), iters)
    return {
        "shape": [m, k, n],
        "bf16_ms": round(1000 * t_bf16, 3),
        "bf16_tflops": round(flops / t_bf16 / 1e12, 1),
        "int8_ms": round(1000 * t_int8, 3),
        "int8_tops": round(flops / t_int8 / 1e12, 1),
        "int8_dequant_ms": round(1000 * t_deq, 3),
        "int8_speedup_vs_bf16": round(t_bf16 / t_deq, 2),
    }


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    jax.device_get(jnp.zeros(()))  # pay the tunnel first-fetch up front
    out = {
        "device": str(jax.devices()[0]),
        # Square MXU-friendly shape: peak-rate check.
        "square_4k": bench_shape(4096, 4096, 4096, iters),
        # ROI-tail-like shapes: 16000 ROIs x 49 px, 1024->512 and
        # 2048->512 1x1 convs, and the 3x3 (im2col 4608) unit conv.
        "tail_1x1_a": bench_shape(16000 * 49 // 8, 1024, 512, iters),
        "tail_1x1_b": bench_shape(16000 * 16 // 8, 2048, 512, iters),
        "tail_3x3_im2col": bench_shape(16000 * 16 // 8, 4608, 512, iters),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
