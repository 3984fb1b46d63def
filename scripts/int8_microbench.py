"""MXU microbenchmark: int8 vs bf16 dot throughput at model shapes.

Round-3 finding: the int8 serving profiles measure ~2x SLOWER than bf16
end to end on TPU v5e (same-session A/B: FRCNN 16.7 vs 34.1 img/s,
SSD 548 vs 959). This microbenchmark isolates whether XLA even delivers
the chip's 2x int8 MXU rate for bare dots — separating "quantization
overhead in the model" from "the XLA int8 path itself is not faster".

Method: K INDEPENDENT (m,n)x(n,n) dots batched in one jitted program
(einsum over a stacked LHS), so the tunnel's per-call dispatch/upload
cost amortizes AND the MXU can pipeline — two earlier formulations both
mismeasured this device: a per-call python loop measures the tunnel
re-uploading operands every call (int8 "wins" exactly tracking operand
bytes), and a serial fori_loop chain of dependent matmuls stalls the
pipeline to ~15% of the rate the same chip sustains on real conv
stacks (measured 149 TF/s bf16 on the ROI-tail shapes = 76% MFU).
One device_get fences the whole program (see bench.py on why
block_until_ready is not a fence on this platform).

Run on the TPU host:  python scripts/int8_microbench.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 32  # independent matmuls per program


def time_batch(n, dtype, iters=5):
    """TOPS of K independent (n,n)x(n,n) dots in one program."""
    rng = np.random.RandomState(0)
    if dtype == "int8":
        a = jnp.asarray(rng.randint(-127, 127, (K, n, n), np.int8))
        b = jnp.asarray(rng.randint(-127, 127, (n, n), np.int8))

        @jax.jit
        def f(a, b):
            out = jax.lax.dot_general(
                a, b, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            # cheap reduce so only (K, n) leaves the program — keeps the
            # HBM write of a (K, n, n) int32 result out of the timing
            return out.sum(axis=1)
    else:
        a = jnp.asarray(rng.randn(K, n, n), jnp.bfloat16)
        b = jnp.asarray(rng.randn(n, n) * 0.01, jnp.bfloat16)

        @jax.jit
        def f(a, b):
            out = jax.lax.dot_general(
                a, b, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.sum(axis=1)

    jax.device_get(f(a, b))  # compile + first dispatch
    t0 = time.time()
    for _ in range(iters):
        out = f(a, b)
    jax.device_get(out)
    dt = (time.time() - t0) / iters
    ops = 2 * (n ** 3) * K
    return {
        "program_ms": round(1000 * dt, 1),
        "ms_per_matmul": round(1000 * dt / K, 3),
        "tops": round(ops / dt / 1e12, 1),
    }


def main():
    out = {"device": str(jax.devices()[0]), "batch_len": K}
    for n in (2048, 4096):
        row = {}
        for dtype in ("bf16", "int8"):
            try:
                row[dtype] = time_batch(n, dtype)
            except Exception as e:
                row[dtype] = {"error": str(e)[:120]}
        if "tops" in row.get("int8", {}) and "tops" in row.get("bf16", {}):
            row["int8_speedup"] = round(
                row["int8"]["tops"] / row["bf16"]["tops"], 2
            )
        out[f"square{n}"] = row
        print(f"square{n}", json.dumps(row), flush=True)
    print("MICRO " + json.dumps(out))


if __name__ == "__main__":
    main()
