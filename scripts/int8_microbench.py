"""MXU microbenchmark: int8 vs bf16 dot throughput at model shapes.

Round-3 finding: the int8 serving profiles measure ~2x SLOWER than bf16
end to end on TPU v5e (same-session A/B: FRCNN 16.7 vs 34.1 img/s,
SSD 548 vs 959). This microbenchmark isolates whether XLA even delivers
the chip's 2x int8 MXU rate for bare dots — separating "quantization
overhead in the model" from "the XLA int8 path itself is not faster".

Method: K chained matmuls inside ONE jitted program (lax.fori_loop), so
the tunnel's per-call dispatch/upload cost amortizes to nothing — a
naive per-call loop here measures the tunnel re-uploading the operands
every call (0.85x-2x "speedups" that exactly track operand byte size),
not the MXU. One device_get fences the whole program (see bench.py on
why block_until_ready is not a fence on this platform).

Run on the TPU host:  python scripts/int8_microbench.py
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

K = 64  # chained matmuls per program


def time_chain(n, dtype, iters=3):
    """TOPS of K chained (n,n)x(n,n) dots in one program."""
    rng = np.random.RandomState(0)
    if dtype == "int8":
        a = jnp.asarray(rng.randint(-8, 8, (n, n), np.int8))
        b = jnp.asarray(rng.randint(-8, 8, (n, n), np.int8))

        @jax.jit
        def f(a, b):
            def body(i, acc):
                prod = jax.lax.dot(
                    acc, b, preferred_element_type=jnp.int32
                )
                # re-narrow so the chain stays int8 x int8; clip keeps
                # values in range (VPU work, negligible next to the MXU
                # at n>=2048)
                return jnp.clip(prod, -127, 127).astype(jnp.int8)

            return jax.lax.fori_loop(0, K, body, a)
    else:
        a = jnp.asarray(rng.randn(n, n), jnp.bfloat16)
        b = jnp.asarray(rng.randn(n, n) * 0.01, jnp.bfloat16)

        @jax.jit
        def f(a, b):
            def body(i, acc):
                return jax.lax.dot(
                    acc, b, preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, K, body, a)

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
    out = {"device": str(jax.devices()[0]), "chain_len": K}
    for n in (2048, 4096, 8192):
        row = {}
        for dtype in ("bf16", "int8"):
            try:
                row[dtype] = time_chain(n, dtype)
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
