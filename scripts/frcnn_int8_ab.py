"""Same-process A/B of the FRCNN int8 serving variants on hardware.

Round-5 question: `int8_full` (trunk AND tail quantized, static scales)
was AP-validated in r3 (ΔAP −0.003, scripts/int8_accuracy.py) but its
throughput was never measured with static calibrated scales — only the
tail-only variant (37.1 img/s vs 34.5 bf16, BENCH_r04/r5). If the
quantized trunk adds on top of the quantized tail, the serving `fast`
profile should compose it instead.

One process so all variants share the single tunnel first-fetch cost and
the same attachment (persistent-cache behavior is attachment-dependent,
STATUS.md round-5 note 6). Uses bench.py's own entry so the measurement
harness (fence amortization, MFU accounting) is identical to the driver
bench. Reference counterpart of the path: the reference has no int8
serving at all — this is TPU-only machinery (MXU 2x int8 rate).

Usage: python scripts/frcnn_int8_ab.py [iters]
Prints one JSON line per variant + a final summary line.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


VARIANTS = {
    "bf16": (),
    "int8_tail": ("model.base_network.int8_tail=True",
                  "model.base_network.int8_static=True"),
    "int8_full": ("model.base_network.int8_tail=True",
                  "model.base_network.int8_trunk=True",
                  "model.base_network.int8_static=True"),
    "int8_trunk": ("model.base_network.int8_trunk=True",
                   "model.base_network.int8_static=True"),
}


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = {}
    for name, overrides in VARIANTS.items():
        r = bench.bench_frcnn_inference(iters=iters, overrides=overrides)
        out[name] = r
        print(json.dumps({name: r}), flush=True)
    summary = {
        k: v.get("images_per_sec") for k, v in out.items()
    }
    print(json.dumps({"frcnn_int8_ab": summary}), flush=True)


if __name__ == "__main__":
    main()
