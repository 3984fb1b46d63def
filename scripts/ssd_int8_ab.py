"""A/B the SSD trunk dtype on hardware: bf16 vs int8-static.

Round 4's driver bench recorded ssd_inference 1583 img/s bf16 but
ssd_inference_int8 1366 img/s — int8 LOST, reversing the r3 result
(int8 1053 vs bf16 963). The r3 win was measured when the proposal
stage was slow for both paths; the r4 fused per-image proposal
(models/ssd/proposal.py) shrank the non-trunk time, so the trunk A/B
is now clean. This script isolates the comparison in one process
(same device, same tunnel first-fetch) to decide whether the SSD fast
profile should keep int8_trunk.

Run on the TPU attachment: python scripts/ssd_int8_ab.py
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def main():
    variants = [
        ("ssd_bf16", []),
        ("ssd_int8_static",
         ["model.base_network.int8_trunk=True",
          "model.base_network.int8_static=True"]),
        # The dynamic-quant variant separates lowering cost from
        # calibration cost.
        ("ssd_int8_dynamic", ["model.base_network.int8_trunk=True"]),
    ]
    results = {}
    for name, overrides in variants:
        # Print each result as it lands: a crash in a later variant
        # (e.g. a remote-compile payload error) must not lose the
        # hundreds of seconds of compile already spent on earlier ones.
        try:
            results[name] = bench.bench_ssd_inference(overrides=overrides)
        except Exception as e:  # noqa: BLE001 - record and continue
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
