"""Inference-throughput sweep over RPN proposal counts and batch sizes.

VERDICT item 9: the ROI tail (block4 over post-NMS proposals) is ~half of
inference time; this measures what cutting predict-time proposals and
growing the batch actually buys on the chip. Run on TPU:

    python scripts/sweep_proposals.py [quick]

Each configuration recompiles (different static shapes), so a full sweep
takes a while; `quick` runs the three most informative points.
"""

import json
import sys

sys.path.insert(0, ".")

from bench import bench_frcnn_inference, _tunnel_sync  # noqa: E402


def main():
    quick = len(sys.argv) > 1 and sys.argv[1] == "quick"

    from luminoth_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    first_fetch = _tunnel_sync()
    print(json.dumps({"tunnel_first_fetch_s": round(first_fetch, 1)}),
          flush=True)

    points = [
        # (batch, post_nms_top_n, pre_nms_top_n)
        (8, 2000, 12000),   # default (reference parity)
        (8, 1000, 6000),    # the reference zoo's lighter settings
        (8, 300, 6000),     # serving-oriented
        (16, 2000, 12000),  # batch scaling at parity settings
        (16, 1000, 6000),
    ]
    if quick:
        points = [points[0], points[1], points[3]]

    for batch, post_nms, pre_nms in points:
        result = bench_frcnn_inference(
            batch=batch,
            overrides=[
                f"model.rpn.proposals.post_nms_top_n={post_nms}",
                f"model.rpn.proposals.pre_nms_top_n={pre_nms}",
            ],
        )
        result["post_nms_top_n"] = post_nms
        result["pre_nms_top_n"] = pre_nms
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
