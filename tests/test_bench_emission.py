"""The bench's stdout contract with the driver.

The driver captures only the TAIL of bench.py's stdout (a few KB) and
json-parses the LAST line. Round 4 lost a full suite of verified
numbers because the final line embedded the whole detail dict, grew
past the capture window, and was truncated mid-line (BENCH_r04.json:
rc=0, parsed=null). These tests pin the contract: the final stdout
line stays compact and parseable no matter how much detail the suite
accumulates.
"""

import importlib.util
import json
import pathlib

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _full_detail():
    # A detail dict at least as large as a complete round-4 run,
    # including the big per-entry sub-dicts the compact line must NOT
    # inline.
    entry = {
        "images_per_sec": 34.392, "batch": 8, "input": [608, 800],
        "compile_s": 477.7, "batch_latency_ms": 232.6,
        "tflops_per_step": 23.85, "mfu": 0.5205,
    }
    detail = {
        "budget_s": 1200.0,
        "skipped_for_budget": ["fasterrcnn_train_pipeline", "loader_scaling"],
        "entry_wall_s": {f"entry_{i}": 100.0 + i for i in range(12)},
        "device": "TPU v5 lite0",
        "h2d_clean_MBps": 1704.0,
        "tunnel_first_fetch_s": 483.1,
        "h2d_poisoned_MBps": 26.8,
    }
    for key in [
        "fasterrcnn_inference", "fasterrcnn_train", "ssd_train",
        "ssd_inference", "fasterrcnn_inference_int8_tail",
        "ssd_inference_int8", "ssd_inference_b128",
        "ssd_inference_int8_b128", "fasterrcnn_inference_serving1000",
        "fasterrcnn_inference_evalnms", "mesh_singlechip_gspmd",
        "fasterrcnn_eval", "fasterrcnn_train_pipeline",
    ]:
        detail[key] = dict(entry)
    detail["fasterrcnn_serving_fast_profile"] = {
        "p50_ms": 126.8, "p90_ms": 152.3, "first_call_s": 3.4,
        "input": [480, 640], "transfer": "uint8",
    }
    return detail


def test_final_line_is_compact_and_parseable():
    bench = _load_bench()
    snap = bench._Snapshot(_full_detail())
    snap.value = 34.392
    line = snap.to_json()
    # Well under any plausible tail-capture window.
    assert len(line) < 1000, f"final line too long: {len(line)}"
    parsed = json.loads(line)
    assert parsed["metric"] == "fasterrcnn_r101_coco_inference_throughput"
    assert parsed["value"] == 34.392
    assert parsed["unit"] == "images/sec/chip"
    assert parsed["vs_baseline"] == round(34.392 / 1.6, 2)
    # The summary carries the key secondary numbers without the bulk.
    assert parsed["summary"]["frcnn_int8"] == 34.392
    assert parsed["summary"]["skipped"] == 2
    # The full detail must NOT be inlined.
    assert "detail" not in parsed


def test_final_line_parseable_even_on_error():
    bench = _load_bench()
    detail = {"budget_s": 1200.0, "skipped_for_budget": [],
              "entry_wall_s": {},
              "error": "accelerator unavailable: " + "x" * 500}
    snap = bench._Snapshot(detail)
    line = snap.to_json()
    assert len(line) < 1000
    parsed = json.loads(line)
    assert parsed["value"] == 0.0
    assert "accelerator unavailable" in parsed["summary"]["error"]


def test_emit_writes_full_detail_to_partial_file(tmp_path, monkeypatch):
    bench = _load_bench()
    monkeypatch.chdir(tmp_path)
    snap = bench._Snapshot(_full_detail())
    snap.value = 34.392
    snap.emit()
    # One JSON document: json.load() on the file must keep working.
    with open(tmp_path / "BENCH_partial.json") as f:
        doc = json.load(f)
    assert doc["detail"]["fasterrcnn_inference"]["mfu"] == 0.5205
    assert doc["result"]["value"] == 34.392


def test_failed_entries_surface_in_summary():
    bench = _load_bench()
    detail = _full_detail()
    detail["ssd_inference"] = {"error": "RuntimeError: chip on fire"}
    snap = bench._Snapshot(detail)
    snap.value = 34.392
    parsed = json.loads(snap.to_json())
    # A raised entry is distinguishable from one never run.
    assert parsed["summary"]["failed"] == ["ssd_inference"]
    assert "ssd_inf" not in parsed["summary"]
    assert len(snap.to_json()) < 1000
