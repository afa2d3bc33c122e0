"""Pin bench.py's driver-facing JSON record.

BENCH_r*.json is the round's official performance artifact; these tests
pin the metric name, the vs_baseline guard (64-step Heun only — the only
setting with an apples-to-apples reference baseline, BASELINE.md), and
JSON-serializability, so env-knob additions can't silently corrupt the
record the driver parses.
"""

import importlib.util
import json
import os

import pytest


@pytest.fixture(scope="module")
def bench():
    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)  # module body imports only stdlib + numpy
    return mod


def test_default_headline_record(bench):
    rec = bench.make_record(3.7, 64, "bfloat16", "heun", 500.0)
    assert rec["metric"] == "sampling_throughput_1024pt_64step_cfg"
    assert rec["value"] == 3.7
    assert rec["unit"] == "clouds/sec"
    assert rec["dtype"] == "bfloat16"
    assert rec["steps"] == 64
    assert rec["wall_s"] == 500.0
    assert rec["vs_baseline"] == round(3.7 / (32.0 / 276.0), 2)
    assert rec["batch"] == 32  # default; PCDIFF_BENCH_BATCH is disclosed
    json.dumps(rec)  # one parseable line is the whole contract


def test_fast_preset_has_no_baseline_ratio(bench):
    rec = bench.make_record(7.08, 32, "bfloat16", "heun", 400.0)
    assert rec["metric"] == "sampling_throughput_1024pt_32step_cfg"
    assert rec["vs_baseline"] is None


def test_reuse_solver_tags_metric_and_keeps_ratio(bench):
    # heun_reuse is quality-gated neutral at the same 64-step sigma grid
    # (docs/trained_gates.json "bf16-reuse"), so the task-level baseline
    # ratio applies; the metric name still discloses the solver.
    rec = bench.make_record(8.0, 64, "bfloat16", "heun_reuse", 450.0)
    assert rec["metric"] == "sampling_throughput_1024pt_64step_cfg_heun_reuse"
    assert rec["vs_baseline"] == round(8.0 / (32.0 / 276.0), 2)
    json.dumps(rec)


def test_gated_guidance_interval_keeps_ratio(bench):
    # The [0.1, 10] interval is quality-gated as a unit with bf16+reuse
    # (docs/trained_gates.json "bf16-gi-reuse"), so the ratio applies;
    # any other interval is an ungated program and reports null.
    rec = bench.make_record(11.0, 64, "bfloat16",
                            "heun_reuse_gi0.1-10.0", 400.0)
    assert rec["metric"] == (
        "sampling_throughput_1024pt_64step_cfg_heun_reuse_gi0.1-10.0"
    )
    assert rec["vs_baseline"] == round(11.0 / (32.0 / 276.0), 2)
    rec = bench.make_record(11.0, 64, "bfloat16",
                            "heun_reuse_gi0.05-25.0", 400.0)
    assert rec["vs_baseline"] is None
    json.dumps(rec)


def test_other_solvers_null_ratio(bench):
    rec = bench.make_record(8.0, 64, "bfloat16", "heun_parallel", 450.0)
    assert rec["metric"] == "sampling_throughput_1024pt_64step_cfg_heun_parallel"
    assert rec["vs_baseline"] is None
    rec = bench.make_record(9.0, 32, "bfloat16", "heun_reuse", 450.0)
    assert rec["vs_baseline"] is None  # reuse at a different grid: no ratio


def test_batch_field_disclosed(bench):
    rec = bench.make_record(15.0, 64, "bfloat16", "heun_reuse", 450.0,
                            batch=64)
    assert rec["batch"] == 64
    assert rec["vs_baseline"] == round(15.0 / (32.0 / 276.0), 2)
    json.dumps(rec)


def test_value_rounding(bench):
    rec = bench.make_record(4.130001, 64, "float32", "heun", 501.96)
    assert rec["value"] == 4.13
    assert rec["wall_s"] == 502.0


def test_mfu_field(bench):
    # 10.968 clouds/s at batch 32 with 169 TFLOP per batch -> 58 TFLOP/s
    # achieved -> ~29% of the 197 TFLOP/s v5e bf16 peak (VERDICT r3 #4).
    flops = int(169e12)
    rec = bench.make_record(10.968, 64, "bfloat16",
                            "heun_reuse_gi0.1-10.0", 700.0,
                            flops_per_batch=flops)
    achieved = flops * 10.968 / 32
    assert rec["mfu"] == round(achieved / bench.V5E_PEAK_FLOPS, 4)
    assert rec["flops_per_batch"] == flops
    assert rec["peak_tflops"] == 197.0
    json.dumps(rec)


def test_mfu_absent_without_flops(bench):
    rec = bench.make_record(10.0, 64, "bfloat16", "heun_reuse", 500.0)
    assert "mfu" not in rec and "flops_per_batch" not in rec
    json.dumps(rec)
