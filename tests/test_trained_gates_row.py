"""Pin the docs/trained_gates.json row schema (per-class columns +
checkpoint provenance, VERDICT r3 #3) without running an evaluation."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_gates_module():
    spec = importlib.util.spec_from_file_location(
        "trained_gates", os.path.join(REPO, "scripts", "trained_gates.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_make_gate_row_schema():
    mod = _load_gates_module()
    summary = {
        "overall": {"cd_full": 0.0034, "f1_full": 0.49, "cd_fps": 0.0034},
        "per_class": {
            "airplane": {"cd_full": 0.0028, "f1_full": 0.57, "count": 24},
            "car": {"cd_full": 0.0070, "f1_full": 0.22, "count": 24},
        },
    }
    overrides = ["model.compute_dtype=bfloat16", "sample.sampler=heun_reuse"]
    row = mod.make_gate_row(summary, overrides,
                            "/tmp/pcdiff_shapes_runs/run_19-08-2026_04-57/")
    assert row["cd_full"] == 0.0034 and row["f1_full"] == 0.49
    assert row["checkpoint"] == "run_19-08-2026_04-57"  # trailing / stripped
    assert row["overrides"] == overrides
    # per-class carries exactly cd/f1 per class (slim, JSON-stable)
    assert set(row["per_class"]) == {"airplane", "car"}
    assert row["per_class"]["car"] == {"cd_full": 0.0070, "f1_full": 0.22}


def test_gates_include_fast_stack_unit():
    mod = _load_gates_module()
    # rows are (name, overrides[, "ema"]) — the EMA rows restore the shadow
    # params from run_dir/ema instead of the raw checkpoint
    by_name = {row[0]: row[1] for row in mod.GATES}
    # the combined bf16 + guidance-interval + reuse @ 32 steps unit
    # (VERDICT r3 #2) must stay in the gate registry
    assert "bf16-gi-reuse-32" in by_name
    ov = by_name["bf16-gi-reuse-32"]
    assert "sample.karras_steps=32" in ov
    assert "model.compute_dtype=bfloat16" in ov
    # the EMA gate rows (VERDICT r4 task 6) restore the shadow params
    ema_rows = [row for row in mod.GATES if len(row) > 2 and row[2] == "ema"]
    assert {r[0] for r in ema_rows} == {"ema-baseline", "ema-bf16-gi-reuse"}
