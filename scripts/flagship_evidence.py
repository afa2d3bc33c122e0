"""Collect the flagship training run's evidence into docs/.

Copies the run's metrics JSONL to docs/flagship_train_metrics.jsonl and
renders docs/flagship_loss_curve.png (same smoothing/format as the
reduced-scale quality_evidence curve). Quality numbers for this run live in
docs/trained_gates_flagship.json (scripts/trained_gates.py --dest).

The 2026-08-20 run survived two tunnel outages via checkpoint resume, so
its metrics are split across several run dirs whose step axes overlap by
the (lost) steps trained past each resume point; pass the run dirs in
chronological order and later segments overwrite overlapping steps (the
lineage that actually fed the final checkpoint).

Usage: python scripts/flagship_evidence.py <run_dir> [run_dir2 ...]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(*run_dirs: str) -> None:
    by_step = {}
    for run_dir in run_dirs:
        for line in open(os.path.join(run_dir, "metrics.jsonl")):
            rec = json.loads(line)
            if "loss" in rec:
                by_step[rec["step"]] = rec
    dst = os.path.join(REPO, "docs", "flagship_train_metrics.jsonl")
    steps = sorted(by_step)
    with open(dst, "w") as f:
        for s in steps:
            f.write(json.dumps(by_step[s]) + "\n")
    losses = [by_step[s]["loss"] for s in steps]
    print(f"{len(losses)} steps; final-500 mean loss "
          f"{sum(losses[-500:]) / len(losses[-500:]):.5f}")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 3.5))
    ax.plot(losses, lw=0.4, alpha=0.4, color="#4477aa")
    win = 200
    if len(losses) > win:
        smooth = [sum(losses[i - win + 1:i + 1]) / win
                  for i in range(win - 1, len(losses))]
        ax.plot(range(win - 1, len(losses)), smooth, lw=1.5, color="#223366")
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.set_yscale("log")
    ax.set_title("flagship shapes run (1024 pts, 6 RCW blocks, dim 256)")
    fig.tight_layout()
    fig.savefig(os.path.join(REPO, "docs", "flagship_loss_curve.png"), dpi=110)
    print("wrote docs/flagship_loss_curve.png, docs/flagship_train_metrics.jsonl")


if __name__ == "__main__":
    main(*sys.argv[1:])
