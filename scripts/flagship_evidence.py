"""Collect the flagship training run's evidence into docs/.

Copies the run's metrics JSONL to docs/flagship_train_metrics.jsonl and
renders docs/flagship_loss_curve.png (same smoothing/format as the
reduced-scale quality_evidence curve). Quality numbers for this run live in
docs/trained_gates_flagship.json (scripts/trained_gates.py --dest).

Usage: python scripts/flagship_evidence.py <run_dir>
"""

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(run_dir: str) -> None:
    src = os.path.join(run_dir, "metrics.jsonl")
    dst = os.path.join(REPO, "docs", "flagship_train_metrics.jsonl")
    shutil.copyfile(src, dst)
    losses = [json.loads(l)["loss"] for l in open(src) if '"loss"' in l]
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
    main(sys.argv[1])
