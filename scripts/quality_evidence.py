"""Produce the trained-quality evidence artifacts (run on the TPU chip).

Runs pcdiff.cli.evaluate three ways on configs/synthetic_quality.yaml:
  1. trained checkpoint, default (Pallas) attention backend;
  2. trained checkpoint, XLA attention backend — pins that the fused kernel
     does not change sample quality;
  3. untrained (fresh-init) weights — the contrast baseline.
Writes evaluation logs to cwd and a summary JSON + loss curve to docs/.

Usage: python scripts/quality_evidence.py <run_dir>
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rename_newest_log(stable_name: str, before: set) -> None:
    """Give the evaluate CLI's timestamped log a stable, committable name."""
    new = sorted(set(glob.glob("evaluation_log_*.txt")) - before, key=os.path.getmtime)
    if new:
        os.replace(new[-1], os.path.join(REPO, "docs", "evidence", stable_name))


def _export_training_artifacts(run_dir: str) -> None:
    """Copy the run's per-step metrics + render the loss curve into docs/."""
    import shutil

    src = os.path.join(run_dir, "metrics.jsonl")
    if os.path.exists(src):
        shutil.copy(src, os.path.join(REPO, "docs", "quality_train_metrics.jsonl"))
        losses = [json.loads(line)["loss"] for line in open(src)]
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(7, 3.5))
            ax.plot(losses, lw=0.6, alpha=0.5, color="#4477aa")
            win = max(1, len(losses) // 100)
            import numpy as _np

            smooth = _np.convolve(losses, _np.ones(win) / win, mode="valid")
            ax.plot(range(win - 1, len(losses)), smooth, lw=1.5, color="#223366")
            ax.set_xlabel("train step")
            ax.set_ylabel("loss")
            ax.set_yscale("log")
            fig.tight_layout()
            fig.savefig(os.path.join(REPO, "docs", "quality_loss_curve.png"), dpi=110)
            print("wrote docs/quality_loss_curve.png")
        except ImportError:
            pass


def main(run_dir: str) -> None:
    from pcdiff.core.config import apply_overrides, load_config
    from pcdiff.cli.evaluate import main as eval_main
    from pcdiff.ops import set_attention_backend

    cfg = load_config(os.path.join(REPO, "configs", "synthetic_quality.yaml"), [])
    ckpt = os.path.join(run_dir, "checkpoints")

    results = {}

    cfg_trained = apply_overrides(cfg, [f"sample.load_checkpoint_path={ckpt}"])
    print("=== trained, pallas attention ===")
    seen = set(glob.glob("evaluation_log_*.txt"))
    results["trained_pallas"] = eval_main(cfg_trained)
    _rename_newest_log("evaluation_log_trained.txt", seen)

    print("=== trained, xla attention ===")
    set_attention_backend("xla")
    seen = set(glob.glob("evaluation_log_*.txt"))
    try:
        results["trained_xla"] = eval_main(cfg_trained)
    finally:
        set_attention_backend("auto")
    _rename_newest_log("evaluation_log_trained_xla_attention.txt", seen)

    print("=== untrained (fresh init) ===")
    # load_params requires a checkpoint; evaluate untrained by saving a
    # fresh-init state once
    import jax

    from pcdiff.cli.train import build_model, init_params
    from pcdiff.core.checkpoint import save_checkpoint
    from pcdiff.train import create_train_state

    model = build_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(123))
    state = create_train_state(model, params, lr=1e-4, total_steps=1)
    fresh_dir = "/tmp/pcdiff_quality_fresh"
    save_checkpoint(fresh_dir, 0, jax.device_get(state))
    cfg_fresh = apply_overrides(cfg, [f"sample.load_checkpoint_path={fresh_dir}"])
    seen = set(glob.glob("evaluation_log_*.txt"))
    results["untrained"] = eval_main(cfg_fresh)
    _rename_newest_log("evaluation_log_untrained_baseline.txt", seen)

    out = {
        k: {
            "overall": v["overall"],
            "per_class": v["per_class"],
        }
        for k, v in results.items()
    }
    dest = os.path.join(REPO, "docs", "quality_evidence.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {dest}")

    _export_training_artifacts(run_dir)
    for k, v in out.items():
        o = v["overall"]
        print(f"{k}: cd_full={o['cd_full']:.6f} f1_full={o['f1_full']:.6f}")


if __name__ == "__main__":
    main(sys.argv[1])
