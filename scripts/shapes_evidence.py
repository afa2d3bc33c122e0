"""Generalization-quality evidence: train on geometric shapes, evaluate on
UNSEEN instances (run on the TPU chip).

The synthetic_quality fixture proves the pipeline converges (memorization of
random clouds); this experiment proves the framework *learns*: parametric
shape classes with per-instance variation (pcdiff.data.make_shapes_fixture),
train and test instance sets drawn disjointly, evaluation strictly on shapes
the model never saw. Three numbers per metric:

  1. trained model on held-out instances;
  2. untrained (fresh-init) model — the noise floor;
  3. copy-the-partial baseline — what "just echo the input scan" scores
     (the reference task's trivial competitor).

Writes docs/shapes_evidence.json, docs/evidence/evaluation_log_shapes{,_untrained}.txt,
and leaves the run dir under /tmp/pcdiff_shapes_runs.

Usage: python scripts/shapes_evidence.py [run_dir]
  (without run_dir: generates fixtures and trains first)
"""

import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN_H5 = "/tmp/pcdiff_shapes_train.h5"
TEST_H5 = "/tmp/pcdiff_shapes_test.h5"


def _rename_newest_log(stable_name: str, before: set) -> None:
    new = sorted(set(glob.glob("evaluation_log_*.txt")) - before, key=os.path.getmtime)
    if new:
        os.replace(new[-1], os.path.join(REPO, "docs", "evidence", stable_name))


def _make_fixtures() -> None:
    from pcdiff.data import make_shapes_fixture

    make_shapes_fixture(TRAIN_H5, instances_per_class=32, seed=0)
    make_shapes_fixture(TEST_H5, instances_per_class=4, seed=9)
    print(f"wrote {TRAIN_H5}, {TEST_H5}")


def _partial_copy_baseline(cfg) -> dict:
    """CD/F1 of echoing the (clamped) partial scan as the prediction."""
    import numpy as np

    from pcdiff.data import BatchLoader, ModelNetCompletion
    from pcdiff.evals import CompletionMetrics

    dataset = ModelNetCompletion(TEST_H5, split="test")
    label_to_class = {v: k for k, v in dataset.class_to_label.items()}
    loader = BatchLoader(dataset, cfg.sample.num_samples, shuffle=False,
                         seed=cfg.train.seed, drop_last=False)
    metrics = CompletionMetrics(fps_points=1024)
    for batch in loader:
        pred = np.clip(batch["partial_pcd"], -0.5, 0.5)
        metrics.update(pred, batch["target"], batch["class_labels"])
    return metrics.summary(class_names=label_to_class)


def main(run_dir: str | None = None, overrides: list[str] | None = None) -> None:
    from pcdiff.core.config import apply_overrides, load_config
    from pcdiff.cli.evaluate import main as eval_main

    cfg = load_config(os.path.join(REPO, "configs", "synthetic_shapes.yaml"),
                      list(overrides or []))

    if run_dir is None:
        _make_fixtures()
        from pcdiff.cli.train import main as train_main

        train_main(cfg)
        run_dir = max(glob.glob(os.path.join(cfg.train.output_dir, "run_*")),
                      key=os.path.getmtime)
    print(f"run_dir: {run_dir}")

    results = {}
    ckpt = os.path.join(run_dir, "checkpoints")
    eval_overrides = [f"data.h5_path={TEST_H5}"]

    cfg_trained = apply_overrides(
        cfg, eval_overrides + [f"sample.load_checkpoint_path={ckpt}"]
    )
    print("=== trained, held-out instances ===")
    seen = set(glob.glob("evaluation_log_*.txt"))
    results["trained_heldout"] = eval_main(cfg_trained)
    _rename_newest_log("evaluation_log_shapes.txt", seen)

    print("=== untrained (fresh init), held-out instances ===")
    import jax

    from pcdiff.cli.train import build_model, init_params
    from pcdiff.core.checkpoint import save_checkpoint
    from pcdiff.train import create_train_state

    model = build_model(cfg)
    params = init_params(model, cfg, jax.random.PRNGKey(123))
    state = create_train_state(model, params, lr=1e-4, total_steps=1)
    fresh_dir = "/tmp/pcdiff_shapes_fresh"
    shutil.rmtree(fresh_dir, ignore_errors=True)  # stale trees don't restore
    save_checkpoint(fresh_dir, 0, jax.device_get(state))
    cfg_fresh = apply_overrides(
        cfg, eval_overrides + [f"sample.load_checkpoint_path={fresh_dir}"]
    )
    seen = set(glob.glob("evaluation_log_*.txt"))
    results["untrained"] = eval_main(cfg_fresh)
    _rename_newest_log("evaluation_log_shapes_untrained.txt", seen)

    print("=== copy-the-partial baseline ===")
    results["partial_copy"] = _partial_copy_baseline(cfg)

    out = {k: {"overall": v["overall"], "per_class": v["per_class"]}
           for k, v in results.items()}
    dest = os.path.join(REPO, "docs", "shapes_evidence.json")
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {dest}")
    for k, v in out.items():
        o = v["overall"]
        print(f"{k}: cd_full={o['cd_full']:.6f} f1_full={o['f1_full']:.6f}")


if __name__ == "__main__":
    # usage: shapes_evidence.py [run_dir|-] [key=value overrides...]
    run_arg = sys.argv[1] if len(sys.argv) > 1 and "=" not in sys.argv[1] else None
    if run_arg == "-":
        run_arg = None
    main(run_arg, [a for a in sys.argv[1:] if "=" in a])
