"""Produce the trained-quality evidence artifacts (run on the TPU chip).

Runs pcdiff.cli.evaluate three ways on configs/synthetic_quality.yaml:
  1. trained checkpoint, default (Pallas) attention backend;
  2. trained checkpoint, XLA attention backend — pins that the fused kernel
     does not change sample quality;
  3. untrained (fresh-init) weights — the contrast baseline.
Writes evaluation logs to cwd and a summary JSON + loss curve to docs/.

Usage: python scripts/quality_evidence.py <run_dir>
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(run_dir: str) -> None:
    from pcdiff.core.config import apply_overrides, load_config
    from pcdiff.cli.evaluate import main as eval_main
    from pcdiff.ops import set_attention_backend

    cfg = load_config(os.path.join(REPO, "configs", "synthetic_quality.yaml"), [])
    ckpt = os.path.join(run_dir, "checkpoints")

    results = {}

    cfg_trained = apply_overrides(cfg, [f"sample.load_checkpoint_path={ckpt}"])
    print("=== trained, pallas attention ===")
    results["trained_pallas"] = eval_main(cfg_trained)

    print("=== trained, xla attention ===")
    set_attention_backend("xla")
    try:
        results["trained_xla"] = eval_main(cfg_trained)
    finally:
        set_attention_backend("auto")

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
    results["untrained"] = eval_main(cfg_fresh)

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
    for k, v in out.items():
        o = v["overall"]
        print(f"{k}: cd_full={o['cd_full']:.6f} f1_full={o['f1_full']:.6f}")


if __name__ == "__main__":
    main(sys.argv[1])
