"""Quality-gate the bf16-activations lever on the trained fixture checkpoint.

Evaluates the checkpoint trained by configs/synthetic_quality.yaml with
``model.compute_dtype=bfloat16`` (params stay fp32; all activations/matmuls
compute in bf16) and prints CD/F1 next to the fp32 numbers from
docs/quality_evidence.json. The reference has no such mode (fp32-only,
SURVEY.md section 2.5); this gates a throughput lever, not a parity surface.

Usage: python scripts/bf16_experiment.py <run_dir> [config.yaml] [test_h5]
  defaults: configs/synthetic_quality.yaml, the config's own data.h5_path
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main(run_dir: str, config_path: str | None = None,
         test_h5: str | None = None) -> None:
    from pcdiff.core.config import apply_overrides, load_config
    from pcdiff.cli.evaluate import main as eval_main

    cfg = load_config(
        config_path or os.path.join(REPO, "configs", "synthetic_quality.yaml"),
        [],
    )
    ckpt = os.path.join(run_dir, "checkpoints")
    overrides = [
        f"sample.load_checkpoint_path={ckpt}",
        "model.compute_dtype=bfloat16",
    ]
    if test_h5:
        overrides.append(f"data.h5_path={test_h5}")
    cfg = apply_overrides(cfg, overrides)
    result = eval_main(cfg)

    evidence_path = os.path.join(REPO, "docs", "quality_evidence.json")
    fp32 = None
    if os.path.exists(evidence_path):
        with open(evidence_path) as f:
            fp32 = json.load(f).get("trained_pallas", {}).get("overall")

    o = result["overall"]
    print(f"bf16: cd_full={o['cd_full']:.6f} f1_full={o['f1_full']:.6f}")
    if fp32:
        print(f"fp32: cd_full={fp32['cd_full']:.6f} f1_full={fp32['f1_full']:.6f}")
        print(
            f"delta: cd {o['cd_full'] - fp32['cd_full']:+.6f} "
            f"({(o['cd_full'] / fp32['cd_full'] - 1) * 100:+.2f}%), "
            f"f1 {o['f1_full'] - fp32['f1_full']:+.6f} "
            f"({(o['f1_full'] / max(fp32['f1_full'], 1e-12) - 1) * 100:+.2f}%)"
        )


if __name__ == "__main__":
    main(sys.argv[1],
         sys.argv[2] if len(sys.argv) > 2 else None,
         sys.argv[3] if len(sys.argv) > 3 else None)
