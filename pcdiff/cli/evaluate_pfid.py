"""P-FID between two npz sample batches
(``/root/reference/evals/scripts/evaluate_pfid.py`` equivalent).

Usage: ``python -m pcdiff.cli.evaluate_pfid batch1.npz batch2.npz --checkpoint pointnet.pt``
"""

from __future__ import annotations

import argparse

from ..evals.feature_extractor import PointNetClassifier
from ..evals.fid_is import compute_statistics
from ..evals.npz_stream import NpzStreamer


def read_clouds(glob_path: str, batch_size: int, clf: PointNetClassifier):
    import numpy as np

    feats = []
    for batch in NpzStreamer(glob_path).stream(batch_size, ["arr_0"]):
        f, _ = clf.features_and_preds(batch["arr_0"])
        feats.append(f)
    return np.concatenate(feats, axis=0)


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("batch_1")
    parser.add_argument("batch_2")
    parser.add_argument("--checkpoint", required=True,
                        help="pretrained pointnet .pt checkpoint")
    parser.add_argument("--cache_dir", default=None)
    args = parser.parse_args()

    clf = PointNetClassifier(torch_checkpoint_path=args.checkpoint)
    print("computing first batch activations")
    feats_1 = read_clouds(args.batch_1, clf.batch_size, clf)
    print("computing second batch activations")
    feats_2 = read_clouds(args.batch_2, clf.batch_size, clf)
    stats_1, stats_2 = compute_statistics(feats_1), compute_statistics(feats_2)
    print(f"P-FID: {stats_1.frechet_distance(stats_2)}")


if __name__ == "__main__":
    main()
