"""P-IS (inception score) of an npz sample batch
(``/root/reference/evals/scripts/evaluate_pis.py`` equivalent).

Usage: ``python -m pcdiff.cli.evaluate_pis batch.npz --checkpoint pointnet.pt``
"""

from __future__ import annotations

import argparse

import numpy as np

from ..evals.feature_extractor import PointNetClassifier
from ..evals.fid_is import compute_inception_score
from ..evals.npz_stream import NpzStreamer


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("batch")
    parser.add_argument("--checkpoint", required=True)
    args = parser.parse_args()

    clf = PointNetClassifier(torch_checkpoint_path=args.checkpoint)
    preds = []
    for batch in NpzStreamer(args.batch).stream(clf.batch_size, ["arr_0"]):
        _, p = clf.features_and_preds(batch["arr_0"])
        preds.append(p)
    print(f"P-IS: {compute_inception_score(np.concatenate(preds, axis=0))}")


if __name__ == "__main__":
    main()
