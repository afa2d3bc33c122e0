"""Completion metrics aggregation (CD / F1, overall and per-class).

The jitted math lives in :mod:`pcdiff.geometry.ops`; this module mirrors the
reference evaluation driver's accumulation logic
(``/root/reference/evaluation.py:115-194``): full-resolution squared-L2
chamfer + F1@0.03 per batch, optional FPS-to-1024 variants for >1024-point
samples, per-class and overall means.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.fps import fps
from ..geometry.ops import chamfer_distance_xyz, fscore

__all__ = ["CompletionMetrics", "batch_cd_f1"]


@jax.jit
def batch_cd_f1(pred: jnp.ndarray, gt: jnp.ndarray):
    """Per-sample (cd, f1, f1_squared) for [B, N, 3] clouds.

    f1 at Euclidean threshold 0.03; f1_squared at squared threshold 1e-4
    (the reference's commented-out variant columns, evaluation.py:145-147 /
    models/util.py:231-262).
    """
    from ..geometry.ops import fscore_squared

    cd = chamfer_distance_xyz(pred, gt)
    f1, _, _ = fscore(pred, gt, threshold=0.03)
    f1_sq, _, _ = fscore_squared(pred, gt, threshold=1e-4)
    return cd, f1, f1_sq


class CompletionMetrics:
    """Accumulate CD/F1 per class over evaluation batches."""

    def __init__(self, fps_points: Optional[int] = 1024):
        self.fps_points = fps_points
        # cd, f1, f1_squared, cd_fps, f1_fps, n
        self._sums = defaultdict(lambda: np.zeros(6))

    def update(self, pred: np.ndarray, gt: np.ndarray, class_labels: np.ndarray):
        """pred/gt: [B, N, 3] (pred pre-clamped to +-0.5 by the caller)."""
        cd, f1, f1_sq = batch_cd_f1(jnp.asarray(pred), jnp.asarray(gt))
        cd, f1, f1_sq = np.asarray(cd), np.asarray(f1), np.asarray(f1_sq)
        if self.fps_points is not None and pred.shape[1] > self.fps_points:
            pred_fps = fps(jnp.asarray(pred), self.fps_points, deterministic=True)
            cd_fps, f1_fps, _ = batch_cd_f1(pred_fps, jnp.asarray(gt))
            cd_fps, f1_fps = np.asarray(cd_fps), np.asarray(f1_fps)
        else:
            cd_fps, f1_fps = cd, f1
        for i, label in enumerate(np.asarray(class_labels)):
            self._sums[int(label)] += [
                cd[i], f1[i], f1_sq[i], cd_fps[i], f1_fps[i], 1.0
            ]

    def summary(self, class_names: Optional[Dict[int, str]] = None) -> Dict:
        def row(sums):
            n = sums[5]
            return dict(
                cd_full=sums[0] / n, f1_full=sums[1] / n,
                f1_squared_full=sums[2] / n,
                cd_fps=sums[3] / n, f1_fps=sums[4] / n, count=int(n),
            )

        per_class = {}
        total = np.zeros(6)
        for label, sums in sorted(self._sums.items()):
            total += sums
            name = class_names.get(label, str(label)) if class_names else str(label)
            per_class[name] = row(sums)
        total[5] = max(total[5], 1.0)
        return dict(overall=row(total), per_class=per_class)
