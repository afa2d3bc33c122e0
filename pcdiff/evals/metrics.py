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
    """Per-sample (cd, f1) for [B, N, 3] clouds (threshold 0.03)."""
    cd = chamfer_distance_xyz(pred, gt)
    f1, _, _ = fscore(pred, gt, threshold=0.03)
    return cd, f1


class CompletionMetrics:
    """Accumulate CD/F1 per class over evaluation batches."""

    def __init__(self, fps_points: Optional[int] = 1024):
        self.fps_points = fps_points
        self._sums = defaultdict(lambda: np.zeros(5))  # cd, f1, cd_fps, f1_fps, n

    def update(self, pred: np.ndarray, gt: np.ndarray, class_labels: np.ndarray):
        """pred/gt: [B, N, 3] (pred pre-clamped to +-0.5 by the caller)."""
        cd, f1 = batch_cd_f1(jnp.asarray(pred), jnp.asarray(gt))
        cd, f1 = np.asarray(cd), np.asarray(f1)
        if self.fps_points is not None and pred.shape[1] > self.fps_points:
            pred_fps = fps(jnp.asarray(pred), self.fps_points, deterministic=True)
            cd_fps, f1_fps = batch_cd_f1(pred_fps, jnp.asarray(gt))
            cd_fps, f1_fps = np.asarray(cd_fps), np.asarray(f1_fps)
        else:
            cd_fps, f1_fps = cd, f1
        for i, label in enumerate(np.asarray(class_labels)):
            self._sums[int(label)] += [cd[i], f1[i], cd_fps[i], f1_fps[i], 1.0]

    def summary(self, class_names: Optional[Dict[int, str]] = None) -> Dict:
        per_class = {}
        total = np.zeros(5)
        for label, sums in sorted(self._sums.items()):
            total += sums
            name = class_names.get(label, str(label)) if class_names else str(label)
            n = sums[4]
            per_class[name] = dict(
                cd_full=sums[0] / n, f1_full=sums[1] / n,
                cd_fps=sums[2] / n, f1_fps=sums[3] / n, count=int(n),
            )
        n = max(total[4], 1.0)
        return dict(
            overall=dict(
                cd_full=total[0] / n, f1_full=total[1] / n,
                cd_fps=total[2] / n, f1_fps=total[3] / n, count=int(total[4]),
            ),
            per_class=per_class,
        )
