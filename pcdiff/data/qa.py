"""Dataset integrity / QA audits for the completion H5 files.

The reference embeds these as ad-hoc functions in its ModelNet loader module
(``/root/reference/dataset/modelnet_dataloader.py:43-216``): value-range and
moment checks per class, scan-count/shape integrity, and detection of
instances with missing or incomplete partial scans. Same checks, structured
as a report.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["audit_modelnet_h5", "H5AuditReport"]


@dataclass
class H5AuditReport:
    value_ranges: Dict[str, Dict[str, Tuple[float, float]]] = field(default_factory=dict)
    moments: Dict[str, Dict[str, Tuple[float, float]]] = field(default_factory=dict)
    scan_counts: Dict[str, List[int]] = field(default_factory=dict)
    incomplete_instances: List[str] = field(default_factory=list)
    bad_shapes: List[str] = field(default_factory=list)

    def ok(self) -> bool:
        return not self.incomplete_instances and not self.bad_shapes


def audit_modelnet_h5(
    h5_path: str,
    expected_points: Optional[int] = None,
    expected_scans: Optional[int] = None,
    max_instances_per_class: Optional[int] = None,
) -> H5AuditReport:
    """Audit a ModelNet-completion H5 for the defects the reference's skip
    lists were built to work around."""
    import h5py

    report = H5AuditReport()
    with h5py.File(h5_path, "r") as f:
        for cls in f.keys():
            gmin, gmax = np.inf, -np.inf
            pmin, pmax = np.inf, -np.inf
            means, variances = [], []
            counts = []
            for i, inst in enumerate(f[cls].keys()):
                if max_instances_per_class and i >= max_instances_per_class:
                    break
                grp = f[cls][inst]
                key = f"{cls}/{inst}"
                if "ground_truth" not in grp or "partials" not in grp:
                    report.incomplete_instances.append(key)
                    continue
                gt = grp["ground_truth"][()]
                if expected_points and gt.shape[0] != expected_points:
                    report.bad_shapes.append(f"{key}/ground_truth{gt.shape}")
                gmin, gmax = min(gmin, float(gt.min())), max(gmax, float(gt.max()))
                means.append(float(gt.mean()))
                variances.append(float(gt.var()))
                scans = list(grp["partials"].keys())
                counts.append(len(scans))
                if expected_scans and len(scans) != expected_scans:
                    report.incomplete_instances.append(key)
                for s in scans:
                    sg = grp["partials"][s]
                    if "pointcloud" not in sg or "distance" not in sg:
                        report.incomplete_instances.append(f"{key}/{s}")
                        continue
                    pc = sg["pointcloud"]
                    if expected_points and pc.shape[0] != expected_points:
                        report.bad_shapes.append(f"{key}/{s}{pc.shape}")
                    pmin = min(pmin, float(pc[()].min()))
                    pmax = max(pmax, float(pc[()].max()))
            report.value_ranges[cls] = {
                "ground_truth": (gmin, gmax), "partials": (pmin, pmax)
            }
            if means:
                report.moments[cls] = {
                    "mean": (float(np.mean(means)), float(np.std(means))),
                    "var": (float(np.mean(variances)), float(np.std(variances))),
                }
            report.scan_counts[cls] = counts
    return report
