"""ModelNet-derived completion dataset (the fork's primary training/eval data).

Schema and normalization parity with
``/root/reference/dataset/modelnet_dataloader.py:220-434``:

- H5 layout ``class/instance/{ground_truth, partials/scan_XXXX/{pointcloud,
  distance}}``, one sample per (instance, scan);
- hardcoded corrupt-instance skip list (train split only) and default
  ``skip_classes`` with remaining classes relabeled 0..K-1 in sorted order;
- the 36-entry viewpoint table — a 26-point azimuth ring at z=0.25 (15 deg
  steps) plus a 10-point elevation arc (x from 1 to -1 in 2/9 steps on the
  unit xz-circle, rounded to 6 decimals exactly as the reference hardcodes
  them) — with the ``[0, 2, 1]`` axis swap;
- per-item normalization: partial clamp +-0.5, depth / 255, ground truth
  * 0.01 then clamp +-0.5, random permutation of the ground-truth points.

Output layout is channels-last; depth maps gain a trailing channel axis
([H, W, 1]) to be NHWC for the conv patchifier.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Set

import numpy as np

__all__ = [
    "ModelNetCompletion",
    "DEFAULT_SKIP_CLASSES",
    "TRAIN_SKIP_INSTANCES",
    "build_viewpoint_table",
    "export_instance_ground_truths",
]

DEFAULT_SKIP_CLASSES = ("dresser", "table", "desk", "bed", "chair")

# Corrupt instances identified by the reference's H5 QA pass
# (modelnet_dataloader.py:227-248); dataset metadata, train split only.
TRAIN_SKIP_INSTANCES: Set[str] = {
    "car/car_0239", "car/car_0241",
    "chair/chair_0940",
    "desk/desk_0241",
    "dresser/dresser_0243", "dresser/dresser_0244", "dresser/dresser_0251",
    "guitar/guitar_0158", "guitar/guitar_0191", "guitar/guitar_0194",
    "guitar/guitar_0205", "guitar/guitar_0216",
    "airplane/airplane_0087", "airplane/airplane_0103",
    "airplane/airplane_0152", "airplane/airplane_0207",
    "airplane/airplane_0378", "airplane/airplane_0433",
    "airplane/airplane_0449", "airplane/airplane_0477",
    "airplane/airplane_0485", "airplane/airplane_0512",
}


def build_viewpoint_table() -> np.ndarray:
    """The scan-index -> camera-position table, axis-swapped to (x, z, y).

    scan_0000..0025: azimuth ring, (cos(15 deg * i), sin(15 deg * i), 0.25).
    scan_0026..0035: elevation arc on the unit xz-circle, x stepping 1 -> -1
    by 2/9, values rounded to 6 decimals (matching the reference's hardcoded
    constants digit-for-digit).
    """
    rows = []
    for i in range(26):
        a = math.radians(15.0 * i)
        rows.append((math.cos(a), math.sin(a), 0.25))
    # Quirks preserved verbatim from the reference constants (a trained model
    # conditions on these exact values): |x|=0.555556 rows carry z=0.831211,
    # which is NOT on the unit circle (sqrt(1-x^2)=0.831479 — an upstream
    # data-generation typo), and |x|=0.111111 rows are truncated (0.993807)
    # rather than rounded (0.993808).
    z_quirks = {0.555556: 0.831211, 0.111111: 0.993807}
    for i in range(10):
        x = round(1.0 - 2.0 * i / 9.0, 6)
        z = z_quirks.get(abs(x))
        if z is None:
            z = 0.0 if abs(x) == 1.0 else round(math.sqrt(1.0 - x * x), 6)
        rows.append((x, 0.0, z))
    table = np.asarray(rows, dtype=np.float32)
    return table[:, [0, 2, 1]]


class ModelNetCompletion:
    """Map-style dataset over (instance, scan) pairs in the completion H5."""

    def __init__(
        self,
        h5_path: str,
        split: str = "train",
        skip_classes: Optional[Sequence[str]] = DEFAULT_SKIP_CLASSES,
        keep_h5_open: bool = True,
    ):
        import h5py

        assert split in ("train", "test")
        self.h5_path = h5_path
        self.split = split
        self.skip_instances = TRAIN_SKIP_INSTANCES if split == "train" else set()
        self.viewpoints = build_viewpoint_table()
        self._h5 = h5py.File(h5_path, "r") if keep_h5_open else None

        self.samples: List[Dict] = []
        with h5py.File(h5_path, "r") as f:
            if skip_classes is not None:
                names = sorted(n for n in f.keys() if n not in skip_classes)
            else:
                names = list(f.keys())
            self.class_to_label = {cls: i for i, cls in enumerate(names)}

            for class_name in f.keys():
                if skip_classes and class_name in skip_classes:
                    continue
                for instance_id in f[class_name].keys():
                    if f"{class_name}/{instance_id}" in self.skip_instances:
                        continue
                    partials = f[class_name][instance_id]["partials"]
                    for scan_name in partials.keys():
                        scan_idx = int(scan_name.split("_")[-1])
                        base = f"{class_name}/{instance_id}"
                        self.samples.append(
                            dict(
                                class_name=class_name,
                                partial=f"{base}/partials/{scan_name}/pointcloud",
                                depth=f"{base}/partials/{scan_name}/distance",
                                target=f"{base}/ground_truth",
                                viewpoint_idx=scan_idx,
                            )
                        )

    def __len__(self) -> int:
        return len(self.samples)

    def _file(self):
        if self._h5 is not None:
            return self._h5
        import h5py

        return h5py.File(self.h5_path, "r")

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None) -> Dict[str, np.ndarray]:
        rng = rng or np.random.default_rng()
        s = self.samples[idx]
        f = self._file()
        try:
            partial = np.asarray(f[s["partial"]][()], dtype=np.float32)
            depth = np.asarray(f[s["depth"]][()], dtype=np.float32)
            target = np.asarray(f[s["target"]][()], dtype=np.float32)
        finally:
            if self._h5 is None:
                f.close()

        partial = np.clip(partial, -0.5, 0.5)
        depth = depth / 255.0
        target = np.clip(target * 0.01, -0.5, 0.5)
        target = target[rng.permutation(target.shape[0])]

        return dict(
            class_labels=np.int32(self.class_to_label[s["class_name"]]),
            partial_pcd=partial,
            depth_maps=depth[..., None],  # NHWC
            viewpoints=self.viewpoints[s["viewpoint_idx"]],
            target=target,
        )

    def close(self):
        if self._h5 is not None:
            self._h5.close()
            self._h5 = None


def export_instance_ground_truths(
    h5_path: str,
    skip_classes: Sequence[str] = DEFAULT_SKIP_CLASSES,
    npz_output: str = "modelnet_filtered_instances.npz",
    labels_output: str = "modelnet_filtered_labels.npz",
) -> Dict[str, np.ndarray]:
    """Export one normalized ground-truth cloud per kept instance.

    Builds the reference batch for distribution metrics (P-FID/P-IS): the
    reference's ``save_instance_ground_truths``
    (``/root/reference/dataset/modelnet_dataloader.py:517-560``) — classes
    outside ``skip_classes`` relabeled 0..K-1 in sorted order, ground truth
    scaled by 0.01 and clamped to +-0.5, point order left untouched.
    Labels are saved as npz (the reference used ``torch.save``; a plain
    integer array needs no torch dependency).
    """
    import h5py

    all_gt: List[np.ndarray] = []
    all_labels: List[int] = []
    with h5py.File(h5_path, "r") as f:
        names = sorted(n for n in f.keys() if n not in skip_classes)
        class_to_label = {cls: i for i, cls in enumerate(names)}
        for class_name in f.keys():
            if class_name in skip_classes:
                continue
            for instance_id in f[class_name].keys():
                gt = np.asarray(
                    f[class_name][instance_id]["ground_truth"][()],
                    dtype=np.float32,
                )
                all_gt.append(np.clip(gt * 0.01, -0.5, 0.5))
                all_labels.append(class_to_label[class_name])

    ground_truths = np.stack(all_gt)
    labels = np.asarray(all_labels, dtype=np.int64)
    np.savez_compressed(npz_output, ground_truths=ground_truths)
    np.savez_compressed(labels_output, labels=labels)
    return {"ground_truths": ground_truths, "labels": labels}
