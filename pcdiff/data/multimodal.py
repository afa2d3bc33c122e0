"""ShapeNet-derived multimodal completion dataset.

Parity with ``/root/reference/dataset/multimodal_dataloader.py:36-119``:
H5 layout ``obj_type/obj_id/{points, depth_maps, viewpoints, target_points}``
with 154 scans per object; 40 scans subsampled per object via ``linspace``;
precomputed normalization constants (depth [0, 255], viewpoint max-abs
2.87765) with an optional recompute pass; random permutation of the target.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

__all__ = ["MultiModalCompletion", "SHAPENET_LABEL_DICT"]

SHAPENET_LABEL_DICT = {
    "airplane": 1, "cabinet": 2, "car": 3, "chair": 4, "lamp": 5, "sofa": 6,
    "table": 7, "watercraft": 8, "bed": 9, "bench": 10, "bookshelf": 11,
    "bus": 12, "guitar": 13, "motorbike": 14, "pistol": 15, "skateboard": 16,
}

DEFAULT_SKIP = (("car", "car_974"), ("car", "car_975"), ("car", "car_976"))


class MultiModalCompletion:
    """Map-style dataset over (object, scan) pairs in the multimodal H5."""

    def __init__(
        self,
        h5_path: str,
        num_scans: int = 154,
        scans_per_object: int = 40,
        depth_min: Optional[float] = 0.0,
        depth_max: Optional[float] = 255.0,
        viewpoints_max_abs: Optional[float] = 2.87765,
        skip_list=DEFAULT_SKIP,
        keep_h5_open: bool = True,
    ):
        import h5py

        self.h5_path = h5_path
        self.depth_min = depth_min
        self.depth_max = depth_max
        self.viewpoints_max_abs = viewpoints_max_abs
        self.skip_list = set(tuple(x) for x in skip_list)
        self._h5 = h5py.File(h5_path, "r") if keep_h5_open else None

        self.index: List[Tuple[str, str, int]] = []
        with h5py.File(h5_path, "r") as f:
            for obj_type in f.keys():
                for obj_id in f[obj_type].keys():
                    if (obj_type, obj_id) in self.skip_list:
                        continue
                    for i in np.linspace(0, num_scans - 1, scans_per_object, dtype=int):
                        self.index.append((obj_type, obj_id, int(i)))

        if self.depth_min is None or self.depth_max is None or self.viewpoints_max_abs is None:
            self._compute_normalization_stats()

    def _file(self):
        if self._h5 is not None:
            return self._h5
        import h5py

        return h5py.File(self.h5_path, "r")

    def _compute_normalization_stats(self) -> None:
        depth_min, depth_max = float("inf"), float("-inf")
        vmax = float("-inf")
        f = self._file()
        try:
            for obj_type, obj_id, scan_idx in self.index:
                obj = f[obj_type][obj_id]
                depth = obj["depth_maps"][scan_idx][:]
                view = obj["viewpoints"][scan_idx][:]
                depth_min = min(depth_min, float(depth.min()))
                depth_max = max(depth_max, float(depth.max()))
                vmax = max(vmax, float(np.abs(view).max()))
        finally:
            if self._h5 is None:
                f.close()
        self.depth_min, self.depth_max, self.viewpoints_max_abs = depth_min, depth_max, vmax

    def __len__(self) -> int:
        return len(self.index)

    def __getitem__(
        self, idx: int, rng: Optional[np.random.Generator] = None
    ) -> Dict[str, np.ndarray]:
        rng = rng or np.random.default_rng()
        obj_type, obj_id, scan_idx = self.index[idx]
        f = self._file()
        try:
            obj = f[obj_type][obj_id]
            partial = np.asarray(obj["points"][scan_idx][:], dtype=np.float32)
            depth = np.asarray(obj["depth_maps"][scan_idx][:], dtype=np.float32)
            view = np.asarray(obj["viewpoints"][scan_idx][:], dtype=np.float32)
            target = np.asarray(obj["target_points"][:], dtype=np.float32)
            label_name = obj.attrs.get("label", None)
        finally:
            if self._h5 is None:
                f.close()

        depth = (depth - self.depth_min) / (self.depth_max - self.depth_min)
        view = view / self.viewpoints_max_abs
        target = target[rng.permutation(target.shape[0])]

        return dict(
            class_labels=np.int32(SHAPENET_LABEL_DICT[label_name]),
            partial_pcd=partial,
            depth_maps=depth[..., None],
            viewpoints=view,
            target=target,
        )

    def close(self):
        if self._h5 is not None:
            self._h5.close()
            self._h5 = None
