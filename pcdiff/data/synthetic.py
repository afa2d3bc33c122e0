"""Synthetic data: in-memory batches and an H5 fixture mirroring the
ModelNet-completion schema.

The fixture replicates the reference's H5 layout
(``class/instance/{ground_truth, partials/scan_XXXX/{pointcloud, distance}}``,
``/root/reference/dataset/modelnet_dataloader.py:300-340``) so loader code is
tested without the real dataset.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

__all__ = [
    "synthetic_batch",
    "make_modelnet_fixture",
    "make_mvp_fixture",
    "make_multimodal_fixture",
    "SYNTHETIC_CLASSES",
]

SYNTHETIC_CLASSES = ("airplane", "bench", "bottle", "car", "monitor")


def synthetic_batch(
    rng: np.random.Generator,
    batch_size: int = 4,
    num_points: int = 1024,
    num_partial: int = 1024,
    depth_size: int = 512,
    num_classes: int = 10,
) -> Dict[str, np.ndarray]:
    """A random batch shaped like the ModelNet loader's output
    (channels-last; depth maps NHWC)."""
    return dict(
        target=rng.uniform(-0.5, 0.5, (batch_size, num_points, 3)).astype(np.float32),
        class_labels=rng.integers(0, num_classes, (batch_size,)).astype(np.int32),
        partial_pcd=rng.uniform(-0.5, 0.5, (batch_size, num_partial, 3)).astype(
            np.float32
        ),
        depth_maps=rng.random((batch_size, depth_size, depth_size, 1)).astype(
            np.float32
        ),
        viewpoints=rng.standard_normal((batch_size, 3)).astype(np.float32),
    )


def make_modelnet_fixture(
    path: str,
    classes: Sequence[str] = SYNTHETIC_CLASSES,
    instances_per_class: int = 2,
    scans_per_instance: int = 3,
    num_points: int = 64,
    depth_size: int = 64,
    seed: int = 0,
) -> str:
    """Write a tiny H5 file with the ModelNet-completion layout."""
    import h5py

    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        for cls in classes:
            g = f.create_group(cls)
            for i in range(instances_per_class):
                inst = g.create_group(f"{cls}_{i:04d}")
                # stored ground truth is x100 (loader multiplies by 0.01)
                inst.create_dataset(
                    "ground_truth",
                    data=rng.uniform(-50, 50, (num_points, 3)).astype(np.float32),
                )
                partials = inst.create_group("partials")
                for s in range(scans_per_instance):
                    scan = partials.create_group(f"scan_{s:04d}")
                    scan.create_dataset(
                        "pointcloud",
                        data=rng.uniform(-0.5, 0.5, (num_points, 3)).astype(
                            np.float32
                        ),
                    )
                    scan.create_dataset(
                        "distance",
                        data=(rng.random((depth_size, depth_size)) * 255).astype(
                            np.float32
                        ),
                    )
    return path


def make_mvp_fixture(
    path: str,
    num_instances: int = 2,
    scans_per_instance: int = 26,
    num_points: int = 2048,
    seed: int = 0,
) -> str:
    """Tiny H5 with the MVP benchmark layout
    (incomplete_pcds / complete_pcds / labels; 26 scans per instance)."""
    import h5py

    rng = np.random.default_rng(seed)
    n_scans = num_instances * scans_per_instance
    with h5py.File(path, "w") as f:
        f.create_dataset(
            "incomplete_pcds",
            data=rng.uniform(-0.5, 0.5, (n_scans, num_points, 3)).astype(np.float32),
        )
        f.create_dataset(
            "complete_pcds",
            data=rng.uniform(-0.5, 0.5, (num_instances, num_points, 3)).astype(
                np.float32
            ),
        )
        f.create_dataset(
            "labels", data=rng.integers(1, 17, (n_scans,)).astype(np.int64)
        )
    return path


def make_multimodal_fixture(
    path: str,
    num_objects: int = 2,
    num_scans: int = 8,
    num_points: int = 64,
    depth_size: int = 32,
    seed: int = 0,
) -> str:
    """Tiny H5 with the ShapeNet-multimodal layout
    (obj_type/obj_id/{points, depth_maps, viewpoints, target_points})."""
    import h5py

    rng = np.random.default_rng(seed)
    with h5py.File(path, "w") as f:
        g = f.create_group("car")
        for i in range(num_objects):
            obj = g.create_group(f"car_{i}")
            obj.attrs["label"] = "car"
            obj.create_dataset(
                "points",
                data=rng.uniform(-0.5, 0.5, (num_scans, num_points, 3)).astype(
                    np.float32
                ),
            )
            obj.create_dataset(
                "depth_maps",
                data=(rng.random((num_scans, depth_size, depth_size)) * 255).astype(
                    np.float32
                ),
            )
            obj.create_dataset(
                "viewpoints",
                data=rng.uniform(-2.8, 2.8, (num_scans, 3)).astype(np.float32),
            )
            obj.create_dataset(
                "target_points",
                data=rng.uniform(-0.5, 0.5, (num_points, 3)).astype(np.float32),
            )
    return path
