"""MVP completion benchmark dataset.

Parity with ``/root/reference/dataset/mvp_dataloader.py:12-66``:
``MVP_{Train,Test}_CP.h5`` with 2048-point incomplete scans, complete ground
truths, and 16-class labels; 26 scans per instance so
``complete = gt[index // 26]``; the whole array is FPS-downsampled to
``n_samples`` up front (here with the jitted TPU FPS kernel instead of the
external CUDA package) and cached float16; ground truth is randomly permuted
per fetch.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = ["MVPCompletion", "MVP_LABEL_DICT"]

MVP_LABEL_DICT = {
    "airplane": 1, "cabinet": 2, "car": 3, "chair": 4, "lamp": 5, "sofa": 6,
    "table": 7, "watercraft": 8, "bed": 9, "bench": 10, "bookshelf": 11,
    "bus": 12, "guitar": 13, "motorbike": 14, "pistol": 15, "skateboard": 16,
}

SCANS_PER_INSTANCE = 26


def _fps_downsample(points: np.ndarray, n: int, batch: int = 256) -> np.ndarray:
    """FPS the whole [M, 2048, 3] array to [M, n, 3]: native host kernel when
    built (index-exact with the JAX kernel), else on-device in chunks."""
    from ..geometry.fps_native import native_fps_indices

    # starts mirror the chunked device path: element i of each chunk starts
    # at index i, i.e. global element b starts at b % batch
    starts = np.arange(len(points), dtype=np.int32) % batch
    idx = native_fps_indices(points, n, starts=starts)
    if idx is not None:
        return np.take_along_axis(points, idx[..., None], axis=1)

    import jax.numpy as jnp

    from ..geometry.fps import fps

    out = []
    for i in range(0, len(points), batch):
        chunk = jnp.asarray(points[i : i + batch])
        out.append(np.asarray(fps(chunk, n, deterministic=True)))
    return np.concatenate(out, axis=0)


class MVPCompletion:
    """Map-style dataset over MVP incomplete/complete pairs."""

    def __init__(
        self,
        h5_path: str,
        prefix: str = "train",
        n_samples: Optional[int] = None,
        limit: Optional[int] = None,
    ):
        import h5py

        if prefix not in ("train", "val", "test"):
            raise ValueError("prefix should be [train/val/test]")
        self.prefix = prefix
        self.n_samples = 2048 if n_samples is None else n_samples

        with h5py.File(h5_path, "r") as f:
            self.input_data = np.asarray(f["incomplete_pcds"][()])
            if limit:
                self.input_data = self.input_data[:limit]
            if prefix != "test":
                self.gt_data = np.asarray(f["complete_pcds"][()])
                self.labels = np.asarray(f["labels"][()])

        if self.n_samples < 2048:
            if prefix != "test":
                self.gt_data = _fps_downsample(self.gt_data, self.n_samples).astype(
                    np.float16
                )
            self.input_data = _fps_downsample(self.input_data, self.n_samples).astype(
                np.float16
            )

    def __len__(self) -> int:
        return self.input_data.shape[0]

    def __getitem__(
        self, index: int, rng: Optional[np.random.Generator] = None
    ) -> Dict[str, np.ndarray]:
        rng = rng or np.random.default_rng()
        partial = np.asarray(self.input_data[index], dtype=np.float32)
        if self.prefix == "test":
            return dict(partial_pcd=partial)
        complete = np.asarray(
            self.gt_data[index // SCANS_PER_INSTANCE], dtype=np.float32
        )
        complete = complete[rng.permutation(complete.shape[0])]
        return dict(
            class_labels=np.int32(self.labels[index]),
            partial_pcd=partial,
            target=complete,
        )
