"""Offline FPS-downsampling tool for completion H5 datasets.

Equivalent of ``/root/reference/dataset/downsampling_pcd.py:21-97``: walk the
full-resolution ModelNet-completion H5, FPS each ground truth and partial
scan down to ``n`` points with the jitted TPU FPS kernel (the reference used
an external CUDA package), and write ``*_<n>.h5`` with the same layout.
Instances with fewer than ``min_points`` points are skipped, as are classes
in ``--skip-classes`` (the reference skipped ``guitar`` and <4096-pt
instances).

Usage: ``python -m pcdiff.cli.downsample in.h5 out.h5 --n 1024``
"""

from __future__ import annotations

import argparse

import numpy as np


def fps_batch(points_list, n):
    from ..geometry.fps_native import native_fps_indices

    stacked_np = np.stack(points_list)
    idx = native_fps_indices(stacked_np, n)
    if idx is not None:
        return np.take_along_axis(stacked_np, idx[..., None], axis=1)

    import jax.numpy as jnp

    from ..geometry.fps import fps

    return np.asarray(fps(jnp.asarray(stacked_np), n, deterministic=True))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_h5")
    parser.add_argument("output_h5")
    parser.add_argument("--n", type=int, default=1024)
    parser.add_argument("--min-points", type=int, default=4096)
    parser.add_argument("--skip-classes", nargs="*", default=["guitar"])
    parser.add_argument("--batch", type=int, default=64)
    args = parser.parse_args()

    import h5py

    with h5py.File(args.input_h5, "r") as fin, h5py.File(args.output_h5, "w") as fout:
        for cls in fin.keys():
            if cls in args.skip_classes:
                print(f"skipping class {cls}")
                continue
            gcls = fout.create_group(cls)
            for inst in fin[cls].keys():
                grp = fin[cls][inst]
                gt = grp["ground_truth"][()]
                if gt.shape[0] < args.min_points:
                    print(f"skipping {cls}/{inst}: only {gt.shape[0]} points")
                    continue
                ginst = gcls.create_group(inst)
                ginst.create_dataset(
                    "ground_truth", data=fps_batch([gt], args.n)[0]
                )
                gpart = ginst.create_group("partials")
                for s in grp["partials"].keys():
                    sg = grp["partials"][s]
                    pc = sg["pointcloud"][()]
                    if pc.shape[0] < args.n:
                        print(f"skipping scan {cls}/{inst}/{s}: {pc.shape[0]} pts")
                        continue
                    sgo = gpart.create_group(s)
                    sgo.create_dataset("pointcloud", data=fps_batch([pc], args.n)[0])
                    sgo.create_dataset("distance", data=sg["distance"][()])
            print(f"done class {cls}")


if __name__ == "__main__":
    main()
