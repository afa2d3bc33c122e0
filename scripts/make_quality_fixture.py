"""Generate the synthetic ModelNet-schema fixture used by
configs/synthetic_quality.yaml (5 classes x 4 instances x 4 scans,
256-point clouds, 64x64 depth maps)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pcdiff.data import make_modelnet_fixture


def main(path: str = "/tmp/pcdiff_quality.h5") -> None:
    out = make_modelnet_fixture(
        path,
        instances_per_class=4,
        scans_per_instance=4,
        num_points=256,
        depth_size=64,
        seed=7,
    )
    print(f"wrote {out}")


if __name__ == "__main__":
    main(*sys.argv[1:])
