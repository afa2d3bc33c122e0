"""Generate the flagship-scale parametric-shapes fixtures.

Same held-out-instance protocol as scripts/shapes_evidence.py (disjoint
seeds => disjoint instance shapes) but at the reference flagship's data
scale (/root/reference/config.yaml:26-40): 1024-point clouds and 512^2
depth maps. Used by configs/flagship_shapes.yaml and the flagship gate
rows in docs/trained_gates.json.

Usage: python scripts/make_flagship_fixture.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TRAIN_H5 = "/tmp/pcdiff_flagship_train.h5"
TEST_H5 = "/tmp/pcdiff_flagship_test.h5"


def main() -> None:
    from pcdiff.data import make_shapes_fixture

    make_shapes_fixture(TRAIN_H5, instances_per_class=32, seed=0,
                        num_points=1024, depth_size=512)
    make_shapes_fixture(TEST_H5, instances_per_class=4, seed=9,
                        num_points=1024, depth_size=512)
    print(f"wrote {TRAIN_H5}, {TEST_H5}")


if __name__ == "__main__":
    main()
