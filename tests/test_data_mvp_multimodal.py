"""MVP and ShapeNet-multimodal loader tests over synthetic fixtures."""

import numpy as np
import pytest

from pcdiff.data import (
    MultiModalCompletion,
    MVPCompletion,
    make_multimodal_fixture,
    make_mvp_fixture,
)


@pytest.fixture(scope="module")
def mvp_h5(tmp_path_factory):
    return make_mvp_fixture(str(tmp_path_factory.mktemp("mvp") / "mvp.h5"),
                            num_points=128)


@pytest.fixture(scope="module")
def mm_h5(tmp_path_factory):
    return make_multimodal_fixture(str(tmp_path_factory.mktemp("mm") / "mm.h5"))


def test_mvp_gt_sharing(mvp_h5):
    ds = MVPCompletion(mvp_h5, prefix="train")
    assert len(ds) == 52  # 2 instances x 26 scans
    rng = np.random.default_rng(0)
    # all 26 scans of instance 0 share (a permutation of) the same gt
    a = ds.__getitem__(0, rng=rng)["target"]
    b = ds.__getitem__(25, rng=rng)["target"]
    c = ds.__getitem__(26, rng=rng)["target"]
    np.testing.assert_allclose(
        np.sort(a.ravel()), np.sort(b.ravel()), rtol=1e-6
    )
    assert not np.allclose(np.sort(a.ravel()), np.sort(c.ravel()))


def test_mvp_fps_precache(mvp_h5):
    ds = MVPCompletion(mvp_h5, prefix="train", n_samples=32)
    assert ds.input_data.dtype == np.float16  # reference caches fp16
    assert ds.input_data.shape == (52, 32, 3)
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["partial_pcd"].shape == (32, 3)
    assert item["partial_pcd"].dtype == np.float32
    assert item["target"].shape == (32, 3)


def test_mvp_test_prefix(mvp_h5):
    ds = MVPCompletion(mvp_h5, prefix="test")
    item = ds.__getitem__(0)
    assert set(item) == {"partial_pcd"}
    with pytest.raises(ValueError):
        MVPCompletion(mvp_h5, prefix="bogus")


def test_multimodal_loader(mm_h5):
    ds = MultiModalCompletion(mm_h5, num_scans=8, scans_per_object=4)
    assert len(ds) == 8  # 2 objects x 4 subsampled scans
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["class_labels"] == 3  # "car"
    assert item["partial_pcd"].shape == (64, 3)
    assert item["depth_maps"].shape == (32, 32, 1)
    assert item["depth_maps"].max() <= 1.0 and item["depth_maps"].min() >= 0.0
    assert np.abs(item["viewpoints"]).max() <= 1.0  # normalized by max-abs
    assert item["target"].shape == (64, 3)


def test_multimodal_stat_recompute(mm_h5):
    ds = MultiModalCompletion(
        mm_h5, num_scans=8, scans_per_object=4,
        depth_min=None, depth_max=None, viewpoints_max_abs=None,
    )
    assert 0.0 <= ds.depth_min < ds.depth_max <= 255.0
    assert 0.0 < ds.viewpoints_max_abs <= 2.8


def test_multimodal_skip_list(mm_h5):
    ds = MultiModalCompletion(
        mm_h5, num_scans=8, scans_per_object=4,
        skip_list=[("car", "car_0")],
    )
    assert len(ds) == 4
