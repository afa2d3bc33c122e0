"""Data pipeline tests: ModelNet fixture loader, viewpoint table parity,
batch loader sharding/shuffling, config system."""

import numpy as np
import pytest

from pcdiff.core.config import Config, apply_overrides, load_config
from pcdiff.data import (
    BatchLoader,
    ModelNetCompletion,
    build_viewpoint_table,
    make_modelnet_fixture,
)

from .reference_import import ref_module


@pytest.fixture(scope="module")
def fixture_h5(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("h5") / "modelnet_fixture.h5")
    return make_modelnet_fixture(path)


def test_viewpoint_table_matches_reference():
    ref_ds = ref_module("dataset.modelnet_dataloader")
    # instantiate only the table logic: read the tensor from the class source
    # by constructing against the fixture is heavy; instead compare directly
    # with the hardcoded reference constants.
    import torch

    ref_table = ref_ds.ModelnetDataset.__init__.__doc__  # not available; build manually
    got = build_viewpoint_table()
    # reconstruct the reference's table from its source semantics
    import inspect
    src = inspect.getsource(ref_ds.ModelnetDataset.__init__)
    # evaluate the literal tuple list from the source block
    start = src.index("torch.tensor([")
    end = src.index("], dtype=torch.float32)")
    literal = src[start + len("torch.tensor(") : end + 1]
    rows = eval(literal)  # list of tuples from the reference source
    want = np.asarray(rows, dtype=np.float32)[:, [0, 2, 1]]
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-7)


def test_modelnet_fixture_loading(fixture_h5):
    ds = ModelNetCompletion(fixture_h5, split="train", skip_classes=None)
    # 5 classes x 2 instances x 3 scans
    assert len(ds) == 30
    item = ds.__getitem__(0, rng=np.random.default_rng(0))
    assert item["partial_pcd"].shape == (64, 3)
    assert item["depth_maps"].shape == (64, 64, 1)
    assert item["viewpoints"].shape == (3,)
    assert item["target"].shape == (64, 3)
    assert np.abs(item["target"]).max() <= 0.5
    assert np.abs(item["partial_pcd"]).max() <= 0.5
    assert item["depth_maps"].max() <= 1.0
    # class labels sorted by name
    assert ds.class_to_label["airplane"] == 0


def test_modelnet_skip_classes(fixture_h5):
    ds = ModelNetCompletion(
        fixture_h5, split="train", skip_classes=("airplane", "bench")
    )
    assert len(ds) == 18
    assert "airplane" not in ds.class_to_label
    labels = sorted(ds.class_to_label.values())
    assert labels == [0, 1, 2]


def test_target_random_permutation(fixture_h5):
    ds = ModelNetCompletion(fixture_h5, split="train", skip_classes=None)
    a = ds.__getitem__(0, rng=np.random.default_rng(1))["target"]
    b = ds.__getitem__(0, rng=np.random.default_rng(2))["target"]
    assert not np.array_equal(a, b)  # different permutation
    np.testing.assert_allclose(
        np.sort(a.ravel()), np.sort(b.ravel()), rtol=1e-6
    )  # same multiset of points


def test_batch_loader_sharding(fixture_h5):
    ds = ModelNetCompletion(fixture_h5, split="train", skip_classes=None)
    seen = []
    for pi in range(2):
        loader = BatchLoader(
            ds, batch_size=5, seed=7, process_index=pi, process_count=2,
            prefetch=0,
        )
        loader.set_epoch(3)
        batches = list(loader)
        assert len(batches) == 3  # 15 per host / 5
        for b in batches:
            assert b["target"].shape == (5, 64, 3)
            seen.append(b["class_labels"])
    # two hosts see a disjoint split of the shared permutation: with all 30
    # samples covered, class counts must match the full dataset (6 per class)
    all_labels = np.concatenate(seen)
    assert len(all_labels) == 30
    counts = np.bincount(all_labels)
    assert (counts == 6).all()


def test_batch_loader_epoch_reshuffle(fixture_h5):
    ds = ModelNetCompletion(fixture_h5, split="train", skip_classes=None)
    loader = BatchLoader(ds, batch_size=30, seed=7, prefetch=2)
    loader.set_epoch(0)
    b0 = next(iter(loader))
    loader.set_epoch(1)
    b1 = next(iter(loader))
    assert not np.array_equal(b0["class_labels"], b1["class_labels"])


def test_config_defaults_match_reference_yaml():
    cfg = Config()
    assert cfg.train.batch_size == 32
    assert cfg.train.self_conditioning_prob == 0.6
    assert cfg.train.start_chamfer == 120
    assert cfg.model.num_points == 1024
    assert cfg.model.latent_dim == 256
    assert cfg.model.num_tokens_ppcd == 256
    assert cfg.diffusion.schedule == "linear"
    assert cfg.diffusion.timesteps == 1000
    assert cfg.sample.guidance_scale == 3.0
    assert cfg.sample.karras_steps == 64
    assert cfg.sample.sigma_max == 120.0


def test_config_overrides():
    cfg = apply_overrides(
        Config(),
        ["train.lr=1e-4", "model.num_blocks=2",
         "model.active_modalities=[class,view]"],
    )
    assert cfg.train.lr == 1e-4
    assert cfg.model.num_blocks == 2
    assert cfg.model.active_modalities == ("class", "view")
    with pytest.raises(KeyError):
        apply_overrides(Config(), ["train.nonexistent=1"])


def test_config_yaml_roundtrip(tmp_path):
    from pcdiff.core.config import save_config

    cfg = apply_overrides(Config(), ["train.epochs=7"])
    p = str(tmp_path / "cfg.yaml")
    save_config(cfg, p)
    back = load_config(p)
    assert back == cfg


def test_export_instance_ground_truths_matches_reference(fixture_h5, tmp_path):
    """Golden vs /root/reference/dataset/modelnet_dataloader.py:517-560."""
    import torch

    from pcdiff.data import export_instance_ground_truths

    ref_ds = ref_module("dataset.modelnet_dataloader")
    skip = ["bench"]  # fixture classes: airplane, bench, bottle, car, monitor

    ours = export_instance_ground_truths(
        fixture_h5, skip_classes=skip,
        npz_output=str(tmp_path / "gt.npz"),
        labels_output=str(tmp_path / "labels.npz"),
    )

    ref_npz = str(tmp_path / "ref_gt.npz")
    ref_pt = str(tmp_path / "ref_labels.pt")
    ref_ds.save_instance_ground_truths(
        fixture_h5, skip_classes=skip, npz_output=ref_npz, pt_output=ref_pt
    )
    ref_gt = np.load(ref_npz)["ground_truths"]
    ref_labels = torch.load(ref_pt, weights_only=False).numpy()

    np.testing.assert_allclose(ours["ground_truths"], ref_gt, rtol=0, atol=0)
    np.testing.assert_array_equal(ours["labels"], ref_labels)

    saved = np.load(str(tmp_path / "gt.npz"))["ground_truths"]
    np.testing.assert_array_equal(saved, ours["ground_truths"])
    assert np.load(str(tmp_path / "labels.npz"))["labels"].dtype == np.int64


def test_shapes_fixture_schema_and_learnability(tmp_path):
    """The geometric fixture loads through ModelNetCompletion, partials are
    view-dependent subsets of the shape, and different seeds draw different
    instances (the held-out-split property)."""
    from pcdiff.data import make_shapes_fixture

    p0 = make_shapes_fixture(
        str(tmp_path / "a.h5"), instances_per_class=2, scans_per_instance=2,
        num_points=128, depth_size=32, seed=0,
    )
    ds = ModelNetCompletion(p0, split="test")
    assert len(ds) == 5 * 2 * 2
    item = ds[0]
    assert item["partial_pcd"].shape == (128, 3)
    assert item["target"].shape == (128, 3)
    assert item["depth_maps"].shape == (32, 32, 1)
    assert np.all(np.abs(item["target"]) <= 0.5)
    assert np.all(item["depth_maps"] >= 0) and np.all(item["depth_maps"] <= 1)
    # partial points lie on the shape: each has an exact match in the raw gt
    import h5py

    with h5py.File(p0, "r") as f:
        cls = sorted(f.keys())[0]
        inst = sorted(f[cls].keys())[0]
        gt = f[cls][inst]["ground_truth"][()] / 100.0
        scan = sorted(f[cls][inst]["partials"].keys())[0]
        partial = f[cls][inst]["partials"][scan]["pointcloud"][()]
    d = np.linalg.norm(partial[:, None] - gt[None], axis=-1).min(axis=1)
    assert d.max() < 1e-5
    # ...but not all of it (view-dependent crop drops the far side)
    assert len(np.unique(partial, axis=0)) < len(gt)

    # disjoint instances across seeds
    p1 = make_shapes_fixture(
        str(tmp_path / "b.h5"), instances_per_class=2, scans_per_instance=2,
        num_points=128, depth_size=32, seed=9,
    )
    with h5py.File(p0, "r") as f0, h5py.File(p1, "r") as f1:
        gt0 = f0["car"][sorted(f0["car"].keys())[0]]["ground_truth"][()]
        gt1 = f1["car"][sorted(f1["car"].keys())[0]]["ground_truth"][()]
        names0 = set(f0["car"].keys())
        names1 = set(f1["car"].keys())
    assert not np.allclose(gt0, gt1)
    assert names0.isdisjoint(names1)
