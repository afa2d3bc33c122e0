"""Eval-stack tests: PointNet++ grouping parity, classifier weight-port
parity, FID/IS math parity, npz streaming."""

import io

import numpy as np
import pytest
import torch

from .reference_import import ref_module

ref_pn2 = ref_module("evals.pointnet2_utils")
ref_cls = ref_module("evals.pointnet2_cls_ssg")
ref_fid = ref_module("evals.fid_is")

import jax
import jax.numpy as jnp

from pcdiff.evals import (
    CompletionMetrics,
    FIDStatistics,
    NpzStreamer,
    PointNet2ClassifierSSG,
    compute_inception_score,
    compute_statistics,
    import_pointnet2_torch_state,
    query_ball_point,
    sample_and_group,
)

B, N, S = 2, 64, 16


@pytest.fixture
def xyz(rng):
    return rng.standard_normal((B, N, 3)).astype(np.float32)


def test_query_ball_point_matches_reference(xyz, rng):
    new_xyz = rng.standard_normal((B, S, 3)).astype(np.float32)
    got = np.asarray(query_ball_point(0.8, 8, jnp.asarray(xyz), jnp.asarray(new_xyz)))
    want = ref_pn2.query_ball_point(
        0.8, 8, torch.from_numpy(xyz), torch.from_numpy(new_xyz)
    ).numpy()
    np.testing.assert_array_equal(got, want)


def test_sample_and_group_matches_reference(xyz):
    new_xyz, new_points = sample_and_group(
        8, 0.8, 4, jnp.asarray(xyz), None, deterministic=True
    )
    ref_new_xyz, ref_new_points = ref_pn2.sample_and_group(
        8, 0.8, 4, torch.from_numpy(xyz), None, deterministic=True
    )
    np.testing.assert_allclose(
        np.asarray(new_xyz), ref_new_xyz.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(new_points), ref_new_points.numpy(), rtol=1e-4, atol=1e-5
    )


def test_pointnet2_classifier_weight_port_parity(xyz):
    torch.manual_seed(0)
    ref_model = ref_cls.get_model(num_class=40, normal_channel=False, width_mult=1)
    ref_model.eval()
    # randomize BN running stats so the port is nontrivial
    for m in ref_model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    variables = import_pointnet2_torch_state(ref_model.state_dict())
    ours = PointNet2ClassifierSSG(num_class=40, normal_channel=False, width_mult=1)

    with torch.no_grad():
        ref_logp, _, ref_feats = ref_model(
            torch.from_numpy(xyz).permute(0, 2, 1), features=True
        )
    got_logp, _, got_feats = ours.apply(variables, jnp.asarray(xyz), features=True)
    np.testing.assert_allclose(
        np.asarray(got_feats), ref_feats.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_logp), ref_logp.numpy(), rtol=1e-3, atol=1e-4
    )


def test_pointnet2_export_round_trip_and_torch_load(xyz):
    """export(import(sd)) == sd exactly, and the torch reference model
    loads the exported state dict and reproduces the jax forward — the
    contract the trained P-FID extractor relies on."""
    from pcdiff.evals.pointnet2 import export_pointnet2_torch_state

    torch.manual_seed(1)
    ref_model = ref_cls.get_model(num_class=40, normal_channel=False, width_mult=1)
    ref_model.eval()
    for m in ref_model.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    variables = import_pointnet2_torch_state(ref_model.state_dict())
    sd = export_pointnet2_torch_state(variables)
    want = {k: v for k, v in ref_model.state_dict().items()
            if "num_batches_tracked" not in k}
    assert set(sd) == set(want)
    for k in want:
        np.testing.assert_array_equal(sd[k], want[k].numpy(), err_msg=k)

    # load into a FRESH torch model and check forward parity with jax
    model2 = ref_cls.get_model(num_class=40, normal_channel=False, width_mult=1)
    model2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,  # num_batches_tracked buffers keep defaults
    )
    model2.eval()
    ours = PointNet2ClassifierSSG(num_class=40, normal_channel=False, width_mult=1)
    with torch.no_grad():
        ref_logp, _ = model2(torch.from_numpy(xyz).permute(0, 2, 1))
    got_logp, _ = ours.apply(variables, jnp.asarray(xyz))
    np.testing.assert_allclose(
        np.asarray(got_logp), ref_logp.numpy(), rtol=1e-3, atol=1e-4
    )


def test_set_abstraction_msg_weight_port_parity(xyz, rng):
    from pcdiff.evals.pointnet2 import (
        PointNetSetAbstractionMsg,
        import_sa_msg_torch_state,
    )

    torch.manual_seed(1)
    radius_list, nsample_list = [0.2, 0.5], [8, 16]
    mlp_list = [[16, 32], [16, 48]]
    in_channel = 5
    ref = ref_pn2.PointNetSetAbstractionMsg(
        S, radius_list, nsample_list, in_channel, mlp_list
    )
    ref.eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    points = rng.standard_normal((B, N, in_channel)).astype(np.float32)
    with torch.no_grad():
        ref_xyz, ref_feats = ref(
            torch.from_numpy(xyz).permute(0, 2, 1),
            torch.from_numpy(points).permute(0, 2, 1),
        )

    ours = PointNetSetAbstractionMsg(S, radius_list, nsample_list, mlp_list)
    variables = import_sa_msg_torch_state(ref.state_dict(), len(mlp_list))
    got_xyz, got_feats = ours.apply(variables, jnp.asarray(xyz), jnp.asarray(points))
    np.testing.assert_allclose(
        np.asarray(got_xyz), ref_xyz.permute(0, 2, 1).numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got_feats), ref_feats.permute(0, 2, 1).numpy(),
        rtol=1e-4, atol=1e-4,
    )


def test_feature_propagation_weight_port_parity(xyz, rng):
    from pcdiff.evals.pointnet2 import (
        PointNetFeaturePropagation,
        import_fp_torch_state,
    )

    torch.manual_seed(2)
    d1, d2 = 6, 10
    ref = ref_pn2.PointNetFeaturePropagation(d1 + d2, [24, 16])
    ref.eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm1d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)

    xyz2 = rng.standard_normal((B, S, 3)).astype(np.float32)
    points1 = rng.standard_normal((B, N, d1)).astype(np.float32)
    points2 = rng.standard_normal((B, S, d2)).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(xyz).permute(0, 2, 1),
            torch.from_numpy(xyz2).permute(0, 2, 1),
            torch.from_numpy(points1).permute(0, 2, 1),
            torch.from_numpy(points2).permute(0, 2, 1),
        )
    ours = PointNetFeaturePropagation([24, 16])
    variables = import_fp_torch_state(ref.state_dict())
    got = ours.apply(
        variables, jnp.asarray(xyz), jnp.asarray(xyz2),
        jnp.asarray(points1), jnp.asarray(points2),
    )
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_feature_propagation_single_source_broadcast(rng):
    """S == 1 broadcast path (reference ``repeat``), points1=None."""
    from pcdiff.evals.pointnet2 import (
        PointNetFeaturePropagation,
        import_fp_torch_state,
    )

    torch.manual_seed(3)
    ref = ref_pn2.PointNetFeaturePropagation(4, [8])
    ref.eval()
    xyz1 = rng.standard_normal((B, N, 3)).astype(np.float32)
    xyz2 = rng.standard_normal((B, 1, 3)).astype(np.float32)
    points2 = rng.standard_normal((B, 1, 4)).astype(np.float32)
    with torch.no_grad():
        want = ref(
            torch.from_numpy(xyz1).permute(0, 2, 1),
            torch.from_numpy(xyz2).permute(0, 2, 1),
            None,
            torch.from_numpy(points2).permute(0, 2, 1),
        )
    ours = PointNetFeaturePropagation([8])
    variables = import_fp_torch_state(ref.state_dict())
    got = ours.apply(
        variables, jnp.asarray(xyz1), jnp.asarray(xyz2), None, jnp.asarray(points2)
    )
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_fid_matches_reference(rng):
    a = rng.standard_normal((200, 16))
    b = rng.standard_normal((220, 16)) + 0.3
    ours = compute_statistics(a).frechet_distance(compute_statistics(b))
    theirs = ref_fid.compute_statistics(a).frechet_distance(
        ref_fid.compute_statistics(b)
    )
    assert np.isclose(ours, theirs, rtol=1e-9)


def test_inception_score_matches_reference(rng):
    logits = rng.standard_normal((300, 40))
    preds = np.exp(logits) / np.exp(logits).sum(axis=1, keepdims=True)
    ours = compute_inception_score(preds, split_size=100)
    theirs = ref_fid.compute_inception_score(preds, split_size=100)
    assert np.isclose(ours, theirs, rtol=1e-9)


def test_inception_score_zero_prob_no_nan(rng):
    """A sharp classifier underflows some class probs to exactly 0; the
    KL convention 0*log0=0 must apply (the reference formula NaNs here)."""
    logits = 200.0 * rng.standard_normal((50, 10))
    preds = np.exp(logits - logits.max(axis=1, keepdims=True))
    preds /= preds.sum(axis=1, keepdims=True)
    assert np.any(preds == 0.0)
    ours = compute_inception_score(preds, split_size=25)
    assert np.isfinite(ours) and 1.0 <= ours <= 10.0
    # agreement with the reference where BOTH are finite: perturb the
    # zeros away and the two formulas coincide
    preds_eps = np.clip(preds, 1e-30, None)
    preds_eps /= preds_eps.sum(axis=1, keepdims=True)
    ref = ref_fid.compute_inception_score(preds_eps, split_size=25)
    assert np.isclose(compute_inception_score(preds_eps, split_size=25), ref,
                      rtol=1e-9)
    assert np.isclose(ours, ref, rtol=1e-3)


def test_npz_streamer_rebatches_across_shards(tmp_path, rng):
    for i in range(3):
        np.savez(
            tmp_path / f"shard_{i}.npz",
            arr_0=rng.standard_normal((5, 4, 3)).astype(np.float32),
            labels=np.arange(5) + i * 5,
        )
    streamer = NpzStreamer(str(tmp_path / "shard_*.npz"))
    assert set(streamer.keys()) == {"arr_0", "labels"}
    batches = list(streamer.stream(4, ["arr_0", "labels"]))
    sizes = [len(b["labels"]) for b in batches]
    assert sizes == [4, 4, 4, 3]
    all_labels = np.concatenate([b["labels"] for b in batches])
    np.testing.assert_array_equal(np.sort(all_labels), np.arange(15))


def test_npz_streamer_slice_syntax(tmp_path, rng):
    np.savez(tmp_path / "x.npz", arr_0=rng.standard_normal((10, 3)))
    streamer = NpzStreamer(str(tmp_path / "x.npz") + "[:7]")
    total = sum(len(b["arr_0"]) for b in streamer.stream(3, ["arr_0"]))
    assert total == 7


def test_completion_metrics_aggregation(rng):
    pred = rng.uniform(-0.5, 0.5, (4, 32, 3)).astype(np.float32)
    gt = pred + 0.01
    metrics = CompletionMetrics()
    metrics.update(pred, gt, np.array([0, 0, 1, 1]))
    out = metrics.summary(class_names={0: "airplane", 1: "bench"})
    assert set(out["per_class"]) == {"airplane", "bench"}
    assert out["overall"]["count"] == 4
    assert out["overall"]["cd_full"] < 0.01
    assert out["overall"]["f1_full"] > 0.9


def test_feature_extractor_padding_and_shapes(rng):
    """features_and_preds pads the ragged final chunk and strips it back."""
    import jax

    from pcdiff.evals.feature_extractor import (
        PointNetClassifier,
        normalize_point_clouds,
    )
    from pcdiff.evals.pointnet2 import PointNet2ClassifierSSG

    model = PointNet2ClassifierSSG(num_class=40, normal_channel=False,
                                   width_mult=1)
    clouds = rng.standard_normal((5, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clouds[:1]))
    clf = PointNetClassifier(params=variables, batch_size=2, width_mult=1)
    feats, preds = clf.features_and_preds(clouds)
    assert feats.shape == (5, 256)
    assert preds.shape == (5, 40)
    np.testing.assert_allclose(preds.sum(axis=1), 1.0, rtol=1e-4)

    normed = normalize_point_clouds(clouds)
    np.testing.assert_allclose(normed.mean(axis=1), 0.0, atol=1e-6)
    radii = np.linalg.norm(normed, axis=-1).max(axis=1)
    np.testing.assert_allclose(radii, 1.0, rtol=1e-5)


def test_feature_extractor_float64_path(rng):
    """dtype=np.float64 (the P-FID canonical-comparison mode): casts params
    and inputs to double, output is double, deterministic bitwise, and
    agrees with the f32 path to fp32-noise level at matched chunking."""
    import jax

    from pcdiff.evals.feature_extractor import PointNetClassifier
    from pcdiff.evals.pointnet2 import PointNet2ClassifierSSG

    model = PointNet2ClassifierSSG(num_class=40, normal_channel=False,
                                   width_mult=1)
    clouds = rng.standard_normal((4, 64, 3)).astype(np.float64)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.asarray(clouds[:1], jnp.float32))
    with jax.enable_x64(True):
        clf64 = PointNetClassifier(params=variables, batch_size=4,
                                   width_mult=1, dtype=np.float64)
        f64a, p64 = clf64.features_and_preds(clouds)
        f64b, _ = clf64.features_and_preds(clouds)
    assert f64a.dtype == np.float64 and p64.dtype == np.float64
    np.testing.assert_array_equal(f64a, f64b)  # double is order-stable here

    clf32 = PointNetClassifier(params=variables, batch_size=4, width_mult=1)
    f32, _ = clf32.features_and_preds(clouds.astype(np.float32))
    np.testing.assert_allclose(f64a, f32, atol=5e-2, rtol=5e-2)


def test_feature_extractor_mesh_sharded_matches_dense(rng):
    """Mesh-sharded extraction (the reference's multi-GPU thread-pool role)
    must produce the single-device results exactly."""
    import jax

    from pcdiff.evals.feature_extractor import PointNetClassifier
    from pcdiff.evals.pointnet2 import PointNet2ClassifierSSG
    from pcdiff.parallel import make_mesh

    model = PointNet2ClassifierSSG(num_class=40, normal_channel=False,
                                   width_mult=1)
    clouds = rng.standard_normal((10, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(clouds[:1]))
    dense = PointNetClassifier(params=variables, batch_size=8, width_mult=1)
    mesh = make_mesh(data_parallel=8, model_parallel=1)
    sharded = PointNetClassifier(params=variables, batch_size=8, width_mult=1,
                                 mesh=mesh)
    f0, p0 = dense.features_and_preds(clouds)
    f1, p1 = sharded.features_and_preds(clouds)
    np.testing.assert_allclose(f1, f0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(p1, p0, rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError):
        PointNetClassifier(params=variables, batch_size=6, width_mult=1,
                           mesh=mesh)
