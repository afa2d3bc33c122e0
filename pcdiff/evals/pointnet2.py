"""PointNet++ (SSG) feature extractor for P-FID / P-IS, in JAX/flax.

Ports the reference's pure-torch PointNet++ ops and classifier
(``/root/reference/evals/pointnet2_utils.py:49-260``,
``/root/reference/evals/pointnet2_cls_ssg.py:33-96``) with exact
grouping semantics — P-FID drifts otherwise:

- ``query_ball_point``: radius mask -> index-sort -> take first K ->
  pad misses with the group's first hit (``pointnet2_utils.py:122-142``);
- deterministic FPS at eval (batch element b seeded at point b);
- set abstraction: grouped relative coords (+features) -> shared 1x1
  conv/BN/ReLU stack -> max-pool over the neighborhood.

The classifier taps features at the fc2 batch-norm output (256-d with
width_mult=2), matching ``pointnet2_cls_ssg.py:83-89``. Weights load from
the reference's pretrained ``pointnet`` checkpoint via
:func:`import_pointnet2_torch_state`.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.fps import farthest_point_sample
from ..geometry.ops import index_points, square_distance

__all__ = [
    "query_ball_point",
    "sample_and_group",
    "sample_and_group_all",
    "PointNetSetAbstraction",
    "PointNetSetAbstractionMsg",
    "PointNetFeaturePropagation",
    "PointNet2ClassifierSSG",
    "import_pointnet2_torch_state",
    "import_sa_msg_torch_state",
    "import_fp_torch_state",
]


def query_ball_point(
    radius: float, nsample: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> jnp.ndarray:
    """Indices of up to ``nsample`` points within ``radius`` of each query.

    xyz: [B, N, 3]; new_xyz: [B, S, 3] -> [B, S, nsample] int32. Misses are
    padded with each group's first in-radius index (reference semantics).
    """
    B, N, _ = xyz.shape
    S = new_xyz.shape[1]
    sqrdists = square_distance(new_xyz, xyz)  # [B, S, N]
    base = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, S, N))
    group_idx = jnp.where(sqrdists > radius**2, N, base)
    group_idx = jnp.sort(group_idx, axis=-1)[:, :, :nsample]
    group_first = jnp.broadcast_to(group_idx[:, :, :1], group_idx.shape)
    return jnp.where(group_idx == N, group_first, group_idx).astype(jnp.int32)


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    points: Optional[jnp.ndarray],
    deterministic: bool = True,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FPS centroids + ball-query neighborhoods with relative coordinates."""
    B, N, C = xyz.shape
    fps_idx = farthest_point_sample(xyz, npoint, deterministic=deterministic, key=key)
    new_xyz = index_points(xyz, fps_idx)  # [B, S, 3]
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    grouped_xyz = index_points(xyz, idx)  # [B, S, K, 3]
    grouped_xyz_norm = grouped_xyz - new_xyz[:, :, None, :]
    if points is not None:
        grouped_points = index_points(points, idx)
        new_points = jnp.concatenate([grouped_xyz_norm, grouped_points], axis=-1)
    else:
        new_points = grouped_xyz_norm
    return new_xyz, new_points


def sample_and_group_all(
    xyz: jnp.ndarray, points: Optional[jnp.ndarray]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One group containing every point, centered at the origin."""
    B, N, C = xyz.shape
    new_xyz = jnp.zeros((B, 1, C), dtype=xyz.dtype)
    grouped = xyz[:, None, :, :]
    if points is not None:
        grouped = jnp.concatenate([grouped, points[:, None, :, :]], axis=-1)
    return new_xyz, grouped


class PointNetSetAbstraction(nn.Module):
    """Set abstraction: group -> shared MLP (1x1 conv + BN + ReLU) -> max."""

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    group_all: bool

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, points: Optional[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xyz: [B, N, 3] channels-last; points: [B, N, D] or None."""
        if self.group_all:
            new_xyz, new_points = sample_and_group_all(xyz, points)
        else:
            new_xyz, new_points = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points,
                deterministic=True,
            )
        # new_points: [B, S, K, C]; shared MLP over the channel dim
        h = new_points
        for i, out_ch in enumerate(self.mlp):
            h = nn.Conv(out_ch, kernel_size=(1, 1), name=f"conv_{i}")(h)
            h = nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, momentum=0.9,
                name=f"bn_{i}",
            )(h)
            h = nn.relu(h)
        new_points = jnp.max(h, axis=2)  # max over the K neighborhood
        return new_xyz, new_points


class PointNetSetAbstractionMsg(nn.Module):
    """Multi-scale-grouping set abstraction
    (``/root/reference/evals/pointnet2_utils.py:244-302``).

    One FPS centroid set queried at several radii; each scale runs its own
    shared-MLP stack and max-pools over its neighborhood, then the per-scale
    features are concatenated. NOTE the reference's concat order here is
    [features, relative_xyz] — the opposite of SSG's ``sample_and_group``.
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, points: Optional[jnp.ndarray]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """xyz: [B, N, 3] channels-last; points: [B, N, D] or None.
        Returns (new_xyz [B, S, 3], features [B, S, sum(mlp[-1])])."""
        B, N, C = xyz.shape
        S = self.npoint
        fps_idx = farthest_point_sample(xyz, S, deterministic=True)
        new_xyz = index_points(xyz, fps_idx)
        outs = []
        for i, radius in enumerate(self.radius_list):
            K = self.nsample_list[i]
            idx = query_ball_point(radius, K, xyz, new_xyz)
            grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
            if points is not None:
                grouped = jnp.concatenate(
                    [index_points(points, idx), grouped_xyz], axis=-1
                )
            else:
                grouped = grouped_xyz
            h = grouped  # [B, S, K, C_in]
            for j, out_ch in enumerate(self.mlp_list[i]):
                h = nn.Conv(out_ch, kernel_size=(1, 1), name=f"conv_{i}_{j}")(h)
                h = nn.BatchNorm(
                    use_running_average=True, epsilon=1e-5, momentum=0.9,
                    name=f"bn_{i}_{j}",
                )(h)
                h = nn.relu(h)
            outs.append(jnp.max(h, axis=2))  # [B, S, D_i]
        return new_xyz, jnp.concatenate(outs, axis=-1)


class PointNetFeaturePropagation(nn.Module):
    """Inverse-distance 3-NN feature interpolation + shared MLP
    (``/root/reference/evals/pointnet2_utils.py:304-356``)."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(
        self,
        xyz1: jnp.ndarray,
        xyz2: jnp.ndarray,
        points1: Optional[jnp.ndarray],
        points2: jnp.ndarray,
    ) -> jnp.ndarray:
        """xyz1: [B, N, 3] targets; xyz2: [B, S, 3] sources;
        points1: [B, N, D1] or None; points2: [B, S, D2].
        Returns [B, N, mlp[-1]] channels-last."""
        B, N, _ = xyz1.shape
        S = xyz2.shape[1]

        if S == 1:
            interpolated = jnp.broadcast_to(points2, (B, N, points2.shape[-1]))
        else:
            dists = square_distance(xyz1, xyz2)  # [B, N, S]
            neg, idx = jax.lax.top_k(-dists, 3)  # 3 smallest
            dist_recip = 1.0 / (-neg + 1e-8)
            weight = dist_recip / jnp.sum(dist_recip, axis=2, keepdims=True)
            interpolated = jnp.sum(
                index_points(points2, idx) * weight[..., None], axis=2
            )

        if points1 is not None:
            h = jnp.concatenate([points1, interpolated], axis=-1)
        else:
            h = interpolated
        for i, out_ch in enumerate(self.mlp):
            h = nn.Conv(out_ch, kernel_size=(1,), name=f"conv_{i}")(h)
            h = nn.BatchNorm(
                use_running_average=True, epsilon=1e-5, momentum=0.9,
                name=f"bn_{i}",
            )(h)
            h = nn.relu(h)
        return h


class PointNet2ClassifierSSG(nn.Module):
    """PointNet++ single-scale-grouping classifier with a feature tap."""

    num_class: int = 40
    normal_channel: bool = False
    width_mult: int = 1

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, features: bool = False
    ):
        """xyz: [B, N, 3(+3)] channels-last -> (log_probs, global_feats[, fc2_features])."""
        w = self.width_mult
        B = xyz.shape[0]
        if self.normal_channel:
            norm = xyz[..., 3:]
            xyz = xyz[..., :3]
        else:
            norm = None
        l1_xyz, l1 = PointNetSetAbstraction(
            512, 0.2, 32, (64 * w, 64 * w, 128 * w), False, name="sa1"
        )(xyz, norm)
        l2_xyz, l2 = PointNetSetAbstraction(
            128, 0.4, 64, (128 * w, 128 * w, 256 * w), False, name="sa2"
        )(l1_xyz, l1)
        _, l3 = PointNetSetAbstraction(
            None, None, None, (256 * w, 512 * w, 1024 * w), True, name="sa3"
        )(l2_xyz, l2)
        x = l3.reshape(B, 1024 * w)
        x = nn.relu(
            nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(
                nn.Dense(512 * w, name="fc1")(x)
            )
        )
        feats = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn2")(
            nn.Dense(256 * w, name="fc2")(x)
        )
        x = nn.relu(feats)
        x = nn.Dense(self.num_class, name="fc3")(x)
        log_probs = nn.log_softmax(x, axis=-1)
        if features:
            return log_probs, l3, feats
        return log_probs, l3


# ------------------------------------------------------------- torch import

def _t(x) -> np.ndarray:
    return (x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)).astype(
        np.float32
    )


def import_pointnet2_torch_state(state_dict) -> Dict:
    """Map the reference's pretrained PointNet++ state_dict to flax variables."""
    sd = state_dict
    params: Dict = {}
    batch_stats: Dict = {}

    for sa in ("sa1", "sa2", "sa3"):
        p, bs = {}, {}
        i = 0
        while f"{sa}.mlp_convs.{i}.weight" in sd:
            w = _t(sd[f"{sa}.mlp_convs.{i}.weight"])  # [out, in, 1, 1]
            p[f"conv_{i}"] = {
                "kernel": w.transpose(2, 3, 1, 0),  # -> [1, 1, in, out]
                "bias": _t(sd[f"{sa}.mlp_convs.{i}.bias"]),
            }
            p[f"bn_{i}"] = {
                "scale": _t(sd[f"{sa}.mlp_bns.{i}.weight"]),
                "bias": _t(sd[f"{sa}.mlp_bns.{i}.bias"]),
            }
            bs[f"bn_{i}"] = {
                "mean": _t(sd[f"{sa}.mlp_bns.{i}.running_mean"]),
                "var": _t(sd[f"{sa}.mlp_bns.{i}.running_var"]),
            }
            i += 1
        params[sa] = p
        batch_stats[sa] = bs

    for fc, bn in (("fc1", "bn1"), ("fc2", "bn2")):
        params[fc] = {
            "kernel": _t(sd[f"{fc}.weight"]).T, "bias": _t(sd[f"{fc}.bias"])
        }
        params[bn] = {
            "scale": _t(sd[f"{bn}.weight"]), "bias": _t(sd[f"{bn}.bias"])
        }
        batch_stats[bn] = {
            "mean": _t(sd[f"{bn}.running_mean"]),
            "var": _t(sd[f"{bn}.running_var"]),
        }
    params["fc3"] = {"kernel": _t(sd["fc3.weight"]).T, "bias": _t(sd["fc3.bias"])}
    return {"params": params, "batch_stats": batch_stats}


def export_pointnet2_torch_state(variables: Dict) -> Dict:
    """Inverse of :func:`import_pointnet2_torch_state`: flax variables ->
    the reference's torch ``state_dict`` layout (numpy arrays; wrap with
    ``torch.from_numpy`` / ``torch.save`` as needed). Lets a classifier
    trained in this framework serve as the P-FID/P-IS extractor for the
    torch reference pipeline (``/root/reference/evals/feature_extractor.py``
    loads this schema)."""
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    sd: Dict = {}

    for sa in ("sa1", "sa2", "sa3"):
        i = 0
        while f"conv_{i}" in params[sa]:
            conv = params[sa][f"conv_{i}"]
            # [1, 1, in, out] -> [out, in, 1, 1]
            sd[f"{sa}.mlp_convs.{i}.weight"] = np.ascontiguousarray(
                np.asarray(conv["kernel"]).transpose(3, 2, 0, 1)
            )
            sd[f"{sa}.mlp_convs.{i}.bias"] = np.asarray(conv["bias"])
            bn = params[sa][f"bn_{i}"]
            bs = batch_stats[sa][f"bn_{i}"]
            sd[f"{sa}.mlp_bns.{i}.weight"] = np.asarray(bn["scale"])
            sd[f"{sa}.mlp_bns.{i}.bias"] = np.asarray(bn["bias"])
            sd[f"{sa}.mlp_bns.{i}.running_mean"] = np.asarray(bs["mean"])
            sd[f"{sa}.mlp_bns.{i}.running_var"] = np.asarray(bs["var"])
            i += 1

    for fc, bn in (("fc1", "bn1"), ("fc2", "bn2")):
        sd[f"{fc}.weight"] = np.ascontiguousarray(
            np.asarray(params[fc]["kernel"]).T)
        sd[f"{fc}.bias"] = np.asarray(params[fc]["bias"])
        sd[f"{bn}.weight"] = np.asarray(params[bn]["scale"])
        sd[f"{bn}.bias"] = np.asarray(params[bn]["bias"])
        sd[f"{bn}.running_mean"] = np.asarray(batch_stats[bn]["mean"])
        sd[f"{bn}.running_var"] = np.asarray(batch_stats[bn]["var"])
    sd["fc3.weight"] = np.ascontiguousarray(np.asarray(params["fc3"]["kernel"]).T)
    sd["fc3.bias"] = np.asarray(params["fc3"]["bias"])
    return sd


def import_sa_msg_torch_state(state_dict, num_scales: int) -> Dict:
    """Map a torch ``PointNetSetAbstractionMsg`` state_dict to flax variables."""
    sd = state_dict
    params: Dict = {}
    batch_stats: Dict = {}
    for i in range(num_scales):
        j = 0
        while f"conv_blocks.{i}.{j}.weight" in sd:
            w = _t(sd[f"conv_blocks.{i}.{j}.weight"])  # [out, in, 1, 1]
            params[f"conv_{i}_{j}"] = {
                "kernel": w.transpose(2, 3, 1, 0),
                "bias": _t(sd[f"conv_blocks.{i}.{j}.bias"]),
            }
            params[f"bn_{i}_{j}"] = {
                "scale": _t(sd[f"bn_blocks.{i}.{j}.weight"]),
                "bias": _t(sd[f"bn_blocks.{i}.{j}.bias"]),
            }
            batch_stats[f"bn_{i}_{j}"] = {
                "mean": _t(sd[f"bn_blocks.{i}.{j}.running_mean"]),
                "var": _t(sd[f"bn_blocks.{i}.{j}.running_var"]),
            }
            j += 1
    return {"params": params, "batch_stats": batch_stats}


def import_fp_torch_state(state_dict) -> Dict:
    """Map a torch ``PointNetFeaturePropagation`` state_dict to flax variables."""
    sd = state_dict
    params: Dict = {}
    batch_stats: Dict = {}
    i = 0
    while f"mlp_convs.{i}.weight" in sd:
        w = _t(sd[f"mlp_convs.{i}.weight"])  # [out, in, 1]
        params[f"conv_{i}"] = {
            "kernel": w.transpose(2, 1, 0),  # -> [1, in, out]
            "bias": _t(sd[f"mlp_convs.{i}.bias"]),
        }
        params[f"bn_{i}"] = {
            "scale": _t(sd[f"mlp_bns.{i}.weight"]),
            "bias": _t(sd[f"mlp_bns.{i}.bias"]),
        }
        batch_stats[f"bn_{i}"] = {
            "mean": _t(sd[f"mlp_bns.{i}.running_mean"]),
            "var": _t(sd[f"mlp_bns.{i}.running_var"]),
        }
        i += 1
    return {"params": params, "batch_stats": batch_stats}
