"""PointNet++ feature/probability extraction for P-FID / P-IS.

Parity with ``/root/reference/evals/feature_extractor.py:51-119``: normalize
each cloud to zero mean / unit sphere, run the pretrained width-mult-2
PointNet++ in fixed-size jitted batches, return (256-d features, 40-class
probabilities). The reference shards work over GPUs with a thread pool; here
one jitted program handles padded batches and the data-parallel mesh (if
active) shards them across chips.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pointnet2 import PointNet2ClassifierSSG, import_pointnet2_torch_state

__all__ = ["normalize_point_clouds", "PointNetClassifier"]


def normalize_point_clouds(pc: np.ndarray) -> np.ndarray:
    """Center each cloud and scale to the unit sphere
    (reference ``feature_extractor.py:114-119``)."""
    centroids = np.mean(pc, axis=1, keepdims=True)
    pc = pc - centroids
    m = np.max(np.sqrt(np.sum(pc**2, axis=-1, keepdims=True)), axis=1, keepdims=True)
    return pc / m


class PointNetClassifier:
    """Pretrained PointNet++ SSG wrapper returning features and probs."""

    def __init__(
        self,
        params=None,
        torch_checkpoint_path: Optional[str] = None,
        batch_size: int = 64,
        width_mult: int = 2,
        num_class: int = 40,
        mesh=None,
        dtype=None,
    ):
        """``dtype=np.float64`` runs the extractor forward in float64
        (requires ``jax_enable_x64``). fp32 GEMMs are reduction-order
        sensitive — full-batch vs chunked evaluation of IDENTICAL
        weights+inputs moves P-FID by ~5% at n=240 through the
        ill-conditioned 512-dim Frechet sqrtm — so cross-implementation
        P-FID parity checks (scripts/pfid_evidence.py) canonicalize both
        pipelines to f64, where order jitter collapses below 1e-9."""
        self.model = PointNet2ClassifierSSG(
            num_class=num_class, normal_channel=False, width_mult=width_mult
        )
        if params is None:
            if torch_checkpoint_path is None:
                raise ValueError("pass params or torch_checkpoint_path")
            import torch

            sd = torch.load(torch_checkpoint_path, map_location="cpu",
                            weights_only=True)
            if "model_state_dict" in sd:
                sd = sd["model_state_dict"]
            params = import_pointnet2_torch_state(sd)
        self.dtype = np.dtype(dtype) if dtype is not None else np.dtype(np.float32)
        if self.dtype == np.float64:
            params = jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64)
                if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
                params,
            )
        self.variables = params
        self.batch_size = batch_size
        # The reference fans batches out over GPUs with a thread pool
        # (feature_extractor.py:84-110); here one jitted program is sharded
        # over the mesh's data axis — XLA splits the batch across chips.
        self._batch_sharding = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
            if batch_size % mesh.shape["data"]:
                raise ValueError(
                    f"batch_size {batch_size} must divide over the mesh's "
                    f"data axis ({mesh.shape['data']})"
                )

        def fwd(variables, xyz):
            log_probs, _, feats = self.model.apply(variables, xyz, features=True)
            return feats, jnp.exp(log_probs)

        self._fwd = jax.jit(fwd)

    def features_and_preds(self, point_clouds: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """point_clouds: [N, P, 3] -> (features [N, F], preds [N, C])."""
        pc = normalize_point_clouds(np.asarray(point_clouds, dtype=self.dtype))
        n = len(pc)
        feats_out, preds_out = [], []
        for i in range(0, n, self.batch_size):
            chunk = pc[i : i + self.batch_size]
            pad = self.batch_size - len(chunk)
            if pad:
                chunk = np.concatenate([chunk, chunk[-1:].repeat(pad, axis=0)])
            device_chunk = jnp.asarray(chunk)
            if self._batch_sharding is not None:
                device_chunk = jax.device_put(device_chunk, self._batch_sharding)
            feats, preds = self._fwd(self.variables, device_chunk)
            feats_out.append(np.asarray(feats)[: self.batch_size - pad])
            preds_out.append(np.asarray(preds)[: self.batch_size - pad])
        return np.concatenate(feats_out, axis=0), np.concatenate(preds_out, axis=0)
