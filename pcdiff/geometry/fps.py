"""Farthest point sampling (FPS) as a jitted TPU program.

The algorithm is inherently sequential in the sample dimension, so it is
expressed as a ``lax.fori_loop`` over M iterations of an O(N) vectorized
min-distance update (the same math as the reference's pure-torch
``farthest_point_sample``, ``/root/reference/evals/pointnet2_utils.py:95-119``,
and the CUDA FPS it wraps at ``/root/reference/dataset/point_ops.py:23``).

Each iteration is a VPU-friendly [B, N] update; the whole loop compiles to a
single XLA while-loop with no host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["farthest_point_sample", "fps"]


@partial(jax.jit, static_argnames=("num_samples", "deterministic"))
def farthest_point_sample(
    points: jnp.ndarray,
    num_samples: int,
    *,
    key: Optional[jax.Array] = None,
    deterministic: bool = False,
) -> jnp.ndarray:
    """Indices of ``num_samples`` farthest points per batch element.

    points: [B, N, C] (only used through pairwise distances; C arbitrary)
    Returns idx: [B, num_samples] int32.

    ``deterministic=True`` seeds from index 0 (the reference's eval mode);
    otherwise ``key`` picks a random start per batch element.
    """
    B, N, _ = points.shape
    # distance comparisons need >= f32 accuracy (bf16 ties flip indices);
    # f64 inputs stay f64 so the P-FID canonical-double pipeline matches
    # the torch reference's double FPS index-for-index
    if points.dtype not in (jnp.float32, jnp.float64):
        points = points.astype(jnp.float32)

    if deterministic or key is None:
        # the reference's deterministic mode seeds batch element b at point
        # index b (evals/pointnet2_utils.py:107-108)
        start = jnp.arange(B, dtype=jnp.int32) % N
    else:
        start = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)

    def body(i, carry):
        idx, dist, farthest = carry
        idx = idx.at[:, i].set(farthest)
        centroid = jnp.take_along_axis(points, farthest[:, None, None], axis=1)
        d = jnp.sum((points - centroid) ** 2, axis=-1)  # [B, N]
        dist = jnp.minimum(dist, d)
        return idx, dist, jnp.argmax(dist, axis=-1).astype(jnp.int32)

    idx0 = jnp.zeros((B, num_samples), dtype=jnp.int32)
    dist0 = jnp.full((B, N), jnp.finfo(points.dtype).max, dtype=points.dtype)
    idx, _, _ = jax.lax.fori_loop(0, num_samples, body, (idx0, dist0, start))
    return idx


def fps(
    points: jnp.ndarray,
    num_samples: int,
    *,
    key: Optional[jax.Array] = None,
    deterministic: bool = False,
) -> jnp.ndarray:
    """FPS-downsample points [B, N, C] to [B, num_samples, C]."""
    idx = farthest_point_sample(
        points, num_samples, key=key, deterministic=deterministic
    )
    return jnp.take_along_axis(points, idx[..., None], axis=1)
