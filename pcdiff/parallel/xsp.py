"""x-stream sequence parallelism: point tokens sharded across the mesh.

The RIN architecture's scaling story (SURVEY.md section 5.7): per-point cost
is two cross-attentions per block while the quadratic compute lives on the
latent stream. Scaling the point count across chips therefore means:

- **x sharded** on the token axis over the ``model`` mesh axis, z replicated;
- **read attention** (z queries x): local partial attention per shard with a
  globally-normalized softmax — ``pmax`` for the running max, ``psum`` for
  the normalizer and the value-weighted partial sums (one collective round
  per attention, riding ICI);
- **write attention** (x queries z): kv replicated, queries local — zero
  collectives;
- x-side MLPs/LayerNorms: trivially local.

These primitives make exact, test-verified building blocks for a sharded
backbone (integration is a follow-up; 1024-point models fit one chip).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from .mesh import MODEL_AXIS

__all__ = [
    "sharded_read_attention",
    "sharded_write_attention",
    "sharded_head_attention",
]


def _local_attention(q, k, v):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def sharded_read_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
) -> jnp.ndarray:
    """Attention with REPLICATED queries over KV sharded on the token axis.

    q: [B, H, Nq, D] replicated; k, v: [B, H, Nk, D] with Nk sharded over
    ``axis``. Returns [B, H, Nq, D] replicated. Exact global softmax via the
    flash-attention identity: out = psum(exp(l - m) V) / psum(exp(l - m) 1)
    with m = pmax(local max). q is expected pre-scaled.
    """

    def local_fn(q_l, k_l, v_l):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", q_l, k_l, preferred_element_type=jnp.float32
        ).astype(jnp.float32)
        m_local = jnp.max(logits, axis=-1)
        # the softmax max-shift is gradient-invariant; stop_gradient makes
        # pmax differentiable-by-construction with exact gradients
        m = jax.lax.pmax(jax.lax.stop_gradient(m_local), axis)
        p = jnp.exp(logits - m[..., None])
        denom = jax.lax.psum(jnp.sum(p, axis=-1), axis)
        part = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_l.dtype), v_l)
        out = jax.lax.psum(part, axis)
        return (out / denom[..., None].astype(out.dtype)).astype(q_l.dtype)

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(None, None, axis, None), P(None, None, axis, None)),
        out_specs=P(),
        check_rep=False,
    )(q, k, v)


def sharded_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
) -> jnp.ndarray:
    """Tensor-parallel attention: HEADS sharded over ``axis``, tokens
    replicated. Each device computes its head group's attention fully
    locally — zero collectives (the all-reduce happens later in the output
    projection, inserted by GSPMD). The natural strategy for the z-stream
    compute blocks, whose quadratic cost lives on few tokens but many heads.

    q, k, v: [B, H, N, D] with H sharded over ``axis``; q pre-scaled.
    """
    return shard_map(
        _local_attention,
        mesh=mesh,
        in_specs=(
            P(None, axis, None, None),
            P(None, axis, None, None),
            P(None, axis, None, None),
        ),
        out_specs=P(None, axis, None, None),
        check_rep=False,
    )(q, k, v)


def sharded_write_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = MODEL_AXIS,
) -> jnp.ndarray:
    """Attention with queries SHARDED on the token axis over replicated KV.

    q: [B, H, Nq, D] with Nq sharded over ``axis``; k, v replicated.
    Fully local — no collectives. q is expected pre-scaled.
    """
    return shard_map(
        _local_attention,
        mesh=mesh,
        in_specs=(P(None, None, axis, None), P(), P()),
        out_specs=P(None, None, axis, None),
        check_rep=False,
    )(q, k, v)
