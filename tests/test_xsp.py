"""x-stream sequence-parallel attention: exact equivalence to dense attention
on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcdiff.ops.flash_attention import _xla_attention
from pcdiff.parallel import make_mesh
from pcdiff.parallel.xsp import sharded_read_attention, sharded_write_attention

B, H, D = 2, 4, 16


@pytest.fixture(scope="module")
def mesh():
    # all 8 devices on the model axis: the x-token axis splits 8 ways
    return make_mesh(data_parallel=1, model_parallel=8)


def _qkv(rng, nq, nk):
    q = jnp.asarray(rng.standard_normal((B, H, nq, D)), dtype=jnp.float32) * 0.3
    k = jnp.asarray(rng.standard_normal((B, H, nk, D)), dtype=jnp.float32) * 0.3
    v = jnp.asarray(rng.standard_normal((B, H, nk, D)), dtype=jnp.float32)
    return q, k, v


def test_read_attention_matches_dense(rng, mesh):
    """z queries (replicated) over x KV sharded 8 ways: global softmax must
    equal the dense result exactly (up to reduction order)."""
    q, k, v = _qkv(rng, nq=24, nk=64)  # nk divisible by 8
    want = _xla_attention(q, k, v)
    got = sharded_read_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_write_attention_matches_dense(rng, mesh):
    """x queries sharded 8 ways over replicated z KV: purely local."""
    q, k, v = _qkv(rng, nq=64, nk=24)
    want = _xla_attention(q, k, v)
    got = sharded_write_attention(q, k, v, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_read_attention_under_jit_with_sharded_inputs(rng, mesh):
    """The primitive composes with jit and actually-sharded device arrays."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    q, k, v = _qkv(rng, nq=24, nk=64)
    kv_sharding = NamedSharding(mesh, P(None, None, "model", None))
    k_sharded = jax.device_put(k, kv_sharding)
    v_sharded = jax.device_put(v, kv_sharding)
    f = jax.jit(lambda q, k, v: sharded_read_attention(q, k, v, mesh))
    got = f(q, k_sharded, v_sharded)
    want = _xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
