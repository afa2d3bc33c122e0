"""Parallel-in-time Karras sampling (Picard iteration over step windows).

The reference's sampling loop is strictly sequential — one denoiser call
chain of length 2(n-1)+1 per batch (``/root/reference/diffusion/
k_diffusion.py:270-311``). On a TPU pod slice that serial chain leaves all
but one chip's worth of extra capacity idle once the batch itself no longer
fills the mesh. This module implements ParaDiGMS-style parallel sampling
(Shih et al., arXiv:2305.16317, PAPERS.md): write the Heun recurrence in
integral form

    x_{i+1} = x_p + sum_{j=p..i} D_j(x_j, state_j)

over a sliding window of ``W`` steps and solve it by Picard (fixed-point)
iteration. Every iteration evaluates ALL window drifts in one batched,
``vmap``-ped denoiser call — a [W, B, ...] workload that shards over the
mesh's data axis (``window_spec``), so wall-clock per iteration is one
denoiser call per chip instead of ``W`` sequential calls.

Correctness structure:

- Window position ``p`` (the frontier) reads an *exact* ``x_p`` and exact
  input state, so its update is exact — the frontier always advances by at
  least one step per iteration and the solve terminates in <= n iterations.
- With ``tol > 0`` the frontier additionally skips past positions whose
  iterate moved less than ``tol`` (scaled by the position's noise level),
  which is where the parallel speedup comes from: converged-enough suffixes
  are accepted without re-evaluation, cutting sequential iterations to a
  fraction of ``n`` (the paper reports ~3x fewer).
- ``tol=0`` degenerates to an exact (but redundant) re-derivation of
  ``sample_heun`` — used by the parity tests.

The RIN latent self-conditioning state (``/root/reference/diffusion/
k_diffusion.py:189-203``) is threaded per-position: a buffer holds each
step's input state; within a window evaluation the predictor -> corrector
state order of the sequential sampler is reproduced exactly, and
cross-position state lags one Picard iteration (exact at the frontier,
hence exact at convergence).

Restrictions vs :func:`pcdiff.diffusion.karras.sample_heun`: ``s_churn``
must be 0 (the flagship config's setting — stochastic churn would decouple
the parallel trajectory from the sequential one) and ``progressive`` is not
offered (the full x-trajectory is available as a byproduct instead).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .karras import DenoiseFn, to_d

__all__ = ["sample_heun_parallel"]


def _tree_where(pred, a, b):
    """Elementwise select over matching pytrees with a scalar/bcast pred."""
    return jax.tree.map(
        lambda x, y: jnp.where(
            pred.reshape(pred.shape + (1,) * (x.ndim - pred.ndim)), x, y
        ),
        a,
        b,
    )


def _window_eval(denoise_fn: DenoiseFn, win_x, win_sigma, win_sigma_next,
                 win_state):
    """Batched Heun drifts for all window positions: one vmapped call pair.

    Per position the predictor -> corrector state threading matches the
    sequential sampler (``karras.sample_heun``); the final (sigma_next == 0)
    step is pure Euler and keeps only the predictor's state, as the
    sequential code path does.
    """

    def eval_one(x, sigma, sigma_next, st):
        s_in = jnp.ones((x.shape[0],), x.dtype)
        denoised, st1 = denoise_fn(x, sigma * s_in, st)
        d = to_d(x, sigma, denoised)
        dt = sigma_next - sigma
        x_2 = x + d * dt
        is_last = sigma_next == 0.0
        safe_next = jnp.where(is_last, jnp.ones_like(sigma_next), sigma_next)
        denoised_2, st2 = denoise_fn(x_2, safe_next * s_in, st1)
        d_2 = (x_2 - denoised_2) / safe_next
        drift = jnp.where(is_last, d * dt, (d + d_2) / 2.0 * dt)
        st_out = st1 if st is None else _tree_where(
            jnp.asarray(is_last)[None], st1, st2
        )
        return drift, denoised, st_out

    return jax.vmap(eval_one)(win_x, win_sigma, win_sigma_next, win_state)


def sample_heun_parallel(
    denoise_fn: DenoiseFn,
    x_T: jnp.ndarray,
    sigmas: np.ndarray,
    key: jax.Array,
    *,
    state: Any = None,
    window: int = 8,
    tol: float = 1e-3,
    s_churn: float = 0.0,
    window_spec: Optional[Any] = None,
    mesh: Optional[Any] = None,
) -> dict:
    """Picard-parallel Heun solve; same contract as ``sample_heun``.

    Args:
      window: number of ODE steps evaluated concurrently per iteration.
      tol: per-position convergence tolerance on the RMS change of the
        iterate, relative to the position's expected scale
        ``sqrt(sigma^2 + sigma_data^2)``. 0 means exact (sequential-parity)
        mode.
      window_spec: optional ``PartitionSpec`` for the window-stacked
        tensors (leading axis = window). Pass ``P('data')`` (with ``mesh``)
        to shard the W axis over the mesh — parallel-in-time across chips.
      mesh: the ``jax.sharding.Mesh`` that ``window_spec`` refers to.

    Returns dict with ``x``, ``pred_xstart``, ``state``, and
    ``parallel_iters`` (sequential denoiser rounds actually used;
    ``<= n`` and typically ``~n/2`` at tol=1e-3).

    Note: the convergence test measures only the ``x`` iterate. At
    ``tol > 0`` the returned ``state`` (the threaded latent
    self-conditioning) at accepted positions lags one Picard iteration —
    it is approximate to the same order as the accepted ``x`` error; at
    ``tol=0`` it is exact.
    """
    del key  # churn-free Heun is deterministic given x_T
    if s_churn != 0.0:
        raise NotImplementedError(
            "parallel Heun requires s_churn=0 (stochastic churn would "
            "decouple the parallel and sequential trajectories)"
        )
    n = len(sigmas) - 1
    W = min(window, n)
    sig = jnp.asarray(sigmas, dtype=jnp.float32)
    sigma_i = sig[:-1]  # [n]
    sigma_next = sig[1:]  # [n]
    # expected per-coordinate scale of x_{i+1}: noise level + data std (the
    # EDM sigma_data=0.5 of this model family) — makes tol meaningful across
    # the whole 120 -> 0 sigma range
    scale2 = sigma_next**2 + 0.25

    has_state = state is not None

    def shard(tree):
        if window_spec is None:
            return tree
        sh = jax.sharding.NamedSharding(mesh, window_spec)
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, sh), tree
        )

    # Trajectory buffer: X[i] is the iterate of x at sigma index i. The
    # buffers carry W scratch rows past the end so the window write near the
    # trajectory tail never goes out of bounds (dynamic_update_slice CLAMPS
    # out-of-range starts, which would silently corrupt earlier positions).
    X = jnp.broadcast_to(x_T[None], (n + W,) + x_T.shape)
    Dn = jnp.zeros((n + W,) + x_T.shape, x_T.dtype)  # last denoised per pos
    # S[i] = input state for position i (= state after position i-1).
    S = (
        jax.tree.map(lambda l: jnp.broadcast_to(l[None], (n + W,) + l.shape),
                     state)
        if has_state
        else None
    )

    def cond(carry):
        return carry[0] < n

    def body(carry):
        p, iters, X, Dn, S = carry
        idx = p + jnp.arange(W)
        valid = idx < n
        cidx = jnp.minimum(idx, n - 1)

        win_x = X[cidx]  # [W, B, N, C] (gather; exact at the frontier)
        win_state = jax.tree.map(lambda l: l[cidx], S) if has_state else None
        win_x = shard(win_x)
        if has_state:
            win_state = shard(win_state)

        drifts, denoised, st_out = _window_eval(
            denoise_fn, win_x, sigma_i[cidx], sigma_next[cidx], win_state
        )
        drifts = jnp.where(valid.reshape((W,) + (1,) * (drifts.ndim - 1)),
                           drifts, 0.0)

        frontier_x = X[p]
        new_x = frontier_x[None] + jnp.cumsum(drifts, axis=0)  # x_{p+1..p+W}
        old_x = X[jnp.minimum(idx + 1, n)]
        err = jnp.mean(
            (new_x - old_x) ** 2, axis=tuple(range(1, new_x.ndim))
        )  # [W]

        vmask = valid.reshape((W,) + (1,) * (new_x.ndim - 1))
        X = jax.lax.dynamic_update_slice_in_dim(
            X, jnp.where(vmask, new_x, old_x).astype(X.dtype),
            p + 1, axis=0
        )
        Dn = jax.lax.dynamic_update_slice_in_dim(
            Dn,
            jnp.where(vmask, denoised, Dn[cidx]).astype(Dn.dtype),
            p, axis=0,
        )
        if has_state:
            old_s = jax.tree.map(lambda l: l[jnp.minimum(idx + 1, n)], S)
            upd = _tree_where(valid, st_out, old_s)
            S = jax.tree.map(
                lambda buf, u: jax.lax.dynamic_update_slice_in_dim(
                    buf, u.astype(buf.dtype), p + 1, axis=0
                ),
                S, upd,
            )

        # Frontier position is exact now (advance >= 1); extend the advance
        # past additionally-converged positions.
        converged = err <= tol**2 * scale2[cidx]
        converged = converged.at[0].set(True)
        not_conv = jnp.logical_not(converged)
        advance = jnp.where(jnp.any(not_conv), jnp.argmax(not_conv), W)
        advance = jnp.minimum(advance.astype(p.dtype), n - p)
        return p + advance, iters + 1, X, Dn, S

    p0 = jnp.asarray(0, dtype=jnp.int32)
    p, iters, X, Dn, S = jax.lax.while_loop(
        cond, body, (p0, jnp.asarray(0, jnp.int32), X, Dn, S)
    )

    out = {
        "x": X[n],
        "pred_xstart": Dn[n - 1],
        "state": jax.tree.map(lambda l: l[n], S) if has_state else state,
        "parallel_iters": iters,
    }
    return out
