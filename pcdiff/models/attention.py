"""Attention and transformer building blocks (flax.linen).

Design notes (TPU-first):
- softmax always in float32 regardless of compute dtype (the reference pins
  fp32 softmax for fp16 stability, ``/root/reference/models/transformer.py:83``;
  on TPU the analogous hazard is bfloat16);
- attention is a single batched einsum chain that XLA tiles onto the MXU;
  the ``attention_fn`` hook lets hot paths swap in the Pallas flash-attention
  kernel from :mod:`pcdiff.ops` without touching module code;
- pre-LN residual blocks mirroring torch's ``norm_first=True`` encoder /
  decoder layers used by the reference encoders
  (``/root/reference/models/model.py:273-294``).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

__all__ = [
    "dot_product_attention",
    "CrossAttention",
    "FusedLayerNorm",
    "LayerNorm",
    "Mlp",
    "EncoderLayer",
    "DecoderLayer",
    "set_ln_dense_fusion",
    "fuse_ln_dense_enabled",
    "set_ln_mlp_fusion",
    "fuse_ln_mlp_enabled",
    "set_gelu_impl",
    "gelu_act",
]

AttentionFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]


def dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Dense attention with fp32 softmax. q,k,v: [B, H, N, D] -> [B, H, Nq, D].

    q is expected pre-scaled (by 1/sqrt(D) or split-scaling). Dispatches to
    the Pallas fused kernel on TPU (scores stay in VMEM) and to plain XLA
    einsums elsewhere; see :mod:`pcdiff.ops.flash_attention`.
    """
    from ..ops.flash_attention import fused_attention

    return fused_attention(q, k, v)


default_kernel_init = nn.initializers.xavier_uniform()


class FusedLayerNorm(nn.Module):
    """Drop-in ``nn.LayerNorm`` (last-axis, fp32 stats, fast variance) with
    a backend-selectable implementation (XLA by default; opt-in Pallas
    in-VMEM kernel via ``pcdiff.ops.layer_norm.set_layernorm_backend``).

    Param tree ({"scale": [C], "bias": [C]}, fp32) and numerics are identical
    to ``flax.linen.LayerNorm`` — weight importers and golden tests see no
    difference. A/B on the full sampler showed the standalone kernel LOSES
    ~5% end-to-end (see ``_use_pallas_ln``), so XLA stays the default.
    """

    epsilon: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    param_dtype: jnp.dtype = jnp.float32
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from flax.linen import dtypes

        from ..ops.layer_norm import fused_layer_norm

        c = x.shape[-1]
        scale = self.param("scale", self.scale_init, (c,), self.param_dtype)
        bias = self.param("bias", self.bias_init, (c,), self.param_dtype)
        out_dtype = dtypes.canonicalize_dtype(x, scale, bias, dtype=self.dtype)
        return fused_layer_norm(x, scale, bias, self.epsilon, out_dtype)


LN_EPS = 1e-5  # torch-parity epsilon, reference nn.LayerNorm default


class _LNParams(nn.Module):
    """Declares the LayerNorm param tree ({"scale", "bias"}, fp32) WITHOUT
    computing the normalization — the fused LN+Dense path consumes the raw
    (scale, bias) and normalizes inside the projection kernel. Param paths
    are identical to :class:`FusedLayerNorm`/``nn.LayerNorm``, so
    checkpoints are interchangeable between the fused and unfused graphs."""

    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c: int):
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        return scale, bias, LN_EPS


class _DenseParams(nn.Module):
    """Declares an ``nn.Dense``-compatible param tree (kernel [+ bias])
    without computing the projection (same names, shapes, and inits)."""

    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = default_kernel_init

    @nn.compact
    def __call__(self, c: int):
        kernel = self.param(
            "kernel", self.kernel_init, (c, self.features), self.param_dtype
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       self.param_dtype)
            if self.use_bias else None
        )
        return kernel, bias


_GELU_IMPL = "erf"  # erf | tanh


def set_gelu_impl(mode: str) -> None:
    """Select the GELU flavor applied by every MLP that routes through
    ``gelu_act()``/``gelu_approximate()`` — the denoiser's per-token fc1
    epilogues AND the conditioning encoders' Encoder/DecoderLayer MLPs.
    Only the literal ``nn.gelu`` stems in encoders.py/rotary.py stay
    exact-erf regardless. Modes: 'erf' (exact, torch ``nn.GELU()``
    parity — the default) or 'tanh' (torch
    ``approximate='tanh'``; |err| <= 1.5e-3 abs vs exact). On TPU the
    tanh form rides the hardware exp instead of a ~12-term erf rational
    on the VPU — it exists as a quality-gated perf lever for the
    fc1-epilogue-bound fused kernels (docs/performance.md). Trace-time
    decision; param trees are identical either way."""
    global _GELU_IMPL
    assert mode in ("erf", "tanh")
    _GELU_IMPL = mode


def gelu_act() -> str:
    """The activation tag MLPs pass to the fused LN+Dense kernels."""
    return "gelu" if _GELU_IMPL == "erf" else "gelu_tanh"


def gelu_approximate() -> bool:
    """``approximate=`` flag for ``nn.gelu`` on the unfused paths."""
    return _GELU_IMPL == "tanh"


_LN_DENSE_FUSION = "auto"  # auto | on | off


def set_ln_dense_fusion(mode: str) -> None:
    """Select whether pre-LN blocks fuse the LayerNorm into the consuming
    projection (:func:`pcdiff.ops.ln_dense.fused_ln_denses`): 'auto' (TPU
    only), 'on', or 'off'. Trace-time decision; param trees are identical
    either way, so a checkpoint works under both graphs."""
    global _LN_DENSE_FUSION
    assert mode in ("auto", "on", "off")
    _LN_DENSE_FUSION = mode


def fuse_ln_dense_enabled() -> bool:
    if _LN_DENSE_FUSION == "off":
        return False
    if _LN_DENSE_FUSION == "on":
        return True
    import jax

    return jax.default_backend() == "tpu"


# Measured throughput-NEUTRAL on the TPU sampling bench (10.90 vs 10.94
# clouds/s) at ~1.7x the server-side compile cost — the split path's fc1
# kernel is VPU-erf-bound, not hidden-traffic-bound, so keeping the
# [B, N, F] hidden in VMEM buys nothing (docs/performance.md). Kept as an
# opt-in A/B knob.
_LN_MLP_FUSION = "off"  # auto | on | off


def set_ln_mlp_fusion(mode: str) -> None:
    """Select whether pre-LN MLPs fuse the WHOLE LN -> fc1 -> act -> fc2
    chain into one kernel (:func:`pcdiff.ops.ln_dense.fused_ln_mlp`):
    'auto' (follows the LN+Dense fusion decision), 'on', or 'off'
    ('off' keeps the split path: fused LN+fc1, XLA fc2). Trace-time
    decision; param trees are identical either way."""
    global _LN_MLP_FUSION
    assert mode in ("auto", "on", "off")
    _LN_MLP_FUSION = mode


def fuse_ln_mlp_enabled() -> bool:
    if _LN_MLP_FUSION == "off":
        return False
    if _LN_MLP_FUSION == "on":
        return True
    return fuse_ln_dense_enabled()


def _ln_dense_multi(x, ln, params, dtype, acts=None, out_scales=None):
    """LN(x) -> [act_i(Dense_i(LN(x)) * s_i)] with the normalized tensor
    never materialized (multi-output Pallas kernel on TPU, the equivalent
    XLA composition elsewhere). ``params`` is a list of
    (kernel, bias-or-None); ``acts`` of None|'gelu'; ``out_scales`` of
    trace-time constants folded into the weights (weights are
    loop-invariant, so the fold is hoisted out of sampler loops)."""
    from ..ops.ln_dense import fused_ln_denses

    scale, bias, eps = ln
    kernels = [k for k, _ in params]
    biases = [b for _, b in params]
    if out_scales is not None:
        kernels = [k if s is None else k * s
                   for k, s in zip(kernels, out_scales)]
        biases = [b if (s is None or b is None) else b * s
                  for b, s in zip(biases, out_scales)]
    if acts is None:
        acts = (None,) * len(kernels)
    return fused_ln_denses(x, scale, bias, tuple(kernels), tuple(biases),
                           eps, dtype, tuple(acts))


def LayerNorm(**kwargs):
    """LayerNorm with torch's epsilon (1e-5) for weight-port parity."""
    kwargs.setdefault("epsilon", 1e-5)
    return FusedLayerNorm(**kwargs)


class CrossAttention(nn.Module):
    """Multi-head attention with separate query and key/value inputs.

    Functional parity with the reference RIN ``CrossAttention``
    (``/root/reference/models/modules.py:17-63``): output dim = query dim,
    heads over the query dim, optional qkv bias, projection dropout.
    """

    dim: int
    num_heads: int = 16
    qkv_bias: bool = False
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: jnp.dtype = jnp.float32
    attention_fn: AttentionFn = staticmethod(dot_product_attention)

    @nn.compact
    def __call__(
        self,
        x_q: jnp.ndarray,
        x_kv: jnp.ndarray,
        deterministic: bool = True,
        *,
        q_ln=None,
        kv_ln=None,
    ) -> jnp.ndarray:
        """With ``q_ln``/``kv_ln`` (the (scale, bias, eps) tuples from
        :class:`_LNParams`), ``x_q``/``x_kv`` are UN-normalized and the
        pre-LN is fused into the q/k/v projections (one concatenated
        matmul per distinct input); otherwise inputs are pre-normalized by
        the caller as usual. Param tree is identical in both modes."""
        B, N_q, _ = x_q.shape
        N_kv = x_kv.shape[1]
        H = self.num_heads
        head_dim = self.dim // H
        scale = head_dim**-0.5

        if q_ln is not None:
            # The attention 1/sqrt(d) scale on q is folded into wq at trace
            # time, so q2 comes out of the kernel PRE-scaled (one less
            # elementwise HBM pass between the two custom calls).
            wq = _DenseParams(self.dim, self.qkv_bias, name="wq")(x_q.shape[-1])
            wk = _DenseParams(self.dim, self.qkv_bias, name="wk")(x_kv.shape[-1])
            wv = _DenseParams(self.dim, self.qkv_bias, name="wv")(x_kv.shape[-1])
            if x_q is x_kv and q_ln is kv_ln:
                q2, k2, v2 = _ln_dense_multi(
                    x_q, q_ln, [wq, wk, wv], self.dtype,
                    out_scales=[scale, None, None])
            else:
                (q2,) = _ln_dense_multi(x_q, q_ln, [wq], self.dtype,
                                        out_scales=[scale])
                if kv_ln is not None:
                    k2, v2 = _ln_dense_multi(x_kv, kv_ln, [wk, wv], self.dtype)
                else:
                    # pre-normalized (or un-normalized-by-design) kv side,
                    # e.g. decoder cross-attention over raw memory
                    proj = lambda p: (
                        x_kv.astype(self.dtype) @ p[0].astype(self.dtype)
                        + (0 if p[1] is None else p[1].astype(self.dtype)))
                    k2, v2 = proj(wk), proj(wv)
        else:
            dense = lambda name: nn.Dense(
                self.dim, use_bias=self.qkv_bias, dtype=self.dtype,
                kernel_init=default_kernel_init, name=name,
            )
            q2 = dense("wq")(x_q)
            k2 = dense("wk")(x_kv)
            v2 = dense("wv")(x_kv)

        if q_ln is None:
            q2 = q2 * scale  # fused path folds the scale into wq
        fn = self.attention_fn
        inner = fn.__func__ if isinstance(fn, staticmethod) else fn
        if inner is dot_product_attention:
            # default path: heads stay folded in the feature axis so no
            # head-split relayout ever reaches HBM (Pallas kernel on TPU)
            from ..ops.flash_attention import fused_attention_mh

            out = fused_attention_mh(q2, k2, v2, H)
        else:
            # custom attention_fn hook (e.g. xsp sharded attention): bhqd
            q = q2.reshape(B, N_q, H, head_dim).transpose(0, 2, 1, 3)
            k = k2.reshape(B, N_kv, H, head_dim).transpose(0, 2, 1, 3)
            v = v2.reshape(B, N_kv, H, head_dim).transpose(0, 2, 1, 3)
            out = fn(q, k, v)
            out = out.transpose(0, 2, 1, 3).reshape(B, N_q, self.dim)
        if self.attn_drop > 0.0:
            # the reference drops attention *weights*; with the fused kernel we
            # apply an equivalent-rate dropout on the attention output
            out = nn.Dropout(self.attn_drop)(out, deterministic=deterministic)
        out = nn.Dense(
            self.dim, dtype=self.dtype, kernel_init=default_kernel_init, name="proj"
        )(out)
        return nn.Dropout(self.proj_drop)(out, deterministic=deterministic)


class Mlp(nn.Module):
    """Two-layer GELU MLP (timm-style: fc1 -> act -> drop -> fc2 -> drop)."""

    hidden_dim: int
    out_dim: Optional[int] = None
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, *, ln=None
    ) -> jnp.ndarray:
        out_dim = self.out_dim or x.shape[-1]
        if (ln is not None and fuse_ln_mlp_enabled()
                and (self.drop == 0.0 or deterministic)):
            # WHOLE pre-LN MLP in one kernel: the [B, N, hidden] activation
            # never leaves VMEM (the split path round-trips it through HBM
            # between the fc1 custom call and fc2's fusion). Only when
            # dropout is inactive — dropout between fc1 and fc2 cannot
            # cross the kernel boundary.
            from ..ops.ln_dense import fused_ln_mlp

            scale, bias_p, eps = ln
            w1, b1 = _DenseParams(self.hidden_dim, name="fc1")(x.shape[-1])
            w2, b2 = _DenseParams(out_dim, name="fc2")(self.hidden_dim)
            return fused_ln_mlp(x, scale, bias_p, w1, b1, w2, b2, eps,
                                self.dtype, gelu_act())
        if ln is not None:
            # pre-LN fused into fc1 (x is UN-normalized; see CrossAttention)
            # with the GELU applied on the f32 accumulator inside the
            # kernel — a standalone gelu between two custom calls costs
            # an f32 materialization of the [B, N, 4C] activation.
            fc1 = _DenseParams(self.hidden_dim, name="fc1")(x.shape[-1])
            (x,) = _ln_dense_multi(x, ln, [fc1], self.dtype,
                                   acts=[gelu_act()])
        else:
            x = nn.Dense(
                self.hidden_dim, dtype=self.dtype,
                kernel_init=default_kernel_init, name="fc1",
            )(x)
            x = nn.gelu(x, approximate=gelu_approximate())
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(
            out_dim, dtype=self.dtype, kernel_init=default_kernel_init, name="fc2"
        )(x)
        return nn.Dropout(self.drop)(x, deterministic=deterministic)


class EncoderLayer(nn.Module):
    """Pre-LN transformer encoder layer (torch ``norm_first=True`` semantics):
    ``x += attn(LN(x)); x += mlp(LN(x))`` with dropout on each residual."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = CrossAttention(
            self.dim, num_heads=self.num_heads, qkv_bias=True,
            attn_drop=self.drop, proj_drop=0.0, dtype=self.dtype, name="self_attn",
        )
        mlp = Mlp(
            int(self.dim * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
            name="mlp",
        )
        if fuse_ln_dense_enabled():
            ln1 = _LNParams(name="norm1")(x.shape[-1])
            h = attn(x, x, deterministic=deterministic, q_ln=ln1, kv_ln=ln1)
            x = x + nn.Dropout(self.drop)(h, deterministic=deterministic)
            ln2 = _LNParams(name="norm2")(x.shape[-1])
            return x + mlp(x, deterministic=deterministic, ln=ln2)
        h = LayerNorm(dtype=self.dtype, name="norm1")(x)
        h = attn(h, h, deterministic=deterministic)
        x = x + nn.Dropout(self.drop)(h, deterministic=deterministic)
        h = LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = mlp(h, deterministic=deterministic)
        return x + h


class DecoderLayer(nn.Module):
    """Pre-LN transformer decoder layer: self-attn over queries, cross-attn
    to memory, then MLP (torch ``TransformerDecoderLayer(norm_first=True)``)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    drop: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, q: jnp.ndarray, memory: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        self_attn = CrossAttention(
            self.dim, num_heads=self.num_heads, qkv_bias=True,
            attn_drop=self.drop, proj_drop=0.0, dtype=self.dtype, name="self_attn",
        )
        cross_attn = CrossAttention(
            self.dim, num_heads=self.num_heads, qkv_bias=True,
            attn_drop=self.drop, proj_drop=0.0, dtype=self.dtype, name="cross_attn",
        )
        mlp = Mlp(
            int(self.dim * self.mlp_ratio), drop=self.drop, dtype=self.dtype,
            name="mlp",
        )
        if fuse_ln_dense_enabled():
            ln1 = _LNParams(name="norm1")(q.shape[-1])
            h = self_attn(q, q, deterministic=deterministic, q_ln=ln1,
                          kv_ln=ln1)
            q = q + nn.Dropout(self.drop)(h, deterministic=deterministic)
            ln2 = _LNParams(name="norm2")(q.shape[-1])
            # memory is un-normalized by design (torch norm_first decoder):
            # only the query side carries a pre-LN
            h = cross_attn(q, memory, deterministic=deterministic, q_ln=ln2,
                           kv_ln=None)
            q = q + nn.Dropout(self.drop)(h, deterministic=deterministic)
            ln3 = _LNParams(name="norm3")(q.shape[-1])
            return q + mlp(q, deterministic=deterministic, ln=ln3)
        h = LayerNorm(dtype=self.dtype, name="norm1")(q)
        h = self_attn(h, h, deterministic=deterministic)
        q = q + nn.Dropout(self.drop)(h, deterministic=deterministic)
        h = LayerNorm(dtype=self.dtype, name="norm2")(q)
        h = cross_attn(h, memory, deterministic=deterministic)
        q = q + nn.Dropout(self.drop)(h, deterministic=deterministic)
        h = LayerNorm(dtype=self.dtype, name="norm3")(q)
        h = mlp(h, deterministic=deterministic)
        return q + h
