"""TwoStreamDenoiser: the fork's flagship multimodal completion denoiser.

Functional parity with ``/root/reference/models/model.py:422-547`` with two
TPU-first changes (both math-preserving):

1. **Trace-stable modality presence.** The reference branches in Python on
   ``torch.all(value == 0)`` per modality (``model.py:498-507,531-539``) — a
   data-dependent branch XLA cannot trace. Here presence is a [B] mask per
   modality: explicit via the ``presence`` kwarg (used by the CFG sampler to
   mark the zeroed unconditional rows), or defaulting to the reference's
   batch-level any-nonzero check computed with jnp (identical semantics,
   traced as a select instead of a branch).

2. **Cacheable conditioning.** Conditioning tokens depend only on the
   modality inputs, yet the reference re-runs all encoders at every ODE
   sub-step. ``encode_conditioning`` exposes them for one-shot computation;
   ``__call__`` accepts precomputed ``cond_tokens`` and skips the encoders —
   the sampler exploits this (reference hook: ``cached_model_kwargs``,
   ``model.py:478``).

Token-type ids are fixed per modality (class=0, view=1, partial_pcd=2,
depth=3); type embeddings are added unmasked during training but
presence-masked at inference (reference ``model.py:515-539``). Training-time
CFG dropout combines a full-batch drop mask with independent per-modality
keep masks (``model.py:519-529``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .encoders import (
    ClassEmbedding,
    DepthMapEncoder,
    PartialPointCloudEncoder,
    ViewAngleEmbedding,
)
from .rin import DenoiserBackbone

__all__ = ["TwoStreamDenoiser", "MODALITY_TOKEN_IDS"]

MODALITY_TOKEN_IDS = {"class": 0, "view": 1, "partial_pcd": 2, "depth": 3}


class TwoStreamDenoiser(nn.Module):
    """RIN backbone + multimodal conditioning encoders.

    Layout: points are channels-last ([B, N, C]); depth maps are NHWC.
    """

    num_points: int = 1024
    num_latents: int = 256
    cond_drop_prob: float = 0.1
    input_channels: int = 3
    output_channels: int = 3
    latent_dim: int = 768
    x_dim: int = 512
    num_blocks: int = 6
    num_compute_layers: int = 4
    num_classes: int = 16
    num_heads: int = 8
    num_tokens_ppcd: int = 64
    num_tokens_depth: int = 32
    depth_image_size: int = 512
    depth_patch: int = 32
    active_modalities: Sequence[str] = ("class", "view", "partial_pcd", "depth")
    dtype: jnp.dtype = jnp.float32
    # compile-wall lever: lax.scan over the RCW blocks (see
    # pcdiff.models.rin.DenoiserBackbone.scan_blocks); changes the backbone
    # param layout — convert checkpoints with rin.stack_rcw_block_params
    scan_blocks: bool = False
    # parallelism hooks (pcdiff.parallel.xsp): selectable attention
    # implementations for the read/write interface attentions (x-stream
    # sequence parallelism) and the latent compute attentions (head TP)
    read_attention_fn: Any = None
    write_attention_fn: Any = None
    compute_attention_fn: Any = None

    def setup(self):
        backbone_kwargs = {}
        if self.read_attention_fn is not None:
            backbone_kwargs["read_attention_fn"] = self.read_attention_fn
        if self.write_attention_fn is not None:
            backbone_kwargs["write_attention_fn"] = self.write_attention_fn
        if self.compute_attention_fn is not None:
            backbone_kwargs["compute_attention_fn"] = self.compute_attention_fn
        self.backbone = DenoiserBackbone(
            input_channels=self.input_channels,
            output_channels=self.output_channels,
            num_x=self.num_points, num_z=self.num_latents,
            z_dim=self.latent_dim, x_dim=self.x_dim,
            num_blocks=self.num_blocks,
            num_compute_layers=self.num_compute_layers,
            num_heads=self.num_heads, dtype=self.dtype,
            scan_blocks=self.scan_blocks,
            **backbone_kwargs,
        )
        encoders = {}
        for m in self.active_modalities:
            if m == "class":
                encoders[m] = ClassEmbedding(
                    num_classes=self.num_classes, embed_dim=self.latent_dim,
                    dtype=self.dtype,
                )
            elif m == "view":
                encoders[m] = ViewAngleEmbedding(
                    input_dim=3, embed_dim=self.latent_dim, dtype=self.dtype
                )
            elif m == "partial_pcd":
                encoders[m] = PartialPointCloudEncoder(
                    embed_dim=self.latent_dim, num_tokens=self.num_tokens_ppcd,
                    dtype=self.dtype,
                )
            elif m == "depth":
                encoders[m] = DepthMapEncoder(
                    in_channels=1, embed_dim=self.latent_dim,
                    num_tokens=self.num_tokens_depth,
                    image_size=self.depth_image_size, patch=self.depth_patch,
                    dtype=self.dtype,
                )
            else:
                raise ValueError(f"unknown modality: {m}")
        self.encoders = encoders
        self.token_type_embeddings = nn.Embed(
            4, self.latent_dim,
            embedding_init=nn.initializers.normal(stddev=0.005),
            dtype=self.dtype, name="token_type_embeddings",
        )

    # -------------------------------------------------------------- helpers

    def modality_token_counts(self) -> Dict[str, int]:
        counts = {"class": 1, "view": 1, "partial_pcd": self.num_tokens_ppcd,
                  "depth": self.num_tokens_depth}
        return {m: counts[m] for m in self.active_modalities}

    @property
    def num_cond_tokens(self) -> int:
        return sum(self.modality_token_counts().values())

    @property
    def latent_tokens(self) -> int:
        """Length of the self-conditioning latent: z_init + cond + time."""
        return self.num_latents + self.num_cond_tokens + 1

    def _presence(self, value, override) -> jnp.ndarray:
        """[B]-mask: explicit override, else the reference's batch-level
        any-nonzero check (model.py:501-507), else 0 for a missing input."""
        if override is not None:
            return override.astype(self.dtype)
        if value is None:
            return jnp.zeros((), dtype=self.dtype)
        return jnp.any(value != 0).astype(self.dtype)

    # ------------------------------------------------------------- encoding

    def encode_modalities(
        self,
        batch_size: int,
        class_labels=None,
        viewpoints=None,
        partial_pcd=None,
        depth_maps=None,
        presence: Optional[Dict[str, jnp.ndarray]] = None,
        train: bool = False,
    ) -> Dict[str, Optional[Tuple[jnp.ndarray, jnp.ndarray]]]:
        """Run the (expensive) modality encoders once.

        Returns ``{modality: (tokens * presence [B,count,D], presence [B,1,1])}``
        with ``None`` for absent inputs. The result feeds
        :meth:`assemble_conditioning`, which applies the cheap per-forward
        parts (type embeddings, CFG dropout) — the train step reuses one
        encoding across the self-conditioning bootstrap and the main
        forward (reference re-encodes per forward: ``train.py:184-191`` +
        ``models/model.py:498-509``).
        """
        presence = presence or {}
        inputs = {
            "class": class_labels, "view": viewpoints,
            "partial_pcd": partial_pcd, "depth": depth_maps,
        }
        B = batch_size
        raw: Dict[str, Optional[Tuple[jnp.ndarray, jnp.ndarray]]] = {}
        for m in self.active_modalities:
            value = inputs[m]
            if value is None:
                raw[m] = None
                continue
            p = self._presence(value, presence.get(m))
            p = jnp.broadcast_to(p, (B,))[:, None, None]  # [B,1,1]
            tokens = self.encoders[m](value, deterministic=not train) * p
            raw[m] = (tokens, p)
        return raw

    def assemble_conditioning(
        self,
        raw: Dict[str, Optional[Tuple[jnp.ndarray, jnp.ndarray]]],
        batch_size: int,
        train: bool = False,
    ) -> jnp.ndarray:
        """Type embeddings + CFG dropout over precomputed modality tokens.

        In training, type embeddings are added unmasked and CFG dropout is
        applied per modality chunk (fresh ``cond_drop`` rng draw per call);
        at inference, tokens and type embeddings are presence-masked.
        """
        counts = self.modality_token_counts()
        B = batch_size

        if train and self.cond_drop_prob > 0.0:
            key = self.make_rng("cond_drop")
            k_full, k_keep = jax.random.split(key)
            full_drop = jax.random.uniform(k_full, (B,)) < self.cond_drop_prob
            keep = jax.random.uniform(
                k_keep, (B, len(self.active_modalities))
            ) >= self.cond_drop_prob
            keep = jnp.logical_and(keep, jnp.logical_not(full_drop)[:, None])
            keep = keep.astype(self.dtype)
        else:
            keep = None

        chunks = []
        for i, m in enumerate(self.active_modalities):
            count = counts[m]
            if raw.get(m) is None:
                tokens = jnp.zeros((B, count, self.latent_dim), dtype=self.dtype)
                p = jnp.zeros((B, 1, 1), dtype=self.dtype)
            else:
                tokens, p = raw[m]
            type_emb = self.token_type_embeddings(
                jnp.full((count,), MODALITY_TOKEN_IDS[m], dtype=jnp.int32)
            )[None]  # [1, count, D]
            if train:
                chunk = tokens + type_emb
                if keep is not None:
                    chunk = chunk * keep[:, i][:, None, None]
            else:
                chunk = tokens + type_emb * p
            chunks.append(chunk)
        return jnp.concatenate(chunks, axis=1)

    def encode_conditioning(
        self,
        batch_size: int,
        class_labels=None,
        viewpoints=None,
        partial_pcd=None,
        depth_maps=None,
        presence: Optional[Dict[str, jnp.ndarray]] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """All conditioning tokens with type embeddings applied -> [B, num_cond, D]."""
        raw = self.encode_modalities(
            batch_size, class_labels=class_labels, viewpoints=viewpoints,
            partial_pcd=partial_pcd, depth_maps=depth_maps,
            presence=presence, train=train,
        )
        return self.assemble_conditioning(raw, batch_size, train=train)

    # --------------------------------------------------------------- forward

    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        class_labels=None,
        viewpoints=None,
        partial_pcd=None,
        depth_maps=None,
        prev_latent: Optional[jnp.ndarray] = None,
        cond_tokens: Optional[jnp.ndarray] = None,
        presence: Optional[Dict[str, jnp.ndarray]] = None,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: [B, num_points, C] channels-last. Returns (eps_hat, latent)."""
        assert x.shape[1] == self.num_points, (
            f"input point cloud must have {self.num_points} points, got {x.shape[1]}"
        )
        B = x.shape[0]
        if cond_tokens is None:
            cond_tokens = self.encode_conditioning(
                B, class_labels=class_labels, viewpoints=viewpoints,
                partial_pcd=partial_pcd, depth_maps=depth_maps,
                presence=presence, train=train,
            )
        x_denoised, latent = self.backbone(
            x, t, cond=cond_tokens, prev_latent=prev_latent,
            deterministic=not train,
        )
        return x_denoised, latent
