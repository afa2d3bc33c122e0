"""Point-cloud SDF model for mesh extraction (flax.linen).

Parity with ``/root/reference/models/sdf.py:11-139``: a deep transformer
encodes the cloud once (``encode_point_clouds``), then a SimplePerceiver
decoder cross-attends batches of query points to the cached latents
(``predict_sdf``) — the encode/predict split enables cheap repeated grid
queries during marching cubes.

Layout: channels-last — clouds [B, N, 3], queries [B, N', 3] -> SDF [B, N'].
"""

from __future__ import annotations

import math
from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from .attention import LayerNorm
from .perceiver import SimplePerceiver
from .point_e import PointETransformer, _init

__all__ = ["CrossAttentionPointCloudSDFModel"]


class CrossAttentionPointCloudSDFModel(nn.Module):
    n_ctx: int = 4096
    width: int = 512
    encoder_layers: int = 12
    encoder_heads: int = 8
    decoder_layers: int = 4
    decoder_heads: int = 8
    init_scale: float = 0.25
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        proj_init = _init(self.init_scale * math.sqrt(1.0 / self.width))
        self.encoder_input_proj = nn.Dense(
            self.width, dtype=self.dtype, kernel_init=proj_init
        )
        self.encoder = PointETransformer(
            self.width, self.encoder_layers, self.encoder_heads,
            self.init_scale, dtype=self.dtype,
        )
        self.decoder_input_proj = nn.Dense(
            self.width, dtype=self.dtype, kernel_init=proj_init
        )
        self.decoder = SimplePerceiver(
            self.width, self.decoder_layers, self.decoder_heads,
            self.init_scale, dtype=self.dtype,
        )
        self.ln_post = LayerNorm(dtype=self.dtype)
        self.output_proj = nn.Dense(1, dtype=jnp.float32, kernel_init=proj_init)

    @property
    def default_batch_size(self) -> int:
        return self.n_ctx

    def encode_point_clouds(self, point_clouds: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        h = self.encoder_input_proj(point_clouds.astype(self.dtype))
        return dict(latents=self.encoder(h))

    def predict_sdf(
        self, x: jnp.ndarray, encoded: Dict[str, jnp.ndarray]
    ) -> jnp.ndarray:
        h = self.decoder_input_proj(x.astype(self.dtype))
        h = self.decoder(h, encoded["latents"])
        h = self.ln_post(h)
        return self.output_proj(h)[..., 0]

    def __call__(
        self,
        x: jnp.ndarray,
        point_clouds: Optional[jnp.ndarray] = None,
        encoded: Optional[Dict[str, jnp.ndarray]] = None,
    ) -> jnp.ndarray:
        assert (point_clouds is None) != (encoded is None)
        if point_clouds is not None:
            encoded = self.encode_point_clouds(point_clouds)
        return self.predict_sdf(x, encoded)
