"""Positional / timestep embeddings (pure jnp, host-precomputable tables).

Parity targets:
- sinusoidal timestep embedding, cos-then-sin order:
  ``/root/reference/models/util.py:72-88``
- 2D sin-cos patch-grid embedding: ``/root/reference/models/model.py:192-213``
- Fourier XYZ features: ``/root/reference/models/model.py:175-189``
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

__all__ = [
    "timestep_embedding",
    "build_2d_sincos_position_embedding",
    "fourier_pe",
    "preprocess_img",
]


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: float = 10_000.0) -> jnp.ndarray:
    """Sinusoidal embeddings of (possibly fractional) timesteps -> [N, dim].

    Uses the Point-E convention: ``[cos | sin]`` halves, zero-padded if dim
    is odd.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def build_2d_sincos_position_embedding(
    h: int, w: int, dim: int, temperature: float = 10_000.0
) -> np.ndarray:
    """Fixed 2D sin-cos position embedding over an h x w grid -> [h*w, dim].

    Quadrant layout (matching the reference): [sin_x | cos_x | sin_y | cos_y],
    each dim/4 wide.
    """
    assert dim % 4 == 0, "dim must be divisible by 4 for 2D sin-cos PE"
    y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    y = y.reshape(-1).astype(np.float64)
    x = x.reshape(-1).astype(np.float64)
    div = np.exp(
        np.arange(0, dim // 2, 2, dtype=np.float64)
        * -(math.log(temperature) / (dim // 4))
    )
    pe = np.zeros((h * w, dim), dtype=np.float32)
    pe[:, 0 : dim // 4] = np.sin(x[:, None] * div)
    pe[:, dim // 4 : dim // 2] = np.cos(x[:, None] * div)
    pe[:, dim // 2 : 3 * dim // 4] = np.sin(y[:, None] * div)
    pe[:, 3 * dim // 4 :] = np.cos(y[:, None] * div)
    return pe


def fourier_pe(xyz: jnp.ndarray, num_freqs: int = 8, scale: float = 0.5) -> jnp.ndarray:
    """Fourier features of XYZ coords: [..., 3] -> [..., 3*2*num_freqs].

    Frequencies 2^k * pi / scale; per-coordinate [sin | cos] bands flattened.
    """
    freqs = (2.0 ** jnp.arange(num_freqs, dtype=jnp.float32)) * math.pi / scale
    enc = xyz[..., None] * freqs  # [..., 3, F]
    enc = jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)  # [..., 3, 2F]
    return enc.reshape(enc.shape[:-2] + (-1,))


def preprocess_img(x: jnp.ndarray) -> jnp.ndarray:
    """MCC-style image normalization: bilinear-resize to 224 and apply the
    ResNet mean/std (``/root/reference/models/util.py:96-110``).

    x: [B, H, W, 3] float in [0, 1] (channels-last).
    """
    import jax

    if x.shape[1] != 224:
        x = jax.image.resize(
            x, (x.shape[0], 224, 224, x.shape[-1]), method="bilinear"
        )
    mean = jnp.asarray([0.485, 0.456, 0.406], dtype=x.dtype)
    std = jnp.asarray([0.229, 0.224, 0.225], dtype=x.dtype)
    return (x - mean) / std
