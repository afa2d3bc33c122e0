"""Neural models: RIN two-stream denoiser, modality encoders, Point-E family."""

from .attention import CrossAttention, DecoderLayer, EncoderLayer, Mlp
from .embeddings import (
    build_2d_sincos_position_embedding,
    fourier_pe,
    timestep_embedding,
)
from .encoders import (
    ClassEmbedding,
    DepthMapEncoder,
    PartialPointCloudEncoder,
    ViewAngleEmbedding,
)
from .rin import ComputeBlock, DenoiserBackbone, RCWBlock, ReadBlock, WriteBlock
from .two_stream import MODALITY_TOKEN_IDS, TwoStreamDenoiser

__all__ = [
    "CrossAttention",
    "EncoderLayer",
    "DecoderLayer",
    "Mlp",
    "timestep_embedding",
    "build_2d_sincos_position_embedding",
    "fourier_pe",
    "ClassEmbedding",
    "ViewAngleEmbedding",
    "PartialPointCloudEncoder",
    "DepthMapEncoder",
    "ComputeBlock",
    "ReadBlock",
    "WriteBlock",
    "RCWBlock",
    "DenoiserBackbone",
    "TwoStreamDenoiser",
    "MODALITY_TOKEN_IDS",
]
