"""pcdiff — a TPU-native multimodal point-cloud diffusion framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
`entheeb/A-Multimodal-Diffusion-Based-Model-for-Point-Cloud-Completion`
(a Point-E fork with a RIN-style two-stream denoiser for multimodal
point-cloud completion).

Layers (mirroring the reference's layer map, re-architected TPU-first):

- :mod:`pcdiff.geometry`  — point-cloud / mesh data structures, IO, geometric ops
- :mod:`pcdiff.diffusion` — DDPM/Karras diffusion processes as pure functions,
  samplers as fused ``lax.scan`` programs
- :mod:`pcdiff.models`    — flax modules: RIN two-stream denoiser, modality
  encoders, Point-E transformer family, perceiver, SDF
- :mod:`pcdiff.data`      — H5 dataset readers with per-host sharding
- :mod:`pcdiff.parallel`  — device mesh / sharding utilities (DP today, room
  for TP/FSDP)
- :mod:`pcdiff.train`     — jitted train step, loss curriculum, checkpointing
- :mod:`pcdiff.evals`     — CD/F1 metrics, PointNet++ feature extractor,
  P-FID / P-IS
- :mod:`pcdiff.ops`       — Pallas TPU kernels for the hot paths
"""

__version__ = "0.1.0"
