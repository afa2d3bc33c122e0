"""Typed configuration system.

Replaces the reference's single OmegaConf YAML (``/root/reference/config.yaml``,
loaded by absolute path with no overrides, ``train.py:344``) with frozen
dataclasses + YAML load + dotted-path CLI overrides, preserving every key of
the reference schema as canonical defaults.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence, Tuple

import yaml

__all__ = [
    "WandbConfig",
    "DataConfig",
    "TrainConfig",
    "ModelConfig",
    "GaussianDiffusionConfig",
    "DiffusionConfig",
    "SampleConfig",
    "Config",
    "load_config",
    "apply_overrides",
]


@dataclass(frozen=True)
class WandbConfig:
    project: str = "pointcloud_diffusion"
    enabled: bool = False


@dataclass(frozen=True)
class DataConfig:
    h5_path: str = ""
    dataset: str = "modelnet"  # modelnet | mvp | multimodal | synthetic


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 32
    num_workers: int = 8
    epochs: int = 500
    lr: float = 3e-4
    weight_decay: float = 0.01
    seed: int = 42
    self_conditioning_prob: float = 0.6
    save_every: int = 10
    sample_every: int = 100
    start_chamfer: int = 120
    output_dir: str = "./outputs"
    continue_training: bool = False
    load_checkpoint_path: str = ""
    # quirk flag: the reference's self-conditioning bootstrap forward omits
    # partial_pcd (train.py:184-191); default preserves that behavior
    bootstrap_include_partial_pcd: bool = False
    # improvement over reference (weights-only ckpts): save full train state
    save_full_state: bool = True
    # parameter EMA decay; 0 disables (the reference keeps no EMA)
    ema_decay: float = 0.0
    # jax.profiler trace dir ('' disables)
    profile_dir: str = ""
    # device-resident dataset (auto | on | off): hold the full normalized
    # tensor set in HBM and ship only int32 index rows per step. 'auto'
    # enables it for single-process runs whose stacked data is under
    # ~2 GB; streaming a fresh ~33 MB batch through the axon tunnel every
    # step is both slower (740 vs ~400 ms/step, flagship) and leaks
    # client RSS at one batch/step (the 125 GB OOM of 2026-08-20).
    device_data: str = "auto"


@dataclass(frozen=True)
class ModelConfig:
    num_points: int = 1024
    num_latents: int = 256
    cond_drop_prob: float = 0.1
    input_channels: int = 3
    output_channels: int = 3
    latent_dim: int = 256
    x_dim: int = 256
    num_blocks: int = 6
    num_compute_layers: int = 4
    num_heads: int = 8
    num_classes: int = 10
    num_tokens_ppcd: int = 256
    num_tokens_depth: int = 128
    active_modalities: Tuple[str, ...] = ("class", "view", "partial_pcd", "depth")
    depth_image_size: int = 512
    depth_patch: int = 32
    compute_dtype: str = "float32"  # float32 | bfloat16
    # exp-panel dtype inside the fused attention kernel (float32 |
    # bfloat16); bfloat16 is a quality-gated throughput lever (see
    # docs/trained_gates.json)
    softmax_dtype: str = "float32"
    # GELU flavor in the transformer MLPs (erf | tanh); tanh rides the
    # TPU hardware exp instead of the VPU erf rational — a quality-gated
    # throughput lever (see docs/trained_gates.json)
    gelu_impl: str = "erf"
    # lax.scan over the RCW blocks: math-identical compile-wall lever
    # (~6x fewer jaxpr equations per denoiser copy); unrolled checkpoints
    # are converted at load time (cli.sample.load_params). NOTE: the config
    # default here is False (checkpoint-layout parity with the reference),
    # but the headline bench runs scan_blocks=true by default
    # (PCDIFF_BENCH_SCANBLOCKS=0 restores unrolled) — gated math-identical
    # in docs/trained_gates.json "bf16-gi-reuse-scan"
    scan_blocks: bool = False


@dataclass(frozen=True)
class GaussianDiffusionConfig:
    model_mean_type: str = "epsilon"
    model_var_type: str = "fixed_small"
    loss_type: str = "mse"


@dataclass(frozen=True)
class DiffusionConfig:
    gaussiandiffusion: GaussianDiffusionConfig = field(
        default_factory=GaussianDiffusionConfig
    )
    schedule: str = "linear"
    timesteps: int = 1000


@dataclass(frozen=True)
class SampleConfig:
    num_samples: int = 32
    load_checkpoint_path: str = ""
    save_format: str = "ply"  # ply | npz
    output_dir: str = "./samples"
    guidance_scale: float = 3.0
    use_karras: bool = True
    karras_steps: int = 64
    sigma_min: float = 1e-3
    sigma_max: float = 120.0
    s_churn: float = 0.0
    # ODE solver: heun | dpm | ancestral | heun_parallel (Picard
    # parallel-in-time; window/tol below apply to it only)
    sampler: str = "heun"
    parallel_window: int = 8
    parallel_tol: float = 1e-3
    # CFG only while sigma is in [lo, hi] (arXiv:2404.07724); the
    # unconditional branch is skipped outside the interval, cutting its
    # cost. Disabled when hi <= lo (the default). heun/heun_reuse only.
    guidance_interval_lo: float = 0.0
    guidance_interval_hi: float = 0.0


@dataclass(frozen=True)
class Config:
    wandb: WandbConfig = field(default_factory=WandbConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    diffusion: DiffusionConfig = field(default_factory=DiffusionConfig)
    sample: SampleConfig = field(default_factory=SampleConfig)


def _from_dict(cls, data: Dict[str, Any]):
    if not dataclasses.is_dataclass(cls):
        return data
    import typing

    hints = typing.get_type_hints(cls)
    kwargs = {}
    field_names = {f.name for f in dataclasses.fields(cls)}
    for key, value in data.items():
        if key not in field_names:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}")
        ftype = hints.get(key)
        if isinstance(ftype, type) and dataclasses.is_dataclass(ftype):
            kwargs[key] = _from_dict(ftype, value)
        elif isinstance(value, list):
            kwargs[key] = tuple(value)
        else:
            kwargs[key] = value
    return cls(**kwargs)


def load_config(path: Optional[str] = None, overrides: Sequence[str] = ()) -> Config:
    """Load a YAML config file merged over defaults, then apply
    ``key.path=value`` overrides."""
    data: Dict[str, Any] = {}
    if path:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
    cfg = _from_dict(Config, data)
    return apply_overrides(cfg, overrides)


def _parse_value(s: str) -> Any:
    value = yaml.safe_load(s)
    if isinstance(value, str):
        # YAML 1.1 does not treat "1e-4" as a float; users expect it to be
        try:
            return int(value)
        except ValueError:
            pass
        try:
            return float(value)
        except ValueError:
            pass
    return value


def apply_overrides(cfg: Config, overrides: Sequence[str]) -> Config:
    """Apply ``a.b.c=value`` overrides (values YAML-parsed)."""
    for item in overrides:
        if "=" not in item:
            raise ValueError(f"override must look like key.path=value: {item!r}")
        path, raw = item.split("=", 1)
        keys = path.split(".")
        value = _parse_value(raw)
        if isinstance(value, list):
            value = tuple(value)

        def rebuild(node, keys):
            if len(keys) == 1:
                if not hasattr(node, keys[0]):
                    raise KeyError(f"unknown config key: {path}")
                return dataclasses.replace(node, **{keys[0]: value})
            child = getattr(node, keys[0])
            return dataclasses.replace(node, **{keys[0]: rebuild(child, keys[1:])})

        cfg = rebuild(cfg, keys)
    return cfg


def to_dict(cfg) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def save_config(cfg: Config, path: str) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(dataclasses.asdict(cfg), f, sort_keys=False)
