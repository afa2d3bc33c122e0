"""Torch weight importers for the Point-E model family.

Maps the published Point-E checkpoints (state_dicts of
``/root/reference/models/transformer.py`` / ``sdf.py`` modules) onto the
flax trees of :mod:`pcdiff.models.point_e` / :mod:`pcdiff.models.sdf`, so
``base40M``/``base300M``/``base1B``/``upsample``/``sdf`` load directly.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import numpy as np

__all__ = ["import_point_e_torch_state", "import_sdf_torch_state"]


def _t(x) -> np.ndarray:
    return (x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)).astype(np.float32)


def _linear(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _ln(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _pe_mlp(sd, prefix):
    return {"c_fc": _linear(sd, f"{prefix}.c_fc"),
            "c_proj": _linear(sd, f"{prefix}.c_proj")}


def _resblock(sd, prefix):
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "attn": {"c_qkv": _linear(sd, f"{prefix}.attn.c_qkv"),
                 "c_proj": _linear(sd, f"{prefix}.attn.c_proj")},
        "mlp": _pe_mlp(sd, f"{prefix}.mlp"),
    }


def _cross_resblock(sd, prefix):
    return {
        "ln_1": _ln(sd, f"{prefix}.ln_1"),
        "ln_2": _ln(sd, f"{prefix}.ln_2"),
        "ln_3": _ln(sd, f"{prefix}.ln_3"),
        "attn": {"c_q": _linear(sd, f"{prefix}.attn.c_q"),
                 "c_kv": _linear(sd, f"{prefix}.attn.c_kv"),
                 "c_proj": _linear(sd, f"{prefix}.attn.c_proj")},
        "mlp": _pe_mlp(sd, f"{prefix}.mlp"),
    }


def _count(sd, pattern):
    rx = re.compile(pattern)
    idxs = {int(m.group(1)) for k in sd for m in [rx.match(k)] if m}
    return (max(idxs) + 1) if idxs else 0


def import_point_e_torch_state(state_dict) -> Dict[str, Any]:
    """Point-E denoiser state_dict -> flax variables for the matching class
    in :mod:`pcdiff.models.point_e`."""
    sd = state_dict
    p: Dict[str, Any] = {
        "input_proj": _linear(sd, "input_proj"),
        "output_proj": _linear(sd, "output_proj"),
        "ln_pre": _ln(sd, "ln_pre"),
        "ln_post": _ln(sd, "ln_post"),
        "time_embed": _pe_mlp(sd, "time_embed"),
    }
    n = _count(sd, r"backbone\.resblocks\.(\d+)\.")
    backbone: Dict[str, Any] = {}
    for i in range(n):
        backbone[f"resblock_{i}"] = _resblock(sd, f"backbone.resblocks.{i}")
    p["backbone"] = backbone

    if "clip_embed.weight" in sd:  # vector-conditioned variant
        p["clip_embed"] = _linear(sd, "clip_embed")
    if "clip_embed.0.weight" in sd:  # grid variant: Sequential(LN, Linear)
        p["clip_embed_ln"] = _ln(sd, "clip_embed.0")
        p["clip_embed"] = _linear(sd, "clip_embed.1")
    if "cond_point_proj.weight" in sd:  # upsampler
        p["cond_point_proj"] = _linear(sd, "cond_point_proj")
    return {"params": p}


def import_sdf_torch_state(state_dict) -> Dict[str, Any]:
    """SDF model state_dict -> flax variables for
    :class:`pcdiff.models.sdf.CrossAttentionPointCloudSDFModel`."""
    sd = state_dict
    p: Dict[str, Any] = {
        "encoder_input_proj": _linear(sd, "encoder_input_proj"),
        "decoder_input_proj": _linear(sd, "decoder_input_proj"),
        "ln_post": _ln(sd, "ln_post"),
        "output_proj": _linear(sd, "output_proj"),
    }
    enc = {}
    for i in range(_count(sd, r"encoder\.resblocks\.(\d+)\.")):
        enc[f"resblock_{i}"] = _resblock(sd, f"encoder.resblocks.{i}")
    p["encoder"] = enc
    dec = {}
    for i in range(_count(sd, r"decoder\.resblocks\.(\d+)\.")):
        dec[f"resblock_{i}"] = _cross_resblock(sd, f"decoder.resblocks.{i}")
    p["decoder"] = dec
    return {"params": p}
