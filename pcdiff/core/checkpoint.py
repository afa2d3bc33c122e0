"""Checkpointing: orbax-backed native checkpoints + reference weight import.

Improves on the reference, which saves weights only and silently restarts
the LR schedule on resume (``/root/reference/train.py:123-146,273-280``):
here the FULL train state (params, optimizer state, step) plus RNG key are
saved and restored atomically.

``import_two_stream_torch_state`` maps a reference ``TwoStreamDenoiser``
torch ``state_dict`` (``/root/reference/models/model.py:422``) onto this
framework's flax param tree, so published ``.pt`` checkpoints load directly.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import numpy as np

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint_step",
    "import_two_stream_torch_state",
    "load_torch_checkpoint",
]


# --------------------------------------------------------------------- orbax

def _manager(directory: str, max_to_keep: Optional[int] = None):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_checkpoint(directory: str, step: int, state, max_to_keep: Optional[int] = None) -> None:
    """Save a pytree (e.g. TrainState) checkpoint at ``step``."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory, max_to_keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(directory: str, state_template, step: Optional[int] = None):
    """Restore a checkpoint into the structure of ``state_template``."""
    import orbax.checkpoint as ocp

    mgr = _manager(directory)
    step = mgr.latest_step() if step is None else step
    if step is None:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    out = mgr.restore(step, args=ocp.args.StandardRestore(state_template))
    mgr.close()
    return out, step


def latest_checkpoint_step(directory: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    try:
        mgr = _manager(directory)
    except Exception:
        return None
    step = mgr.latest_step()
    mgr.close()
    return step


def detect_scanned_layout(directory: str, step: Optional[int] = None) -> Optional[bool]:
    """Whether an orbax checkpoint holds the scanned (``blocks/block``)
    RCW param layout (True), the unrolled ``block_0..`` layout (False), or
    neither/undetectable (None).

    Reads the saved tree structure from the checkpoint's metadata JSON
    (stringified key paths) — no restore, no template. Callers fall back
    to trying both templates when this returns None.
    """
    import json

    if step is None:
        step = latest_checkpoint_step(directory)
        if step is None:
            return None
    meta_path = os.path.join(
        os.path.abspath(directory), str(step), "default", "_METADATA"
    )
    try:
        with open(meta_path) as f:
            keys = json.load(f)["tree_metadata"].keys()
    except Exception:
        return None
    has_stacked = any("'blocks', 'block'" in k for k in keys)
    has_unrolled = any("'block_0'" in k for k in keys)
    if has_stacked == has_unrolled:  # both or neither: not a layout we know
        return None
    return has_stacked


def detect_bare_params(directory: str, step: Optional[int] = None) -> Optional[bool]:
    """Whether an orbax checkpoint holds a BARE params/variables pytree
    (True — e.g. the EMA shadow ``cli.train`` saves under ``run_dir/ema``)
    or a full TrainState with optimizer state (False), or is undetectable
    (None). Same metadata-JSON probe as :func:`detect_scanned_layout`."""
    import json

    if step is None:
        step = latest_checkpoint_step(directory)
        if step is None:
            return None
    meta_path = os.path.join(
        os.path.abspath(directory), str(step), "default", "_METADATA"
    )
    try:
        with open(meta_path) as f:
            keys = json.load(f)["tree_metadata"].keys()
    except Exception:
        return None
    return not any("'opt_state'" in k for k in keys)


# ------------------------------------------------------------- torch import

def _t(x) -> np.ndarray:
    arr = x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)
    return arr.astype(np.float32)


def _linear(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix):
    # timm-style Mlp: fc1 -> act -> fc2
    return {"fc1": _linear(sd, f"{prefix}.fc1"), "fc2": _linear(sd, f"{prefix}.fc2")}


def _rin_attn(sd, prefix):
    return {
        "wq": _linear(sd, f"{prefix}.wq"),
        "wk": _linear(sd, f"{prefix}.wk"),
        "wv": _linear(sd, f"{prefix}.wv"),
        "proj": _linear(sd, f"{prefix}.proj"),
    }


def _torch_mha(sd, prefix):
    """torch.nn.MultiheadAttention -> separate wq/wk/wv/proj."""
    w = _t(sd[f"{prefix}.in_proj_weight"])  # [3D, D]
    b = _t(sd[f"{prefix}.in_proj_bias"])
    D = w.shape[1]
    wq, wk, wv = w[:D], w[D : 2 * D], w[2 * D :]
    bq, bk, bv = b[:D], b[D : 2 * D], b[2 * D :]
    return {
        "wq": {"kernel": wq.T, "bias": bq},
        "wk": {"kernel": wk.T, "bias": bk},
        "wv": {"kernel": wv.T, "bias": bv},
        "proj": _linear(sd, f"{prefix}.out_proj"),
    }


def _torch_encoder_layer(sd, prefix):
    """torch TransformerEncoderLayer(norm_first) -> pcdiff EncoderLayer."""
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "self_attn": _torch_mha(sd, f"{prefix}.self_attn"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.linear1"),
            "fc2": _linear(sd, f"{prefix}.linear2"),
        },
    }


def _torch_decoder_layer(sd, prefix):
    """torch TransformerDecoderLayer(norm_first) -> pcdiff DecoderLayer."""
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "norm3": _layernorm(sd, f"{prefix}.norm3"),
        "self_attn": _torch_mha(sd, f"{prefix}.self_attn"),
        "cross_attn": _torch_mha(sd, f"{prefix}.multihead_attn"),
        "mlp": {
            "fc1": _linear(sd, f"{prefix}.linear1"),
            "fc2": _linear(sd, f"{prefix}.linear2"),
        },
    }


def _count_layers(sd, pattern):
    rx = re.compile(pattern)
    idxs = {int(m.group(1)) for k in sd for m in [rx.match(k)] if m}
    return (max(idxs) + 1) if idxs else 0


def _rin_block(sd, prefix, kind):
    """Read/Write/Compute block param subtrees."""
    if kind == "read":
        norms = {"norm_x": "norm_x", "norm_z1": "norm_z1", "norm_z2": "norm_z2"}
    elif kind == "write":
        norms = {"norm_z": "norm_z", "norm_x1": "norm_x1", "norm_x2": "norm_x2"}
    else:
        norms = {"norm_z1": "norm_z1", "norm_z2": "norm_z2"}
    out = {v: _layernorm(sd, f"{prefix}.{k}") for k, v in norms.items()}
    out["attn"] = _rin_attn(sd, f"{prefix}.attn")
    out["mlp"] = _mlp(sd, f"{prefix}.mlp")
    return out


def _query_decoder(sd, prefix, num_layers):
    # stored [1, T-1, D]; our param keeps the leading axis
    out = {"token_queries": _t(sd[f"{prefix}.token_queries"])}
    for i in range(num_layers // 2):
        out[f"decoder_{i}"] = _torch_decoder_layer(sd, f"{prefix}.decoder.layers.{i}")
        out[f"refiner_{i}"] = _torch_encoder_layer(
            sd, f"{prefix}.query_refiner.layers.{i}"
        )
    out["proj_out"] = _linear(sd, f"{prefix}.proj_out")
    out["ln_out"] = _layernorm(sd, f"{prefix}.ln_out")
    return out


def import_two_stream_torch_state(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a reference TwoStreamDenoiser state_dict to flax params.

    Returns ``{"params": tree}`` matching
    :class:`pcdiff.models.TwoStreamDenoiser`'s variable structure.
    """
    sd = state_dict
    p: Dict[str, Any] = {}

    # ----- backbone
    bb_prefix = "denoiser_backbone"
    bb: Dict[str, Any] = {
        "input_proj": _linear(sd, f"{bb_prefix}.input_proj"),
        "ln_pre": _layernorm(sd, f"{bb_prefix}.ln_pre"),
        "z_init": _t(sd[f"{bb_prefix}.z_init"]),
        "time_embed": _mlp(sd, f"{bb_prefix}.time_embed"),
        "latent_mlp": _mlp(sd, f"{bb_prefix}.latent_mlp"),
        "ln_latent": _layernorm(sd, f"{bb_prefix}.ln_latent"),
        "ln_post": _layernorm(sd, f"{bb_prefix}.ln_post"),
        "output_proj": _linear(sd, f"{bb_prefix}.output_proj"),
    }
    n_blocks = _count_layers(sd, rf"{bb_prefix}\.blocks\.(\d+)\.")
    for i in range(n_blocks):
        bp = f"{bb_prefix}.blocks.{i}"
        block = {
            "read": _rin_block(sd, f"{bp}.read", "read"),
            "write": _rin_block(sd, f"{bp}.write", "write"),
        }
        n_compute = _count_layers(sd, rf"{re.escape(bp)}\.compute\.(\d+)\.")
        for j in range(n_compute):
            block[f"compute_{j}"] = _rin_block(sd, f"{bp}.compute.{j}", "compute")
        bb[f"block_{i}"] = block
    p["backbone"] = bb

    # ----- modality encoders
    if "encoders.class.embedding.weight" in sd:
        p["encoders_class"] = {
            "embedding": {"embedding": _t(sd["encoders.class.embedding.weight"])},
            "norm": _layernorm(sd, "encoders.class.norm"),
        }
    if "encoders.view.mlp.0.weight" in sd:
        p["encoders_view"] = {
            "fc1": _linear(sd, "encoders.view.mlp.0"),
            "fc2": _linear(sd, "encoders.view.mlp.2"),
            "fc3": _linear(sd, "encoders.view.mlp.4"),
            "norm": _layernorm(sd, "encoders.view.mlp.5"),
        }
    if "encoders.partial_pcd.input_proj.weight" in sd:
        pref = "encoders.partial_pcd"
        n_layers = _count_layers(sd, rf"{re.escape(pref)}\.encoder\.layers\.(\d+)\.")
        enc: Dict[str, Any] = {
            "input_proj": _linear(sd, f"{pref}.input_proj"),
            "cls_token": _t(sd[f"{pref}.cls_token"]),
        }
        for i in range(n_layers):
            enc[f"encoder_{i}"] = _torch_encoder_layer(
                sd, f"{pref}.encoder.layers.{i}"
            )
        enc["query_decoder"] = _query_decoder(sd, pref, n_layers)
        p["encoders_partial_pcd"] = enc
    if "encoders.depth.proj.weight" in sd:
        pref = "encoders.depth"
        n_layers = _count_layers(sd, rf"{re.escape(pref)}\.mixer\.layers\.(\d+)\.")
        conv_w = _t(sd[f"{pref}.proj.weight"])  # OIHW
        enc = {
            "patch_proj": {
                "kernel": conv_w.transpose(2, 3, 1, 0),  # OIHW -> HWIO
                "bias": _t(sd[f"{pref}.proj.bias"]),
            },
            "cls_token": _t(sd[f"{pref}.cls_token"]),
        }
        for i in range(n_layers):
            enc[f"mixer_{i}"] = _torch_encoder_layer(sd, f"{pref}.mixer.layers.{i}")
        enc["query_decoder"] = _query_decoder(sd, pref, n_layers)
        p["encoders_depth"] = enc

    if "token_type_embeddings.weight" in sd:
        p["token_type_embeddings"] = {
            "embedding": _t(sd["token_type_embeddings.weight"])
        }
    return {"params": p}


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference ``.pt`` checkpoint and convert to flax params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return import_two_stream_torch_state(sd)


# ------------------------------------------------------------- torch export

def _inv_linear(out: Dict, prefix: str, tree: Dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(tree["kernel"]).T
    if "bias" in tree:
        out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _inv_layernorm(out: Dict, prefix: str, tree: Dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(tree["scale"])
    out[f"{prefix}.bias"] = np.asarray(tree["bias"])


def _inv_mlp(out: Dict, prefix: str, tree: Dict) -> None:
    _inv_linear(out, f"{prefix}.fc1", tree["fc1"])
    _inv_linear(out, f"{prefix}.fc2", tree["fc2"])


def _inv_rin_attn(out: Dict, prefix: str, tree: Dict) -> None:
    for name in ("wq", "wk", "wv", "proj"):
        _inv_linear(out, f"{prefix}.{name}", tree[name])


def _inv_torch_mha(out: Dict, prefix: str, tree: Dict) -> None:
    wq, wk, wv = (np.asarray(tree[n]["kernel"]).T for n in ("wq", "wk", "wv"))
    bq, bk, bv = (np.asarray(tree[n]["bias"]) for n in ("wq", "wk", "wv"))
    out[f"{prefix}.in_proj_weight"] = np.concatenate([wq, wk, wv], axis=0)
    out[f"{prefix}.in_proj_bias"] = np.concatenate([bq, bk, bv], axis=0)
    _inv_linear(out, f"{prefix}.out_proj", tree["proj"])


def _inv_encoder_layer(out: Dict, prefix: str, tree: Dict) -> None:
    _inv_layernorm(out, f"{prefix}.norm1", tree["norm1"])
    _inv_layernorm(out, f"{prefix}.norm2", tree["norm2"])
    _inv_torch_mha(out, f"{prefix}.self_attn", tree["self_attn"])
    _inv_linear(out, f"{prefix}.linear1", tree["mlp"]["fc1"])
    _inv_linear(out, f"{prefix}.linear2", tree["mlp"]["fc2"])


def _inv_decoder_layer(out: Dict, prefix: str, tree: Dict) -> None:
    for n in ("norm1", "norm2", "norm3"):
        _inv_layernorm(out, f"{prefix}.{n}", tree[n])
    _inv_torch_mha(out, f"{prefix}.self_attn", tree["self_attn"])
    _inv_torch_mha(out, f"{prefix}.multihead_attn", tree["cross_attn"])
    _inv_linear(out, f"{prefix}.linear1", tree["mlp"]["fc1"])
    _inv_linear(out, f"{prefix}.linear2", tree["mlp"]["fc2"])


def _inv_rin_block(out: Dict, prefix: str, tree: Dict, kind: str) -> None:
    norms = {
        "read": ("norm_x", "norm_z1", "norm_z2"),
        "write": ("norm_z", "norm_x1", "norm_x2"),
        "compute": ("norm_z1", "norm_z2"),
    }[kind]
    for n in norms:
        _inv_layernorm(out, f"{prefix}.{n}", tree[n])
    _inv_rin_attn(out, f"{prefix}.attn", tree["attn"])
    _inv_mlp(out, f"{prefix}.mlp", tree["mlp"])


def _inv_query_decoder(out: Dict, prefix: str, tree: Dict) -> None:
    out[f"{prefix}.token_queries"] = np.asarray(tree["token_queries"])
    i = 0
    while f"decoder_{i}" in tree:
        _inv_decoder_layer(out, f"{prefix}.decoder.layers.{i}", tree[f"decoder_{i}"])
        _inv_encoder_layer(
            out, f"{prefix}.query_refiner.layers.{i}", tree[f"refiner_{i}"]
        )
        i += 1
    _inv_linear(out, f"{prefix}.proj_out", tree["proj_out"])
    _inv_layernorm(out, f"{prefix}.ln_out", tree["ln_out"])


def export_two_stream_torch_state(variables: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Convert flax TwoStreamDenoiser variables back to a reference-style
    torch state_dict (numpy values) — the inverse of
    :func:`import_two_stream_torch_state`, for interop with the reference
    ecosystem. Buffers the reference recomputes (pos embeds, token-type
    template) are not emitted."""
    p = variables["params"] if "params" in variables else variables
    out: Dict[str, np.ndarray] = {}

    bb = p["backbone"]
    pre = "denoiser_backbone"
    _inv_linear(out, f"{pre}.input_proj", bb["input_proj"])
    _inv_layernorm(out, f"{pre}.ln_pre", bb["ln_pre"])
    out[f"{pre}.z_init"] = np.asarray(bb["z_init"])
    _inv_mlp(out, f"{pre}.time_embed", bb["time_embed"])
    _inv_mlp(out, f"{pre}.latent_mlp", bb["latent_mlp"])
    _inv_layernorm(out, f"{pre}.ln_latent", bb["ln_latent"])
    _inv_layernorm(out, f"{pre}.ln_post", bb["ln_post"])
    _inv_linear(out, f"{pre}.output_proj", bb["output_proj"])
    i = 0
    while f"block_{i}" in bb:
        blk = bb[f"block_{i}"]
        _inv_rin_block(out, f"{pre}.blocks.{i}.read", blk["read"], "read")
        _inv_rin_block(out, f"{pre}.blocks.{i}.write", blk["write"], "write")
        j = 0
        while f"compute_{j}" in blk:
            _inv_rin_block(
                out, f"{pre}.blocks.{i}.compute.{j}", blk[f"compute_{j}"],
                "compute",
            )
            j += 1
        i += 1

    if "encoders_class" in p:
        out["encoders.class.embedding.weight"] = np.asarray(
            p["encoders_class"]["embedding"]["embedding"]
        )
        _inv_layernorm(out, "encoders.class.norm", p["encoders_class"]["norm"])
    if "encoders_view" in p:
        v = p["encoders_view"]
        _inv_linear(out, "encoders.view.mlp.0", v["fc1"])
        _inv_linear(out, "encoders.view.mlp.2", v["fc2"])
        _inv_linear(out, "encoders.view.mlp.4", v["fc3"])
        _inv_layernorm(out, "encoders.view.mlp.5", v["norm"])
    if "encoders_partial_pcd" in p:
        e = p["encoders_partial_pcd"]
        _inv_linear(out, "encoders.partial_pcd.input_proj", e["input_proj"])
        out["encoders.partial_pcd.cls_token"] = np.asarray(e["cls_token"])
        i = 0
        while f"encoder_{i}" in e:
            _inv_encoder_layer(
                out, f"encoders.partial_pcd.encoder.layers.{i}", e[f"encoder_{i}"]
            )
            i += 1
        _inv_query_decoder(out, "encoders.partial_pcd", e["query_decoder"])
    if "encoders_depth" in p:
        e = p["encoders_depth"]
        out["encoders.depth.proj.weight"] = np.asarray(
            e["patch_proj"]["kernel"]
        ).transpose(3, 2, 0, 1)  # HWIO -> OIHW
        out["encoders.depth.proj.bias"] = np.asarray(e["patch_proj"]["bias"])
        out["encoders.depth.cls_token"] = np.asarray(e["cls_token"])
        i = 0
        while f"mixer_{i}" in e:
            _inv_encoder_layer(
                out, f"encoders.depth.mixer.layers.{i}", e[f"mixer_{i}"]
            )
            i += 1
        _inv_query_decoder(out, "encoders.depth", e["query_decoder"])

    if "token_type_embeddings" in p:
        out["token_type_embeddings.weight"] = np.asarray(
            p["token_type_embeddings"]["embedding"]
        )
    return out
