"""Pretrained-checkpoint registry and cached downloads.

Parity with ``/root/reference/models/download.py:14-78``: the same named
checkpoint registry (OpenAI Azure URLs for the Point-E family plus the
P-FID PointNet++ classifier), a file-locked cached download with
tmp-then-rename atomicity, and a loader that converts ``.pt`` payloads into
this framework's flax variables.
"""

from __future__ import annotations

import os
from typing import Dict, Optional
from urllib.request import urlopen

from filelock import FileLock

__all__ = ["MODEL_PATHS", "default_cache_dir", "fetch_file_cached", "load_checkpoint"]

MODEL_PATHS = {
    "base40M-imagevec": "https://openaipublic.azureedge.net/main/point-e/base_40m_imagevec.pt",
    "base40M-textvec": "https://openaipublic.azureedge.net/main/point-e/base_40m_textvec.pt",
    "base40M-uncond": "https://openaipublic.azureedge.net/main/point-e/base_40m_uncond.pt",
    "base40M": "https://openaipublic.azureedge.net/main/point-e/base_40m.pt",
    "base300M": "https://openaipublic.azureedge.net/main/point-e/base_300m.pt",
    "base1B": "https://openaipublic.azureedge.net/main/point-e/base_1b.pt",
    "upsample": "https://openaipublic.azureedge.net/main/point-e/upsample_40m.pt",
    "sdf": "https://openaipublic.azureedge.net/main/point-e/sdf.pt",
    "pointnet": "https://openaipublic.azureedge.net/main/point-e/pointnet.pt",
}


def default_cache_dir() -> str:
    return os.path.join(os.path.expanduser("~"), ".cache", "pcdiff")


def fetch_file_cached(
    url: str, cache_dir: Optional[str] = None, chunk_size: int = 4096
) -> str:
    """Download ``url`` into the cache once; concurrent callers serialize on
    a file lock and the write is tmp-then-rename atomic."""
    cache_dir = cache_dir or default_cache_dir()
    os.makedirs(cache_dir, exist_ok=True)
    local_path = os.path.join(cache_dir, url.split("/")[-1])
    if os.path.exists(local_path):
        return local_path
    with FileLock(local_path + ".lock"):
        if os.path.exists(local_path):
            return local_path
        tmp_path = local_path + ".tmp"
        with urlopen(url) as response, open(tmp_path, "wb") as f:
            while True:
                chunk = response.read(chunk_size)
                if not chunk:
                    break
                f.write(chunk)
        os.rename(tmp_path, local_path)
    return local_path


def load_checkpoint(
    checkpoint_name: str,
    cache_dir: Optional[str] = None,
    convert: bool = True,
) -> Dict:
    """Fetch a named checkpoint; optionally convert torch weights to flax.

    ``pointnet`` converts via the PointNet++ importer; Point-E denoiser
    checkpoints convert via their respective importers once available —
    pass ``convert=False`` to get the raw torch state_dict.
    """
    if checkpoint_name not in MODEL_PATHS:
        raise ValueError(
            f"unknown checkpoint name {checkpoint_name!r}; "
            f"known: {sorted(MODEL_PATHS)}"
        )
    import torch

    path = fetch_file_cached(MODEL_PATHS[checkpoint_name], cache_dir=cache_dir)
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if not convert:
        return sd
    if checkpoint_name == "pointnet":
        from ..evals.pointnet2 import import_pointnet2_torch_state

        if "model_state_dict" in sd:
            sd = sd["model_state_dict"]
        return import_pointnet2_torch_state(sd)
    return sd
