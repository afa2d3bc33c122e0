"""Import the read-only reference implementation for golden-value tests.

The reference tree at /root/reference is a Python package whose internal
absolute imports use the name ``point_e``; alias it so pure-math modules
(gaussian_diffusion, k_diffusion, models.util) can be imported for parity
checks. Modules with unavailable deps (open3d, clip, timm) are NOT imported
here — tests that need them must skip.
"""

import importlib
import sys
import types

# Stub host-only deps the reference imports at module scope but that are not
# needed for the pure-math functions under test.
for _missing in ("open3d",):
    if _missing not in sys.modules:
        try:
            importlib.import_module(_missing)
        except ImportError:
            sys.modules[_missing] = types.ModuleType(_missing)

sys.path.insert(0, "/root")
_ref = importlib.import_module("reference")
sys.modules.setdefault("point_e", _ref)


def ref_module(name: str):
    """Import e.g. 'diffusion.gaussian_diffusion' from the reference tree."""
    return importlib.import_module(f"reference.{name}")
