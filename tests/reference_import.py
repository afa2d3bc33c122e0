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

# timm is imported by reference models.modules for Mlp/DropPath; provide
# torch-native equivalents so pure-math functions in models.model import.
try:
    importlib.import_module("timm")
except ImportError:
    import torch.nn as _nn

    class _Mlp(_nn.Module):
        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=_nn.GELU, drop=0.0, **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = _nn.Linear(in_features, hidden_features)
            self.act = act_layer()
            self.fc2 = _nn.Linear(hidden_features, out_features)
            self.drop = _nn.Dropout(drop)

        def forward(self, x):
            return self.drop(self.fc2(self.drop(self.act(self.fc1(x)))))

    _timm = types.ModuleType("timm")
    _timm_models = types.ModuleType("timm.models")
    _timm_vit = types.ModuleType("timm.models.vision_transformer")
    _timm_vit.Mlp = _Mlp
    _timm_vit.DropPath = _nn.Identity
    _timm.models = _timm_models
    _timm_models.vision_transformer = _timm_vit
    sys.modules["timm"] = _timm
    sys.modules["timm.models"] = _timm_models
    sys.modules["timm.models.vision_transformer"] = _timm_vit

sys.path.insert(0, "/root")
_ref = importlib.import_module("reference")
sys.modules.setdefault("point_e", _ref)


def ref_module(name: str):
    """Import e.g. 'diffusion.gaussian_diffusion' from the reference tree."""
    return importlib.import_module(f"reference.{name}")
