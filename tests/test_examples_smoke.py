"""Import/argparse smoke tests for the notebook-equivalent example drivers
and the offline Blender render script (they need downloaded checkpoints /
Blender to actually run; these pin that the plumbing at least parses,
imports, and exposes the documented CLI)."""

import importlib.util
import py_compile
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
EXAMPLES = [
    REPO / "examples" / "text2pointcloud.py",
    REPO / "examples" / "image2pointcloud.py",
    REPO / "examples" / "pointcloud2mesh.py",
]


def _load(path: Path):
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_imports_and_has_main(path):
    mod = _load(path)
    assert callable(mod.main)


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.stem)
def test_example_help_exits_zero(path):
    out = subprocess.run(
        [sys.executable, str(path), "--help"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr
    assert "usage" in out.stdout.lower()


def test_blender_script_compiles_and_guards_import(tmp_path):
    script = REPO / "scripts" / "blender_render.py"
    # must be valid python even though bpy only exists inside Blender
    py_compile.compile(str(script), cfile=str(tmp_path / "br.pyc"), doraise=True)
    with pytest.raises((RuntimeError, ImportError)) as exc:
        _load(script)
    assert "Blender" in str(exc.value) or "bpy" in str(exc.value)
