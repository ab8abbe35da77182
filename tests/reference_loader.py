"""Import the reference implementation for parity testing.

Loads modules from the read-only reference mount by file path, stubbing
the heavyweight imports they declare but never use (torchvision,
matplotlib, pandas — see e.g. TensorGCN-master/
embedding_help_functions.py:8-13). Running the reference as a test
oracle is the point of the exercise: our models must match its
forward/backward numerics on identical inputs.
"""

from __future__ import annotations

import importlib
import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_DIR = Path("/root/reference/TensorGCN-master")


def _stub(name: str) -> None:
    """Stub a module only if the real one is unavailable."""
    if name in sys.modules:
        return
    try:
        importlib.import_module(name)
        return
    except ImportError:
        pass
    mod = types.ModuleType(name)
    sys.modules[name] = mod


def load_reference_module(module_name: str, transforms=None, alias: str | None = None):
    """Load e.g. 'embedding_help_functions' from the reference tree.

    transforms: optional (old, new) source text replacements applied
    before exec — used to adapt dtype idioms that modern torch rejects
    (e.g. float32-ifying a float64 pipeline for oracle runs).
    alias: module name to register (defaults to reference_<name>).
    """
    import numpy as np

    if not hasattr(np, "float"):
        # The reference uses the long-removed ``np.float`` alias
        # (embedding_help_functions.py:678); restore it for the oracle.
        np.float = float  # type: ignore[attr-defined]
    for name in [
        "torchvision",
        "torchvision.datasets",
        "matplotlib",
        "matplotlib.pyplot",
        "pandas",
    ]:
        _stub(name)
    path = REFERENCE_DIR / f"{module_name}.py"
    modname = alias or f"reference_{module_name}"
    if transforms:
        src = path.read_text()
        for old, new in transforms:
            src = src.replace(old, new)
        mod = importlib.util.module_from_spec(
            importlib.util.spec_from_loader(modname, loader=None)
        )
        mod.__file__ = str(path)
        sys.modules[modname] = mod
        exec(compile(src, str(path), "exec"), mod.__dict__)
        return mod
    spec = importlib.util.spec_from_file_location(modname, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def reference_available() -> bool:
    if not REFERENCE_DIR.exists():
        return False
    try:
        import torch  # noqa: F401

        return True
    except ImportError:
        return False
