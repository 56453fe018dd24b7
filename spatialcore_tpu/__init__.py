"""spatialcore_tpu — TPU-native spatial statistics for spatial transcriptomics.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
SpatialCore reference library (see SURVEY.md): spatial autocorrelation
(Moran's I, Geary's C, Lee's L, local variants with permutation nulls),
neighborhood/niche analysis, spatial domain extraction without an R bridge,
threshold-based classification, and a full cell-type annotation pipeline —
all built on fixed-degree sparse neighbor graphs and counter-based PRNG
permutations that shard across TPU meshes.

Module availability follows the reference façade
(/root/reference/src/spatialcore/__init__.py:14-99): ``core`` is mandatory;
heavier modules import lazily and degrade to helpful errors when optional
dependencies are missing.
"""

from __future__ import annotations

import importlib
from types import ModuleType
from typing import Dict, List

__version__ = "0.1.0"

import os as _os


def _enable_persistent_compile_cache() -> None:
    """Opt into JAX's persistent compilation cache (kernel compiles for the
    1M-cell graph/permutation programs take minutes on remote TPU backends;
    the cache makes them one-time). User-set config/env always wins."""
    try:
        import jax

        if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return
        if jax.config.jax_compilation_cache_dir:
            return
        # key the dir by the host's CPU feature flags: XLA:CPU AOT
        # executables cached on a DIFFERENT microarchitecture load with a
        # feature-mismatch warning and then run wrong-machine code
        # (observed 2026-08-19 after a host swap: f32 summation drift in
        # the multichip dryrun; tests/conftest.py documents the SIGFAULT
        # variant). A host change must start a fresh cache.
        import hashlib

        try:
            with open("/proc/cpuinfo") as _f:
                _flags = next(
                    (ln for ln in _f if ln.startswith("flags")), "")
        except OSError:
            import platform

            _flags = platform.processor()
        _tag = hashlib.sha1(_flags.encode()).hexdigest()[:10]
        # prefer a REPO-located cache when the package runs from a git
        # checkout: the home directory is re-imaged between benchmark
        # rounds on this infrastructure (observed 2026-08-20: the driver's
        # bench process started with an EMPTY ~/.cache and paid 45.6 s
        # graph + 98 s plan + 82 s AOT re-compiles of shapes compiled the
        # day before), while the checkout persists. Installed packages
        # (site-packages is not a place to write) keep the home path.
        _pkg_parent = _os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__)))
        if _os.path.isdir(_os.path.join(_pkg_parent, ".git")):
            _base = _os.path.join(_pkg_parent, ".cache")
        else:
            _base = _os.path.join(
                _os.path.expanduser("~"), ".cache", "spatialcore_tpu")
        cache_dir = _os.path.join(_base, f"jax_cache_{_tag}")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # never block import on cache setup
        pass


_enable_persistent_compile_cache()

from . import core  # mandatory
from .core import SpatialData, get_logger, read_h5ad, update_metadata, write_h5ad

_OPTIONAL_MODULES = ["ops", "spatial", "stats", "annotation", "plotting",
                     "parallel", "utils", "nmf", "diffusion", "r_bridge"]
_module_errors: Dict[str, str] = {}


class _UnavailableModule(ModuleType):
    """Placeholder raising a helpful ImportError on any attribute access."""

    def __init__(self, name: str, error: str):
        super().__init__(name)
        self._name = name
        self._error = error

    def __getattr__(self, item):
        raise ImportError(
            f"spatialcore_tpu.{self._name} is unavailable: {self._error}")


def _try_import(name: str):
    try:
        mod = importlib.import_module(f".{name}", __name__)
        if getattr(mod, "__file__", None) is None:  # bare namespace dir
            raise ImportError(f"module '{name}' has no __init__.py")
        return mod
    except ImportError as e:  # missing optional dependency
        _module_errors[name] = str(e)
        return _UnavailableModule(name, str(e))


ops = _try_import("ops")
spatial = _try_import("spatial")
stats = _try_import("stats")
annotation = _try_import("annotation")
plotting = _try_import("plotting")
parallel = _try_import("parallel")
utils = _try_import("utils")
nmf = _try_import("nmf")
diffusion = _try_import("diffusion")
r_bridge = _try_import("r_bridge")


def available_modules() -> List[str]:
    """Names of successfully imported top-level modules."""
    out = ["core"]
    for m in _OPTIONAL_MODULES:
        if m not in _module_errors:
            out.append(m)
    return out


def print_info() -> None:
    """Print version and module availability."""
    print(f"spatialcore_tpu {__version__}")
    for m in ["core"] + _OPTIONAL_MODULES:
        status = "ok" if m not in _module_errors else f"unavailable ({_module_errors[m]})"
        print(f"  {m:12s} {status}")


__all__ = [
    "__version__", "SpatialData", "read_h5ad", "write_h5ad", "get_logger",
    "update_metadata", "core", "ops", "spatial", "stats", "annotation",
    "plotting", "parallel", "utils", "nmf", "diffusion", "r_bridge",
    "available_modules", "print_info",
]
