"""R execution utilities — compatibility layer.

The reference ships an ``r_bridge`` package
(/root/reference/src/spatialcore/r_bridge/__init__.py:37-48) because its
domain pipeline shells out to R/sf. This build replaces that pipeline
with the on-device raster pass (ops/geometry.py; see docs/domains.md),
so NOTHING here is required by any spatialcore_tpu functionality — the
module exists for drop-in compatibility with user code that imported the
reference's generic R helpers. The four functions are real, minimal
subprocess wrappers with the reference's typed exceptions.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path
from typing import Optional, Sequence, Union

from .core.logging import get_logger

logger = get_logger("r_bridge")


class RBridgeError(Exception):
    """Base error for R execution problems."""


class RNotFoundError(RBridgeError):
    """Rscript is not installed / not on PATH."""


class RExecutionError(RBridgeError):
    """The R process exited non-zero."""

    def __init__(self, message: str, stdout: str = "", stderr: str = "",
                 returncode: Optional[int] = None):
        super().__init__(message)
        self.stdout = stdout
        self.stderr = stderr
        self.returncode = returncode


class RTimeoutError(RBridgeError):
    """The R process exceeded the timeout."""


def check_r_available() -> bool:
    """True if ``Rscript`` is on PATH."""
    return shutil.which("Rscript") is not None


def get_r_version() -> str:
    """The installed R version string (raises :class:`RNotFoundError`)."""
    if not check_r_available():
        raise RNotFoundError(
            "Rscript not found on PATH. Note: spatialcore_tpu itself never "
            "needs R — spatial domains run on-device (docs/domains.md).")
    out = subprocess.run(["Rscript", "--version"], capture_output=True,
                         text=True)
    return (out.stderr or out.stdout).strip()


def run_r_script(script_path: Union[str, Path],
                 args: Sequence[str] = (),
                 timeout: float = 300.0) -> str:
    """Run an R script file with ``Rscript``; returns stdout."""
    path = Path(script_path)
    if not path.exists():
        raise RBridgeError(f"R script not found: {path}")
    if not check_r_available():
        raise RNotFoundError("Rscript not found on PATH")
    try:
        out = subprocess.run(["Rscript", str(path), *map(str, args)],
                             capture_output=True, text=True,
                             timeout=timeout)
    except subprocess.TimeoutExpired as e:
        raise RTimeoutError(
            f"R script {path} exceeded {timeout}s") from e
    if out.returncode != 0:
        raise RExecutionError(
            f"R script {path} failed (rc={out.returncode}):\n{out.stderr}",
            stdout=out.stdout, stderr=out.stderr,
            returncode=out.returncode)
    return out.stdout


def run_r_code(code: str, timeout: float = 300.0) -> str:
    """Run a string of R code with ``Rscript -e``; returns stdout."""
    if not check_r_available():
        raise RNotFoundError("Rscript not found on PATH")
    try:
        out = subprocess.run(["Rscript", "-e", code], capture_output=True,
                             text=True, timeout=timeout)
    except subprocess.TimeoutExpired as e:
        raise RTimeoutError(f"R code exceeded {timeout}s") from e
    if out.returncode != 0:
        raise RExecutionError(
            f"R code failed (rc={out.returncode}):\n{out.stderr}",
            stdout=out.stdout, stderr=out.stderr,
            returncode=out.returncode)
    return out.stdout


__all__ = [
    "check_r_available", "get_r_version", "run_r_script", "run_r_code",
    "RBridgeError", "RNotFoundError", "RExecutionError", "RTimeoutError",
]
