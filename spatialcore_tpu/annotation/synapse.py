"""Synapse.org downloads (gated on the optional synapseclient SDK).

Parity with /root/reference/src/spatialcore/annotation/synapse.py
(token auth, entity download, folder listing :25-380).
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import List, Optional, Union

from ..core.logging import get_logger

logger = get_logger("annotation.synapse")

SYNAPSE_TOKEN_ENV = "SYNAPSE_AUTH_TOKEN"


def _require_synapse():
    try:
        import synapseclient

        return synapseclient
    except ImportError as e:
        raise ImportError(
            "Synapse access requires the optional 'synapseclient' "
            "dependency (network access needed). Download the entity "
            "manually and pass a local path instead.") from e


def _login(token: Optional[str] = None):
    synapseclient = _require_synapse()
    token = token or os.environ.get(SYNAPSE_TOKEN_ENV)
    if not token:
        raise ValueError(
            f"Synapse auth token required: set {SYNAPSE_TOKEN_ENV} or pass "
            "token=...")
    syn = synapseclient.Synapse()
    syn.login(authToken=token, silent=True)
    return syn


def download_synapse_reference(
    entity_id: str,
    output_path: Union[str, Path],
    token: Optional[str] = None,
) -> Path:
    """Download one Synapse entity (syn12345678) to ``output_path``."""
    syn = _login(token)
    out = Path(output_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    logger.info(f"Synapse download {entity_id} → {out}")
    entity = syn.get(entity_id, downloadLocation=str(out.parent))
    got = Path(entity.path)
    if got != out:
        got.rename(out)
    return out


def list_synapse_folder(
    folder_id: str,
    token: Optional[str] = None,
) -> List[dict]:
    """List child entities (id, name, type) of a Synapse folder."""
    syn = _login(token)
    return [{"id": c["id"], "name": c["name"], "type": c["type"]}
            for c in syn.getChildren(folder_id)]


def download_synapse_folder(
    folder_id: str,
    output_dir: Union[str, Path],
    pattern: str = ".h5ad",
    token: Optional[str] = None,
) -> List[Path]:
    """Download all matching files in a folder."""
    syn = _login(token)
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = []
    for child in syn.getChildren(folder_id):
        if pattern in child["name"]:
            entity = syn.get(child["id"], downloadLocation=str(out))
            paths.append(Path(entity.path))
    logger.info(f"Downloaded {len(paths)} files from {folder_id}")
    return paths


def authenticate_synapse(token: Optional[str] = None):
    """Login and return the Synapse client (reference-name alias)."""
    return _login(token)


def get_synapse_entity_info(entity_id: str, token: Optional[str] = None) -> dict:
    """Name/type/size metadata for a Synapse entity without downloading."""
    syn = _login(token)
    e = syn.get(entity_id, downloadFile=False)
    return {"id": entity_id, "name": getattr(e, "name", None),
            "type": type(e).__name__,
            "size": getattr(e, "fileSize", None)}
