"""Training-data discovery over local filesystems (and gs:// when gcsfs
is available).

Parity with /root/reference/src/spatialcore/annotation/discovery.py
(``discover_training_data`` :71-274 with retry, ``DiscoveredDataset``
:38-68, metadata CSV helpers :349-529).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Union

import pandas as pd

from ..core.logging import get_logger

logger = get_logger("annotation.discovery")


@dataclass
class DiscoveredDataset:
    uri: str
    name: str
    size_bytes: Optional[int] = None
    source: str = "local"
    metadata: Dict = field(default_factory=dict)

    @property
    def size_gb(self) -> Optional[float]:
        return round(self.size_bytes / 1e9, 3) if self.size_bytes else None


def discover_training_data(
    root: Union[str, Path],
    pattern: str = "*.h5ad",
    recursive: bool = True,
    max_retries: int = 3,
) -> List[DiscoveredDataset]:
    """List candidate reference datasets under a local dir or gs:// prefix."""
    root_s = str(root)
    if root_s.startswith("gs://"):
        try:
            import gcsfs
        except ImportError as e:
            raise ImportError(
                "gs:// discovery requires the optional 'gcsfs' dependency"
            ) from e
        fs = gcsfs.GCSFileSystem()
        prefix = root_s[len("gs://"):]
        last_err = None
        for attempt in range(max_retries):
            try:
                glob = f"{prefix}/**/{pattern}" if recursive else \
                    f"{prefix}/{pattern}"
                hits = fs.glob(glob)
                out = []
                for h in hits:
                    info = fs.info(h)
                    out.append(DiscoveredDataset(
                        uri=f"gs://{h}", name=Path(h).stem,
                        size_bytes=info.get("size"), source="gcs"))
                logger.info(f"Discovered {len(out)} datasets under {root_s}")
                return out
            except Exception as e:  # transient GCS errors: retry
                last_err = e
                time.sleep(2 ** attempt)
        raise RuntimeError(
            f"GCS discovery failed after {max_retries} retries: {last_err}")

    root_p = Path(root_s)
    if not root_p.exists():
        raise FileNotFoundError(f"Discovery root not found: {root_p}")
    paths = sorted(root_p.rglob(pattern) if recursive
                   else root_p.glob(pattern))
    out = [DiscoveredDataset(uri=str(p), name=p.stem,
                             size_bytes=p.stat().st_size, source="local")
           for p in paths]
    logger.info(f"Discovered {len(out)} datasets under {root_p}")
    return out


def make_metadata_template(
    datasets: List[DiscoveredDataset],
    path: Optional[Union[str, Path]] = None,
) -> pd.DataFrame:
    """CSV template for curating discovered datasets (tissue/labels/notes)."""
    df = pd.DataFrame([{
        "name": d.name, "uri": d.uri, "size_gb": d.size_gb,
        "source": d.source, "tissue": "", "cell_type_column": "cell_type",
        "include": True, "notes": "",
    } for d in datasets])
    if path:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        df.to_csv(p, index=False)
        logger.info(f"Metadata template → {p}")
    return df


def query_metadata(
    metadata_csv: Union[str, Path],
    tissue: Optional[str] = None,
    include_only: bool = True,
) -> pd.DataFrame:
    """Filter a curated metadata CSV back down to reference URIs."""
    df = pd.read_csv(metadata_csv)
    if include_only and "include" in df.columns:
        df = df[df["include"].astype(bool)]
    if tissue and "tissue" in df.columns:
        df = df[df["tissue"].astype(str).str.lower() == tissue.lower()]
    return df.reset_index(drop=True)


def print_discovery_summary(datasets) -> None:
    """Human-readable table of discovered datasets."""
    if not datasets:
        print("No datasets discovered.")
        return
    total = sum(d.size_bytes or 0 for d in datasets)
    print(f"{len(datasets)} datasets ({total / 1e9:.2f} GB total)")
    for d in sorted(datasets, key=lambda x: -(x.size_bytes or 0)):
        size = f"{d.size_gb:.2f} GB" if d.size_gb else "?"
        print(f"  {d.name:40s} {size:>10s}  {d.source}  {d.uri}")


def query_local_references(
    root,
    pattern: str = "*.h5ad",
    tissue: Optional[str] = None,
    metadata_csv=None,
):
    """Discover local references, optionally filtered by a curated CSV."""
    datasets = discover_training_data(root, pattern=pattern)
    if metadata_csv is not None:
        df = query_metadata(metadata_csv, tissue=tissue)
        keep = set(df["uri"].astype(str))
        datasets = [d for d in datasets if d.uri in keep]
    return datasets


def load_local_metadata(metadata_csv) -> pd.DataFrame:
    """Read a curated metadata CSV unfiltered (reference-name alias)."""
    return pd.read_csv(metadata_csv)


# Reference-name alias
create_metadata_template = make_metadata_template
