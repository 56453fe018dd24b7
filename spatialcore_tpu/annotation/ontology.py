"""Label → Cell Ontology ID mapping: 4-tier fuzzy matcher + add_ontology_ids.

Parity with /root/reference/src/spatialcore/annotation/ontology.py: biological
tokenizer (:208-297), tiered scorer (:304-399; exact → symbol-stripped →
word-boundary-contains → token match with penalties/bonuses → Jaccard),
``search_ontology_index`` (:406-540) and ``add_ontology_ids`` (:980-1232)
with ``skip_if_exists`` preserving native CellxGene IDs, the SKIP_LABELS
placeholder set, and ``{target}_tier``/``{target}_score`` provenance columns.
The bundled index is an independently curated CL table
(data/ontology/cl_index.json); a full CL export can be supplied via
``index_path``.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd

from ..core.logging import get_logger
from ..core.metadata import update_metadata
from .patterns import get_canonical_term

logger = get_logger("annotation.ontology")

_BUILTIN_INDEX = Path(__file__).parent.parent / "data" / "ontology" / \
    "cl_index.json"

GENERIC_TERMS = {"cell", "cells", "type", "like"}

BLACKLISTED_CL_IDS = {"CL:0000000", "CL:0000003", "CL:0000255"}

MODIFIER_TERMS = {
    "positive", "negative", "high", "low", "like", "type", "mature",
    "immature", "activated", "resting", "proliferating", "pro", "pre",
    "post", "inflammatory", "naive", "memory", "effector", "resident",
    "circulating",
}

MEANINGFUL_SHORT_TOKENS = {
    "b", "t", "nk", "dc", "ec", "ve", "ta", "m1", "m2", "cd", "th", "ilc",
}

# Placeholder labels that should never be ontology-mapped.
SKIP_LABELS = {
    "unassigned", "unknown", "doublet", "multiplet", "na", "n/a", "nan",
    "none", "other", "ambiguous", "low quality", "filtered",
}

_INDEX_CACHE: Dict[str, Dict] = {}

UNKNOWN_CELL_TYPE_ID = "unknown"
UNKNOWN_CELL_TYPE_NAME = "unknown"


class OntologyMappingResult(dict):
    """Mapping result for one label: id / name / score / tier (dict-like)."""

    @property
    def matched(self) -> bool:
        return self.get("id") is not None


def load_ontology_index(path: Optional[Union[str, Path]] = None) -> Dict:
    """Load (and cache) the ontology index: {"metadata", "cl": {label: …}}."""
    path = Path(path) if path else _BUILTIN_INDEX
    key = str(path)
    if key not in _INDEX_CACHE:
        with open(path) as f:
            idx = json.load(f)
        if "cl" not in idx:
            raise ValueError(f"Ontology index {path} has no 'cl' section")
        _INDEX_CACHE[key] = idx
        logger.info(f"Loaded ontology index: {len(idx['cl']):,} CL terms "
                    f"({path.name})")
    return _INDEX_CACHE[key]


def extract_biological_tokens(label: str) -> Dict[str, List[str]]:
    """Split a label into CD markers, protein names, core words, modifiers."""
    low = str(label).lower().strip()
    tokens = {"markers": [], "proteins": [], "core_words": [], "modifiers": []}
    tokens["markers"] = re.findall(r"cd\d+", low)
    tokens["proteins"] = [m.lower() for m in re.findall(r"ig[gamed]", low)]
    tokens["proteins"] += [m[:-1].lower()
                           for m in re.findall(r"\b[A-Z0-9]{3,}\+", str(label))]
    cleaned = re.sub(r"cd\d+|ig[gamed]", "", low)
    cleaned = re.sub(r"[+\-]", " ", cleaned)
    cleaned = re.sub(r"\d+", "", cleaned)
    for word in re.sub(r"\s+", " ", cleaned).strip().split():
        if word in MODIFIER_TERMS:
            tokens["modifiers"].append(word)
        elif word in GENERIC_TERMS:
            continue
        elif word in MEANINGFUL_SHORT_TOKENS or len(word) > 1:
            tokens["core_words"].append(word)
    return tokens


def _strip_symbols(s: str) -> str:
    return re.sub(r"\s+", " ", re.sub(r"[+\-,]", " ", s)).strip()


def score_match(search_label: str, term_label: str,
                tokens: Dict[str, List[str]],
                is_pattern_match: bool) -> float:
    """Tiered similarity in [0, 1] between a query label and a CL term."""
    s = search_label.lower().strip()
    t = term_label.lower().strip()
    if s == t:                                    # tier 1: exact
        return 0.95 if is_pattern_match else 1.0
    if _strip_symbols(s) == _strip_symbols(t):    # tier 1b: symbols stripped
        return 0.92 if is_pattern_match else 0.95
    if len(s) >= 4:                               # tier 1c: word-boundary ⊂
        if re.search(rf"\b{re.escape(s)}\b", t):
            return 0.88 if is_pattern_match else 0.90
        if re.search(rf"\b{re.escape(t)}\b", s):
            return 0.86 if is_pattern_match else 0.88

    term_words = set(t.replace("-", " ").replace(",", " ").split())
    core = tokens.get("core_words", [])
    if core and all(w in term_words for w in core):   # tier 2: all core words
        score = 0.70
        if len(core) == 1 and len(core[0]) <= 2:
            score -= 0.15                 # single short token is ambiguous
        bad_prefixes = ("pro", "pre", "post", "immature", "ecto", "endo")
        if any(p in t for p in bad_prefixes) and \
                not any(p in s for p in bad_prefixes):
            score -= 0.15                 # term is a precursor, label isn't
        if tokens.get("markers") and any(m in t for m in tokens["markers"]):
            score = max(score, 0.75)
        if len(core) >= 2:
            score = min(score + 0.05, 0.85)
        return max(score, 0.0)

    label_words = set(s.replace("-", " ").replace(",", " ").split())
    label_words -= GENERIC_TERMS
    if label_words and term_words and (label_words & term_words):
        # tier 3: Jaccard — requires at least one shared word (a zero-overlap
        # pair must score 0, not the formula's 0.5 floor)
        jac = len(label_words & term_words) / len(label_words | term_words)
        return 0.5 + 0.4 * jac
    return 0.0


def search_ontology_index(
    labels: List[str],
    ontology_index: Optional[Dict] = None,
    index_path: Optional[Union[str, Path]] = None,
    min_score: float = 0.5,
) -> Dict[str, Dict]:
    """Best CL match per label: {label: {id, name, score, tier}}.

    Tier 0 first canonicalizes via the pattern table; scoring then runs the
    canonicalized and the raw label against every index term, best wins.
    Blacklisted root terms are never returned.
    """
    index = ontology_index or load_ontology_index(index_path)
    cl = index["cl"]
    out: Dict[str, Dict] = {}
    for label in labels:
        raw = str(label).strip().replace("_", " ")
        candidates = [(raw.lower(), False)]
        canonical = get_canonical_term(raw)
        if canonical:
            candidates.insert(0, (canonical, True))
        best = {"id": None, "name": None, "score": 0.0, "tier": None}
        for search, is_pattern in candidates:
            tokens = extract_biological_tokens(search)
            # fast path: exact key hit
            hit = cl.get(search)
            if hit and hit["id"] not in BLACKLISTED_CL_IDS:
                sc = 0.95 if is_pattern else 1.0
                if sc > best["score"]:
                    best = {"id": hit["id"], "name": hit["name"],
                            "score": sc,
                            "tier": "pattern" if is_pattern else "exact"}
                continue
            for term_label, term in cl.items():
                # fuzzy phase searches proper, current CL terms only —
                # full CL releases carry imported GO/UBERON/PR terms and
                # obsolete labels (reference ontology.py:500-511)
                if not term["id"].startswith("CL:"):
                    continue
                if term["id"] in BLACKLISTED_CL_IDS:
                    continue
                if "obsolete" in term["name"].lower():
                    continue
                sc = score_match(search, term_label, tokens, is_pattern)
                if sc > best["score"]:
                    best = {"id": term["id"], "name": term["name"],
                            "score": sc,
                            "tier": "pattern" if is_pattern else "fuzzy"}
        if best["score"] < min_score:
            best = {"id": None, "name": None, "score": best["score"],
                    "tier": None}
        out[label] = best
    return out


def add_ontology_ids(
    adata,
    cell_type_column: str = "cell_type",
    target_column: str = "cell_type_ontology_term_id",
    name_column: Optional[str] = "cell_type_ontology_name",
    skip_if_exists: bool = True,
    min_score: float = 0.5,
    skip_labels: Optional[set] = None,
    index_path: Optional[Union[str, Path]] = None,
    mapping_output: Optional[Union[str, Path]] = None,
    copy: bool = False,
):
    """Fill CL IDs for every label in ``cell_type_column``.

    ``skip_if_exists`` keeps rows whose ``target_column`` already carries a
    CL ID (native CellxGene annotations win). Writes ``{target}_tier`` and
    ``{target}_score`` provenance columns; optionally dumps the
    label→ID mapping as JSON/CSV.
    """
    if copy:
        adata = adata.copy()
    if cell_type_column not in adata.obs.columns:
        raise ValueError(f"Column '{cell_type_column}' not found in obs")
    skip = {s.lower() for s in (skip_labels if skip_labels is not None
                                else SKIP_LABELS)}

    labels = adata.obs[cell_type_column].astype(str)
    unique = [l for l in labels.unique() if l.strip().lower() not in skip]
    matches = search_ontology_index(unique, index_path=index_path,
                                    min_score=min_score)
    n_hit = sum(1 for m in matches.values() if m["id"])
    logger.info(f"add_ontology_ids: matched {n_hit}/{len(unique)} labels "
                f"(min_score={min_score})")

    existing = None
    if skip_if_exists and target_column in adata.obs.columns:
        existing = adata.obs[target_column].astype(str)
        has_native = existing.str.match(r"^[A-Z]+:[0-9]+$", na=False)
    else:
        has_native = pd.Series(False, index=adata.obs.index)

    ids = np.full(adata.n_obs, None, object)
    names = np.full(adata.n_obs, None, object)
    tiers = np.full(adata.n_obs, None, object)
    scores = np.full(adata.n_obs, np.nan, float)
    for label, m in matches.items():
        rows = (labels == label).to_numpy()
        ids[rows] = m["id"]
        names[rows] = m["name"]
        tiers[rows] = m["tier"]
        scores[rows] = m["score"]
    native_rows = has_native.to_numpy()
    if native_rows.any():
        ids[native_rows] = existing[native_rows]
        tiers[native_rows] = "native"
        scores[native_rows] = 1.0
        logger.info(f"  kept {int(native_rows.sum()):,} native IDs "
                    "(skip_if_exists)")

    adata.obs[target_column] = pd.array(ids, dtype=object)
    if name_column:
        adata.obs[name_column] = pd.array(names, dtype=object)
    adata.obs[f"{target_column}_tier"] = pd.array(tiers, dtype=object)
    adata.obs[f"{target_column}_score"] = scores

    if mapping_output:
        path = Path(mapping_output)
        path.parent.mkdir(parents=True, exist_ok=True)
        payload = {l: {k: v for k, v in m.items()} for l, m in matches.items()}
        if path.suffix == ".csv":
            pd.DataFrame(payload).T.to_csv(path)
        else:
            with open(path, "w") as f:
                json.dump(payload, f, indent=2)
        logger.info(f"  wrote mapping → {path}")

    update_metadata(
        adata, "add_ontology_ids",
        parameters={"cell_type_column": cell_type_column,
                    "target_column": target_column,
                    "min_score": min_score,
                    "skip_if_exists": skip_if_exists,
                    "n_labels_matched": n_hit,
                    "n_labels_total": len(unique)},
        outputs={"obs": [target_column, f"{target_column}_tier",
                         f"{target_column}_score"]})
    return adata


def has_ontology_ids(adata,
                     column: str = "cell_type_ontology_term_id") -> bool:
    """True if the column exists and carries at least one valid CURIE."""
    if column not in adata.obs.columns:
        return False
    vals = adata.obs[column].dropna().astype(str)
    return bool(vals.str.match(r"^[A-Z]+:[0-9A-Z]+$").any())


def create_mapping_table(labels, **kwargs) -> "pd.DataFrame":
    """Label → (id, name, score, tier) DataFrame via the tiered matcher."""
    matches = search_ontology_index(list(labels), **kwargs)
    return pd.DataFrame(
        [{"label": l, **m} for l, m in matches.items()])


def match_to_canonical(label: str):
    """Pattern-table canonicalization (reference-name alias)."""
    return get_canonical_term(label)
