"""Contract-level recorded-response tests for the network annotation
backends (VERDICT r3 item 7).

The three live services (CellxGene Census SOMA, Synapse, gs://) cannot be
reached from this environment, so these tests pin the full request →
response contract against FAKE SDKs that replay recorded-shape responses:
filter-string composition, the memory-efficient ID→sample→fetch flow,
parent/child hierarchy removal, stratified sampling determinism, Synapse
entity traversal with suffix filters and rename-to-target semantics.
After these, a first live run can only fail on transport/auth, not on
our side of the protocol (ref /root/reference/src/spatialcore/annotation/
cellxgene.py:380-453, synapse.py:25-380).
"""

import sys
import types
from pathlib import Path

import numpy as np
import pandas as pd
import pytest


# ---------------------------------------------------------------------------
# Fake cellxgene_census: replays a recorded obs table through the SOMA
# protocol surface query_cellxgene_census actually touches
# ---------------------------------------------------------------------------

def _recorded_obs():
    """A census-shaped obs table: lung cells with a label hierarchy
    ('t cell' is a token-subset parent of the cd4/cd8 children)."""
    rows = []
    specs = [
        ("t cell", "CL:0000084", 40),
        ("cd4 t cell", "CL:0000624", 30),
        ("cd8 t cell", "CL:0000625", 30),
        ("b cell", "CL:0000236", 25),
        ("macrophage", "CL:0000235", 15),
    ]
    jid = 0
    for label, clid, n in specs:
        for _ in range(n):
            rows.append({
                "soma_joinid": jid, "cell_type": label,
                "cell_type_ontology_term_id": clid,
                "disease": "normal", "assay": "10x 3' v3",
                "tissue": "lung", "tissue_general": "lung",
                "donor_id": f"d{jid % 3}",
            })
            jid += 1
    return pd.DataFrame(rows)


class _FakeObs:
    def __init__(self, df, log):
        self._df = df
        self._log = log

    def read(self, value_filter=None, column_names=None):
        self._log.append({"value_filter": value_filter,
                          "column_names": list(column_names or [])})
        out = self._df.query(value_filter) if value_filter else self._df
        if column_names:
            missing = [c for c in column_names if c not in out.columns]
            if missing:
                raise KeyError(f"unknown obs columns {missing}")
            out = out[list(column_names)]
        # SOMA paginates: return an iterator-ish object whose concat()
        # stitches chunks — the recorded response replays 3 chunks
        step = max(1, -(-len(out) // 3))
        chunks = [out.iloc[i:i + step] for i in range(0, max(len(out), 1),
                                                      step)]

        class _Paged:
            def concat(self):
                class _Tbl:
                    def to_pandas(_self):
                        return pd.concat(chunks, ignore_index=True)
                return _Tbl()

        return _Paged()


class _FakeExperiment:
    def __init__(self, df, log):
        self.obs = _FakeObs(df, log)


class _FakeSoma(dict):
    def __init__(self, df, log):
        super().__init__()
        self["census_data"] = {"homo_sapiens": _FakeExperiment(df, log)}

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _install_fake_census(monkeypatch, df, log, downloads):
    from spatialcore_tpu.core import SpatialData

    mod = types.ModuleType("cellxgene_census")

    def open_soma(census_version="stable"):
        log.append({"open_soma": census_version})
        return _FakeSoma(df, log)

    def get_anndata(soma, organism, obs_coords):
        log.append({"get_anndata": {"organism": organism,
                                    "n": len(obs_coords)}})
        sel = df.set_index("soma_joinid").loc[obs_coords].reset_index()
        X = np.zeros((len(sel), 4), np.float32)
        return SpatialData(X=X, obs=sel.reset_index(drop=True))

    def download_source_h5ad(dataset_id, to_path):
        downloads.append(dataset_id)
        Path(to_path).write_bytes(b"fake-h5ad")

    mod.open_soma = open_soma
    mod.get_anndata = get_anndata
    mod.download_source_h5ad = download_source_h5ad
    monkeypatch.setitem(sys.modules, "cellxgene_census", mod)
    return mod


@pytest.fixture
def census_env(monkeypatch):
    df, log, downloads = _recorded_obs(), [], []
    _install_fake_census(monkeypatch, df, log, downloads)
    return df, log, downloads


def test_census_filter_composition_and_fetch_flow(census_env):
    """kwargs compose into an AND value_filter; obs read fetches only the
    documented columns + requested extras; get_anndata receives exactly
    the sampled joinids (3-step flow)."""
    from spatialcore_tpu.annotation.cellxgene import query_cellxgene_census

    df, log, _ = census_env
    adata = query_cellxgene_census(
        tissue="lung", disease="normal", obs_columns=["donor_id"],
        max_cells=50, random_state=0)
    read = next(e for e in log if "value_filter" in e)
    assert read["value_filter"] == \
        "tissue_general == 'lung' and disease == 'normal'"
    assert "donor_id" in read["column_names"]
    assert "soma_joinid" in read["column_names"]
    fetch = next(e for e in log if "get_anndata" in e)
    assert fetch["get_anndata"] == {"organism": "homo_sapiens", "n": 50}
    assert adata.n_obs == 50
    # stratified: every cell type survives the subsample
    assert set(adata.obs["cell_type"]) == set(df["cell_type"])


def test_census_raw_value_filter_passthrough(census_env):
    from spatialcore_tpu.annotation.cellxgene import query_cellxgene_census

    _, log, _ = census_env
    adata = query_cellxgene_census(value_filter="cell_type == 'b cell'")
    read = next(e for e in log if "value_filter" in e)
    assert read["value_filter"] == "cell_type == 'b cell'"
    assert set(adata.obs["cell_type"]) == {"b cell"}
    assert adata.n_obs == 25


def test_census_empty_and_filterless_raise(census_env):
    from spatialcore_tpu.annotation.cellxgene import query_cellxgene_census

    with pytest.raises(ValueError, match="No cells match"):
        query_cellxgene_census(value_filter="cell_type == 'astrocyte'")
    with pytest.raises(ValueError, match="at least one filter"):
        query_cellxgene_census()


def test_census_remove_parents(census_env):
    """'t cell' (CL:0000084) is a strict token-subset of its cd4/cd8
    children -> its 40 cells drop; 'b cell'/'macrophage' have no children
    and survive."""
    from spatialcore_tpu.annotation.cellxgene import query_cellxgene_census

    adata = query_cellxgene_census(tissue="lung",
                                   resolve_hierarchy="remove_parents")
    assert "t cell" not in set(adata.obs["cell_type"])
    assert {"cd4 t cell", "cd8 t cell", "b cell", "macrophage"} == \
        set(adata.obs["cell_type"])
    assert adata.n_obs == 100


def test_census_sampling_deterministic(census_env):
    from spatialcore_tpu.annotation.cellxgene import query_cellxgene_census

    a = query_cellxgene_census(tissue="lung", max_cells=30, random_state=7)
    b = query_cellxgene_census(tissue="lung", max_cells=30, random_state=7)
    c = query_cellxgene_census(tissue="lung", max_cells=30, random_state=8)
    np.testing.assert_array_equal(a.obs["soma_joinid"].to_numpy(),
                                  b.obs["soma_joinid"].to_numpy())
    assert not np.array_equal(a.obs["soma_joinid"].to_numpy(),
                              c.obs["soma_joinid"].to_numpy())


def test_census_validate_labels_warns(census_env, monkeypatch, caplog):
    """A label mapping to two ontology IDs triggers the conflict warning
    (reference cellxgene.py label/ontology consistency check)."""
    from spatialcore_tpu.annotation import cellxgene as cg

    df, log, _ = census_env
    df.loc[df.index[:5], "cell_type_ontology_term_id"] = "CL:9999999"
    # the package root logger sets propagate=False (core/logging.py), so
    # capture on the package logger directly instead of caplog's root
    records = []

    class _Cap:
        level = 0

        def handle(self, record):
            records.append(record)

    import logging as _logging

    lg = _logging.getLogger("spatialcore_tpu.annotation.cellxgene")
    h = _Cap()
    lg.addHandler(h)
    try:
        cg.query_cellxgene_census(tissue="lung")
    finally:
        lg.removeHandler(h)
    assert any("multiple ontology IDs" in r.getMessage() for r in records)


def test_census_download_cache_and_force(census_env, tmp_path):
    from spatialcore_tpu.annotation.cellxgene import (
        CELLXGENE_DATASETS, download_cellxgene_reference)

    _, _, downloads = census_env
    key = "healthy_human_liver"
    p = download_cellxgene_reference(key, tmp_path)
    assert p.read_bytes() == b"fake-h5ad"
    assert downloads == [CELLXGENE_DATASETS[key]["dataset_id"]]
    download_cellxgene_reference(key, tmp_path)          # cached: no call
    assert len(downloads) == 1
    download_cellxgene_reference(key, tmp_path, force=True)
    assert len(downloads) == 2
    with pytest.raises(ValueError, match="Unknown dataset"):
        download_cellxgene_reference("nope", tmp_path)


# ---------------------------------------------------------------------------
# Fake synapseclient: entity traversal, suffix filters, rename-to-target
# ---------------------------------------------------------------------------

class _FakeSynEntity:
    def __init__(self, path, name, size=11):
        self.path = str(path)
        self.name = name
        self.fileSize = size


def _install_fake_synapse(monkeypatch, tmp_path, log):
    mod = types.ModuleType("synapseclient")
    files = {
        "syn100": [
            {"id": "syn101", "name": "ref_a.h5ad", "type": "org.sagebionetworks.repo.model.FileEntity"},
            {"id": "syn102", "name": "ref_b.h5ad", "type": "org.sagebionetworks.repo.model.FileEntity"},
            {"id": "syn103", "name": "notes.txt", "type": "org.sagebionetworks.repo.model.FileEntity"},
        ],
    }
    names = {"syn101": "ref_a.h5ad", "syn102": "ref_b.h5ad",
             "syn103": "notes.txt", "syn200": "single.h5ad"}

    class Synapse:
        def login(self, authToken=None, silent=False):
            log.append({"login": bool(authToken)})
            if authToken != "tok":
                raise RuntimeError("bad token")

        def getChildren(self, folder_id):
            log.append({"children": folder_id})
            return iter(files.get(folder_id, []))

        def get(self, entity_id, downloadLocation=None, downloadFile=True):
            log.append({"get": entity_id, "dl": downloadLocation,
                        "fetch": downloadFile})
            name = names[entity_id]
            if downloadLocation is None or downloadFile is False:
                return _FakeSynEntity("", name)
            p = Path(downloadLocation) / name
            p.write_bytes(b"syn-bytes")
            return _FakeSynEntity(p, name)

    mod.Synapse = Synapse
    monkeypatch.setitem(sys.modules, "synapseclient", mod)
    return mod


@pytest.fixture
def synapse_env(monkeypatch, tmp_path):
    log = []
    _install_fake_synapse(monkeypatch, tmp_path, log)
    monkeypatch.setenv("SYNAPSE_AUTH_TOKEN", "tok")
    return log, tmp_path


def test_synapse_entity_download_and_rename(synapse_env):
    """syn.get drops the file under its OWN name; the wrapper renames to
    the requested target and skips when it already exists."""
    from spatialcore_tpu.annotation.synapse import download_synapse_reference

    log, tmp = synapse_env
    target = tmp / "myref.h5ad"
    out = download_synapse_reference("syn200", target)
    assert out == target and target.read_bytes() == b"syn-bytes"
    assert not (tmp / "single.h5ad").exists()          # renamed, not copied
    n_gets = sum(1 for e in log if "get" in e)
    download_synapse_reference("syn200", target)       # cached: no new get
    assert sum(1 for e in log if "get" in e) == n_gets


def test_synapse_folder_listing_and_suffix_filter(synapse_env):
    from spatialcore_tpu.annotation.synapse import list_synapse_folder

    log, _ = synapse_env
    all_children = list_synapse_folder("syn100")
    assert [c["name"] for c in all_children] == \
        ["ref_a.h5ad", "ref_b.h5ad", "notes.txt"]
    only_h5 = list_synapse_folder("syn100", file_types=[".h5ad"])
    assert [c["name"] for c in only_h5] == ["ref_a.h5ad", "ref_b.h5ad"]


def test_synapse_folder_download_filters_and_cache(synapse_env):
    from spatialcore_tpu.annotation.synapse import download_synapse_folder

    log, tmp = synapse_env
    out = tmp / "refs"
    paths = download_synapse_folder("syn100", out, file_types=[".h5ad"],
                                    pattern="ref_a")
    assert [p.name for p in paths] == ["ref_a.h5ad"]
    n_gets = sum(1 for e in log if "get" in e)
    again = download_synapse_folder("syn100", out, file_types=[".h5ad"],
                                    pattern="ref_a")
    assert [p.name for p in again] == ["ref_a.h5ad"]
    assert sum(1 for e in log if "get" in e) == n_gets   # cache hit


def test_synapse_token_required(synapse_env, monkeypatch):
    from spatialcore_tpu.annotation.synapse import list_synapse_folder

    monkeypatch.delenv("SYNAPSE_AUTH_TOKEN")
    with pytest.raises(ValueError, match="auth token required"):
        list_synapse_folder("syn100")


def test_synapse_entity_info_no_download(synapse_env):
    from spatialcore_tpu.annotation.synapse import get_synapse_entity_info

    log, _ = synapse_env
    info = get_synapse_entity_info("syn200")
    assert info["name"] == "single.h5ad"
    fetch = next(e for e in log if "get" in e)
    assert fetch["fetch"] is False                      # metadata only
