#!/usr/bin/env python
"""Build the full Ensembl→HUGO builtin mapping from a BioMart TSV export.

The mapping is PUBLIC GENOME-ANNOTATION DATA (Ensembl BioMart export: Gene
stable ID / HGNC symbol / Gene name / Gene type columns). This regenerates
``data/gene_mappings/ensembl_to_hugo_builtin.json`` — the offline fallback
``core.genes.load_ensembl_to_hugo_mapping`` serves when no cached TSV exists
and the BioMart download is unavailable.

    python tools/build_gene_map.py biomart_export.tsv -o ensembl_to_hugo_builtin.json

Rows with an empty HGNC symbol fall back to the Gene name column when it is
a usable symbol (mirrors the reference loader's effective behavior of mapping
every stable ID it can, /root/reference/src/spatialcore/core/utils.py:116-168).
Duplicate stable IDs keep the first HGNC-symbol-bearing row.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
from pathlib import Path


def build_mapping(tsv_path: Path) -> dict:
    mapping: dict = {}
    with open(tsv_path, encoding="utf-8", newline="") as f:
        reader = csv.reader(f, delimiter="\t")
        header = next(reader)
        cols = {name.strip().lower(): i for i, name in enumerate(header)}

        def col(*names):
            for n in names:
                if n in cols:
                    return cols[n]
            return None

        i_id = col("gene stable id", "ensembl gene id", "ensembl_gene_id")
        i_hgnc = col("hgnc symbol", "hgnc_symbol")
        i_name = col("gene name", "gene_name")
        if i_id is None or (i_hgnc is None and i_name is None):
            raise SystemExit(
                f"Unrecognized TSV header: {header!r} — expected BioMart "
                "columns 'Gene stable ID' and 'HGNC symbol'/'Gene name'")
        for row in reader:
            if len(row) <= i_id:
                continue
            gid = row[i_id].strip()
            if not gid:
                continue
            hgnc = row[i_hgnc].strip() if i_hgnc is not None and len(row) > i_hgnc else ""
            name = row[i_name].strip() if i_name is not None and len(row) > i_name else ""
            symbol = hgnc or name
            if not symbol:
                continue
            if gid not in mapping or (hgnc and mapping[gid][1] == ""):
                mapping[gid] = (symbol, hgnc)
    return {gid: sym for gid, (sym, _) in mapping.items()}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("tsv", type=Path, help="BioMart TSV export")
    ap.add_argument("-o", "--output", type=Path, required=True)
    args = ap.parse_args(argv)
    mapping = build_mapping(args.tsv)
    args.output.parent.mkdir(parents=True, exist_ok=True)
    with open(args.output, "w", encoding="utf-8") as f:
        json.dump(dict(sorted(mapping.items())), f, indent=0,
                  separators=(",\n", ": "))
    print(f"wrote {args.output}: {len(mapping):,} Ensembl→symbol entries",
          file=sys.stderr)


if __name__ == "__main__":
    main()
