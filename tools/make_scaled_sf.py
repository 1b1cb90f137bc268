"""Derive a larger benchmark scale from the driver's sf0.1 tables.

Replicates the FACT tables ``factor`` times with per-replica key shifts
chosen so every key family (orderkey, custkey, doc_id, vec_id, user_id,
event_id) stays consistent — replica i of orders joins replica i of
lineitem/customer, so join selectivities and per-key cardinalities match
the base data and the TPC-H-ish plans keep their shapes. Dimension
tables (region/nation/supplier/part) are copied unchanged, exactly like
real TPC-H scaling. pyarrow end-to-end so logical types survive
(events.ts is TIMESTAMP(NANOS); Spark would rewrite it).

This produces TIMING data only — the correctness gates always run on the
driver's own sf dirs. Usage:

    python tools/make_scaled_sf.py /root/testdata/sf0.1 <dst_dir> 10
    python tools/make_scaled_sf.py src dst 100 documents,embeddings

The optional 4th arg restricts output to the named tables (the large-
factor probes only need the corpus tables). Replicas stream through one
ParquetWriter per table, so peak memory is one base-table copy
regardless of factor.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

DIMS = ["region", "nation", "supplier", "part"]

# fact table -> {column: key family}
FACTS = {
    "lineitem": {"l_orderkey": "orderkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "customer": {"c_custkey": "custkey"},
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}

# key family -> (table, column) holding its full domain
FAMILY_DOMAIN = {
    "orderkey": ("orders", "o_orderkey"),
    "custkey": ("customer", "c_custkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main(src: str, dst: str, factor: int, only: set[str] | None = None) -> None:
    os.makedirs(dst, exist_ok=True)
    dims = [n for n in DIMS if only is None or n in only]
    facts = {n: k for n, k in FACTS.items() if only is None or n in only}
    # key-family domains: read only the tables the selected facts shift by
    needed_fams = {fam for keys in facts.values() for fam in keys.values()}
    domain_tables = {FAMILY_DOMAIN[fam][0] for fam in needed_fams}
    tables = {
        name: pq.read_table(os.path.join(src, f"{name}.parquet"))
        for name in set(dims) | set(facts) | domain_tables
    }
    shifts = {
        fam: int(pc.max(tables[t][c]).as_py()) + 1
        for fam, (t, c) in FAMILY_DOMAIN.items()
        if fam in needed_fams
    }
    for name in dims:
        pq.write_table(tables[name], os.path.join(dst, f"{name}.parquet"))
    for name, keys in facts.items():
        base = tables[name]
        out_path = os.path.join(dst, f"{name}.parquet")
        with pq.ParquetWriter(out_path, base.schema) as writer:
            for i in range(factor):
                rep = base
                if i:
                    for col, fam in keys.items():
                        idx = rep.schema.get_field_index(col)
                        shifted = pc.add(
                            rep[col],
                            pa.scalar(i * shifts[fam], type=rep.schema.field(idx).type),
                        )
                        rep = rep.set_column(idx, rep.schema.field(idx), shifted)
                writer.write_table(rep)
        print(f"{name}: {base.num_rows} -> {base.num_rows * factor}")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    only = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    main(src, dst, factor, only)
