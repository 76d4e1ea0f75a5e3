#!/usr/bin/env python
"""Synthesize a larger scale factor from an existing testdata dir by
replicating every table K times with consistent key offsets.

Usage: python scripts/make_sf.py [src_dir] [out_dir] [K]
       (defaults: /root/testdata/sf0.1  .benchdata/sf1  10)

Design goals (scaling-ratio fidelity, not just volume):

- FK consistency: every key column in a copy is offset by
  ``k * (max_key + 1)`` of its defining table, so joins resolve within a
  copy exactly like the original (per-copy selectivity identical, output
  cardinalities scale by K).
- region/nation stay fixed — TPC-H dimensions don't grow with SF.
- document texts are token-salted per copy (every token suffixed
  ``~k``): identical length/token statistics, but NO shared shingles
  across copies — otherwise every doc would have K-1 exact near-dup
  twins and the dedup queries would measure a pathological dup-cluster
  corpus instead of a scaled one.
- embeddings are dimension-ROTATED per copy: norms and intra-copy
  geometry preserved, cross-copy cosine decorrelated.

DuckDB does the rewrite (fast single-file parquet IO; no Spark session
needed for a data-prep script)."""

from __future__ import annotations

import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# table -> (its own offset key, [(column, defining_table), ...])
KEYS: dict[str, list[tuple[str, str]]] = {
    "region": [],
    "nation": [],
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [("l_orderkey", "orders"), ("l_partkey", "part"),
                 ("l_suppkey", "supplier")],
    "events": [("event_id", "events"), ("user_id", "events_user")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else ".benchdata/sf1"
    k_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)

    con = duckdb.connect()
    strides: dict[str, int] = {}
    for t, keycol in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                      ("part", "p_partkey"), ("orders", "o_orderkey"),
                      ("events", "event_id"), ("documents", "doc_id"),
                      ("embeddings", "vec_id")]:
        strides[t] = con.sql(
            f"select max({keycol}) + 1 from '{src}/{t}.parquet'"
        ).fetchone()[0]
    strides["events_user"] = con.sql(
        f"select max(user_id) + 1 from '{src}/events.parquet'").fetchone()[0]

    for t in TABLES:
        path = f"{src}/{t}.parquet"
        if t in ("region", "nation"):
            con.sql(f"copy (select * from '{path}') to "
                    f"'{out}/{t}.parquet' (format parquet)")
            continue
        cols = [r[0] for r in con.sql(f"describe select * from '{path}'")
                .fetchall()]
        offset_cols = dict(KEYS[t])
        pieces = []
        for k in range(k_copies):
            sel = []
            for c in cols:
                if c in offset_cols:
                    sel.append(f"{c} + {k * strides[offset_cols[c]]} AS {c}")
                elif t == "documents" and c == "text":
                    # salt every token: same token/char statistics, zero
                    # shared shingles across copies
                    sel.append(
                        f"regexp_replace(text, '(\\S+)', '\\1~{k}', 'g')"
                        f" AS text" if k else "text")
                elif t == "embeddings" and c == "embedding":
                    # rotate dimensions by k: intra-copy geometry intact,
                    # cross-copy cosine decorrelated
                    sel.append(
                        f"list_concat(embedding[{k + 1}:], "
                        f"embedding[:{k}]) AS embedding" if k
                        else "embedding")
                else:
                    sel.append(c)
            pieces.append(f"select {', '.join(sel)} from '{path}'")
        union = " union all ".join(pieces)
        # Row-group sizing: DuckDB's default (122 880 rows) writes the whole
        # documents/embeddings table as ONE row group, and Spark cannot split
        # a scan finer than row-group boundaries — the scaled fixture would
        # measure a single-threaded scan, which no real 100 TB layout has
        # (big tables arrive as thousands of files/row groups). Target ~64
        # groups per table so a 32-core box can fill every slot.
        base = con.sql(f"select count(*) from '{path}'").fetchone()[0]
        rg = max(1024, (base * k_copies) // 64)
        con.sql(f"copy ({union}) to '{out}/{t}.parquet' "
                f"(format parquet, row_group_size {rg})")
        n = con.sql(f"select count(*) from '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
