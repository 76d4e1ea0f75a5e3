#!/usr/bin/env python
"""Dump .explain("formatted") for the r13-optimization target queries to
plans/r13/<query>_<tag>.txt (tag = before|after).

Usage: python scripts/dump_r13_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tantalus_spark import get_spark
from tantalus_spark.inventory import QUERIES, db_for

DEFAULT = [
    "44_ngram_jaccard", "45_minhash_lsh", "46_simhash",
    "108_build_corpus", "113_quota_select", "131_hybrid_rrf",
    "134_dedup_funnel", "141_hybrid_serve", "147_hybrid_serve_batch",
    "151_ann_serve_batch", "152_segmented_store_serve",
    "159_snapshot_promote_serve", "161_snapshot_ann_serve",
    "164_band_store_live_serve", "165_release_follow_serve",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_r13_plans")
    db = db_for(spark, sf_dir)
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "events", "documents", "embeddings"):
        db.table(t).count()
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        df.unpersist()
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
