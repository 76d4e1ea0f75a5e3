#!/usr/bin/env python
"""Dump .explain("formatted") for the r14-optimization target queries to
plans/r14/<query>_<tag>.txt (tag = before|after). Run with tag=before
from a worktree at the round's base commit, tag=after at HEAD.

Usage: python scripts/dump_r14_plans.py <tag> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tantalus_spark import get_spark
from tantalus_spark.inventory import QUERIES, db_for

# queries whose PLAN changed this round (construction-latency and
# job-scheduling changes have no plan diff and are covered by the
# profile/bench evidence instead): q97/q101/q108/q113 carry the lazy
# LM-scalar broadcast subtree; q108 additionally the percentile
# broadcast; q164's commit-path change is evidenced by its serve plan
# staying identical (the contract) plus the profiler action log.
DEFAULT = [
    "97_lm_score", "101_perplexity_buckets", "108_build_corpus",
    "113_quota_select", "45_minhash_lsh", "164_band_store_live_serve",
    "165_release_follow_serve",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump_r14_plans")
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
