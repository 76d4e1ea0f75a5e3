#!/usr/bin/env python
"""Subset bench harness for optimization A/Bs: times the NAMED queries
with exactly bench.py's methodology (same session config, same warmup,
min-of-5 count() per query, unpersist between reps) so a before/after
pair on the same day is comparable per query without paying the full
48-query run.

Usage: python scripts/minibench.py <query> [query ...]
Prints one JSON line {name: best_sec, ...} plus the calib probes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tantalus_spark import get_spark
from tantalus_spark.inventory import QUERIES, db_for


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("minibench")
    import bench

    # same calibration probes as bench.py (one throwaway first)
    spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 2 + 1)").collect()
    calib_jvm = round(time.perf_counter() - t0, 3)

    db = db_for(spark, sf_dir)
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "events", "documents", "embeddings"):
        db.table(t).count()

    # warmup round: run every named query once untimed, so the JIT /
    # codegen warmth the full bench accumulates over its 48-query run
    # is approximated and the min-of-5 below measures steady state
    for name in names:
        fn = bench.PRODUCTION_VARIANTS.get(name, QUERIES[name])
        df = fn(spark, sf_dir)
        df.count()
        df.unpersist()

    timings = {}
    for name in names:
        fn = bench.PRODUCTION_VARIANTS.get(name, QUERIES[name])
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.count()
            best = min(best, time.perf_counter() - t0)
            df.unpersist()
        timings[name] = round(best, 3)
    print(json.dumps({"queries": timings, "calib_jvm_s": calib_jvm,
                      "total": round(sum(timings.values()), 3)}))


if __name__ == "__main__":
    main()
