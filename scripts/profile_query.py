#!/usr/bin/env python
"""Profile one bench/inventory query: total wall plus a per-Spark-action
breakdown (how many driver-blocking actions run and where the time goes).

Wraps the PySpark action entry points (count/collect/first/take/toPandas
and DataFrameWriter.save paths) with timers BEFORE running the query, so
every action the query triggers is logged with its wall time and a short
caller tag. cProfile-style sampling would bury the numbers in Py4J noise;
this is exact per-action wall accounting.

Usage: python scripts/profile_query.py <query_name> [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tantalus_spark import get_spark
from tantalus_spark.inventory import QUERIES, db_for

ACTIONS = []  # (label, caller, seconds)


def _wrap(cls, name):
    orig = getattr(cls, name)

    def timed(self, *a, **kw):
        t0 = time.perf_counter()
        try:
            return orig(self, *a, **kw)
        finally:
            dt = time.perf_counter() - t0
            # find the first repo frame below pyspark for attribution
            caller = ""
            for fr in reversed(traceback.extract_stack()):
                if ("tantalus_spark" in fr.filename
                        or "inventory" in fr.filename
                        or "bench" in fr.filename):
                    caller = f"{os.path.basename(fr.filename)}:{fr.lineno}"
                    break
            ACTIONS.append((f"{cls.__name__}.{name}", caller, dt))

    setattr(cls, name, timed)


def main():
    from pyspark.sql import DataFrame
    from pyspark.sql.readwriter import DataFrameWriter

    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    spark = get_spark("profile")
    db = db_for(spark, sf_dir)
    for t in ("lineitem", "orders", "customer", "part", "supplier",
              "events", "documents", "embeddings"):
        db.table(t).count()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    fn = bench.PRODUCTION_VARIANTS.get(name, QUERIES[name])

    # Spark 4: pyspark.sql.DataFrame is a dispatch facade; instances are
    # pyspark.sql.classic.dataframe.DataFrame, which OVERRIDES the action
    # methods — wrap the classic class or count/collect/first go unseen.
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _CDF
    except ImportError:
        _CDF = DataFrame
    for m in ("count", "collect", "first", "take", "toPandas"):
        _wrap(_CDF, m)
    _wrap(DataFrameWriter, "parquet")
    _wrap(DataFrameWriter, "save")
    _wrap(DataFrameWriter, "csv")

    walls = []
    for rep in range(reps):
        ACTIONS.clear()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.count()
        wall = time.perf_counter() - t0
        walls.append(wall)
        df.unpersist()
        if rep < reps - 1:
            continue
        # report the LAST (warmed) rep
        print(f"\n=== {name} rep {rep}: wall {wall:.3f}s, "
              f"{len(ACTIONS)} actions, "
              f"action-sum {sum(a[2] for a in ACTIONS):.3f}s ===")
        for label, caller, dt in ACTIONS:
            print(f"  {dt:7.3f}s  {label:28s} {caller}")
    print(f"\nwalls: {[round(w, 3) for w in walls]}")


if __name__ == "__main__":
    main()
