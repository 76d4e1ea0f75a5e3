#!/usr/bin/env python
"""Cross-SF scale-ratio measurement for selected inventory queries.

One warmed session, SFs interleaved per query, best-of-N (the BENCH_sf3
method from SCALING.md): never compare numbers from two differently
shaped harnesses, never run two Spark processes while timing.

Usage: python scripts/bench_scale.py q1 [q2 ...] [--sfs dir1,dir2] [--n 5]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sfs = ["/root/testdata/sf0.1", ".benchdata/sf1"]
    n = 5
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--sfs":
            sfs = args[i + 1].split(",")
            i += 2
        elif args[i] == "--n":
            n = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from pyspark.sql import SparkSession

    from tantalus_spark.inventory import QUERIES

    spark = (SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        # match get_spark: the pyspark default 1g heap OOMs the pair-agg
        # queries at sf1 on local[32] (all "executors" share one JVM)
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .appName("bench-scale").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    full = [k for k in QUERIES if any(k.startswith(p) for p in names)]
    out: dict[str, dict[str, float]] = {}
    for name in full:
        fn = QUERIES[name]
        for sf in sfs:          # warmup once per (query, sf)
            df = fn(spark, sf)
            df.count()
            # release caller-owned caches: without this every timed rep
            # below re-serves the warmup's persisted result (identical
            # analyzed plan -> CacheManager hit) and the "scale ratio"
            # measures result-read size, not query cost — the same
            # harness cache-assist bug bench.py had (SCALING.md r6)
            df.unpersist()
        best = {sf: float("inf") for sf in sfs}
        for _ in range(n):
            for sf in sfs:      # interleave SFs within each rep
                t0 = time.time()
                df = fn(spark, sf)
                df.count()
                best[sf] = min(best[sf], time.time() - t0)
                df.unpersist()
        out[name] = {sf: round(best[sf], 3) for sf in sfs}
        if len(sfs) == 2:
            a, b = sfs
            out[name]["ratio"] = round(best[b] / best[a], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
