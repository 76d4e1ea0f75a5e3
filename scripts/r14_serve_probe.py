#!/usr/bin/env python
"""Isolate the q165 serve leg (guide §1.4): build the two release
snapshots once exactly as q165 does, then time hybrid_serve_topk_batch
off them under a noop sink and dump the executed plan. Separates the
per-serve cost (the thing a serving fleet pays per batch) from the
lifecycle cost around it."""

from __future__ import annotations

import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tantalus_spark import get_spark
from tantalus_spark.datapipe.textstats import hybrid_serve_topk_batch
from tantalus_spark.inventory import db_for
from tantalus_spark.streaming.maintenance import (
    export_release, feats_refresh_batches, index_refresh_batches,
    load_release)


def main():
    spark = get_spark("serve-probe")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = db_for(spark, sf_dir).table("documents").select("doc_id", "text")
    docs.count()
    root = tempfile.mkdtemp(prefix="tantalus_serveprobe_")
    cb_ix = index_refresh_batches(root + "/ix", op_col="op",
                                  max_segments=2, keep_versions=4)
    cb_ft = feats_refresh_batches(root + "/feats", dim=64, op_col="op",
                                  max_segments=2, keep_versions=4)
    add = lambda df: df.withColumn("op", F.lit("add"))  # noqa: E731
    cb_ix(add(docs), 0)
    cb_ft(add(docs), 0)
    stores = {"postings": ("term", root + "/ix"),
              "dense": ("feats", root + "/feats")}
    export_release(spark, stores, root + "/releases")
    release = load_release(spark, root + "/releases")
    postings, (n, avgdl) = release["stores"]["postings"]
    feats = release["stores"]["dense"]
    qs = [(1, ["customer", "sort", "hash"]), (2, ["merge", "join"]),
          (3, ["hash", "table"])]

    out = hybrid_serve_topk_batch(postings, qs, feats, k=10, depth=40,
                                  rrf_k=60, dim=64, n_docs=n, avgdl=avgdl)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for node in ("Exchange", "ReusedExchange", "Scan parquet", "Window",
                 "SortMergeJoin", "BroadcastHashJoin", "Generate"):
        print(node, len(re.findall(re.escape(node), plan)))
    # pushdown check on the postings scan
    for line in plan.splitlines():
        if "PushedFilters" in line:
            print(line.strip()[:200])
    ts = []
    for _ in range(6):
        df = hybrid_serve_topk_batch(postings, qs, feats, k=10, depth=40,
                                     rrf_k=60, dim=64, n_docs=n,
                                     avgdl=avgdl)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print("serve noop times:", [round(t, 3) for t in ts])
    # construction cost
    t0 = time.perf_counter()
    for _ in range(3):
        hybrid_serve_topk_batch(postings, qs, feats, k=10, depth=40,
                                rrf_k=60, dim=64, n_docs=n, avgdl=avgdl)
    print("construction avg:", round((time.perf_counter() - t0) / 3, 3))


if __name__ == "__main__":
    main()
