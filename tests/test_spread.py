"""spread_small_scan: adaptive repartition for parallelism-starved scans.

The gate must (a) spread a big single-row-group parquet to the core
count, (b) leave small inputs and already-parallel scans untouched, and
(c) never change results — the repartition is pure placement.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from tantalus_spark.operators.spread import spread_small_scan


def _write_one_group(path, n_rows, text_len):
    tbl = pa.table({
        "doc_id": pa.array(range(n_rows), pa.int64()),
        # incompressible-ish text so on-disk size clears/undershoots the
        # min_bytes gate as intended
        "text": pa.array(
            [("w%07d " % (i * 7919)) * (text_len // 9) for i in range(n_rows)]
        ),
    })
    pq.write_table(tbl, path, row_group_size=n_rows)  # ONE row group
    return str(path)


def test_spreads_big_single_row_group(spark, tmp_path):
    p = _write_one_group(tmp_path / "big.parquet", 4000, 900)
    df = spark.read.parquet(p)
    assert pq.ParquetFile(p).metadata.num_row_groups == 1
    out = spread_small_scan(df, min_bytes=64 * 1024)
    cores = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == cores
    # placement only: same rows either way
    a = sorted(r.doc_id for r in df.select("doc_id").collect())
    b = sorted(r.doc_id for r in out.select("doc_id").collect())
    assert a == b


def test_small_input_not_spread(spark, tmp_path):
    p = _write_one_group(tmp_path / "small.parquet", 50, 100)
    df = spark.read.parquet(p)
    out = spread_small_scan(df)  # default 2 MiB floor: shuffle won't pay
    assert out is df


def test_already_parallel_not_spread(spark, tmp_path):
    d = tmp_path / "many"
    d.mkdir()
    # several files (= row groups) per core: effective parallelism is
    # already at the core count, so the gate must not add an exchange
    for i in range(3 * spark.sparkContext.defaultParallelism):
        _write_one_group(d / f"part-{i}.parquet", 500, 900)
    df = spark.read.parquet(str(d))
    out = spread_small_scan(df, min_bytes=1)
    assert out is df


def test_streaming_passthrough(spark, tmp_path):
    p = _write_one_group(tmp_path / "s.parquet", 10, 50)
    schema = spark.read.parquet(p).schema
    stream = spark.readStream.schema(schema).parquet(str(tmp_path))
    assert spread_small_scan(stream) is stream


def test_operators_identical_under_spread(spark, tmp_path):
    """A spread-eligible corpus must produce byte-identical operator
    output to the same rows read pre-parallelized (placement never leaks
    into results)."""
    from tantalus_spark.datapipe.textstats import doc_profile

    p = _write_one_group(tmp_path / "c.parquet", 3000, 900)
    df = spark.read.parquet(p)
    spread = spread_small_scan(df, min_bytes=1024)
    assert spread is not df
    a = {tuple(r) for r in doc_profile(spread).collect()}
    b = {tuple(r) for r in doc_profile(df.coalesce(1)).collect()}
    assert a == b and len(a) == 3000
