"""Database: named DataFrames + a relationship catalog.

One parquet file per entity/junction table (SURVEY.md §4.3). ``load_dir``
reads a directory of ``<name>.parquet`` files lazily — Spark only scans the
tables a query actually touches, and parquet column pruning / predicate
pushdown apply per-scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tantalus_spark.catalog.relations import RelationshipCatalog


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """``spark.read.parquet`` that tolerates TIMESTAMP(NANOS) columns.

    Spark has no nanosecond timestamp type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` those columns surface as Long
    (nanos since epoch). Detect them from the parquet footer and convert to
    microsecond timestamps JVM-side (same truncation DuckDB applies), so the
    rest of the engine sees a proper ``TimestampType`` column.
    """
    # Runtime-settable; MUST be set here (not only in our session factory):
    # callers like the correctness driver build a vanilla SparkSession, and
    # without this conf reading a TIMESTAMP(NANOS) parquet column raises
    # PARQUET_TYPE_ILLEGAL before any query runs.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    try:
        import pyarrow.parquet as pq

        fragment = path
        if os.path.isdir(path):
            parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
            if not parts:
                return df
            fragment = os.path.join(path, parts[0])
        schema = pq.read_schema(fragment)
        nanos = [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        nanos = []
    for c in nanos:
        # integer `div`, NOT float division: epoch-nanos (~1.7e18) exceed a
        # double's 53-bit mantissa, so `/ 1000` rounds the value before the
        # cast and can land 1µs off DuckDB's truncation of the same cell
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


class Database:
    """A set of named tables plus the relationship graph over them."""

    def __init__(
        self,
        spark: SparkSession,
        catalog: RelationshipCatalog,
        tables: dict[str, DataFrame] | None = None,
    ) -> None:
        import threading

        self.spark = spark
        self.catalog = catalog
        self._tables: dict[str, DataFrame] = dict(tables or {})
        # name -> parquet path, resolved on first table() access. Lazy so
        # one unreadable file cannot fail queries over unrelated tables.
        self._pending: dict[str, str] = {}
        # concurrent first accesses (e.g. the threaded HTTP facade) must
        # not race the pending->resolved transition
        self._resolve_lock = threading.Lock()

    def add(self, name: str, df: DataFrame, primary_key: str = "id") -> None:
        self._tables[name] = df
        self._pending.pop(name, None)
        if name not in self.catalog.tables:
            self.catalog.add_table(name, primary_key)

    def add_lazy(self, name: str, path: str, primary_key: str = "id") -> None:
        self._pending[name] = path
        if name not in self.catalog.tables:
            self.catalog.add_table(name, primary_key)

    def table(self, name: str) -> DataFrame:
        if name not in self._tables:
            with self._resolve_lock:
                if name in self._tables:          # resolved while waiting
                    return self._tables[name]
                if name not in self._pending:
                    raise KeyError(
                        f"unknown table {name!r}; have {self.names()}")
                df = read_parquet(self.spark, self._pending[name])
                self._tables[name] = df
                del self._pending[name]
                return df
        return self._tables[name]

    def __contains__(self, name: str) -> bool:
        return name in self._tables or name in self._pending

    def names(self) -> list[str]:
        return sorted(set(self._tables) | set(self._pending))

    def query(self, root: str):
        from tantalus_spark.compiler.compiler import QuerySet

        return QuerySet(self, root)

    def register_views(self, prefix: str = "") -> None:
        # The SQL front door needs every table as a view, so this is the one
        # place lazy tables are all resolved (a query() stays per-table lazy).
        for name in self.names():
            self.table(name).createOrReplaceTempView(f"{prefix}{name}")

    def sql(self, query: str) -> DataFrame:
        """ANSI-SQL front door: every table is a temp view; the statement
        goes straight to Catalyst (same engine, same plans as the
        DataFrame API)."""
        self.register_views()
        return self.spark.sql(query)


def load_dir(
    spark: SparkSession,
    path: str,
    catalog: RelationshipCatalog,
    names: list[str] | None = None,
) -> Database:
    """Register every ``<name>.parquet`` under *path* into a Database.

    Registration is lazy: each file is read on first ``table()`` access, so
    an unreadable file only fails the queries that actually touch it.
    """
    if names is None:
        names = sorted(
            f[: -len(".parquet")]
            for f in os.listdir(path)
            if f.endswith(".parquet")
        )
    db = Database(spark, catalog)
    for name in names:
        db.add_lazy(name, os.path.join(path, f"{name}.parquet"), primary_key=catalog.pk(name))
    return db
