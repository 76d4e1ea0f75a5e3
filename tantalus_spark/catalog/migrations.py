"""Versioned schema evolution: code-as-DDL migrations over DataFrames.

The reference evolved through 129 Django migrations
(``tantalus/migrations/0001_initial.py`` … ``0129_auto_20200301_1408.py``);
an analytics engine's equivalent is an ordered list of frame transforms
that upgrade data written under any historical schema to the current one at
read time (or once, at rewrite time). Parquet is schema-on-read, so old
files stay valid — migrations here are pure column operations: add with
default, rename, drop, retype.

A migration is ``(version, fn)``; ``migrate`` applies every migration above
the data's recorded version in order. Keep migrations append-only and
total-ordered, exactly like the reference's numbered files.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Migration:
    version: int
    description: str
    apply: Callable[[DataFrame], DataFrame]


def add_column(name: str, dtype: str, default=None):
    def _apply(df: DataFrame) -> DataFrame:
        if name in df.columns:
            return df
        return df.withColumn(name, F.lit(default).cast(dtype))
    return _apply


def rename_column(old: str, new: str):
    def _apply(df: DataFrame) -> DataFrame:
        return df.withColumnRenamed(old, new) if old in df.columns else df
    return _apply


def drop_column(name: str):
    def _apply(df: DataFrame) -> DataFrame:
        return df.drop(name) if name in df.columns else df
    return _apply


def retype_column(name: str, dtype: str):
    def _apply(df: DataFrame) -> DataFrame:
        if name not in df.columns:
            return df
        return df.withColumn(name, F.col(name).cast(dtype))
    return _apply


def migrate(df: DataFrame, migrations: list[Migration],
            from_version: int = 0) -> DataFrame:
    """Apply every migration with version > from_version, in order. All
    transforms are narrow (no shuffle) — upgrading 100 TB at read time
    costs only the projection."""
    for m in sorted(migrations, key=lambda m: m.version):
        if m.version > from_version:
            df = m.apply(df)
    return df


def check_schema(df: DataFrame, expected_cols: list[str]) -> list[str]:
    """makemigrations --check analog (reference test/test_tantalus.sh:15):
    report drift between the frame and the declared schema."""
    have = set(df.columns)
    want = set(expected_cols)
    problems = []
    for c in sorted(want - have):
        problems.append(f"missing column {c!r}")
    for c in sorted(have - want):
        problems.append(f"unexpected column {c!r}")
    return problems
