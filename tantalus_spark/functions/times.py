"""Timestamp-type-tolerant epoch conversion.

The synthetic event tables have shipped ``ts`` as parquet TIMESTAMP(NANOS)
(read as nanos-long via ``spark.sql.legacy.parquet.nanosAsLong`` and
converted to TimestampType by the loader) and as TIMESTAMP(MICROS,
isAdjustedToUTC=false) (read natively as TIMESTAMP_NTZ). Operators that
need numeric time arithmetic (as-of join, sessionization gaps) must accept
every variant: TIMESTAMP, TIMESTAMP_NTZ, DATE, and already-numeric
columns. ANSI Spark refuses ``cast(ntz as double)``, so the NTZ leg goes
through an explicit TIMESTAMP cast first — value-preserving because every
session seam (``session.get_spark``, ``inventory.db_for``) pins the
session timezone to UTC.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def epoch_expr(df: DataFrame, col: str) -> Column:
    """Seconds-since-epoch as DOUBLE (fractional seconds preserved) for a
    timestamp/ntz/date/numeric column of *df*, chosen by schema type —
    never by try/except, so analysis errors still surface loudly."""
    dt = df.schema[col].dataType
    c = F.col(col)
    if isinstance(dt, T.TimestampNTZType):
        # NTZ has no epoch; reinterpret as UTC wall-clock (session TZ is
        # pinned UTC at get_spark and db_for)
        return c.cast("timestamp").cast("double")
    if isinstance(dt, T.DateType):
        return c.cast("timestamp").cast("double")
    return c.cast("double")
