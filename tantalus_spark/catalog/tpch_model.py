"""Relationship catalog over the driver-generated TPC-H-ish testdata
(TESTDATA.md): region nation customer supplier part orders lineitem events
documents embeddings.

``lineitem`` doubles as a junction-ish fact table, which lets the generic
operator inventory exercise the same multi-valued path semantics the
reference needs for its M2M tables (SURVEY.md §7 hard part 1).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from tantalus_spark.catalog.loader import Database, load_dir
from tantalus_spark.catalog.relations import ForeignKey, RelationshipCatalog

TPCH_PKS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",  # not unique; lineitem has no single-col pk
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def tpch_catalog() -> RelationshipCatalog:
    cat = RelationshipCatalog()
    for t, pk in TPCH_PKS.items():
        # lineitem's declared pk is the order FK — NOT unique. Flagging it
        # makes pk-grain compiler ops (multi-valued filters, annotate)
        # raise instead of silently matching/aggregating at order grain.
        cat.add_table(t, pk, pk_unique=(t != "lineitem"))
    cat.add_fk(
        ForeignKey("nation", "n_regionkey", "region", "r_regionkey",
                   accessor="region", reverse_accessor="nations")
    )
    cat.add_fk(
        ForeignKey("customer", "c_nationkey", "nation", "n_nationkey",
                   accessor="nation", reverse_accessor="customers")
    )
    cat.add_fk(
        ForeignKey("supplier", "s_nationkey", "nation", "n_nationkey",
                   accessor="nation", reverse_accessor="suppliers")
    )
    cat.add_fk(
        ForeignKey("orders", "o_custkey", "customer", "c_custkey",
                   accessor="customer", reverse_accessor="orders")
    )
    cat.add_fk(
        ForeignKey("lineitem", "l_orderkey", "orders", "o_orderkey",
                   accessor="order", reverse_accessor="lineitems")
    )
    cat.add_fk(
        ForeignKey("lineitem", "l_partkey", "part", "p_partkey",
                   accessor="part", reverse_accessor="lineitems")
    )
    cat.add_fk(
        ForeignKey("lineitem", "l_suppkey", "supplier", "s_suppkey",
                   accessor="supplier", reverse_accessor="lineitems")
    )
    return cat


def load_tpch(spark: SparkSession, sf_dir: str) -> Database:
    return load_dir(spark, sf_dir, tpch_catalog())
