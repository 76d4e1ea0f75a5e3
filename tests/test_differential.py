"""Randomized differential test: the lookup compiler vs DuckDB on the SAME
predicate trees.

Hypothesis generates boolean trees over a pool of conditions spanning every
compiler strategy — root columns (direct filter), a single-valued join path
(customer), multi-valued paths incl. a 2-hop one (lineitem, lineitem→part;
these route through the match-set machinery and its child-side rewrite) —
and each tree runs both as a compiled QuerySet and as hand-derived SQL.

Same-call semantics make the SQL non-trivial: all conditions in one
``.filter(tree)`` must be satisfied by ONE row of the joined frame (shared
lineitem row for lineitem+part leaves). DuckDB can't correlate outer joins,
so the frame-EXISTS is decomposed into (a) EXISTS over real lineitem rows
(with part LEFT-joined) and (b) the null-extended branch for orders with no
lineitems, where lineitem/part leaves are literally FALSE; customer leaves
become scalar subqueries (single-valued).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tantalus_spark.compiler import Q

SF = "/root/testdata/sf0.001"

C_SUB = ("(SELECT c.c_mktsegment FROM customer c "
         "WHERE c.c_custkey = o.o_custkey)")

# (django lookup kwargs, row-level SQL, row-level SQL when the order has
# no lineitems — lineitem/part references are unknown-> FALSE there)
POOL = [
    ({"o_orderstatus": "O"}, "o.o_orderstatus = 'O'", "o.o_orderstatus = 'O'"),
    ({"o_totalprice__gte": 100_000.0},
     "o.o_totalprice >= 100000.0", "o.o_totalprice >= 100000.0"),
    ({"o_orderpriority__in": ["1-URGENT", "2-HIGH"]},
     "o.o_orderpriority IN ('1-URGENT', '2-HIGH')",
     "o.o_orderpriority IN ('1-URGENT', '2-HIGH')"),
    ({"customer__c_mktsegment": "BUILDING"},
     f"{C_SUB} = 'BUILDING'", f"{C_SUB} = 'BUILDING'"),
    ({"lineitems__l_quantity__lte": 10.0}, "l.l_quantity <= 10.0", "FALSE"),
    ({"lineitems__l_returnflag": "R"}, "l.l_returnflag = 'R'", "FALSE"),
    ({"lineitems__part__p_brand__startswith": "Brand#1"},
     "p.p_brand LIKE 'Brand#1%'", "FALSE"),
]


class Node:
    def __init__(self, kind, a, b=None):
        self.kind, self.a, self.b = kind, a, b


@st.composite
def trees(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return Node("leaf", draw(st.integers(0, len(POOL) - 1)))
    kind = draw(st.sampled_from(["and", "or"]))
    return Node(kind, draw(trees(depth=depth + 1)),
                draw(trees(depth=depth + 1)))


def to_q(node) -> Q:
    if node.kind == "leaf":
        return Q(**POOL[node.a][0])
    left, right = to_q(node.a), to_q(node.b)
    return (left & right) if node.kind == "and" else (left | right)


def to_sql(node, null_branch: bool) -> str:
    if node.kind == "leaf":
        return POOL[node.a][2 if null_branch else 1]
    op = "AND" if node.kind == "and" else "OR"
    return (f"({to_sql(node.a, null_branch)} {op} "
            f"{to_sql(node.b, null_branch)})")


def frame_exists_sql(node) -> str:
    """Orders for which SOME row of the (customer, lineitem, part) joined
    frame satisfies the tree — the compiler's single-call match-set."""
    row = to_sql(node, null_branch=False)
    nul = to_sql(node, null_branch=True)
    return (
        "(EXISTS (SELECT 1 FROM lineitem l "
        "LEFT JOIN part p ON p.p_partkey = l.l_partkey "
        f"WHERE l.l_orderkey = o.o_orderkey AND {row}) "
        "OR (NOT EXISTS (SELECT 1 FROM lineitem l "
        "WHERE l.l_orderkey = o.o_orderkey) "
        f"AND {nul}))"
    )


@pytest.fixture(scope="module")
def ducks():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "part"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def tpch(spark):
    from tantalus_spark.inventory import db_for

    return db_for(spark, SF)


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(tree=trees(), exclude=st.booleans())
def test_filter_trees_match_duckdb(tpch, ducks, tree, exclude):
    q = to_q(tree)
    qs = tpch.query("orders")
    qs = qs.exclude(q) if exclude else qs.filter(q)
    got = sorted(r[0] for r in qs.to_df().select("o_orderkey").collect())
    pred = frame_exists_sql(tree)
    neg = "NOT " if exclude else ""
    sql = f"SELECT o_orderkey FROM orders o WHERE {neg}{pred}"
    want = sorted(r[0] for r in ducks.sql(sql).fetchall())
    assert got == want, f"exclude={exclude} sql={sql}"


def test_weighted_sample_matches_brute_force_aes(spark):
    """weighted_sample's top-k by ln(u)/w must equal the brute-force
    A-ES computation with the same md5-derived uniforms, and heavier
    rows must dominate the admitted set on average."""
    import hashlib
    import math

    from tantalus_spark.datapipe.sampling import weighted_sample

    rows = [(i, float(1 + (i % 10) * 10)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    out = weighted_sample(df, k=30, weight_col="w")
    got = [r["doc_id"] for r in out.collect()]

    def key(i, w):
        h = int(hashlib.md5(f"ws_{i}".encode()).hexdigest()[:15], 16)
        u = (h + 0.5) / 2.0 ** 60
        return math.log(u) / w

    want = sorted(rows, key=lambda r: (-key(*r), r[0]))[:30]
    assert got == [i for i, _ in want]
    # weight actually biases the draw: mean weight of the sample far
    # above the population mean (~46)
    mean_w = sum(w for i, w in rows if i in set(got)) / 30
    assert mean_w > 60


def test_weighted_sample_excludes_nan_and_nonpositive_weights(spark):
    """Spark orders NaN as greater than every double: an unguarded NaN
    weight would produce a NaN key that sorts to the top of the desc
    order and hijack the draw. NaN / zero / negative / NULL weights
    must all be excluded."""
    rows = [(1, 2.0), (2, float("nan")), (3, 0.0), (4, -1.0),
            (5, None), (6, 5.0)]
    from tantalus_spark.datapipe.sampling import weighted_sample

    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r["doc_id"] for r in
           weighted_sample(df, k=10, weight_col="w").collect()}
    assert got == {1, 6}
