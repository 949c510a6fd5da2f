"""Differential fuzzing: hypothesis-generated ANSI SQL runs verbatim on
BOTH engines (Spark SQL over the engine's loaded tables, DuckDB over
the same parquet) and the result frames must match exactly.

The per-query oracle suite pins the 260+ registered queries; this
harness pins the ENGINE SURFACE BETWEEN them — random predicate /
group-by / aggregate combinations nobody hand-wrote, the class of gap
a fixed query list can never cover. The grammar is deliberately
restricted to constructs with engine-identical semantics:

* integer arithmetic, comparisons, IN, LIKE, AND/OR;
* COUNT(*) / COUNT(DISTINCT) / SUM(bigint) (cast back to BIGINT —
  DuckDB sums BIGINT into HUGEINT) — exact integers;
* MIN/MAX over doubles — exact value PICKS, never accumulations
  (SUM(double) is partition-order-dependent and belongs to the
  decimal-sum pattern, functions/numeric.py);
* year() over microsecond timestamps.

``derandomize=True`` keeps the suite deterministic round-over-round;
raising ``max_examples`` locally widens the sweep.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from event_data_etl_gcs_spark.sources.catalog import load_table

from .conftest import SF_ORACLE, normalize

# SPARK_GRAFT_FUZZ_EXAMPLES widens every shape for the close-out sweep
# (derandomize stays on, so a 1000-example sweep is reproducible and a
# superset of the in-suite examples).
_N = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0"))

_SETTINGS = dict(
    deadline=None,
    max_examples=_N or 25,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# the join-surface shapes carry 30 examples each (4 x 30 = 120 in-suite)
_JOIN_SETTINGS = dict(_SETTINGS, max_examples=_N or 30)


@pytest.fixture(scope="module", autouse=True)
def _views(spark):
    for t in ("orders", "customer", "documents"):
        load_table(spark, SF_ORACLE, t).createOrReplaceTempView(f"fuzz_{t}")
    yield
    for t in ("orders", "customer", "documents"):
        spark.catalog.dropTempView(f"fuzz_{t}")


@st.composite
def _atom(draw) -> str:
    kind = draw(
        st.sampled_from(["mod", "custkey", "price", "status", "prio", "year"])
    )
    if kind == "mod":
        m = draw(st.integers(2, 13))
        return f"o_orderkey % {m} = {draw(st.integers(0, m - 1))}"
    if kind == "custkey":
        op = draw(st.sampled_from(["<=", ">", "="]))
        return f"o_custkey {op} {draw(st.integers(0, 149))}"
    if kind == "price":
        op = draw(st.sampled_from(["<", ">="]))
        cents = draw(st.integers(132_051, 49_970_505))
        return f"o_totalprice {op} {cents / 100:.2f}"
    if kind == "status":
        vals = draw(
            st.lists(
                st.sampled_from(["'O'", "'F'", "'P'"]),
                min_size=1,
                max_size=3,
                unique=True,
            )
        )
        return f"o_orderstatus IN ({', '.join(vals)})"
    if kind == "prio":
        frag = draw(st.sampled_from(["URGENT", "HIGH", "MEDIUM", "LOW", "1-", "5-"]))
        neg = draw(st.booleans())
        return f"o_orderpriority {'NOT ' if neg else ''}LIKE '%{frag}%'"
    return f"year(o_orderdate) = {draw(st.integers(1994, 2002))}"


@st.composite
def _predicate(draw) -> str:
    atoms = draw(st.lists(_atom(), min_size=1, max_size=3))
    op = draw(st.sampled_from([" AND ", " OR "]))
    return "(" + op.join(atoms) + ")"


_AGGS = [
    "COUNT(*) AS cnt",
    "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok",
    "COUNT(DISTINCT o_custkey) AS n_cust",
    "MIN(o_totalprice) AS min_price",
    "MAX(o_totalprice) AS max_price",
]

_KEYS = [
    ("o_orderstatus", "o_orderstatus"),
    ("o_orderpriority", "o_orderpriority"),
    ("o_custkey % 7 AS ck7", "o_custkey % 7"),
    ("year(o_orderdate) AS yr", "year(o_orderdate)"),
]


@st.composite
def _agg_query(draw, table_sql: str) -> str:
    keys = draw(
        st.lists(st.sampled_from(_KEYS), min_size=0, max_size=2, unique=True)
    )
    aggs = draw(
        st.lists(st.sampled_from(_AGGS), min_size=1, max_size=3, unique=True)
    )
    pred = draw(_predicate())
    select = ", ".join([k[0] for k in keys] + aggs)
    sql = f"SELECT {select} FROM {table_sql} WHERE {pred}"
    if keys:
        sql += " GROUP BY " + ", ".join(k[1] for k in keys)
    return sql


def _check(spark, duck, sql: str) -> None:
    got = normalize(spark.sql(sql).toPandas())
    want = normalize(duck.execute(sql.replace("fuzz_", "")).df())
    assert list(got.columns) == list(want.columns), sql
    pd.testing.assert_frame_equal(
        got, want, check_dtype=False, check_exact=True, obj=sql
    )


@settings(**_SETTINGS)
@given(sql=_agg_query("fuzz_orders"))
def test_fuzz_single_table_agg(spark, duck, sql):
    _check(spark, duck, sql)


@st.composite
def _join_query(draw) -> str:
    pred = draw(_predicate())
    key = draw(st.sampled_from(["c_mktsegment", "c_nationkey"]))
    aggs = draw(
        st.lists(st.sampled_from(_AGGS), min_size=1, max_size=2, unique=True)
    )
    extra = draw(st.sampled_from(["", " AND c_acctbal >= 0.00", " AND c_nationkey < 13"]))
    return (
        f"SELECT {key}, {', '.join(aggs)} "
        f"FROM fuzz_orders JOIN fuzz_customer ON o_custkey = c_custkey "
        f"WHERE {pred}{extra} GROUP BY {key}"
    )


@settings(**_SETTINGS)
@given(sql=_join_query())
def test_fuzz_join_agg(spark, duck, sql):
    _check(spark, duck, sql)


@st.composite
def _window_query(draw) -> str:
    """Windowed top-n per key: deterministic total order (o_orderkey is
    unique), integer window aggregates only."""
    key = draw(st.sampled_from([k[1] for k in _KEYS]))
    direction = draw(st.sampled_from(["ASC", "DESC"]))
    n = draw(st.integers(1, 20))
    pred = draw(_predicate())
    return (
        f"SELECT * FROM ("
        f"SELECT o_orderkey, {key} AS k, "
        f"ROW_NUMBER() OVER (PARTITION BY {key} "
        f"ORDER BY o_orderkey {direction}) AS rn, "
        f"CAST(SUM(o_orderkey) OVER (PARTITION BY {key}) AS BIGINT) "
        f"AS grp_sum "
        f"FROM fuzz_orders WHERE {pred}"
        f") t WHERE rn <= {n}"
    )


@settings(**_SETTINGS)
@given(sql=_window_query())
def test_fuzz_window_topn(spark, duck, sql):
    _check(spark, duck, sql)


@st.composite
def _doc_atom(draw) -> str:
    """Predicates over the multilingual documents table. length() is
    character semantics in BOTH engines (verified on the zh rows)."""
    kind = draw(st.sampled_from(["len", "mod", "lang", "source", "nchars"]))
    if kind == "len":
        op = draw(st.sampled_from(["<", ">="]))
        return f"length(text) {op} {draw(st.integers(50, 800))}"
    if kind == "mod":
        m = draw(st.integers(2, 9))
        return f"doc_id % {m} = {draw(st.integers(0, m - 1))}"
    if kind == "lang":
        vals = draw(
            st.lists(
                st.sampled_from(["'en'", "'de'", "'es'", "'fr'", "'zh'"]),
                min_size=1,
                max_size=3,
                unique=True,
            )
        )
        return f"lang IN ({', '.join(vals)})"
    if kind == "source":
        # parenthesized: Spark parses `x LIKE 'p' = true` as
        # `x LIKE ('p' = true)` (= binds tighter than LIKE), DuckDB the
        # other way — a real precedence divergence this harness found
        return f"(source LIKE 'src1%') = {draw(st.sampled_from(['true', 'false']))}"
    return f"n_chars {draw(st.sampled_from(['<=', '>']))} {draw(st.integers(100, 2000))}"


@st.composite
def _doc_query(draw) -> str:
    keys = draw(
        st.lists(
            st.sampled_from(["lang", "source"]),
            min_size=0,
            max_size=2,
            unique=True,
        )
    )
    aggs = draw(
        st.lists(
            st.sampled_from(
                [
                    "COUNT(*) AS cnt",
                    "CAST(SUM(length(text)) AS BIGINT) AS sum_len",
                    "CAST(SUM(n_chars) AS BIGINT) AS sum_chars",
                    "MIN(n_chars) AS min_chars",
                    "MAX(doc_id) AS max_id",
                    "COUNT(DISTINCT lang) AS n_lang",
                ]
            ),
            min_size=1,
            max_size=3,
            unique=True,
        )
    )
    atoms = draw(st.lists(_doc_atom(), min_size=1, max_size=3))
    pred = "(" + draw(st.sampled_from([" AND ", " OR "])).join(atoms) + ")"
    sql = (
        f"SELECT {', '.join(list(keys) + aggs)} FROM fuzz_documents "
        f"WHERE {pred}"
    )
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
    return sql


@settings(**_SETTINGS)
@given(sql=_doc_query())
def test_fuzz_documents_agg(spark, duck, sql):
    _check(spark, duck, sql)


# =========================================================================
# Join-surface shapes (VERDICT r9 directive #2): inner/left/right/full,
# ON vs USING, nullable derived keys, semi/anti, self band join — the
# exact surface where cross-engine divergences historically live.
# =========================================================================

_JOIN_TYPES = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]

_JOIN_AGGS = [
    "COUNT(*) AS cnt",
    # null-extended-side counters: COUNT(col) vs COUNT(*) is where outer
    # join semantics show
    "COUNT(c_nationkey) AS n_cust_side",
    "COUNT(o_orderkey) AS n_order_side",
    "CAST(SUM(o_orderkey) AS BIGINT) AS sum_ok",
    "COUNT(DISTINCT c_nationkey) AS n_nation",
]


@st.composite
def _join_using_query(draw) -> str:
    """orders x customer through a USING join (coalesced key column) —
    optionally on a NULLIF-derived key, so null keys must never match
    on EITHER engine, and grouping by the USING column exercises the
    coalesce semantics of outer joins."""
    jt = draw(st.sampled_from(_JOIN_TYPES))
    pred = draw(_predicate())
    if draw(st.booleans()):
        m = draw(st.integers(2, 11))
        okey = f"NULLIF(o_custkey % {m}, 0)"
        ckey = f"NULLIF(c_custkey % {m}, 0)"
    else:
        okey, ckey = "o_custkey", "c_custkey"
    key = draw(st.sampled_from(["ck", "c_nationkey", ""]))
    aggs = draw(
        st.lists(st.sampled_from(_JOIN_AGGS), min_size=1, max_size=3, unique=True)
    )
    select = ", ".join(([key] if key else []) + aggs)
    sql = (
        f"SELECT {select} FROM "
        f"(SELECT {okey} AS ck, o_orderkey, o_custkey FROM fuzz_orders "
        f"WHERE {pred}) o "
        f"{jt} (SELECT {ckey} AS ck, c_nationkey, c_acctbal "
        f"FROM fuzz_customer) c USING (ck)"
    )
    if key:
        sql += f" GROUP BY {key}"
    return sql


@settings(**_JOIN_SETTINGS)
@given(sql=_join_using_query())
def test_fuzz_join_using_shapes(spark, duck, sql):
    _check(spark, duck, sql)


@st.composite
def _join_on_query(draw) -> str:
    """ON-spelled joins with an optional extra ON conjunct (filtering in
    the ON clause of an outer join preserves rows the same filter in
    WHERE would drop) and an optional IS [NOT] NULL WHERE probe (the
    LEFT JOIN ... WHERE key IS NULL anti-join idiom)."""
    jt = draw(st.sampled_from(_JOIN_TYPES))
    pred = draw(_predicate())
    extra_on = draw(
        st.sampled_from(
            ["", " AND c_acctbal >= 0.00", " AND c_nationkey < 13",
             " AND o_orderstatus = 'O'"]
        )
    )
    where = draw(
        st.sampled_from(
            ["", " WHERE c_custkey IS NULL", " WHERE c_custkey IS NOT NULL"]
        )
    )
    key = draw(st.sampled_from(["c_mktsegment", "c_nationkey", ""]))
    aggs = draw(
        st.lists(st.sampled_from(_JOIN_AGGS), min_size=1, max_size=3, unique=True)
    )
    select = ", ".join(([key] if key else []) + aggs)
    sql = (
        f"SELECT {select} FROM (SELECT * FROM fuzz_orders WHERE {pred}) o "
        f"{jt} fuzz_customer ON o_custkey = c_custkey{extra_on}{where}"
    )
    if key:
        sql += f" GROUP BY {key}"
    return sql


@settings(**_JOIN_SETTINGS)
@given(sql=_join_on_query())
def test_fuzz_join_on_shapes(spark, duck, sql):
    _check(spark, duck, sql)


@st.composite
def _semi_anti_query(draw) -> str:
    """Semi/anti joins in their ANSI spellings: correlated [NOT] EXISTS
    and [NOT] IN over a possibly-NULL subquery column (three-valued
    NOT IN: one NULL in the subquery empties the result — both engines
    must agree)."""
    pred = draw(_predicate())
    neg = draw(st.booleans())
    form = draw(st.sampled_from(["exists", "in", "in_nullable"]))
    if form == "exists":
        sub = (
            f"{'NOT ' if neg else ''}EXISTS (SELECT 1 FROM fuzz_orders "
            f"WHERE o_custkey = c_custkey AND {pred})"
        )
    elif form == "in":
        sub = (
            f"c_custkey {'NOT ' if neg else ''}IN "
            f"(SELECT o_custkey FROM fuzz_orders WHERE {pred})"
        )
    else:
        m = draw(st.integers(2, 11))
        sub = (
            f"c_custkey % {m} {'NOT ' if neg else ''}IN "
            f"(SELECT NULLIF(o_custkey % {m}, 0) FROM fuzz_orders "
            f"WHERE {pred})"
        )
    key = draw(st.sampled_from(["c_mktsegment", "c_nationkey"]))
    return (
        f"SELECT {key}, COUNT(*) AS cnt, "
        f"CAST(SUM(c_custkey) AS BIGINT) AS sum_ck "
        f"FROM fuzz_customer WHERE {sub} GROUP BY {key}"
    )


@settings(**_JOIN_SETTINGS)
@given(sql=_semi_anti_query())
def test_fuzz_semi_anti(spark, duck, sql):
    _check(spark, duck, sql)


@st.composite
def _self_band_query(draw) -> str:
    """documents self-join: equi on language (optionally NULLIF'd — a
    whole language's keys become NULL and must produce no pairs) plus a
    doc_id band (range-join predicate), aggregated per language."""
    k = draw(st.integers(1, 40))
    jt = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    if draw(st.booleans()):
        lang = draw(st.sampled_from(["en", "de", "es", "fr", "zh"]))
        akey = f"NULLIF(a.lang, '{lang}')"
        bkey = f"NULLIF(b.lang, '{lang}')"
    else:
        akey, bkey = "a.lang", "b.lang"
    atoms = draw(st.lists(_doc_atom(), min_size=1, max_size=2))
    op = draw(st.sampled_from([" AND ", " OR "]))
    pred = "(" + op.join(a.replace("doc_id", "a.doc_id")
                          .replace("length(text)", "length(a.text)")
                          .replace("lang ", "a.lang ")
                          .replace("source", "a.source")
                          .replace("n_chars", "a.n_chars")
                         for a in atoms) + ")"
    return (
        f"SELECT a.lang AS lang_a, COUNT(*) AS cnt, "
        f"COUNT(b.doc_id) AS n_matched, "
        f"CAST(SUM(a.doc_id) AS BIGINT) AS sum_a "
        f"FROM fuzz_documents a {jt} fuzz_documents b "
        f"ON {akey} = {bkey} AND b.doc_id > a.doc_id "
        f"AND b.doc_id <= a.doc_id + {k} "
        f"WHERE {pred} GROUP BY a.lang"
    )


@settings(**_JOIN_SETTINGS)
@given(sql=_self_band_query())
def test_fuzz_self_band_join(spark, duck, sql):
    _check(spark, duck, sql)
