"""Data-quality audit operators: column profiling, key-constraint and
referential-integrity checks — the pre-flight every 100 TB ingest runs
before training-data jobs trust a table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import query


@query(
    "profile_events",
    oracle=(
        "SELECT COUNT(*) AS n_rows, "
        "COUNT(user_id) AS user_id_nonnull, "
        "COUNT(DISTINCT user_id) AS user_id_distinct, "
        "COUNT(DISTINCT event_type) AS event_type_distinct, "
        "MIN(value) AS value_min, MAX(value) AS value_max, "
        "MIN(ts) AS ts_min, MAX(ts) AS ts_max "
        "FROM events"
    ),
    doc=(
        "Single-pass table profile: row count, per-column null/distinct "
        "counts, min/max ranges — one scan, one reduction."
    ),
)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.count("*").alias("n_rows"),
        F.count("user_id").alias("user_id_nonnull"),
        F.countDistinct("user_id").alias("user_id_distinct"),
        F.countDistinct("event_type").alias("event_type_distinct"),
        F.min("value").alias("value_min"),
        F.max("value").alias("value_max"),
        F.min("ts").alias("ts_min"),
        F.max("ts").alias("ts_max"),
    )


@query(
    "unique_key_check",
    oracle=(
        "SELECT o_orderkey AS dup_key, COUNT(*) AS n "
        "FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1"
    ),
    doc=(
        "Primary-key uniqueness check: violating keys with their "
        "multiplicity (empty result = constraint holds)."
    ),
)
def unique_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderkey").alias("dup_key"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )


@query(
    "fk_orphan_check",
    oracle=(
        "SELECT l_orderkey AS orphan_key, COUNT(*) AS n_rows "
        "FROM lineitem l "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey) "
        "GROUP BY l_orderkey"
    ),
    doc=(
        "Referential-integrity check: fact keys with no dimension row "
        "(anti join + group), empty = FK holds."
    ),
)
def fk_orphan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .groupBy(F.col("l_orderkey").alias("orphan_key"))
        .agg(F.count("*").alias("n_rows"))
    )


@query(
    "null_rate_by_column",
    oracle=(
        "SELECT 'artistish' AS col, "
        "CAST(COUNT(*) - COUNT(user_id) AS DOUBLE) / COUNT(*) AS null_rate "
        "FROM events "
        "UNION ALL "
        "SELECT 'props' AS col, "
        "CAST(COUNT(*) - COUNT(props) AS DOUBLE) / COUNT(*) AS null_rate "
        "FROM events"
    ),
    doc="Per-column null-rate report (exact integer ratios).",
)
def null_rate_by_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    n = F.count("*")
    a = ev.agg(
        F.lit("artistish").alias("col"),
        ((n - F.count("user_id")).cast("double") / n).alias("null_rate"),
    )
    b = ev.agg(
        F.lit("props").alias("col"),
        ((n - F.count("props")).cast("double") / n).alias("null_rate"),
    )
    return a.unionByName(b)


_DRIFT_BUCKET_SPARK = "width_bucket(value, 0.0, 500.0, 10)"
_DRIFT_BUCKET_DUCK = (
    "CASE WHEN value < 0.0 THEN 0 WHEN value >= 500.0 THEN 11 "
    "ELSE CAST(FLOOR(value / 50.0) + 1 AS BIGINT) END"
)


@query(
    "value_drift_tvd",
    oracle=(
        "WITH binned AS (SELECT event_type, "
        f"{_DRIFT_BUCKET_DUCK} AS bucket, "
        "CASE WHEN day(ts) <= 15 THEN 'a' ELSE 'b' END AS half "
        "FROM events), "
        "cells AS (SELECT event_type, bucket, "
        "SUM(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS n_a, "
        "SUM(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS n_b "
        "FROM binned GROUP BY 1, 2), "
        "tot AS (SELECT event_type, SUM(n_a) AS t_a, SUM(n_b) AS t_b "
        "FROM cells GROUP BY 1) "
        "SELECT c.event_type, CAST(t.t_a AS BIGINT) AS n_first_half, "
        "CAST(t.t_b AS BIGINT) AS n_second_half, "
        "CAST(SUM(abs(c.n_a * t.t_b - c.n_b * t.t_a)) AS DOUBLE) "
        "/ (2.0 * t.t_a * t.t_b) AS tvd "
        "FROM cells c JOIN tot t ON c.event_type = t.event_type "
        "GROUP BY c.event_type, t.t_a, t.t_b"
    ),
    doc=(
        "Distribution-drift monitor: total-variation distance between "
        "the first and second half-of-month value histograms, per event "
        "type. The TVD is computed as SUM|n_a*T_b - n_b*T_a| / "
        "(2*T_a*T_b): every sum is INTEGER (order-independent, "
        "engine-exact) and the only float operation is one final "
        "division — the drift analogue of the decimal-sum pattern. "
        "Map-side binning, two narrow aggregates; at extreme row counts "
        "the integer products approach 2^63 and the production variant "
        "scales counts per-mille first (documented tradeoff)."
    ),
)
def value_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.expr(_DRIFT_BUCKET_SPARK).alias("bucket"),
        F.when(F.dayofmonth("ts") <= 15, F.lit("a")).otherwise(F.lit("b")).alias("half"),
    )
    cells = binned.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("half") == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("half") == "b", 1).otherwise(0)).alias("n_b"),
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("n_a").alias("t_a"), F.sum("n_b").alias("t_b")
    )
    joined = cells.join(tot, "event_type")
    return (
        joined.groupBy("event_type", "t_a", "t_b")
        .agg(
            F.sum(
                F.abs(F.col("n_a") * F.col("t_b") - F.col("n_b") * F.col("t_a"))
            ).alias("num")
        )
        .select(
            "event_type",
            F.col("t_a").cast("bigint").alias("n_first_half"),
            F.col("t_b").cast("bigint").alias("n_second_half"),
            (
                F.col("num").cast("double")
                / (F.lit(2.0) * F.col("t_a") * F.col("t_b"))
            ).alias("tvd"),
        )
    )


_CENTS_SPARK = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"
_CENTS_DUCK = "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"


@query(
    "mad_outliers",
    oracle=(
        f"WITH c AS (SELECT event_type, {_CENTS_DUCK} AS v FROM events), "
        "med AS (SELECT event_type, quantile_cont(v::DOUBLE, 0.5) AS median_c "
        "FROM c GROUP BY 1), "
        "dev AS (SELECT c.event_type, abs(c.v - m.median_c) AS d, m.median_c "
        "FROM c JOIN med m ON c.event_type = m.event_type), "
        "mad AS (SELECT event_type, median_c, "
        "quantile_cont(d, 0.5) AS mad_c FROM dev GROUP BY 1, 2) "
        "SELECT dev.event_type, mad.median_c, mad.mad_c, "
        "CAST(SUM(CASE WHEN dev.d > 3 * mad.mad_c THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_outliers, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM dev JOIN mad ON dev.event_type = mad.event_type "
        "GROUP BY dev.event_type, mad.median_c, mad.mad_c"
    ),
    doc=(
        "Robust outlier detection: median absolute deviation per event "
        "type, counting points beyond 3*MAD — the robust-stats "
        "alternative to z-scores (immune to the outliers it hunts). "
        "Values go through the exact integer-cents cast (decimal "
        "pattern), so medians interpolate on an integral/half-integral "
        "grid where doubles are exact in both engines. Two percentile "
        "aggregates + one counting pass; each is a narrow shuffle on "
        "event_type."
    ),
)
def mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select("event_type", F.expr(_CENTS_SPARK).alias("v"))
    med = c.groupBy("event_type").agg(
        F.expr("percentile(CAST(v AS DOUBLE), 0.5)").alias("median_c")
    )
    dev = c.join(med, "event_type").select(
        "event_type", "median_c", F.abs(F.col("v") - F.col("median_c")).alias("d")
    )
    mad = dev.groupBy("event_type", "median_c").agg(
        F.expr("percentile(d, 0.5)").alias("mad_c")
    )
    return (
        dev.join(mad.select("event_type", "mad_c"), "event_type")
        .groupBy("event_type", "median_c", "mad_c")
        .agg(
            F.sum(F.when(F.col("d") > 3 * F.col("mad_c"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select("event_type", "median_c", "mad_c", "n_outliers", "n")
    )


def _orders_canonical(engine: str) -> str:
    from ..operators.validation import canonical_row_sql

    s = "STRING" if engine == "spark" else "VARCHAR"
    micros = "unix_micros(o_orderdate)" if engine == "spark" else "epoch_us(o_orderdate)"
    return canonical_row_sql(
        [
            f"CAST(o_orderkey AS {s})",
            f"CAST(o_custkey AS {s})",
            "o_orderstatus",
            # double->string is engine-dependent; 2-decimal render via DECIMAL
            f"CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS {s})",
            f"CAST({micros} AS {s})",
            "o_orderpriority",
        ]
    )


def _orders_checksum_oracle() -> str:
    from ..operators.text import duck_char_hash
    from ..operators.validation import duck_checksum_select

    return (
        "WITH h AS (SELECT strftime(o_orderdate, '%Y-%m') AS part, "
        f"{duck_char_hash(_orders_canonical('duck'))} AS rh FROM orders) "
        f"SELECT part, {duck_checksum_select('rh')} FROM h GROUP BY part"
    )


@query(
    "orders_partition_checksums",
    oracle=_orders_checksum_oracle(),
    doc=(
        "Orderless per-month content checksum of the orders table — the "
        "migration/replication validation primitive: both systems compute "
        "map-only row hashes over a canonical rendering (NULL marker, "
        "field separator, DECIMAL render for 2-decimal doubles, epoch "
        "micros for timestamps) and compare per-partition digests. Two "
        "channels (sum h, sum h^2 mod P) catch compensating edits; "
        "mod-reduced exact-decimal sums stay in range at any row count "
        "and merge across partitionings. See operators/validation.py."
    ),
)
def orders_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.validation import partition_checksums

    orders = load_table(spark, sf_dir, "orders")
    return partition_checksums(
        orders,
        "date_format(o_orderdate, 'yyyy-MM')",
        _orders_canonical("spark"),
    )


@query(
    "k_anonymity_audit",
    oracle=(
        "WITH g AS (SELECT event_type, CAST(ts AS DATE) AS day, "
        "count(DISTINCT user_id) AS n_users "
        "FROM events GROUP BY event_type, day) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_groups, "
        "CAST(min(n_users) AS BIGINT) AS min_users, "
        "CAST(sum(CASE WHEN n_users < 5 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_below_k5, "
        "CAST(sum(CASE WHEN n_users < 20 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_below_k20, "
        "CAST(sum(CASE WHEN n_users < 5 THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ count(*) AS frac_below_k5 "
        "FROM g GROUP BY event_type"
    ),
    doc=(
        "k-anonymity audit over the (event_type, day) quasi-identifier: "
        "per event type, how many daily groups fall under k=5 / k=20 "
        "distinct-user support — the suppression summary a governance "
        "layer consults before releasing aggregates. Two stacked "
        "two-phase aggregates; exact integers, one portable division."
    ),
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(F.countDistinct("user_id").alias("n_users"))
    return g.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.min("n_users").cast("long").alias("min_users"),
        F.sum(F.when(F.col("n_users") < 5, 1).otherwise(0))
        .cast("long")
        .alias("n_below_k5"),
        F.sum(F.when(F.col("n_users") < 20, 1).otherwise(0))
        .cast("long")
        .alias("n_below_k20"),
        (
            F.sum(F.when(F.col("n_users") < 5, 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("frac_below_k5"),
    )


def gini_term_decimal():
    """Exact Gini numerator term (2i - nk - 1) * c with the FACTORS cast
    to decimal before the multiplication: the per-term product (rank
    ~1e9 x hot-key count) can exceed int64 at 100 TB and would wrap
    silently in non-ANSI mode, while the DuckDB oracle computes it in
    hugeint — the engines would diverge exactly at the scale the query
    targets. decimal(20,0) factors keep the product within decimal(38,0)."""
    return (
        2 * F.col("i").cast("decimal(20,0)")
        - F.col("nk").cast("decimal(20,0)")
        - 1
    ) * F.col("c").cast("decimal(20,0)")


@query(
    "key_skew_report",
    oracle=(
        "WITH kc AS (SELECT user_id AS k, count(*) AS c FROM events "
        "GROUP BY user_id), "
        "r AS (SELECT c, row_number() OVER (ORDER BY c, k) AS i, "
        "count(*) OVER () AS nk, sum(c) OVER () AS total FROM kc) "
        "SELECT CAST(max(nk) AS BIGINT) AS n_keys, "
        "CAST(max(total) AS BIGINT) AS n_rows, "
        "CAST(max(c) AS BIGINT) AS max_key_rows, "
        "CAST(max(c) AS DOUBLE) * max(nk) / max(total) AS hot_key_factor, "
        "CAST(sum((2 * i - nk - 1) * c) AS DOUBLE) "
        "/ (CAST(max(nk) AS DOUBLE) * max(total)) AS gini "
        "FROM r"
    ),
    doc=(
        "Shuffle-key skew diagnostic over user_id: per-key counts "
        "(keys-dimension sized), Gini concentration via the exact "
        "integer form sum((2i - n - 1) * c_i) over counts sorted by "
        "(count, key) — the numerator is an exact integer sum, the only "
        "floats are final divisions — plus the hot-key factor "
        "(max / mean) that decides when the salted operators "
        "(operators/skew.py) are worth their overhead."
    ),
)
def key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    kc = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy("c", "k")
    wall = Window.partitionBy()
    r = kc.select(
        "c",
        F.row_number().over(w).alias("i"),
        F.count("*").over(wall).alias("nk"),
        F.sum("c").over(wall).alias("total"),
    )
    return r.agg(
        F.max("nk").cast("long").alias("n_keys"),
        F.max("total").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_key_rows"),
        (
            F.max("c").cast("double") * F.max("nk") / F.max("total")
        ).alias("hot_key_factor"),
        (
            F.sum(gini_term_decimal()).cast("double")
            / (F.max("nk").cast("double") * F.max("total"))
        ).alias("gini"),
    )


@query(
    "l_diversity_audit",
    oracle=(
        "WITH g AS (SELECT event_type, CAST(ts AS DATE) AS day, "
        "count(DISTINCT CAST(floor(value / 25.0) AS BIGINT)) AS l "
        "FROM events GROUP BY event_type, day) "
        "SELECT event_type, CAST(count(*) AS BIGINT) AS n_groups, "
        "CAST(min(l) AS BIGINT) AS min_l, "
        "CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_below_l3, "
        "CAST(sum(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ count(*) AS frac_below_l3 "
        "FROM g GROUP BY event_type"
    ),
    doc=(
        "l-diversity audit — the k-anonymity companion: a group can "
        "have plenty of members (k-anonymous) yet leak if they all "
        "share one sensitive value. Per (event_type, day) "
        "quasi-identifier group, l = distinct sensitive classes "
        "(value bucketed by 25); per event type, the min l and the "
        "fraction of groups below l=3. Two stacked two-phase "
        "aggregates; exact integers, one portable division, one "
        "portable float floor (same IEEE ops both engines)."
    ),
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.countDistinct(
            F.floor(F.col("value") / 25.0).cast("long")
        ).alias("l")
    )
    return g.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_groups"),
        F.min("l").cast("long").alias("min_l"),
        F.sum(F.when(F.col("l") < 3, 1).otherwise(0))
        .cast("long")
        .alias("n_below_l3"),
        (
            F.sum(F.when(F.col("l") < 3, 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("frac_below_l3"),
    )


# ---------------------------------------------------------------------
# Expectation-suite runner: every check in one report
# ---------------------------------------------------------------------

_DQ_REPORT_SQL = """
SELECT 'orders_pk_unique' AS check_name,
       (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
        FROM orders) AS observed,
       (SELECT COUNT(*) = COUNT(DISTINCT o_orderkey) FROM orders) AS passed
UNION ALL
SELECT 'orders_customer_fk',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)),
       (SELECT COUNT(*) = 0 FROM orders o
        WHERE o.o_custkey IS NOT NULL
          AND NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'orders_custkey_not_null',
       (SELECT CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) FROM orders),
       (SELECT COUNT(*) = COUNT(o_custkey) FROM orders)
UNION ALL
SELECT 'lineitem_at_least_orders',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
       (SELECT (SELECT COUNT(*) FROM lineitem) >=
               (SELECT COUNT(*) FROM orders))
UNION ALL
SELECT 'orders_status_domain',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
        WHERE o_orderstatus NOT IN ('O', 'F', 'P')),
       (SELECT COUNT(*) = 0 FROM orders
        WHERE o_orderstatus NOT IN ('O', 'F', 'P'))
UNION ALL
SELECT 'documents_text_present',
       (SELECT CAST(COUNT(*) AS BIGINT) FROM documents
        WHERE text IS NULL OR length(text) = 0),
       (SELECT COUNT(*) = 0 FROM documents
        WHERE text IS NULL OR length(text) = 0)
"""


@query(
    "data_quality_report",
    oracle=_DQ_REPORT_SQL,
    doc=(
        "Expectation-suite runner (the dbt-test / Great-Expectations "
        "shape): six constraint checks — PK uniqueness, FK integrity, "
        "not-null, cross-table row-count sanity, value-domain, "
        "text-present — evaluated in one job, one report row per check "
        "(check_name, observed violation count, passed). All integer/"
        "boolean arithmetic -> exact oracle. Each check is one "
        "aggregate over its table; Spark runs them as independent "
        "stages of a single union plan, so the pre-flight costs one "
        "pass per table regardless of how many checks share it."
    ),
)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    documents = load_table(spark, sf_dir, "documents")

    def row(name: str, observed, passed) -> DataFrame:
        return (
            observed.crossJoin(passed)
            .select(
                F.lit(name).alias("check_name"),
                F.col("observed").cast("long").alias("observed"),
                F.col("passed"),
            )
        )

    pk = orders.agg(
        (F.count("*") - F.countDistinct("o_orderkey")).alias("observed")
    )
    pk_ok = orders.agg(
        (F.count("*") == F.countDistinct("o_orderkey")).alias("passed")
    )

    orphans = orders.filter(F.col("o_custkey").isNotNull()).join(
        customer.select(F.col("c_custkey").alias("o_custkey")),
        "o_custkey",
        "left_anti",
    )
    fk = orphans.agg(F.count("*").alias("observed"))
    fk_ok = fk.select((F.col("observed") == 0).alias("passed"))

    nn = orders.agg(
        (F.count("*") - F.count("o_custkey")).alias("observed")
    )
    nn_ok = nn.select((F.col("observed") == 0).alias("passed"))

    li = lineitem.agg(F.count("*").alias("observed"))
    li_ok = li.crossJoin(
        orders.agg(F.count("*").alias("__n_orders"))
    ).select((F.col("observed") >= F.col("__n_orders")).alias("passed"))

    dom = orders.filter(
        ~F.col("o_orderstatus").isin("O", "F", "P")
    ).agg(F.count("*").alias("observed"))
    dom_ok = dom.select((F.col("observed") == 0).alias("passed"))

    txt = documents.filter(
        F.col("text").isNull() | (F.length("text") == 0)
    ).agg(F.count("*").alias("observed"))
    txt_ok = txt.select((F.col("observed") == 0).alias("passed"))

    out = row("orders_pk_unique", pk, pk_ok)
    for args in (
        ("orders_customer_fk", fk, fk_ok),
        ("orders_custkey_not_null", nn, nn_ok),
        ("lineitem_at_least_orders", li, li_ok),
        ("orders_status_domain", dom, dom_ok),
        ("documents_text_present", txt, txt_ok),
    ):
        out = out.unionByName(row(*args))
    return out
