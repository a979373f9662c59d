"""Query registry: the engine's declared query surface + DuckDB oracles.

Every operator from SURVEY.md §2 Tier B gets a named query here:
``SPARK[name]`` is a ``(spark, sf_dir) -> DataFrame`` callable built on
the DataFrame API (Catalyst plans it); ``ORACLE[name]`` is the
equivalent SQL DuckDB runs on the same parquet for the differential
correctness gate. Names and output column names match exactly on both
sides (the driver sorts columns by name before hashing).

Float determinism policy (why you see decimal casts and rounds):
- SUM(double) is order-dependent -> both sides sum in DECIMAL(27,4)
  (exact, associative) and cast the result back to double.
- AVG / transcendentals are rounded to a tolerance the accumulation
  error cannot cross.
- COUNT/MIN/MAX are exact as-is.
- Timestamps are emitted as formatted strings (engine-neutral).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.bpe import count_expr_duckdb, count_expr_spark
from .functions.text import (
    fingerprint,
    normalize_text,
    shingles_from_tokens,
    token_count,
    tokens,
)
from .functions import urls as U
from .functions.vector import cosine, norm
from .operators import dedup as D
from .operators import simsearch as S
from .operators import textops as X

DEC = "decimal(27,4)"

SPARK: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        SPARK[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _pin_utc(spark: SparkSession) -> None:
    """Pin the session timezone so timestamp rendering/extraction is
    engine-neutral (parquet stores UTC instants; DuckDB reads them as
    naive-UTC). Without this, a driver JVM in a non-UTC zone shifts
    every date_format/extract result (verified failure mode)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")


# Memoized source DataFrames. A fresh spark.read.parquet costs
# ~140-180 ms per call on these fixtures (file listing + footer/schema
# read + FileIndex build) — pure fixed tax repaid on EVERY query build,
# since the testdata is immutable within a session. Keyed by
# applicationId so a restarted session can't serve stale plans.
# DataFrames are immutable, so sharing the base object is safe; no
# registered query loads the same table twice (self-joins all go
# through .alias on one object, which Spark dealiases).
_LOAD_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    _pin_utc(spark)
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, table)
    df = _LOAD_CACHE.get(key)
    if df is None:
        # only one session is live at a time: entries keyed by any
        # other applicationId belong to a stopped session — drop them
        # so its JVM-backed plans aren't pinned for the process lifetime
        for k in [k for k in _LOAD_CACHE if k[0] != app]:
            del _LOAD_CACHE[k]
        if table == "events":
            df = load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
        _LOAD_CACHE[key] = df
    return df


def scan_parallel(df: DataFrame) -> DataFrame:
    """See operators.skew.ensure_scan_parallelism (one definition)."""
    from .operators.skew import ensure_scan_parallelism

    return ensure_scan_parallelism(df)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts has shipped as both TIMESTAMP(NANOS) and timestamp[us]
    parquet across testdata generations; dispatch on what the file
    actually holds. NANOS is rejected by Spark's vectorized reader, so
    it arrives as raw int64 nanos (legacy conf) and converts with exact
    integer division to microseconds (matching DuckDB's ns->us
    truncation — double division would lose precision at 1e18).
    timestamp[us] arrives as TIMESTAMP_NTZ (naive-UTC, same as DuckDB)
    and only needs the cast to the session-UTC instant type the rest of
    the query surface expects."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes)["ts"] == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def dsum(col: F.Column, alias: str) -> F.Column:
    """Order-independent double sum: accumulate exactly in decimal."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def ts_str(col) -> F.Column:
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


def anchor_embedding(e: DataFrame, vec_id: int) -> list:
    """Fetch the single anchor/query embedding `vec_id` to the driver,
    failing with a DESCRIPTIVE error when the fixture lacks that row
    (q124/q136/q143 hard-depend on vec_id 0 existing; a bare
    collect()[0][0] would die with an opaque IndexError, or worse,
    downstream code would see an empty frame and emit empty output
    silently)."""
    rows = e.filter(F.col("vec_id") == vec_id).select("embedding").collect()
    if not rows or rows[0][0] is None:
        raise ValueError(
            f"anchor embedding vec_id={vec_id} missing from the embeddings "
            "table — this query's oracle pins that exact id; regenerate the "
            "fixture or change the anchor on BOTH sides"
        )
    return rows[0][0]


# =====================================================================
# Aggregation / scan / filter
# =====================================================================


@query(
    "q01_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash aggregate (flagship).

    Float determinism: the source doubles carry exactly-2dp values, so
    each operand is cast to decimal FIRST and all arithmetic happens in
    exact decimal (associative, engine-identical). Computing the
    product in double and casting the RESULT to decimal is not enough:
    per-row half-way rounding differs between JVM and DuckDB and the
    1e-4 deltas accumulate over 60k rows (observed 0.004 divergence on
    sum_charge at sf0.01 = driver hash_match failure)."""
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc_price = price * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    charge = disc_price * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q02_filter_predicates",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000 AND 200000
      AND o_orderstatus LIKE 'F%'
      AND o_custkey IS NOT NULL
    """,
)
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter surface: IN, BETWEEN, LIKE, NULL predicate (pushed to scan)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000, 200000)
        & F.col("o_orderstatus").like("F%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")


@query(
    "q06_forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.09
      AND l_quantity < 24
    """,
)
def q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight filter + global aggregate."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@query(
    "q11_agg_rollup",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy aggregate."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum(F.col("l_quantity"), "sum_qty"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q12_agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregate."""
    o = load(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        dsum(F.col("o_totalprice"), "total"), F.count(F.lit(1)).alias("n")
    )


@query(
    "q13_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS total
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via SQL (Catalyst expands to Expand + Aggregate)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS decimal(27,4))) AS double) AS total
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "q41_percentiles",
    """
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.25), 4) AS p25,
           ROUND(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           ROUND(quantile_cont(o_totalprice, 0.75), 4) AS p75,
           COUNT(DISTINCT o_custkey) AS n_cust
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q41(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles + distinct count per group."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 4).alias("p75"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )


@query(
    "q21_distinct_pairs",
    """
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (exact dedup on composite key)."""
    return load(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


# =====================================================================
# Joins
# =====================================================================


@query(
    "q03_shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate_str
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-k."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", ts_str("o_orderdate").alias("orderdate_str"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q04_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) join with a non-equi residual condition."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (
        li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "q05_region_revenue",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: star join with broadcast dims."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


@query(
    "q07_left_join",
    """
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(27,4))), 0) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(F.col("o_totalprice").cast(DEC)), F.lit(0).cast(DEC))
            .cast("double")
            .alias("total_spend"),
        )
    )


@query(
    "q08_full_outer",
    """
    WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.nk, s.nk) AS nationkey, n_cust, n_supp
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
)
def q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "nk", "full_outer")
        .select(F.col("nk").alias("nationkey"), "n_cust", "n_supp")
    )


@query(
    "q09_anti_join",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
    """,
)
def q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the merge-survivor op (ref A17/A19)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "q10_semi_join",
    """
    SELECT c_custkey, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'P')
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_acctbal"
    )


@query(
    "q16_cross_join",
    """
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (small dims)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "q38_range_join",
    """
    SELECT o_orderpriority, COUNT(*) AS n_early
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderpriority
    """,
)
def q38(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (interval) join: lineitems shipped within 30 days."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAYS"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_early"))
    )


@query(
    "q37_asof_join",
    """
    WITH j AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, o_orderkey AS asof_orderkey, o_totalprice AS asof_totalprice
    FROM j WHERE rn = 1
    """,
)
def q37(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to the user's most recent prior
    order — union+carry-forward dataflow (operators/asof.py): one
    linear shuffle of |events|+|orders|, never the quadratic
    (event x prior-order) pair space of the join+window shape."""
    from .operators.asof import asof_join

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = load(spark, sf_dir, "orders")
    out = asof_join(
        e,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderdate", "o_orderkey", "o_totalprice"],
        how="inner",
    )
    return out.select(
        "event_id",
        F.col("o_orderkey").alias("asof_orderkey"),
        F.col("o_totalprice").alias("asof_totalprice"),
    )


# =====================================================================
# Windows
# =====================================================================


@query(
    "q14_window_topk",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INTEGER) AS rn FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via row_number window."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "q15_window_lag",
    """
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           ROUND(value - COALESCE(LAG(value) OVER w, 0), 4) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation window."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.col("value") - F.coalesce(F.lag("value").over(w), F.lit(0)), 4).alias(
            "delta"
        ),
    )


@query(
    "q17_window_running",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
           COUNT(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) frame aggregate + partition count."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w), 4).alias("running_spend"),
        F.count(F.lit(1)).over(Window.partitionBy("o_custkey")).alias("n_orders"),
    )


@query(
    "q18_rank_ntile",
    """
    SELECT p_brand, p_partkey,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           CAST(NTILE(4) OVER w AS INTEGER) AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC)
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank / dense_rank / ntile."""
    p = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return p.select(
        "p_brand",
        "p_partkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "q36_sessionize",
    """
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - COALESCE(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
                         > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
        FROM events
    ), s AS (
        SELECT user_id, event_id,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM g
    )
    SELECT user_id, COUNT(DISTINCT session_id) AS n_sessions,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id
    """,
)
def q36(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min-gap splitting via lag + cumulative sum."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.coalesce(
        F.lag(F.col("ts").cast("long")).over(w), F.col("ts").cast("long")
    )
    sess = (
        e.withColumn("new_session", F.when(gap > 1800, 1).otherwise(0))
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return sess.groupBy("user_id").agg(
        F.countDistinct("session_id").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
    )


# =====================================================================
# Sort / limit / set ops
# =====================================================================


@query(
    "q19_topk_global",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k (TakeOrderedAndProject — no full sort materialized)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_totalprice")
    )


@query(
    "q20_set_ops",
    """
    WITH active AS (SELECT DISTINCT o_custkey AS k FROM orders),
         rich   AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000),
         partial AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'P')
    SELECT k, 'both' AS tag FROM (SELECT k FROM active INTERSECT SELECT k FROM rich)
    UNION ALL
    SELECT k, 'rich_only' AS tag FROM (SELECT k FROM rich EXCEPT SELECT k FROM active)
    UNION ALL
    SELECT k, 'partial' AS tag FROM partial
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operations: INTERSECT, EXCEPT, UNION ALL."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    active = o.select(F.col("o_custkey").alias("k")).distinct()
    rich = c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    partial = (
        o.filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )
    both = active.intersect(rich).withColumn("tag", F.lit("both"))
    rich_only = rich.subtract(active).withColumn("tag", F.lit("rich_only"))
    part_tag = partial.withColumn("tag", F.lit("partial"))
    return both.unionByName(rich_only).unionByName(part_tag)


# =====================================================================
# Scalar function surface
# =====================================================================


@query(
    "q22_string_fns",
    """
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           SUBSTR(p_name, 1, 5) AS name_prefix,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           REGEXP_EXTRACT(p_name, '^(\\w+)', 1) AS first_word,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           TRIM('  ' || p_brand || ' ') AS brand_trim,
           CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green
    FROM part
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function surface."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_replace(F.col("p_type"), " ", "_").alias("type_snake"),
        F.regexp_extract(F.col("p_name"), r"^(\w+)", 1).alias("first_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
    )


@query(
    "q23_datetime_fns",
    """
    SELECT event_id,
           EXTRACT(YEAR FROM ts) AS yr,
           EXTRACT(MONTH FROM ts) AS mon,
           EXTRACT(DAY FROM ts) AS dom,
           EXTRACT(HOUR FROM ts) AS hr,
           EXTRACT(MINUTE FROM ts) AS mi,
           ISODOW(ts) - 1 AS weekday_mon0,
           STRFTIME(DATE_TRUNC('day', ts), '%Y-%m-%d %H:%M:%S') AS day_str,
           DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since
    FROM events
    """,
)
def q23(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function surface (engine-neutral day-of-week: Mon=0)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.year("ts").cast("long").alias("yr"),
        F.month("ts").cast("long").alias("mon"),
        F.dayofmonth("ts").cast("long").alias("dom"),
        F.hour("ts").cast("long").alias("hr"),
        F.minute("ts").cast("long").alias("mi"),
        F.weekday("ts").cast("long").alias("weekday_mon0"),
        ts_str(F.date_trunc("day", F.col("ts"))).alias("day_str"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
    )


@query(
    "q24_math_fns",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1) AS price_r1,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_k,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           ROUND(SQRT(l_quantity), 6) AS qty_sqrt,
           ROUND(POW(1 + l_tax, 2), 6) AS tax_sq,
           CAST(SIGN(l_discount - 0.05) AS BIGINT) AS disc_sign,
           MOD(l_linenumber, 3) AS ln_mod
    FROM lineitem
    """,
)
def q24(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function surface (transcendentals rounded to 6dp for
    cross-libm portability).

    Integer-valued results (floor/ceil/sign) are cast to BIGINT on BOTH
    sides: Spark's FLOOR/CEIL return LONG while DuckDB's return DOUBLE
    (and the reverse for SIGN), and the driver's value canonicalization
    is type-sensitive — 7 vs 7.0 hash-mismatches even though the math
    agrees (observed driver hash_match failure, round 1)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).alias("price_k"),
        F.round(F.log(F.col("l_extendedprice")), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice")), 6).alias("price_log10"),
        F.round(F.sqrt(F.col("l_quantity")), 6).alias("qty_sqrt"),
        F.round(F.pow(1 + F.col("l_tax"), 2), 6).alias("tax_sq"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
        (F.col("l_linenumber") % 3).alias("ln_mod"),
    )


@query(
    "q25_case_when",
    """
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                WHEN o_totalprice < 300000 THEN 'large'
                ELSE 'jumbo' END AS band,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total
    FROM orders GROUP BY 1
    """,
)
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN banding + aggregate."""
    o = load(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return o.groupBy(band.alias("band")).agg(
        F.count(F.lit(1)).alias("n"), dsum(F.col("o_totalprice"), "total")
    )


@query(
    "q26_array_fns",
    """
    SELECT vec_id, label,
           LEN(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_elem,
           ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
    FROM embeddings
    """,
)
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function surface over embedding vectors."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(norm(F.col("embedding")), 6).alias("l2_norm"),
    )


@query(
    "q27_json_fns",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("long")).alias("k_sum"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q28_pivot",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END AS DECIMAL(27,4))) AS DOUBLE) AS qty_f,
           CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END AS DECIMAL(27,4))) AS DOUBLE) AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double"))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
    )


# =====================================================================
# LLM-data-pipeline operators
# =====================================================================

_NORM_SQL = "TRIM(REGEXP_REPLACE(LOWER({c}), '\\s+', ' ', 'g'))"


@query(
    "q29_fingerprints",
    f"""
    SELECT doc_id, MD5({_NORM_SQL.format(c='text')}) AS fp
    FROM documents
    """,
)
def q29(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting (md5 of normalized text)."""
    d = load(spark, sf_dir, "documents")
    return X.doc_fingerprints(d, "text", "doc_id")


@query(
    "q30_exact_dedup",
    f"""
    SELECT MD5({_NORM_SQL.format(c='text')}) AS fp,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS keep_id
    FROM documents GROUP BY 1
    """,
)
def q30(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups by content fingerprint."""
    d = load(spark, sf_dir, "documents")
    return D.exact_dedup_groups(d, "text", "doc_id")


@query(
    "q31_text_stats",
    f"""
    SELECT doc_id,
           LENGTH(text) AS n_chars,
           CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0
                ELSE LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) END AS n_tokens,
           ROUND(CASE WHEN LENGTH(TRIM(text)) = 0 THEN 0.0 ELSE
               LENGTH(REPLACE({_NORM_SQL.format(c='text')}, ' ', ''))
               / CAST(LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS DOUBLE) END, 4) AS avg_token_len,
           ROUND(CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE
               (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[^\\w\\s]', '', 'g')))
               / CAST(LENGTH(text) AS DOUBLE) END, 4) AS punct_ratio,
           ROUND(CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE
               (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[0-9]', '', 'g')))
               / CAST(LENGTH(text) AS DOUBLE) END, 4) AS digit_ratio,
           ROUND(CASE WHEN LENGTH(text) = 0 THEN 0.0 ELSE
               (LENGTH(text) - LENGTH(REGEXP_REPLACE(text, '[A-Z]', '', 'g')))
               / CAST(LENGTH(text) AS DOUBLE) END, 4) AS upper_ratio
    FROM documents
    """,
)
def q31(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality statistics."""
    d = load(spark, sf_dir, "documents")
    return X.text_stats(d, "text", "doc_id")


@query(
    "q33_token_histogram",
    f"""
    SELECT token, COUNT(*) AS freq
    FROM (SELECT UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS token
          FROM documents)
    WHERE LENGTH(token) > 0
    GROUP BY token
    """,
)
def q33(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequency histogram."""
    return X.token_histogram(load(spark, sf_dir, "documents"), "text")


@query(
    "q34_ngram_jaccard",
    f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, ARRAY_TO_STRING(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t) - 1, 1))) AS r(i)
        WHERE LEN(t) >= 3
    ), kept AS (
        -- skew + signal cap: drop shingles appearing in > 100 docs
        -- (ubiquitous n-grams carry no near-dup signal and are the
        -- self-join's quadratic hot keys)
        SELECT sh.doc_id, sh.s FROM sh
        JOIN (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 100) f USING (s)
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
        FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, common,
           ROUND(common * 1.0 / (sa.n_sh + sb.n_sh - common), 6) AS jaccard_r
    FROM pairs
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
    ORDER BY jaccard_r DESC, doc_a ASC, doc_b ASC
    LIMIT 20
    """,
)
def q34(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup mining: top pairs by word-3-gram Jaccard similarity.
    max_df=100 drops ubiquitous shingles before the self-join — the
    hot keys that make shingle joins quadratic on real corpora (and
    pure noise for similarity); sizes are computed post-filter on both
    sides so the Jaccard denominator stays consistent. The self-join
    runs on xxhash64 shingle fingerprints (8-byte shuffle keys, exact
    modulo a ~3e-8 collision chance at this shingle count — see
    ngram_jaccard_pairs); the oracle counts raw strings, so the
    differential check itself proves collision-freedom on this data."""
    d = load(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(
        d, "text", "doc_id", n=3, max_df=100, hash_shingles=True
    )
    return (
        pairs.select(
            "doc_a", "doc_b", "common", F.round("jaccard", 6).alias("jaccard_r")
        )
        .orderBy(F.col("jaccard_r").desc(), F.col("doc_a").asc(), F.col("doc_b").asc())
        .limit(20)
    )


@query(
    "q35_minhash_bands",
    f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents WHERE doc_id < 100
    ), sh AS (
        SELECT DISTINCT doc_id, ARRAY_TO_STRING(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t) - 1, 1))) AS r(i)
        WHERE LEN(t) >= 3
    ), mh AS (
        SELECT doc_id, seed, MIN(MD5(CAST(seed AS VARCHAR) || '|' || s)) AS h
        FROM sh CROSS JOIN UNNEST(RANGE(1, 17)) AS r(seed)
        GROUP BY doc_id, seed
    )
    SELECT doc_id AS doc, CAST((seed - 1) // 4 AS BIGINT) AS band,
           MD5(STRING_AGG(h, '' ORDER BY seed)) AS band_hash
    FROM mh GROUP BY doc_id, CAST((seed - 1) // 4 AS BIGINT)
    """,
)
def q35(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH band hashes (the dedup-candidate bucketing key)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    bands = D.minhash_bands(d, "text", "doc_id", num_hashes=16, band_size=4)
    return bands.select("doc", F.col("band").cast("long").alias("band"), "band_hash")


@query(
    "q32_simsearch_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
         scored AS (
            SELECT query_id, neighbor_id,
                   LIST_SUM(LIST_TRANSFORM(LIST_ZIP(qv, cv),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
                   / (SQRT(LIST_SUM(LIST_TRANSFORM(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                    * SQRT(LIST_SUM(LIST_TRANSFORM(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS sim
            FROM c CROSS JOIN q
            WHERE query_id <> neighbor_id
         ), ranked AS (
            SELECT query_id, neighbor_id, sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored
         )
    SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim_r,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k similarity search (exact baseline)."""
    e = load(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    topk = S.brute_force_topk(e, queries, k=10)
    return topk.select(
        "query_id", "neighbor_id", F.round("sim", 6).alias("sim_r"), "rank"
    )


@query(
    "q39_lang_scores",
    """
    WITH toks AS (
        SELECT doc_id, lang,
               STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\\s+', ' ', 'g')), ' ') AS t
        FROM documents
    )
    SELECT doc_id, lang,
           ROUND(LEN(LIST_FILTER(t, x -> LIST_CONTAINS(['the','and','of','to','a','in','is','it'], x)))
                 / CAST(LEN(t) AS DOUBLE), 4) AS score_en,
           ROUND(LEN(LIST_FILTER(t, x -> LIST_CONTAINS(['el','la','de','que','y','en','un','es'], x)))
                 / CAST(LEN(t) AS DOUBLE), 4) AS score_es
    FROM toks WHERE LEN(t) > 0
    """,
)
def q39(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language scoring (heuristic lang-ID signal)."""
    d = load(spark, sf_dir, "documents")
    scores = X.lang_scores(d, "text", "doc_id")
    return (
        scores.join(d.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "score_en", "score_es")
    )


@query(
    "q40_multimodal_features",
    """
    SELECT doc_id AS media_id,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           CAST(ASCII(SUBSTR(text, 1, 1)) AS BIGINT) AS first_byte
    FROM documents
    """,
)
def q40(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload + mapInPandas feature pass.

    The byte-stat 'decode' is the deterministic stand-in for a real
    media decoder (see operators/multimodal.py); schema + Arrow batch
    shape are the real contract under test.
    """
    from .operators.multimodal import extract_features, to_media_table

    d = load(spark, sf_dir, "documents")
    media = to_media_table(d, "doc_id", "text", "source")
    feats = extract_features(media)
    return feats.select("media_id", "n_bytes", F.col("first_byte").cast("long").alias("first_byte"))


# =====================================================================
# Streaming (run-to-completion over the finite events table)
# =====================================================================


@query(
    "q42_stream_tumbling",
    """
    SELECT STRFTIME(DATE_TRUNC('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total
    FROM events GROUP BY 1, 2
    """,
)
def q42(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming tumbling-window agg (AvailableNow trigger,
    complete mode == batch semantics on a finite source)."""
    from .streaming.events import read_events_stream, tumbling_counts

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = tumbling_counts(stream, "1 hour")
    return out.select(
        "win_start",
        "event_type",
        "n",
        F.col("total").cast(DEC).cast("double").alias("total"),
    )


@query(
    "q43_stream_sliding",
    """
    -- make_timestamp(us) yields a naive (TZ-free) timestamp; TO_TIMESTAMP
    -- would yield timestamptz and render in the session zone.
    SELECT STRFTIME(MAKE_TIMESTAMP(CAST(FLOOR(EPOCH(ts) / 1800) * 1800 - k AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, COUNT(*) AS n
    FROM events CROSS JOIN (SELECT UNNEST([0, 1800]) AS k)
    GROUP BY 1, 2
    """,
)
def q43(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming sliding-window counts (1h window / 30m slide:
    each event lands in exactly two windows)."""
    from .streaming.events import read_events_stream, sliding_counts

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    return sliding_counts(stream, "1 hour", "30 minutes")


@query(
    "q44_stream_dedup",
    """
    SELECT event_type, COUNT(DISTINCT event_id) AS n FROM events GROUP BY event_type
    """,
)
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup by event_id (watermark-bounded state) + counts."""
    from .streaming.events import read_events_stream, streaming_dedup_counts

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    return streaming_dedup_counts(stream)


@query(
    "q45_stream_watermark",
    """
    -- Finite-source watermark emulation: on an AvailableNow run the
    -- final watermark is max(event time) - delay (Spark tracks it in
    -- whole milliseconds, hence the EPOCH_MS truncation), and append
    -- mode emits exactly the windows whose END has been passed by
    -- that watermark. Pure integer-microsecond arithmetic both sides.
    WITH w AS (
      SELECT DATE_TRUNC('hour', ts) AS win_start, COUNT(*) AS n
      FROM events GROUP BY 1
    ), wm AS (
      SELECT (EPOCH_MS(MAX(ts)) - 7200000) * 1000 AS wmark_us FROM events
    )
    SELECT STRFTIME(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, n
    FROM w, wm
    WHERE EPOCH(win_start) * 1000000 + 3600000000 <= wmark_us
    """,
)
def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked append-mode tumbling agg: late/open windows withheld.

    The withheld tail IS the semantics under test: watermark ends at
    max(ts) - 2h on a finite source, so the last windows never close
    and append mode must not emit them (verified 717 of 720 hour
    windows emitted at sf0.01 by both engines)."""
    from .streaming.events import read_events_stream, windowed_with_watermark

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    return windowed_with_watermark(stream, "1 hour", "2 hours")


# =====================================================================
# Batch 2: statistical aggs, struct-max, explode, maps, unpivot,
# correlated subqueries, date arithmetic, hashing, TPC-H classics
# =====================================================================


@query(
    "q46_agg_stats",
    """
    SELECT l_returnflag,
           ROUND(STDDEV_SAMP(l_extendedprice), 4) AS price_std,
           ROUND(VAR_SAMP(l_quantity), 4) AS qty_var,
           ROUND(CORR(l_extendedprice, l_quantity), 6) AS price_qty_corr,
           ROUND(COVAR_SAMP(l_extendedprice, l_discount), 4) AS price_disc_cov,
           ROUND(MIN(l_extendedprice), 4) AS price_min,
           ROUND(MAX(l_extendedprice), 4) AS price_max
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_std"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias("price_qty_corr"),
        F.round(F.covar_samp("l_extendedprice", "l_discount"), 4).alias("price_disc_cov"),
        F.round(F.min("l_extendedprice"), 4).alias("price_min"),
        F.round(F.max("l_extendedprice"), 4).alias("price_max"),
    )


@query(
    "q47_argmax",
    """
    SELECT o_orderstatus,
           (MAX(ROW(o_totalprice, o_orderkey)))[2] AS top_orderkey,
           (MAX(ROW(o_totalprice, o_orderkey)))[1] AS top_price,
           (MIN(ROW(o_totalprice, o_orderkey)))[2] AS bottom_orderkey
    FROM orders GROUP BY o_orderstatus
    """,
)
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin per group via struct ordering (deterministic under
    ties, unlike bare max_by)."""
    o = load(spark, sf_dir, "orders")
    pair = F.struct(F.col("o_totalprice").alias("p"), F.col("o_orderkey").alias("k"))
    return o.groupBy("o_orderstatus").agg(
        F.max(pair).getField("k").alias("top_orderkey"),
        F.max(pair).getField("p").alias("top_price"),
        F.min(pair).getField("k").alias("bottom_orderkey"),
    )


@query(
    "q48_explode_pos",
    """
    SELECT vec_id, CAST(i - 1 AS BIGINT) AS pos,
           ROUND(CAST(embedding[i] AS DOUBLE), 6) AS val
    FROM embeddings, UNNEST(RANGE(1, LEN(embedding) + 1)) AS r(i)
    WHERE vec_id < 10
    """,
)
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of an array column (vector unnesting)."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "__v")
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.round(F.col("__v").cast("double"), 6).alias("val"),
    )


@query(
    "q49_map_fns",
    """
    SELECT event_id,
           'k' AS first_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           1 AS n_keys
    FROM events WHERE event_id < 500
    """,
)
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: parse JSON to map, then map_keys/size/
    element access (MapType round-trips through the engine)."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.from_json("props", "map<string,bigint>")
    return e.select(
        "event_id",
        F.map_keys(m).getItem(0).alias("first_key"),
        m.getItem("k").alias("k_val"),
        F.size(F.map_keys(m)).alias("n_keys"),
    )


@query(
    "q50_unpivot",
    """
    SELECT l_orderkey, l_linenumber, 'quantity' AS metric, l_quantity AS val
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount' AS metric, l_discount AS val
    FROM lineitem WHERE l_orderkey < 100
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax' AS metric, l_tax AS val
    FROM lineitem WHERE l_orderkey < 100
    """,
)
def q50(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide->long) via stack()."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
        ).alias("metric", "val"),
    )


@query(
    "q51_null_fns",
    """
    SELECT c_custkey,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_masked,
           CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
           COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_filled,
           (c_acctbal IS NULL) AS bal_is_null
    FROM customer
    """,
)
def q51(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling surface: nullif/coalesce/conditional nulling."""
    c = load(spark, sf_dir, "customer")
    bal_nonneg = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(
        F.col("c_acctbal")
    )
    return c.select(
        "c_custkey",
        F.coalesce(
            F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")
        ).alias("seg_masked"),
        bal_nonneg.alias("bal_nonneg"),
        F.coalesce(bal_nonneg, F.lit(0.0)).alias("bal_filled"),
        F.isnull("c_acctbal").alias("bal_is_null"),
    )


@query(
    "q52_regexp_count",
    """
    SELECT doc_id,
           LEN(REGEXP_EXTRACT_ALL(text, 'the')) AS n_the,
           LEN(REGEXP_EXTRACT_ALL(text, '[0-9]+')) AS n_numbers,
           CAST(REGEXP_MATCHES(text, 'spark') AS BOOLEAN) AS has_spark
    FROM documents
    """,
)
def q52(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex occurrence counting + boolean match."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("the")).cast("long").alias("n_the"),
        F.regexp_count("text", F.lit("[0-9]+")).cast("long").alias("n_numbers"),
        F.col("text").rlike("spark").alias("has_spark"),
    )


@query(
    "q53_range_frame",
    """
    SELECT o_orderkey, o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) OVER (
                PARTITION BY o_orderstatus ORDER BY o_totalprice
                RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum,
           COUNT(*) OVER (
                PARTITION BY o_orderstatus ORDER BY o_totalprice
                RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS near_n
    FROM orders
    """,
)
def q53(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based sliding window), computed as
    prefix sums instead of Spark's sliding-frame execution.

    Spark re-evaluates a sliding RANGE frame's aggregate from scratch
    per row — O(rows x frame width), measured 6.8s at sf0.1 with this
    10000-wide frame over 3 fat partitions. The equivalent linear plan:
    frame_sum(p) = S(<= p) - S(< p - 10000) over per-distinct-price
    group sums, where both prefix sums are RUNNING (unbounded-
    preceding) frames that Spark maintains incrementally in O(n).
    The strictly-below prefix at the moving lower bound comes from the
    union-stream trick (the q37 as-of shape): bound markers sort
    BEFORE data rows at equal value, so the running sum at a marker
    excludes ties — exactly RANGE's inclusive lower bound. Sums stay
    in decimal (associative), so the regrouping is bit-identical to
    the oracle's native RANGE frame. Semantics (incl. peers of the
    current row being in-frame) are RANGE's own: rows of equal price
    share one group row, so S(<= p) counts all peers."""
    o = load(spark, sf_dir, "orders")
    g = o.groupBy("o_orderstatus", "o_totalprice").agg(
        F.sum(F.col("o_totalprice").cast(DEC)).alias("__s"),
        F.count(F.lit(1)).alias("__c"),
    )
    data = g.select(
        "o_orderstatus",
        F.col("o_totalprice").alias("__val"),
        F.lit(0).alias("__kind"),
        "__s",
        "__c",
        F.lit(None).cast("double").alias("__porig"),
    )
    bounds = g.select(
        "o_orderstatus",
        (F.col("o_totalprice") - 10000).alias("__val"),
        F.lit(-1).alias("__kind"),
        F.lit(0).cast(DEC).alias("__s"),
        F.lit(0).cast("long").alias("__c"),
        F.col("o_totalprice").alias("__porig"),
    )
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy("__val", "__kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = data.unionByName(bounds).select(
        "o_orderstatus",
        "__val",
        "__kind",
        "__porig",
        F.sum("__s").over(w).alias("__run_s"),
        F.sum("__c").over(w).alias("__run_c"),
    )
    upper = u.filter(F.col("__kind") == 0).select(
        "o_orderstatus",
        F.col("__val").alias("o_totalprice"),
        F.col("__run_s").alias("__s_le"),
        F.col("__run_c").alias("__c_le"),
    )
    lower = u.filter(F.col("__kind") == -1).select(
        "o_orderstatus",
        F.col("__porig").alias("o_totalprice"),
        F.col("__run_s").alias("__s_lt"),
        F.col("__run_c").alias("__c_lt"),
    )
    per_price = upper.join(lower, ["o_orderstatus", "o_totalprice"]).select(
        "o_orderstatus",
        "o_totalprice",
        (F.col("__s_le") - F.col("__s_lt")).cast("double").alias("near_sum"),
        (F.col("__c_le") - F.col("__c_lt")).alias("near_n"),
    )
    return o.select("o_orderkey", "o_orderstatus", "o_totalprice").join(
        per_price, ["o_orderstatus", "o_totalprice"]
    ).select("o_orderkey", "o_orderstatus", "near_sum", "near_n")


@query(
    "q54_scalar_subquery",
    """
    SELECT o_orderkey, o_totalprice,
           (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_items
    FROM orders o
    WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
    """,
)
def q54(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated + uncorrelated scalar subqueries (SQL surface;
    Catalyst rewrites to joins)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_items
        FROM orders o
        WHERE o_totalprice > (SELECT AVG(o_totalprice) * 1.5 FROM orders)
        """
    )


@query(
    "q55_date_arith",
    """
    SELECT event_id,
           STRFTIME(CAST(ts AS DATE) + 7, '%Y-%m-%d') AS plus_week,
           STRFTIME(CAST(CAST(ts AS DATE) + INTERVAL 2 MONTH AS DATE), '%Y-%m-%d') AS plus_2mo,
           STRFTIME(LAST_DAY(CAST(ts AS DATE)), '%Y-%m-%d') AS month_end,
           STRFTIME(CAST(DATE_TRUNC('month', ts) AS DATE), '%Y-%m-%d') AS month_start,
           CAST(EPOCH(DATE_TRUNC('second', ts)) AS BIGINT) AS epoch_sec
    FROM events WHERE event_id < 200
    """,
)
def q55(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: date_add / add_months / last_day / trunc / epoch."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 200)
    d = F.to_date("ts")
    return e.select(
        "event_id",
        F.date_format(F.date_add(d, 7), "yyyy-MM-dd").alias("plus_week"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2mo"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.trunc(d, "month"), "yyyy-MM-dd").alias("month_start"),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("epoch_sec"),
    )


@query(
    "q56_hash_fns",
    """
    SELECT p_partkey,
           MD5(p_name) AS name_md5,
           SHA256(p_brand) AS brand_sha256,
           CAST(LENGTH(MD5(p_name)) AS INTEGER) AS md5_len
    FROM part
    """,
)
def q56(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash surface (engine-portable md5/sha256)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2("p_brand", 256).alias("brand_sha256"),
        F.length(F.md5("p_name")).alias("md5_len"),
    )


@query(
    "q57_first_last_window",
    """
    SELECT event_id, user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type,
           NTH_VALUE(event_type, 2) OVER w AS second_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def q57(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over full-partition frames."""
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "event_id",
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
        F.nth_value("event_type", 2).over(w).alias("second_type"),
    )


@query(
    "q58_q10_returned_revenue",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
           n_name
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q58(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "q59_q13_custdist",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    """,
)
def q59(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of orders-per-customer."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q60_q18_large_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        HAVING SUM(l_quantity) > 150
    )
    GROUP BY o_orderkey, o_custkey, o_totalprice
    """,
)
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: large-quantity orders via HAVING-subquery
    semi join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__q"))
        .filter(F.col("__q") > 150)
        .select(F.col("l_orderkey").alias("__big_key"))  # avoid self-join ambiguity
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .join(big, o.o_orderkey == big.__big_key, "left_semi")
        .groupBy("o_orderkey", "o_custkey", "o_totalprice")
        .agg(dsum(F.col("l_quantity"), "total_qty"))
    )


@query(
    "q61_q22_idle_customers",
    """
    SELECT SUBSTR(c_name, 10, 1) AS name_digit,
           COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
    GROUP BY SUBSTR(c_name, 10, 1)
    """,
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    finished orders (scalar subquery + anti join). The anti-join side
    is filtered to status 'F' because the synthetic data gives every
    customer at least one order — an unfiltered NOT EXISTS would be a
    vacuous 0-row check. The scalar subquery stays in the plan as a
    broadcast cross join (the q77/q87 pattern) rather than a driver
    collect, so the whole query remains one lazily-planned DAG."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("__avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 10, 1).alias("name_digit"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            dsum(F.col("c_acctbal"), "total_bal"),
        )
    )


@query(
    "q62_approx_sketches",
    """
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           ABS(APPROX_COUNT_DISTINCT(l_orderkey) - COUNT(DISTINCT l_orderkey))
               <= 0.05 * COUNT(DISTINCT l_orderkey) AS approx_orders_ok,
           APPROX_QUANTILE(l_extendedprice, 0.5)
               BETWEEN QUANTILE_CONT(l_extendedprice, 0.25)
                   AND QUANTILE_CONT(l_extendedprice, 0.75) AS approx_median_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) + approx percentile sketches.

    Sketch payloads are engine-specific and never hash-match across
    engines — but the error BOUND is checkable: each engine computes
    its own sketch AND its own exact statistic and emits deterministic
    booleans (HLL within 5% relative error of exact; approx median
    inside the exact interquartile range). Any correctly implemented
    estimator lands inside these generous bounds, so the booleans are
    engine-neutral while still failing loudly on a broken sketch.
    Exact values (COUNT DISTINCT) are emitted and hash-compared as-is.

    The sketches and the exact COUNT(DISTINCT) are computed in two
    separate aggregations joined on the (3-row) group key: mixing a
    distinct agg with object-hash sketch aggs in ONE agg forces
    Spark's expand rewrite plus a SortAggregate fallback for the
    sketches — measured 8.3s (two F.percentile) / 40s+ (array form)
    vs 0.9s at sf0.01 for the fused plan.

    The Spark-side IQR bounds are percentile_approx at accuracy 1e5
    (deterministic Greenwald-Khanna summary, relative rank error
    <= 1e-5), NOT exact F.percentile: exact percentile buffers every
    value per group, and even fused into one array call it measured
    1.9s at sf0.1 vs 1.2s for the summary (r2-r4 history: two exact
    calls cost 3.7s). The gate loses nothing measurable — the median
    sits ~25 percentile-points inside each bound while the bound
    error is ~0.001 percentile-points, so a broken median sketch
    still trips the boolean, and the bound sketch (1e5) is a
    different summary than the median sketch (default 1e4), keeping
    the check non-vacuous. The oracle side stays exact QUANTILE_CONT;
    only the booleans are compared, and both engines agree."""
    li = load(spark, sf_dir, "lineitem")
    sketches = li.groupBy("l_returnflag").agg(
        # rsd=0.01: the default 0.05 makes the 5%-relative-error gate a
        # 1-sigma coin flip (observed false on the N group); at 0.01 the
        # gate sits ~5 sigma out on both engines.
        F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.percentile_approx(
            "l_extendedprice", F.array(F.lit(0.25), F.lit(0.75)), F.lit(100000)
        ).alias("__iqr"),
    )
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders")
    )
    ex = F.col("exact_orders")
    return sketches.join(exact, "l_returnflag").select(
        "l_returnflag",
        "exact_orders",
        (F.abs(F.col("approx_orders") - ex) <= 0.05 * ex).alias(
            "approx_orders_ok"
        ),
        F.col("approx_median_price")
        .between(F.col("__iqr")[0], F.col("__iqr")[1])
        .alias("approx_median_ok"),
    )


def _q63_oracle() -> str:
    """LSH is APPROXIMATE but fully DETERMINISTIC: the hyperplanes come
    from a seeded driver-side RNG and are inlined as literals, so the
    oracle can embed the exact same doubles (repr round-trips) and
    reproduce bucketing + scoring + ranking bit-for-bit. Sign bits
    agree because the sequential-order dot product is identical on
    both engines (proven by q32/q67)."""
    from .operators.simsearch import hyperplanes

    planes = hyperplanes(dim=64, n_planes=6, seed=42)

    def dot_sql(vcol: str, plane: list[float]) -> str:
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        return (
            f"LIST_SUM(LIST_TRANSFORM(LIST_ZIP({vcol}, {lit}), "
            f"p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )

    bucket = " + ".join(
        f"(CASE WHEN {dot_sql('embedding', p)} >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    cos = (
        "LIST_SUM(LIST_TRANSFORM(LIST_ZIP(qv, cv),"
        " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        " / (SQRT(LIST_SUM(LIST_TRANSFORM(qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        " * SQRT(LIST_SUM(LIST_TRANSFORM(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
    )
    return f"""
    WITH c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                      ({bucket}) AS bucket FROM embeddings),
         q AS (SELECT vec_id AS query_id, embedding AS qv,
                      ({bucket}) AS bucket FROM embeddings WHERE vec_id < 5),
         scored AS (
            SELECT query_id, neighbor_id, {cos} AS sim
            FROM c JOIN q USING (bucket)
            WHERE query_id <> neighbor_id
         ), ranked AS (
            SELECT query_id, neighbor_id, sim,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id ASC) AS rank
            FROM scored
         )
    SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim_r,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 10
    """


@query("q63_lsh_simsearch", _q63_oracle())
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via random-hyperplane LSH (the
    scale path for q32). Deterministic seeded hyperplanes make even
    the approximate result oracle-checkable — the oracle SQL embeds
    the identical plane literals (see _q63_oracle); recall vs exact
    top-k is additionally bounded in pytest."""
    e = load(spark, sf_dir, "embeddings")
    queries_df = e.filter(F.col("vec_id") < 5)
    topk = S.lsh_topk(e, queries_df, k=10, n_planes=6)
    return topk.select(
        "query_id", "neighbor_id", F.round("sim", 6).alias("sim_r"), "rank"
    )


# =====================================================================
# Batch 3: keyed merge (the reference's core semantics), simhash,
# embedding near-dup, IVF ANN, skew-salted join
# =====================================================================


@query(
    "q64_keyed_merge",
    """
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10000.0
                ELSE o_totalprice END AS o_totalprice
    FROM orders
    """,
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed last-writer-wins upsert (ref importer.rs:345-390 done
    set-oriented): an incoming batch of re-priced orders replaces the
    old rows by key; untouched keys survive. The oracle is the
    algebraic end-state (CASE over the key predicate)."""
    from .operators.merge import merge_upsert

    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    batch = o.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") + 10000.0
    )
    return merge_upsert(o, batch, "o_orderkey")


@query(
    "q65_latest_by_key",
    """
    SELECT user_id, event_id, event_type,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
        SELECT user_id, event_id, event_type, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed latest-row dedup (ref A19/A20 Spark-natively): newest
    event per user, event_id as deterministic tiebreaker."""
    from .operators.merge import dedup_latest

    e = load(spark, sf_dir, "events")
    return dedup_latest(e, "user_id", ["ts", "event_id"]).select(
        "user_id", "event_id", "event_type", ts_str("ts").alias("ts_s")
    )


@query(
    "q66_simhash",
    f"""
    WITH toks AS (
        SELECT DISTINCT doc_id, UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS t
        FROM documents
    ), votes AS (
        SELECT doc_id, b,
               SUM(CASE WHEN STRPOS('13579bdf', SUBSTR(MD5(t), b + 1, 1)) > 0
                        THEN 1 ELSE -1 END) AS v
        FROM toks CROSS JOIN UNNEST(RANGE(0, 16)) AS r(b)
        GROUP BY doc_id, b
    )
    SELECT doc_id AS doc,
           CAST(SUM(CASE WHEN v > 0 THEN POWER(2, b) ELSE 0 END) AS BIGINT) AS simhash
    FROM votes GROUP BY doc_id
    """,
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprints (16-bit, md5-parity votes) — the
    hamming-distance near-dup family."""
    d = load(spark, sf_dir, "documents")
    return D.simhash(d, "text", "doc_id", bits=16)


@query(
    "q67_embedding_neardup",
    """
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a.embedding, b.embedding),
                    p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (SQRT(LIST_SUM(LIST_TRANSFORM(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              * SQRT(LIST_SUM(LIST_TRANSFORM(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS sim_r
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE LIST_SUM(LIST_TRANSFORM(LIST_ZIP(a.embedding, b.embedding),
                p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
         / (SQRT(LIST_SUM(LIST_TRANSFORM(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * SQRT(LIST_SUM(LIST_TRANSFORM(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) >= 0.35
    """,
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (threshold 0.35).
    Two-phase and fully distributed: block-pair BLAS prefilter (every
    unordered block pair is one shuffle group — no driver collect, no
    full-corpus broadcast; O(corpus/n_blocks) peak task memory), then
    exact sequential-order expression re-scoring of the survivors —
    bit-identical to the naive all-pairs plan the oracle runs, while
    the interpreted higher-order functions never touch the 12.5M-pair
    cross product. Sub-quadratic approximate path:
    operators.simsearch.embedding_neardup_pairs_lsh."""
    e = load(spark, sf_dir, "embeddings")
    pairs = S.embedding_neardup_pairs(e, threshold=0.35)
    return pairs.select("vec_a", "vec_b", F.round("sim", 6).alias("sim_r"))


_COS_QC = (
    "LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}),"
    " p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    " / (SQRT(LIST_SUM(LIST_TRANSFORM({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    " * SQRT(LIST_SUM(LIST_TRANSFORM({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))"
)


def _kmeans_ctes(iters: int, table: str = "embeddings") -> str:
    """Unrolled deterministic Lloyd iterations as DuckDB CTEs.

    Mirrors operators.simsearch.lloyd_step exactly: tie-broken argmax
    assignment against cents{i-1} (cos DESC, cell ASC), element-wise
    cell mean ROUNDed to 6 decimals (the repo's order-dependent-sum
    policy, so Spark's partition-order AVG and DuckDB's agree), empty
    cells keep the previous centroid cast to DOUBLE[]. Expects a
    ``cents0`` CTE in scope; defines cents1..cents{iters}.
    """
    parts = []
    for i in range(1, iters + 1):
        p = i - 1
        cos = _COS_QC.format(a="e.embedding", b="c.cvec")
        parts.append(
            f"""ka{i} AS (
        SELECT e.vec_id, e.embedding AS v, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {cos} DESC, c.cell ASC) AS rn
        FROM {table} e CROSS JOIN cents{p} c
    ), kasg{i} AS (
        SELECT vec_id, v, cell FROM ka{i} WHERE rn = 1
    ), km{i} AS (
        SELECT cell, dim, ROUND(AVG(CAST(val AS DOUBLE)), 6) AS cval
        FROM (SELECT cell, UNNEST(v) AS val,
                     UNNEST(RANGE(1, LEN(v) + 1)) AS dim
              FROM kasg{i})
        GROUP BY cell, dim
    ), kmv{i} AS (
        SELECT cell, LIST(cval ORDER BY dim ASC) AS mvec
        FROM km{i} GROUP BY cell
    ), cents{i} AS (
        SELECT c.cell,
               COALESCE(mv.mvec,
                        LIST_TRANSFORM(c.cvec, x -> CAST(x AS DOUBLE))) AS cvec
        FROM cents{p} c LEFT JOIN kmv{i} mv USING (cell)
    )"""
        )
    return ", ".join(parts)


@query(
    "q68_ivf_simsearch",
    f"""
    -- The IVF index is deterministic end to end (centroid seed = the
    -- 16 lowest-id vectors, then TWO unrolled k-means iterations with
    -- tie-broken argmax assignment and 6dp-rounded means; probe
    -- ranking ties -> smallest cell), so even the REFINED approximate
    -- index is reproducible in SQL.
    WITH cents0 AS (
        SELECT cell, cvec FROM (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) AS cell,
                   embedding AS cvec
            FROM embeddings
        ) WHERE cell <= 16
    ), {_kmeans_ctes(2)}, cents AS (
        SELECT cell, cvec FROM cents2
    ), assign_scored AS (
        SELECT e.vec_id AS neighbor_id, e.embedding AS cv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_COS_QC.format(a='e.embedding', b='c.cvec')} DESC,
                                           c.cell ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
    ), assigned AS (
        SELECT neighbor_id, cv, cell FROM assign_scored WHERE rn = 1
    ), probe_scored AS (
        SELECT q.vec_id AS query_id, q.embedding AS qv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS_QC.format(a='q.embedding', b='c.cvec')} DESC,
                                           c.cell ASC) AS pr
        FROM embeddings q CROSS JOIN cents c
        WHERE q.vec_id < 5
    ), probes AS (
        SELECT query_id, qv, cell FROM probe_scored WHERE pr <= 4
    ), scored AS (
        SELECT p.query_id, a.neighbor_id,
               {_COS_QC.format(a='p.qv', b='a.cv')} AS sim
        FROM assigned a JOIN probes p USING (cell)
        WHERE p.query_id <> a.neighbor_id
    ), ranked AS (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim_r,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate nearest neighbors via IVF coarse cells with
    k-means-REFINED centroids — fully deterministic (first-16-by-id
    seed, two fixed Lloyd iterations with 6dp-rounded means,
    tie-broken argmax assignment and probes), so even the refined
    approximate index is oracle-checkable: the SQL mirror unrolls the
    same two iterations and the centroids match bit-for-bit (pinned
    in pytest at all three scales). Uses the engine-pure expression
    assignment here so every float matches the SQL mirror; the
    blocked-BLAS assignment (the at-scale default) is pinned equal to
    the expression path in pytest. Recall vs exact top-k also bounded
    in pytest."""
    e = load(spark, sf_dir, "embeddings")
    queries_df = e.filter(F.col("vec_id") < 5)
    topk = S.ivf_topk(
        e, queries_df, k=10, n_cells=16, n_probe=4, vectorized=False,
        refine_iters=2,
    )
    return topk.select(
        "query_id", "neighbor_id", F.round("sim", 6).alias("sim_r"), "rank"
    )


@query(
    "q69_salted_join",
    """
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           f.n_flag AS flag_total
    FROM lineitem l
      JOIN (SELECT l_returnflag, COUNT(*) AS n_flag
            FROM lineitem GROUP BY l_returnflag) f
        ON l.l_returnflag = f.l_returnflag
    """,
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join: lineitem joined to a per-flag rollup on
    l_returnflag (3 distinct values — maximal skew). salted_join
    scatters each hot key over 8 shuffle partitions; the result is
    row-identical to the plain join, which is exactly what the oracle
    checks."""
    from .operators.skew import salted_join

    li = load(spark, sf_dir, "lineitem")
    flag_counts = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_flag")
    )
    return salted_join(
        li.select("l_orderkey", "l_linenumber", "l_returnflag"),
        flag_counts,
        key="l_returnflag",
        scatter_col="l_orderkey",
        salt=8,
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.col("n_flag").alias("flag_total"),
    )


@query(
    "q70_stateful_sessions",
    """
    -- Final state of the gap-sessionizer on a finite source == batch
    -- gaps-and-islands. Timestamps truncated ns -> us FIRST (matching
    -- the stream's integer div-1000 conversion) so a gap of exactly
    -- 30min + sub-us remainder can't flip between engines.
    WITH e AS (
      SELECT user_id, event_id, EPOCH_NS(ts) // 1000 AS ts_us FROM events
    ), d AS (
      SELECT user_id, ts_us,
             LAG(ts_us) OVER (PARTITION BY user_id
                              ORDER BY ts_us, event_id) AS prev_us
      FROM e
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN prev_us IS NULL
                          OR ts_us - prev_us > 1800000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           MAX(ts_us) AS last_ts_us
    FROM d GROUP BY user_id
    """,
)
def q70(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user gap-based session accounting. The update-mode final state
    on a finite AvailableNow source equals batch gaps-and-islands —
    which is exactly what the oracle runs (single-batch equivalence to
    the batch sessionizer is additionally proven in pytest)."""
    from .streaming.events import read_events_stream, stateful_user_sessions

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    return stateful_user_sessions(stream, gap_minutes=30)


@query(
    "q71_rank_distributions",
    """
    SELECT o_orderkey, o_orderstatus,
           ROUND(PERCENT_RANK() OVER w, 6) AS pr,
           ROUND(CUME_DIST() OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
    """,
)
def q71(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist distribution windows."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@query(
    "q72_stream_session_window",
    """
    WITH g AS (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - COALESCE(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts)
                    >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS ns
        FROM events
    ), s AS (
        SELECT user_id, ts,
               SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM g
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           STRFTIME(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS win_end,
           COUNT(*) AS n
    FROM s GROUP BY user_id, sid
    """,
)
def q72(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (merging-window state) — oracle is the
    SQL gaps-and-islands rewrite; >= matches Spark's end-exclusive
    session boundary."""
    from .streaming.events import read_events_stream, session_window_counts

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    return session_window_counts(stream, "30 minutes")


@query(
    "q73_frame_sample",
    """
    SELECT doc_id AS media_id, i AS frame_no,
           MD5(SUBSTRING(text, i * 32 + 1, 32)) AS frame_md5,
           CAST(OCTET_LENGTH(ENCODE(SUBSTRING(text, i * 32 + 1, 32))) AS BIGINT) AS frame_len
    FROM documents,
         UNNEST(RANGE(0, LEAST(4, GREATEST(1, LENGTH(text) // 32)))) AS r(i)
    """,
)
def q73(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal frame sampling: one media row fans out to N frame
    rows via mapInPandas; frames are deterministic byte slices, so the
    oracle reproduces them with varchar slicing (corpus is ASCII) and
    md5-compares the bytes."""
    from .operators.multimodal import sample_frames, to_media_table

    d = load(spark, sf_dir, "documents")
    media = to_media_table(d, "doc_id", "text", "source")
    frames = sample_frames(media, every_n_bytes=32, max_frames=4)
    return frames.select(
        "media_id",
        F.col("frame_no").cast("long").alias("frame_no"),
        F.md5("frame").alias("frame_md5"),
        F.octet_length("frame").cast("long").alias("frame_len"),
    )


# =====================================================================
# Batch 4: TPC-H Q7/Q12/Q14/Q15/Q16/Q17/Q19/Q21 shapes (adapted to the
# fixture columns)
# =====================================================================


@query(
    "q74_q7_nation_volume",
    """
    SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS volume
    FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE n1.n_name <> n2.n_name
    GROUP BY n1.n_name, n2.n_name
    """,
)
def q74(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-nation trade volume (two broadcast dims
    aliased twice in one star join)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume"))
    )


@query(
    "q75_q12_priority_counts",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY l_returnflag
    """,
)
def q75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation post-join."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q76_q14_promo_share",
    """
    SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))
                ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE), 6)
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
)
def q76(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share (conditional ratio over a
    broadcast-dim join)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev.cast(DEC)).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(promo).cast("double")
                / F.sum(rev.cast(DEC)).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q77_q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS total_revenue
        FROM lineitem GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q77(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: top-revenue supplier via derived view + scalar
    max subquery."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        s.join(revenue, s.s_suppkey == revenue.supplier_no)
        .join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q78_q16_supplier_cnt",
    """
    SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type NOT IN ('ECONOMY', 'STANDARD')
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q78(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-count with NOT-IN exclusion filters."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            (F.col("p_brand") != "Brand#1")
            & ~F.col("p_type").isin("ECONOMY", "STANDARD")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q79_q17_small_qty_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (
          SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
)
def q79(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated avg-quantity subquery, decorrelated
    to a pre-aggregated broadcast join (the plan Catalyst would build
    from the SQL, written explicitly)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(thresholds, li.l_partkey == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast(DEC)).cast("double") / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q80_q19_disjunctive",
    """
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
)
def q80(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates spanning
    both join sides (exercises OR-predicate pushdown/split)."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    c2 = (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 30)
    )
    c3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(20, 50)
        & F.col("l_quantity").between(20, 40)
    )
    return j.filter(c1 | c2 | c3).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue")
    )


@query(
    "q81_q21_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
)
def q81(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: EXISTS + NOT EXISTS over the same fact
    (semi-join then anti-join on derived key sets)."""
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l1 = li.select("l_orderkey", "l_suppkey")
    # orders with >1 distinct supplier (EXISTS other-supplier line)
    multi = (
        l1.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("__ns"))
        .filter(F.col("__ns") > 1)
        .select("l_orderkey")
    )
    # (orderkey, suppkey) pairs for which some OTHER supplier returned
    # ('R') a line in the same order
    r_by_order = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("__nr"),
            F.min("l_suppkey").alias("__only_r_supp"),
        )
    )
    cand = (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(multi, "l_orderkey", "left_semi")
    )
    # anti: other-supplier R line exists iff (order has R lines) and
    # (not all of them are this supplier's)
    bad = cand.join(r_by_order, "l_orderkey").filter(
        (F.col("__nr") > 1)
        | (F.col("__only_r_supp") != F.col("l_suppkey"))
    ).select("l_orderkey", "l_suppkey")
    kept = cand.join(bad, ["l_orderkey", "l_suppkey"], "left_anti")
    return (
        kept.join(F.broadcast(s), kept.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "q82_misc_aggs",
    """
    SELECT o_orderstatus,
           BOOL_AND(o_totalprice > 1000) AS all_over_1k,
           BOOL_OR(o_totalprice > 400000) AS any_over_400k,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent,
           ARG_MIN(o_orderkey, o_totalprice) AS cheapest_key,
           ARG_MAX(o_orderkey, o_totalprice) AS priciest_key
    FROM orders GROUP BY o_orderstatus
    """,
)
def q82(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misc aggregate surface: bool_and/bool_or, filtered count
    (count_if), min_by/max_by (argmin/argmax without the struct
    trick). The per-status extreme o_totalprice values are unique in
    this data (verified: the one duplicated price sits mid-range), so
    arg-extrema are deterministic."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_over_1k"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_over_400k"),
        F.count_if(F.col("o_orderpriority") == "1-URGENT").alias("n_urgent"),
        F.min_by("o_orderkey", "o_totalprice").alias("cheapest_key"),
        F.max_by("o_orderkey", "o_totalprice").alias("priciest_key"),
    )


@query(
    "q83_grouped_mad",
    """
    SELECT user_id,
           ROUND(MAD(value), 6) AS value_mad,
           COUNT(*) AS n
    FROM events GROUP BY user_id
    """,
)
def q83(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-user median absolute deviation.
    MAD needs two dependent passes (median, then median of deviations)
    — awkward as SQL, one numpy pass per group in pandas. The grouped
    shuffle is by user_id; each group fits a pandas frame (bounded by
    per-user activity, the natural partition unit)."""
    import pandas as pd

    e = load(spark, sf_dir, "events")

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"].to_numpy()
        med = float(pd.Series(v).median())
        m = float(pd.Series(abs(v - med)).median())
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "value_mad": [round(m, 6)], "n": [len(v)]}
        )

    return e.select("user_id", "value").groupBy("user_id").applyInPandas(
        mad, "user_id bigint, value_mad double, n bigint"
    )


@query(
    "q84_q8_market_share",
    """
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_0' THEN volume_d ELSE 0 END) AS DOUBLE)
                 / CAST(SUM(volume_d) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)) AS volume_d,
               n2.n_name AS nation
        FROM part
          JOIN lineitem ON p_partkey = l_partkey
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN orders   ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region    ON n1.n_regionkey = r_regionkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) t
    GROUP BY o_year
    """,
)
def q84(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): 8-way join, conditional
    aggregate ratio per year. Scale notes: lineitem is the only big
    input; part is pre-filtered before the join (predicate pushdown),
    and every dimension (supplier/customer/nation/region) is broadcast
    so the plan is one shuffle for the final group-by. The ratio is
    computed from two decimal sums (order-independent), divided as
    double, rounded to 6."""
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_asia = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .select("c_custkey")
    )
    supp_nation = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    t = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_asia), o.o_custkey == cust_asia.c_custkey, "left_semi")
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.cast(DEC).alias("volume_d"),
            "nation",
        )
    )
    num = F.sum(F.when(F.col("nation") == "NATION_0", F.col("volume_d")).otherwise(F.lit(0).cast(DEC)))
    den = F.sum(F.col("volume_d"))
    return t.groupBy("o_year").agg(
        F.round(num.cast("double") / den.cast("double"), 6).alias("mkt_share")
    )


@query(
    "q85_q2_min_cost_supplier",
    """
    WITH sp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    elig AS (
        SELECT sp.l_partkey AS partkey, s_suppkey, s_name, s_acctbal, n_name
        FROM sp
          JOIN supplier ON s_suppkey = sp.l_suppkey
          JOIN nation   ON s_nationkey = n_nationkey
          JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT p_partkey, s_name, ROUND(s_acctbal, 2) AS acctbal, n_name
    FROM part JOIN elig ON p_partkey = elig.partkey
    WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
      AND s_acctbal = (SELECT MAX(e2.s_acctbal) FROM elig e2 WHERE e2.partkey = p_partkey)
    """,
)
def q85(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (best supplier per part, correlated MAX
    subquery). No partsupp table in the fixtures, so the supplier<->part
    relation is derived as DISTINCT (l_partkey, l_suppkey) from
    lineitem, and s_acctbal stands in for ps_supplycost (max instead of
    min). The correlated subquery decorrelates to a per-part max over
    the SAME eligible set, joined back on (partkey, acctbal) — one
    shuffle on partkey for distinct + windowless max, dims broadcast."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sp = li.select(F.col("l_partkey").alias("partkey"), "l_suppkey").distinct()
    supp_eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    elig = sp.join(F.broadcast(supp_eur), sp.l_suppkey == supp_eur.s_suppkey)
    best = elig.groupBy("partkey").agg(F.max("s_acctbal").alias("__best"))
    return (
        elig.join(best, "partkey")
        .filter(F.col("s_acctbal") == F.col("__best"))
        .join(F.broadcast(p), F.col("partkey") == p.p_partkey, "left_semi")
        .select(
            F.col("partkey").alias("p_partkey"),
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
            "n_name",
        )
    )


@query(
    "q86_q9_profit",
    """
    SELECT n_name AS nation, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         - 0.1 * p_retailprice * l_quantity AS DECIMAL(27,4))) AS DOUBLE)
             AS sum_profit
    FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, EXTRACT(year FROM o_orderdate)
    """,
)
def q86(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit by nation/year). Fixtures
    have no ps_supplycost; cost is surrogated as 10% of p_retailprice
    per unit, which preserves the shape: fact x filtered-part join,
    supplier->nation lookup, two-key aggregate. part is filtered on a
    LIKE before joining (pushed to the scan); supplier/nation broadcast;
    single shuffle for the (nation, year) aggregate."""
    li = load(spark, sf_dir, "lineitem")
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .select("nation", F.year("o_orderdate").alias("o_year"), profit.cast(DEC).alias("__pd"))
        .groupBy("nation", "o_year")
        .agg(F.sum("__pd").cast("double").alias("sum_profit"))
    )


@query(
    "q87_q11_important_parts",
    """
    WITH pv AS (
        SELECT l_partkey AS partkey,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS value_d
        FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                      JOIN nation   ON s_nationkey = n_nationkey
                      JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY l_partkey
    )
    SELECT partkey, CAST(value_d AS DOUBLE) AS part_value
    FROM pv
    WHERE value_d > (SELECT SUM(value_d) * 0.001 FROM pv)
    """,
)
def q87(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock: per-key value above a fraction
    of the GLOBAL total — uncorrelated scalar subquery over the same
    aggregate). Spark side computes the per-part aggregate once, derives
    the global threshold from it (single-row broadcast cross join), and
    filters — the aggregate is not recomputed. Region-filtered suppliers
    are a broadcast semi-join against the fact."""
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    supp_eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .select("s_suppkey")
    )
    pv = (
        li.join(F.broadcast(supp_eur), li.l_suppkey == supp_eur.s_suppkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)).alias("value_d"))
        # Persist the per-part aggregate: both the threshold scalar and
        # the final filter consume it, and without pinning it Catalyst
        # re-expands the subtree into a SECOND full lineitem scan (the
        # 100 TB killer — the aggregate is ~#parts rows, the rescan is
        # the whole fact).
        .persist()
    )
    total = pv.agg((F.sum("value_d") * F.lit(0.001)).alias("__thresh"))
    return (
        pv.crossJoin(F.broadcast(total))
        .filter(F.col("value_d") > F.col("__thresh"))
        .select("partkey", F.col("value_d").cast("double").alias("part_value"))
    )


@query(
    "q88_q20_excess_shippers",
    """
    WITH shipped AS (
        SELECT l_suppkey AS suppkey, l_partkey AS partkey,
               SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
                             THEN l_quantity ELSE 0 END AS DECIMAL(27,4))) AS recent_qty,
               SUM(CAST(l_quantity AS DECIMAL(27,4))) AS total_qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey, l_partkey
    )
    SELECT DISTINCT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'AMERICA'
      AND s_suppkey IN (SELECT suppkey FROM shipped
                        WHERE recent_qty > 0.5 * total_qty AND total_qty > 0)
    """,
)
def q88(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (suppliers with excess recent shipments: nested
    IN-subqueries becoming semi-join chains over an aggregated
    subquery). availqty has no fixture analog, so the predicate is
    'more than half of this supplier's all-time quantity for the part
    shipped since 1997'. Plan: part-name filter broadcast-semi-joins
    the fact BEFORE the (suppkey, partkey) aggregate (the only big
    shuffle); qualifying suppkeys broadcast back against the dim."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("small%")).select("p_partkey")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    recent = F.when(
        F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"), F.col("l_quantity")
    ).otherwise(F.lit(0))
    shipped = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(recent.cast(DEC)).alias("recent_qty"),
            F.sum(F.col("l_quantity").cast(DEC)).alias("total_qty"),
        )
    )
    excess = (
        shipped.filter(
            (F.col("total_qty") > 0) & (F.col("recent_qty") > F.col("total_qty") * 0.5)
        )
        .select(F.col("l_suppkey").alias("suppkey"))
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left_semi")
        .join(F.broadcast(excess), s.s_suppkey == excess.suppkey, "left_semi")
        .select("s_name", "n_name")
        .distinct()
    )


@query(
    "q89_stratified_sample",
    """
    SELECT doc_id, lang, source
    FROM documents
    WHERE (((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000 <
          CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 300 ELSE 100 END
    """,
)
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling — the training-data-curation
    primitive for rebalancing a corpus by language (keep 50% of en,
    30% of zh, 10% of the rest). Uses an arithmetic LCG hash of the id
    so the sample is reproducible and engine-portable (same rows in
    any engine, any partitioning, any run — unlike rand()-based
    sampleBy). Pure narrow projection+filter: no shuffle at all; the
    predicate pushes to the scan. At 100 TB swap the LCG for
    xxhash64(id) — same one-pass, shuffle-free shape."""
    d = load(spark, sf_dir, "documents")
    bucket = (((F.col("doc_id") % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000
    rate = (
        F.when(F.col("lang") == "en", 500)
        .when(F.col("lang") == "zh", 300)
        .otherwise(100)
    )
    return d.filter(bucket < rate).select("doc_id", "lang", "source")


@query(
    "q90_source_quota_cap",
    """
    SELECT doc_id, source, n_chars
    FROM (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    ) t
    WHERE rn <= 10
    """,
)
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping: keep at most K documents per source,
    preferring the longest — the domain-balancing step of a pretraining
    pipeline (caps crawl-heavy domains so no source dominates the
    corpus). One shuffle on source; rank is deterministic via the
    (n_chars DESC, doc_id) tiebreak. At scale the window never
    materializes more than a partition per source; a skewed mega-source
    would use the two-phase top-K (per-partition heads, then re-rank)
    from q14's pattern."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        d.select("doc_id", "source", "n_chars", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


@query(
    "q91_dedup_components",
    f"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents WHERE doc_id < 100
    ), sh AS (
        SELECT DISTINCT doc_id, ARRAY_TO_STRING(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t) - 1, 1))) AS r(i)
        WHERE LEN(t) >= 3
    ), mh AS (
        SELECT doc_id, seed, MIN(MD5(CAST(seed AS VARCHAR) || '|' || s)) AS h
        FROM sh CROSS JOIN UNNEST(RANGE(1, 17)) AS r(seed)
        GROUP BY doc_id, seed
    ), bands AS (
        SELECT doc_id AS doc, CAST((seed - 1) // 4 AS BIGINT) AS band,
               MD5(STRING_AGG(h, '' ORDER BY seed)) AS band_hash
        FROM mh GROUP BY doc_id, CAST((seed - 1) // 4 AS BIGINT)
    ), edges AS (
        SELECT DISTINCT a.doc AS x, b.doc AS y
        FROM bands a JOIN bands b USING (band, band_hash)
        WHERE a.doc <> b.doc
    ), nodes AS (
        SELECT DISTINCT doc FROM bands
    ), reach(src, dst) AS (
        SELECT doc, doc FROM nodes
        UNION
        SELECT r.src, e.y FROM reach r JOIN edges e ON r.dst = e.x
    )
    SELECT src AS doc, MIN(dst) AS component
    FROM reach GROUP BY src
    """,
)
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assignment: connected components over the
    MinHash-LSH collision graph (same bands as q35), each doc labeled
    with the smallest doc id reachable through chains of band
    collisions. This is the step that turns pairwise near-dup
    candidates into dedup groups (keep one doc per component) — chains
    matter because A~B in band 1 and B~C in band 3 must land A, C in
    one group even though A and C never collide. Spark side runs
    alternating large-star/small-star contraction
    (operators.dedup.connected_components_star — O(log) rounds
    regardless of graph diameter, the 100 TB-safe choice; min-label
    propagation kept as the reference implementation); the oracle is a
    recursive-CTE reachability fixpoint — two completely different
    evaluation strategies agreeing on the fixpoint."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    # the minhash tower (shingle explode + 16 hashes + band agg) feeds
    # THREE consumers (both self-join sides + the isolated-node set) —
    # materialize it once (b96566e discipline; eager because the
    # self-join's scans race within one job)
    bands = D.minhash_bands(
        d, "text", "doc_id", num_hashes=16, band_size=4
    ).localCheckpoint(eager=True)
    a = bands.alias("a")
    b = bands.alias("b")
    edges = (
        a.join(b, on=["band", "band_hash"])
        .filter(F.col("a.doc") != F.col("b.doc"))
        .select(F.col("a.doc").alias("src"), F.col("b.doc").alias("dst"))
        .distinct()
    )
    isolated = bands.select("doc").distinct()
    comp = D.connected_components_star(edges)
    return (
        isolated.join(comp, isolated.doc == comp.node, "left")
        .select("doc", F.coalesce("component", "doc").alias("component"))
    )


@query(
    "q92_quality_rules",
    """
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
    SELECT doc_id,
           CAST(LEN(w) AS INTEGER) AS n_words,
           ROUND(LIST_SUM(LIST_TRANSFORM(w, x -> LEN(x))) * 1.0 / LEN(w), 6) AS mean_word_len,
           ROUND(LEN(LIST_FILTER(w, x -> x IN ('a','the'))) * 1.0 / LEN(w), 6) AS stop_frac,
           ROUND(LEN(LIST_DISTINCT(w)) * 1.0 / LEN(w), 6) AS ttr,
           ROUND(LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(w),
                 x -> LEN(LIST_FILTER(w, y -> y = x)))) * 1.0 / LEN(w), 6) AS top_word_frac,
           (LEN(w) BETWEEN 5 AND 1000
            AND LIST_SUM(LIST_TRANSFORM(w, x -> LEN(x))) * 1.0 / LEN(w) BETWEEN 2 AND 10
            AND LEN(LIST_FILTER(w, x -> x IN ('a','the'))) * 1.0 / LEN(w) < 0.5
            AND LEN(LIST_DISTINCT(w)) * 1.0 / LEN(w) > 0.2) AS keep
    FROM t
    """,
)
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style document quality rules: word count, mean word
    length, stopword fraction, type-token ratio (repetition signal),
    top-word concentration, and the composite keep/drop verdict. The
    entire scorer is higher-order array expressions on the tokenized
    text — ZERO shuffles, no UDFs, embarrassingly parallel: the ideal
    100 TB shape (a pure map over the corpus, whole-stage codegen'd).
    The top-word scan is O(distinct x words) per doc, bounded by doc
    length — still cheaper than an explode + groupBy shuffle of every
    token in the corpus."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    d = d.select("doc_id", w.alias("w"))
    n = F.size("w")
    char_sum = F.aggregate(
        "w", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    mean_len = char_sum * 1.0 / n
    stop_frac = F.size(F.filter("w", lambda x: x.isin("a", "the"))) * 1.0 / n
    ttr = F.size(F.array_distinct("w")) * 1.0 / n
    wcol = F.col("w")
    top_frac = (
        F.array_max(
            F.transform(
                F.array_distinct("w"),
                lambda x: F.size(F.filter(wcol, lambda y: y == x)),
            )
        )
        * 1.0
        / n
    )
    keep = (
        n.between(5, 1000)
        & mean_len.between(2, 10)
        & (stop_frac < 0.5)
        & (ttr > 0.2)
    )
    return d.select(
        "doc_id",
        n.alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(stop_frac, 6).alias("stop_frac"),
        F.round(ttr, 6).alias("ttr"),
        F.round(top_frac, 6).alias("top_word_frac"),
        keep.alias("keep"),
    )


@query(
    "q93_embedding_quantize",
    """
    WITH e AS (SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE)) AS v
               FROM embeddings),
    s AS (SELECT vec_id, v, LIST_MAX(LIST_TRANSFORM(v, x -> ABS(x))) AS mx FROM e)
    SELECT vec_id,
           ROUND(CASE WHEN mx > 0 THEN 127.0/mx ELSE 0 END, 6) AS scale,
           CAST(LIST_SUM(LIST_TRANSFORM(v, x -> CAST(FLOOR(x * (CASE WHEN mx > 0
                THEN 127.0/mx ELSE 0 END) + 0.5) AS BIGINT))) AS BIGINT) AS qsum,
           CAST(LEN(LIST_FILTER(v, x -> FLOOR(x * (CASE WHEN mx > 0
                THEN 127.0/mx ELSE 0 END) + 0.5) <> 0)) AS INTEGER) AS qnnz
    FROM s
    """,
)
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 embedding quantization (the storage/bandwidth
    step before ANN at scale: 4x smaller vectors, SIMD-friendly dot
    products). Per vector: scale = 127/max|x|, q_i = floor(x*scale+.5)
    — floor(+0.5) instead of round() because round-half semantics
    differ across engines while floor is exact IEEE on both. Checked
    via per-vector checksum (qsum) and nnz rather than the raw array
    to keep the oracle's canonical form engine-neutral. Pure array
    expressions: zero shuffles, whole-stage codegen."""
    e = load(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    e = e.select("vec_id", v.alias("v"))
    mx = F.array_max(F.transform("v", F.abs))
    scale = F.when(mx > 0, F.lit(127.0) / mx).otherwise(F.lit(0.0))
    e = e.select("vec_id", "v", scale.alias("__s"))
    qi = lambda x: F.floor(x * F.col("__s") + 0.5).cast("long")  # noqa: E731
    qsum = F.aggregate("v", F.lit(0).cast("long"), lambda acc, x: acc + qi(x))
    qnnz = F.size(F.filter("v", lambda x: qi(x) != 0))
    return e.select(
        "vec_id",
        F.round("__s", 6).alias("scale"),
        qsum.alias("qsum"),
        qnnz.alias("qnnz"),
    )


@query(
    "q94_decontamination",
    f"""
    WITH toks AS (
        SELECT doc_id, source, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, source, ARRAY_TO_STRING(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t) - 1, 1))) AS r(i)
        WHERE LEN(t) >= 3
    ), eval_sh AS (
        SELECT DISTINCT s FROM sh WHERE source IN ('src0','src1','src2')
    ), train_sh AS (
        SELECT doc_id, s FROM sh WHERE source NOT IN ('src0','src1','src2')
    )
    SELECT t.doc_id,
           COUNT(*) AS n_shingles,
           COUNT(e.s) AS n_hits,
           ROUND(COUNT(e.s) * 1.0 / COUNT(*), 6) AS contamination
    FROM train_sh t LEFT JOIN eval_sh e ON t.s = e.s
    GROUP BY t.doc_id
    """,
)
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: per training document, the fraction
    of its distinct 3-gram shingles that also occur anywhere in the
    held-out eval sources — the overlap screen run before pretraining
    so benchmark text is not memorized. Plan: shingle both splits once
    (shared scan), distinct eval shingles, LEFT join train shingles ->
    per-doc hit ratio. The single shuffle is on the shingle hash —
    never the quadratic doc-pair space; at 100 TB the eval side is
    small and becomes a broadcast bloom/semi-join."""
    d = load(spark, sf_dir, "documents")
    eval_srcs = ("src0", "src1", "src2")
    sh = D.shingle_table(d.withColumnRenamed("doc_id", "__id"), "text", "__id", n=3)
    src = d.select(F.col("doc_id").alias("doc"), "source")
    # Both splits consume the shingle table; pin it so tokenization
    # runs once (same reuse reasoning as ngram_jaccard_pairs).
    sh = sh.join(F.broadcast(src), "doc").persist()
    eval_sh = (
        sh.filter(F.col("source").isin(*eval_srcs)).select("s").distinct()
    )
    train_sh = sh.filter(~F.col("source").isin(*eval_srcs)).select("doc", "s")
    hits = train_sh.join(
        eval_sh.withColumn("__hit", F.lit(1)), "s", "left"
    )
    return hits.groupBy(F.col("doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__hit").alias("n_hits"),
        F.round(F.count("__hit") * 1.0 / F.count(F.lit(1)), 6).alias("contamination"),
    )


@query(
    "q95_snapshot_diff",
    """
    WITH old AS (
        SELECT o_orderkey AS k, o_totalprice AS p FROM orders WHERE o_orderkey % 97 <> 0
    ), new AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 1.1 ELSE o_totalprice END AS p
        FROM orders WHERE o_orderkey % 89 <> 0
    )
    SELECT COALESCE(old.k, new.k) AS k,
           CASE WHEN old.k IS NULL THEN 'added'
                WHEN new.k IS NULL THEN 'removed'
                ELSE 'changed' END AS change,
           ROUND(old.p, 4) AS old_price,
           ROUND(new.p, 4) AS new_price
    FROM old FULL OUTER JOIN new ON old.k = new.k
    WHERE old.k IS NULL OR new.k IS NULL OR old.p <> new.p
    """,
)
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (CDC): added / removed / changed rows between two
    keyed table versions — the inverse of the reference's upsert
    (importer.rs:345-390 applies a delta; this RECOVERS the delta from
    two snapshots, which is how you audit a merge or feed a downstream
    incremental consumer). Full outer join on the key, one shuffle,
    then row-level classification; unchanged rows are dropped so output
    is delta-sized. The two versions are derived deterministically from
    orders so the oracle sees identical inputs. At scale both sides
    partition on the key (bucketed tables join shuffle-free — see
    TestBucketedJoin)."""
    o = load(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 97 != 0).select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("op")
    )
    new = o.filter(F.col("o_orderkey") % 89 != 0).select(
        F.col("o_orderkey").alias("k2"),
        F.when(F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") * 1.1)
        .otherwise(F.col("o_totalprice"))
        .alias("np"),
    )
    j = old.join(new, old.k == new.k2, "full_outer")
    change = (
        F.when(F.col("k").isNull(), "added")
        .when(F.col("k2").isNull(), "removed")
        .otherwise("changed")
    )
    return (
        j.filter(F.col("k").isNull() | F.col("k2").isNull() | (F.col("op") != F.col("np")))
        .select(
            F.coalesce("k", "k2").alias("k"),
            change.alias("change"),
            F.round("op", 4).alias("old_price"),
            F.round("np", 4).alias("new_price"),
        )
    )


@query(
    "q96_tfidf_top_terms",
    f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t FROM documents
    ), tf AS (
        SELECT doc_id, s AS term, COUNT(*) AS tf
        FROM toks, UNNEST(t) AS r(s)
        GROUP BY doc_id, s
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    ), ranked AS (
        SELECT doc_id, term, tfidf,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf DESC, term) AS rn
        FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 3
    """,
)
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF: top-3 most characteristic terms per document. The
    retrieval/feature-extraction primitive: explode tokens -> per-doc
    term frequency (shuffle on (doc, term)) -> document frequency
    (shuffle on term; at corpus scale this aggregate is tiny relative
    to the corpus and broadcasts back) -> smooth-IDF score -> per-doc
    top-K window. ln((N+1)/(df+1)) keeps the oracle portable (no
    log-base differences) and avoids div-by-zero smoothing branches."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()  # scalar; corpus row count is cheap metadata
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log((F.lit(n_docs) + 1.0) / (F.col("df") + 1.0)), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tfidf")
    )


@query(
    "q97_bm25_retrieval",
    f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t FROM documents
    ), stats AS (
        SELECT AVG(LEN(t)) AS avgdl, COUNT(*) AS n_docs FROM toks
    ), tf AS (
        SELECT doc_id, LEN(t) AS dl, s AS term, COUNT(*) AS tf
        FROM toks, UNNEST(t) AS r(s)
        WHERE s IN ('spark', 'shuffle', 'partition')
        GROUP BY doc_id, LEN(t), s
    ), df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    )
    SELECT doc_id,
           ROUND(SUM(
               LN(1 + (n_docs - df + 0.5) / (df + 0.5)) *
               (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
           ), 6) AS bm25
    FROM tf JOIN df USING (term) CROSS JOIN stats
    GROUP BY doc_id
    """,
)
def q97(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scoring of every document against a fixed term set (k1=1.2,
    b=0.75) — the classic sparse-retrieval ranker, run corpus-wide the
    way a training-data pipeline scores documents against a topic
    filter. Terms are filtered BEFORE the tf aggregate (predicate
    pushdown into the explode), so the shuffle carries only matching
    (doc, term) rows; corpus stats (avgdl, N) and per-term df are
    scalar/broadcast-sized."""
    d = load(spark, sf_dir, "documents")
    terms = ("spark", "shuffle", "partition")
    toks = d.select("doc_id", F.split(normalize_text("text"), " ").alias("t"))
    stats = toks.agg(
        F.avg(F.size("t")).alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        toks.select("doc_id", F.size("t").alias("dl"), F.explode("t").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 6).alias("bm25"))
    )


@query(
    "q98_cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
    ), activity AS (
        SELECT DISTINCT e.user_id, f.cohort_day,
               CAST(DATEDIFF('day', f.cohort_day, CAST(e.ts AS DATE)) AS INTEGER) AS day_offset
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT CAST(cohort_day AS VARCHAR) AS cohort_day, day_offset,
           COUNT(*) AS active_users
    FROM activity
    WHERE day_offset <= 7
    GROUP BY cohort_day, day_offset
    """,
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, distinct
    active users per (cohort, day-offset) for the first week — the
    standard product-analytics rollup. Two shuffles on user_id (first
    one computes cohorts, second joins them back — at scale the cohort
    table is user-dimension-sized and the join co-partitions on
    user_id with no extra exchange), then one on the output key."""
    e = load(spark, sf_dir, "events")
    ed = e.select("user_id", F.col("ts").cast("date").alias("d"))
    firsts = ed.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    activity = (
        ed.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff("d", "cohort_day").alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.filter(F.col("day_offset") <= 7)
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"), "day_offset"
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@query(
    "q99_curation_pipeline",
    f"""
    WITH q AS (
        SELECT doc_id, lang, n_chars,
               MD5({_NORM_SQL.format(c='text')}) AS fp,
               STRING_SPLIT(text, ' ') AS w
        FROM documents
    ), kept_quality AS (
        SELECT doc_id, lang, n_chars, fp FROM q
        WHERE LEN(w) BETWEEN 5 AND 1000
          AND LIST_SUM(LIST_TRANSFORM(w, x -> LEN(x))) * 1.0 / LEN(w) BETWEEN 2 AND 10
          AND LEN(LIST_FILTER(w, x -> x IN ('a','the'))) * 1.0 / LEN(w) < 0.5
          AND LEN(LIST_DISTINCT(w)) * 1.0 / LEN(w) > 0.2
    ), deduped AS (
        SELECT MIN_BY(doc_id, doc_id) AS doc_id, ANY_VALUE(lang) AS lang,
               ANY_VALUE(n_chars) AS n_chars
        FROM kept_quality GROUP BY fp
    ), sampled AS (
        SELECT * FROM deduped
        WHERE (((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000 <
              CASE lang WHEN 'en' THEN 500 WHEN 'zh' THEN 300 ELSE 100 END
    )
    SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           ROUND(AVG(n_chars), 4) AS avg_chars
    FROM sampled GROUP BY lang
    """,
)
def q99(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship end-to-end corpus curation: Gopher-style quality filter
    (q92 rules) -> exact dedup keeping the smallest doc id per content
    fingerprint (q30 machinery) -> deterministic per-language
    stratified rebalance (q89 LCG) -> per-language corpus stats. The
    composition is the point: the quality filter and the sample
    predicate are shuffle-free maps, so the ONLY shuffles in the whole
    pipeline are the dedup group-by (on content hash — uniformly
    distributed, unskewable by construction) and the final tiny
    per-language rollup. That plan shape is exactly how the full-scale
    corpus build should look at 100 TB."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n = F.size(w)
    char_sum = F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    quality = (
        n.between(5, 1000)
        & (char_sum * 1.0 / n).between(2, 10)
        & (F.size(F.filter(w, lambda x: x.isin("a", "the"))) * 1.0 / n < 0.5)
        & (F.size(F.array_distinct(w)) * 1.0 / n > 0.2)
    )
    kept = d.filter(quality).select(
        "doc_id", "lang", "n_chars", fingerprint("text").alias("fp")
    )
    deduped = kept.groupBy("fp").agg(
        F.min("doc_id").alias("doc_id"),
        F.first("lang").alias("lang"),
        F.first("n_chars").alias("n_chars"),
    )
    bucket = (((F.col("doc_id") % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000
    rate = (
        F.when(F.col("lang") == "en", 500)
        .when(F.col("lang") == "zh", 300)
        .otherwise(100)
    )
    sampled = deduped.filter(bucket < rate)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )


@query(
    "q100_quality_percentile_keep",
    """
    WITH scored AS (
        SELECT doc_id, lang, source,
               LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) * 1.0
                 / LEN(STRING_SPLIT(text, ' ')) AS ttr,
               n_chars
        FROM documents
    ), ranked AS (
        SELECT doc_id, lang, source, ROUND(ttr, 6) AS ttr_r,
               PERCENT_RANK() OVER (PARTITION BY lang, source
                                    ORDER BY ttr DESC, doc_id) AS pr
        FROM scored
    )
    SELECT doc_id, lang, source, ttr_r
    FROM ranked WHERE pr <= 0.2
    """,
)
def q100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-percentile retention: keep the top 20% of documents per
    (lang, source) by type-token ratio — the 'best fraction per
    domain' curation step (a relative threshold per stratum, unlike
    q92's absolute rules, so heterogeneous sources each contribute
    their best). One shuffle on (lang, source); the score itself is a
    shuffle-free expression. percent_rank (not ntile) keeps the cut
    exact under ties, deterministic via the doc_id tiebreak."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(w)) * 1.0 / F.size(w)
    win = Window.partitionBy("lang", "source").orderBy(
        F.desc("__ttr"), F.asc("doc_id")
    )
    return (
        d.select("doc_id", "lang", "source", ttr.alias("__ttr"))
        .withColumn("pr", F.percent_rank().over(win))
        .filter(F.col("pr") <= 0.2)
        .select("doc_id", "lang", "source", F.round("__ttr", 6).alias("ttr_r"))
    )


@query(
    "q101_value_histogram",
    """
    SELECT event_type,
           CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 100 THEN 21
                     ELSE FLOOR(value / 5.0) + 1 END AS BIGINT) AS bucket,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type, 2
    """,
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram per event type via width_bucket — the
    distribution-profiling primitive (dashboards, drift detection).
    Single shuffle on the (type, bucket) pair; bucket assignment is a
    pure expression so the aggregate is map-side combinable: 20
    buckets x #types rows out of however many billions in."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(20)).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q102_median_mode",
    """
    WITH pc AS (
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
        FROM orders GROUP BY 1, 2
    ), m AS (
        SELECT o_orderstatus, o_orderpriority AS top_priority,
               ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                  ORDER BY c DESC, o_orderpriority ASC) AS rn
        FROM pc
    )
    SELECT o.o_orderstatus,
           ROUND(MEDIAN(o.o_totalprice), 4) AS med_price,
           ANY_VALUE(m.top_priority) AS top_priority,
           COUNT(*) AS n
    FROM orders o JOIN m ON o.o_orderstatus = m.o_orderstatus AND m.rn = 1
    GROUP BY o.o_orderstatus
    """,
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median and modal value per group (Spark 3.4+ median/mode
    builtins). Median is the exact percentile (a sort-based agg —
    heavier than percentile_approx q41, which is the at-scale
    default). Mode ties break to the LOWEST value on both sides:
    Spark's mode(col, deterministic=True) guarantees it; the oracle
    spells the same rule as an explicit count-desc/value-asc argmax
    (DuckDB's MODE tie-break is unspecified — it actually diverged on
    the sf0.001 'P' group, where 2-HIGH and 4-NOT SPECIFIED tie)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.median("o_totalprice"), 4).alias("med_price"),
        F.mode("o_orderpriority", True).alias("top_priority"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q103_peak_concurrency",
    """
    WITH iv AS (
        SELECT event_id, event_type, ts AS start_ts,
               ts + INTERVAL 1 SECOND * CAST(value * 60 AS BIGINT) AS end_ts
        FROM events
    ), pts AS (
        SELECT event_type, start_ts AS t, 1 AS delta, event_id FROM iv
        UNION ALL
        SELECT event_type, end_ts AS t, -1 AS delta, event_id FROM iv
    ), run AS (
        SELECT event_type,
               SUM(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta, event_id) AS concurrent
        FROM pts
    )
    SELECT event_type, CAST(MAX(concurrent) AS BIGINT) AS peak_concurrent
    FROM run GROUP BY event_type
    """,
)
def q103(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency per event type (each event held open
    for value minutes): the +1/-1 boundary-sweep — explode intervals
    to start/end deltas, running sum over time, max. The relational
    form of the classic sweep-line; one shuffle on event_type for the
    window. Ends sort BEFORE starts at the same instant (delta -1 < 1)
    so back-to-back intervals don't double-count; event_id breaks
    remaining ties so the running sum is deterministic."""
    e = load(spark, sf_dir, "events")
    iv = e.select(
        "event_id",
        "event_type",
        F.col("ts").alias("start_ts"),
        (
            F.col("ts")
            + F.make_interval(secs=(F.col("value") * 60).cast("bigint").cast("double"))
        ).alias("end_ts"),
    )
    pts = iv.select(
        "event_type", F.col("start_ts").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        iv.select(
            "event_type", F.col("end_ts").alias("t"), F.lit(-1).alias("delta"), "event_id"
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("event_type", F.sum("delta").over(w).alias("concurrent"))
    return run.groupBy("event_type").agg(
        F.max("concurrent").alias("peak_concurrent")
    )


@query(
    "q104_funnel",
    """
    WITH s AS (
        SELECT user_id, MIN(ts) AS t_signup FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), v AS (
        SELECT e.user_id, MIN(e.ts) AS t_view
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'view' AND e.ts > s.t_signup
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS t_purchase
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND e.ts > v.t_view
        GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM v) AS n_then_view,
           (SELECT COUNT(*) FROM p) AS n_then_purchase
    """,
)
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who signed up, then viewed AFTER the
    signup, then purchased AFTER that view — sequential pattern
    matching (the relational decomposition of MATCH_RECOGNIZE).

    ONE shuffle total (round-4 rewrite; was three cascaded
    join+groupBy stages re-shuffling events each time, 8 exchanges):
    a single groupBy(user_id) collects the earliest signup plus the
    per-type sorted timestamp arrays, and the cascade becomes array
    expressions — t_view = min view ts > t_signup, t_purchase = min
    purchase ts > t_view (a null condition filters to empty, so the
    "must have reached the previous stage" join semantics carry over
    exactly). Per-user state is that user's own event timestamps —
    the same bound a sessionizer carries, handled by AQE skew split
    if a key is hot. The single-row count aggregate at the end is the
    only other exchange."""
    e = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "t_signup"
        ),
        F.collect_list(
            F.when(F.col("event_type") == "view", F.col("ts"))
        ).alias("__views"),
        F.collect_list(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).alias("__purchases"),
    )
    t_view = F.array_min(
        F.filter("__views", lambda x: x > F.col("t_signup"))
    )
    stages = per_user.select(
        "t_signup",
        t_view.alias("t_view"),
        F.array_min(
            F.filter("__purchases", lambda x: x > t_view)
        ).alias("t_purchase"),
    )
    return stages.agg(
        F.count("t_signup").alias("n_signup"),
        F.count("t_view").alias("n_then_view"),
        F.count("t_purchase").alias("n_then_purchase"),
    )


@query(
    "q105_sequence_pattern",
    """
    WITH seq AS (
        SELECT user_id,
               STRING_AGG(SUBSTR(event_type, 1, 1), '' ORDER BY ts, event_id) AS s
        FROM events GROUP BY user_id
    )
    SELECT user_id, CAST(LEN(s) AS INTEGER) AS n_events,
           LENGTH(REGEXP_REPLACE(s, 'vp', '', 'g')) <> LENGTH(s) AS has_view_purchase,
           CAST(LENGTH(s) - LENGTH(REGEXP_REPLACE(s, 'e', '', 'g')) AS INTEGER) AS n_errors
    FROM seq
    """,
)
def q105(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence pattern mining: collapse each user's ordered
    event history to a compact symbol string (first letter per type —
    all five types are distinct on it), then run pattern predicates as
    regex over the string: 'did a view immediately precede a purchase'
    (adjacency, not just precedence — funnel q104 can't see that) and
    error counts. This is the poor-man's MATCH_RECOGNIZE, and the
    symbol-string trick is the scalable shape: ONE shuffle to build
    the per-user string (bounded by user activity), then pure string
    expressions — no self-joins over the event table.

    The ordered string is groupBy + array_sort(collect_list(struct)):
    collect_list is unordered, so the sort key (ts, event_id) rides
    inside the struct and array_sort orders each user's array once
    after collection. The previous shape — collect_list over an
    unbounded window then groupBy/first — materialized the full
    per-user array ON EVERY ROW and threw away all but one: O(events
    x user_history) memory and an extra aggregate, with the window's
    sort shuffle on top. This is one hash aggregation, no window, no
    sort exchange."""
    e = load(spark, sf_dir, "events")
    sym = F.substring("event_type", 1, 1)
    seq = (
        e.select("user_id", "ts", "event_id", sym.alias("c"))
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "c"))
            ).alias("s_arr")
        )
        .select(
            "user_id",
            F.array_join(F.transform("s_arr", lambda x: x["c"]), "").alias("s"),
        )
    )
    return seq.select(
        "user_id",
        F.length("s").alias("n_events"),
        (
            F.length(F.regexp_replace("s", "vp", "")) != F.length("s")
        ).alias("has_view_purchase"),
        (
            F.length("s") - F.length(F.regexp_replace("s", "e", ""))
        ).alias("n_errors"),
    )


@query(
    "q106_label_centroids",
    """
    WITH pos AS (
        SELECT label, CAST(i AS INTEGER) AS pos, CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(RANGE(1, LEN(embedding) + 1)) AS r(i)
        WHERE label IS NOT NULL
    )
    SELECT label, pos,
           ROUND(AVG(x), 6) AS centroid_x,
           ROUND(STDDEV_POP(x), 6) AS spread_x
    FROM pos GROUP BY label, pos
    """,
)
def q106(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids + per-dimension spread: the
    cluster-summarization op (class prototypes for nearest-centroid
    classification, drift monitoring of embedding spaces). Vectors
    explode positionally so the aggregate is a plain (label, pos)
    group-by — element-wise mean without any UDF; one shuffle of
    #vectors x dim narrow rows, map-side combined down to
    #labels x dim. (At extreme scale, aggregate the arrays directly
    with fold expressions to avoid the explode fan-out; the explode
    form is the oracle-checkable reference semantics.)"""
    e = load(spark, sf_dir, "embeddings").filter(F.col("label").isNotNull())
    pos = e.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("x").cast("double").alias("x"),
    )
    return pos.groupBy("label", "pos").agg(
        F.round(F.avg("x"), 6).alias("centroid_x"),
        F.round(F.stddev_pop("x"), 6).alias("spread_x"),
    )


@query(
    "q107_null_safe_join",
    """
    WITH l AS (
        SELECT o_orderkey, NULLIF(o_orderpriority, '3-MEDIUM') AS pr, o_totalprice
        FROM orders WHERE o_orderkey % 7 = 0
    ), r AS (
        SELECT DISTINCT NULLIF(o_orderpriority, '3-MEDIUM') AS pr
        FROM orders
    )
    SELECT l.o_orderkey, COALESCE(l.pr, 'NONE') AS pr_out,
           ROUND(l.o_totalprice, 4) AS price
    FROM l JOIN r ON l.pr IS NOT DISTINCT FROM r.pr
    """,
)
def q107(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    match NULL keys instead of vanishing — the join semantics needed
    when the key is a derived/optional attribute (here priorities with
    one value nulled out). Still a hash-joinable equi-predicate in
    Catalyst (EqualNullSafe), unlike an OR-of-IS-NULL rewrite which
    would fall to nested-loop."""
    o = load(spark, sf_dir, "orders")
    pr = F.when(F.col("o_orderpriority") == "3-MEDIUM", F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    left = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey", pr.alias("pr"), "o_totalprice"
    )
    right = o.select(pr.alias("pr_r")).distinct()
    return (
        left.join(right, left.pr.eqNullSafe(right.pr_r))
        .select(
            "o_orderkey",
            F.coalesce("pr", F.lit("NONE")).alias("pr_out"),
            F.round("o_totalprice", 4).alias("price"),
        )
    )


@query(
    "q108_stream_stream_join",
    """
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def q108(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (clicks -> purchases within 30 min,
    same user), run as a real Structured Streaming join with
    watermark-bounded state on BOTH sides — the attribution-pipeline
    shape. Finite-source append output ≡ the batch interval join the
    oracle runs."""
    from .streaming.events import stream_stream_click_purchase

    _pin_utc(spark)
    return stream_stream_click_purchase(spark, f"{sf_dir}/events.parquet")


@query(
    "q109_weighted_sample",
    """
    WITH scored AS (
        SELECT doc_id, lang, n_chars,
               LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) * 1.0
                 / LEN(STRING_SPLIT(text, ' ')) AS ttr
        FROM documents
    )
    SELECT doc_id, lang, ROUND(ttr, 6) AS ttr_r
    FROM scored
    WHERE (((doc_id % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000
          < CAST(FLOOR(100 + 800 * ttr) AS INTEGER)
    """,
)
def q109(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling: keep probability 10%..90% scales
    linearly with the document's type-token ratio — soft curation
    (downweight junk without a hard cutoff, preserving distribution
    tails), reproducible because the coin is the q89 LCG id-hash, not
    rand(). The weight comparison is integer-vs-integer, truncated via
    an EXPLICIT floor on both sides: Spark's cast('int') truncates but
    DuckDB's CAST(... AS INTEGER) rounds half-away-from-zero (2.5 -> 3
    in DuckDB, 2 in Spark), which diverged on 1 sf0.1 row before the
    floor was made explicit. Shuffle-free: pure scan-project-filter."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(w)) * 1.0 / F.size(w)
    bucket = (((F.col("doc_id") % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000
    thresh = F.floor(100 + 800 * ttr).cast("int")
    return (
        d.select("doc_id", "lang", ttr.alias("__ttr"))
        .filter(bucket < thresh)
        .select("doc_id", "lang", F.round("__ttr", 6).alias("ttr_r"))
    )


# =====================================================================
# Batch 5 (round 2): PII redaction, chunking, entropy, boilerplate
# =====================================================================


@query(
    "q110_pii_redaction",
    """
    WITH withpii AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or +1-555-'
                    || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
             + CAST(LEN(REGEXP_EXTRACT_ALL(t, '\\+1-555-[0-9]{4}')) AS INT)
             AS n_redacted,
           MD5(REGEXP_REPLACE(REGEXP_REPLACE(t,
                '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                '<EMAIL>', 'g'),
                '\\+1-555-[0-9]{4}', '<PHONE>', 'g')) AS clean_md5
    FROM withpii
    """,
)
def q110(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing: regex redaction of emails and phone numbers with
    a per-doc redaction count — the standard pre-training privacy
    pass. The fixture corpus carries no PII, so a deterministic
    email+phone per doc is injected first (same expression both
    sides); the patterns stay in the Java-regex ∩ RE2 common dialect
    so Spark and DuckDB match identically. Shuffle-free
    scan-project; the md5 of the scrubbed text makes the oracle
    comparison byte-exact without shipping full texts."""
    d = load(spark, sf_dir, "documents")
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone = r"\+1-555-[0-9]{4}"
    t = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(t, email, "<EMAIL>"), phone, "<PHONE>"
    )
    return d.select(
        "doc_id",
        (F.regexp_count(t, F.lit(email)) + F.regexp_count(t, F.lit(phone)))
        .cast("int")
        .alias("n_redacted"),
        F.md5(clean).alias("clean_md5"),
    )


@query(
    "q111_doc_chunking",
    f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) // 48 AS INT) AS chunk_idx,
           CAST(LEAST(CAST(s + 63 AS BIGINT), LEN(t)) - s + 1 AS INT) AS n_tokens,
           MD5(ARRAY_TO_STRING(t[s:LEAST(CAST(s + 63 AS BIGINT), LEN(t))], ' ')) AS chunk_md5
    FROM toks, UNNEST(RANGE(1, LEN(t) + 1, 48)) AS r(s)
    WHERE LEN(t) > 0
    """,
)
def q111(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping-window document chunking (window 64 tokens, stride
    48 — 16-token overlap), the context-packing primitive of a
    training-data pipeline. Chunk starts come from a per-row
    sequence + posexplode (no join, no shuffle); each chunk is
    identified by md5 so the oracle compares byte-exact without
    duplicating corpus text. Short docs produce one short chunk;
    final ragged chunks keep their true token count."""
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("__t"), F.lit(1)), F.lit(48))
    chunk = F.slice(F.col("__t"), F.col("s"), 64)
    return (
        d.select("doc_id", toks.alias("__t"))
        .filter(F.size("__t") > 0)
        .select("doc_id", "__t", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.floor((F.col("s") - 1) / 48).cast("int").alias("chunk_idx"),
            F.size(chunk).alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
    )


@query(
    "q112_token_entropy",
    f"""
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS w
        FROM documents
    ), cnt AS (
        SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY doc_id, w
    ), tot AS (
        SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id
    )
    SELECT c.doc_id,
           CAST(t.n AS BIGINT) AS n_tokens,
           ROUND(-SUM((c.c * 1.0 / t.n) * LOG2(c.c * 1.0 / t.n)), 6) AS entropy_r
    FROM cnt c JOIN tot t ON c.doc_id = t.doc_id
    GROUP BY c.doc_id, t.n
    """,
)
def q112(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token Shannon entropy — the perplexity-proxy
    quality signal (low entropy = repetitive/boilerplate text, high =
    diverse vocabulary). One explode + two key-local aggregations;
    the per-(doc, token) count shuffle is the only wide stage and is
    map-side combinable. Rounded to 6dp (30-term double sums agree
    across engines far below that tolerance)."""
    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w_doc = Window.partitionBy("doc_id")
    p = F.col("c") / F.sum("c").over(w_doc)
    return (
        cnt.withColumn("__p", p)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.round(-F.sum(F.col("__p") * F.log2("__p")), 6).alias("entropy_r"),
        )
    )


@query(
    "q113_boilerplate_bigrams",
    f"""
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), bg AS (
        SELECT doc_id, ARRAY_TO_STRING(t[i:i+1], ' ') AS g
        FROM toks, UNNEST(RANGE(1, LEN(t))) AS r(i)
        WHERE LEN(t) >= 2
    ), cnt AS (
        SELECT doc_id, g, COUNT(*) AS c FROM bg GROUP BY doc_id, g
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_bigrams,
           CAST(MAX(c) AS BIGINT) AS top_count,
           ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_frac
    FROM cnt GROUP BY doc_id
    """,
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection via top-bigram concentration: the share
    of a document's bigrams taken by its single most frequent bigram
    (C4/Gopher-style repetition signal; templated text scores high).
    Bigrams come from the guarded shingle expression (short docs
    yield no rows, not a crash — the round-1 short-doc fix), counted
    per doc with one map-side-combinable shuffle."""
    from .functions.text import shingles_from_tokens

    d = load(spark, sf_dir, "documents")
    # tokens MUST be projected into a named column before the shingle
    # HOF — an inline tokens() free subexpression re-runs split+regexp
    # once per array element inside the lambda (measured 3.1s -> 0.5s
    # at sf0.1; see shingles_from_tokens docstring).
    t = d.select("doc_id", tokens(F.col("text")).alias("__t"))
    bg = (
        t.select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("__t"), 2)).alias("g"),
        )
        .groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return bg.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.max("c").alias("top_count"),
        F.round(F.max("c") * 1.0 / F.sum("c"), 6).alias("top_frac"),
    )


@query(
    "q114_sequence_packing",
    f"""
    -- Contiguous greedy packing: docs in doc_id order per language,
    -- bin = floor(tokens-before-me / budget). Integer-only, so the
    -- oracle is bit-exact. (True first-fit bin packing is inherently
    -- sequential; contiguous packing is what large pipelines actually
    -- run because it streams.)
    WITH t AS (
        SELECT doc_id, lang,
               LEN(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS n_tok
        FROM documents
    ), c AS (
        SELECT doc_id, lang, n_tok,
               COALESCE(SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS before_me
        FROM t
    )
    SELECT doc_id, lang, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(before_me // 256 AS BIGINT) AS bin_id,
           CAST(before_me % 256 AS BIGINT) AS bin_offset
    FROM c
    """,
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training batches: assign documents (in
    deterministic doc_id order per language) to fixed-token-budget
    bins (budget 256), with each doc's offset inside its bin — the
    context-packing step between curation and tokenization. Contiguous
    streaming packing, not combinatorial bin packing: one running-sum
    window per language partition, integer arithmetic throughout
    (bit-exact across engines), no data movement beyond the one
    window shuffle."""
    d = load(spark, sf_dir, "documents")
    n_tok = F.size(tokens(F.col("text")))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.select("doc_id", "lang", n_tok.alias("n_tok"))
        .withColumn("__before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .select(
            "doc_id",
            "lang",
            F.col("n_tok").cast("bigint").alias("n_tok"),
            F.floor(F.col("__before") / 256).alias("bin_id"),
            (F.col("__before") % 256).alias("bin_offset"),
        )
    )


_L2_QC = (
    "LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}),"
    " p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))"
    " * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))))"
)


@query(
    "q115_pq_codes",
    f"""
    -- Product quantization: 64-dim vectors -> 4 sub-vectors of 16 dims,
    -- each assigned to the nearest of 8 deterministic sub-codebook
    -- centroids (slices of the first 8 vectors by id; ties -> smallest
    -- code). Fully deterministic, so the compressed codes themselves
    -- are oracle-checkable.
    WITH cents AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS k,
               embedding AS cv
        FROM embeddings ORDER BY vec_id ASC LIMIT 8
    ), subcents AS (
        SELECT k, m, cv[1 + 16 * m : 16 + 16 * m] AS csub
        FROM cents, UNNEST([0, 1, 2, 3]) AS u(m)
    ), scored AS (
        SELECT e.vec_id, s.m, s.k,
               ROW_NUMBER() OVER (
                   PARTITION BY e.vec_id, s.m
                   ORDER BY {_L2_QC.format(a='e.embedding[1 + 16 * s.m : 16 + 16 * s.m]', b='s.csub')} ASC,
                            s.k ASC) AS rn
        FROM embeddings e CROSS JOIN subcents s
    )
    SELECT vec_id,
           CAST(MAX(CASE WHEN m = 0 THEN k END) AS INT) AS code0,
           CAST(MAX(CASE WHEN m = 1 THEN k END) AS INT) AS code1,
           CAST(MAX(CASE WHEN m = 2 THEN k END) AS INT) AS code2,
           CAST(MAX(CASE WHEN m = 3 THEN k END) AS INT) AS code3
    FROM scored WHERE rn = 1
    GROUP BY vec_id
    """,
)
def q115(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes: the vector-compression step of a
    billion-scale ANN index (store 4 bytes/vector instead of 256). The
    codebook is deterministic (sub-slices of the first 8 vectors by
    id, L2 argmin ties to the smallest code) so even the compressed
    representation is oracle-checked bit-exactly. Plan: 32-row
    codebook broadcast against one corpus scan, argmin via min-struct
    aggregation (map-side combinable), pivot to one row per vector —
    no window over the corpus, one shuffle on vec_id."""
    e = load(spark, sf_dir, "embeddings")
    # driver-built 8-row codebook (first_n_centroids): no global
    # row_number window on the limit(8) frame -> warning-clean plan
    cents = S.first_n_centroids(
        e, 8, "vec_id", "embedding", cell_col="k", base=0
    ).select("k", F.col("cvec").alias("cv"))
    subcents = cents.select(
        "k", F.explode(F.array(*[F.lit(m) for m in range(4)])).alias("m"), "cv"
    ).select("k", "m", F.expr("slice(cv, 1 + 16 * m, 16)").alias("csub"))
    esub = F.expr("slice(embedding, 1 + 16 * m, 16)")
    l2 = F.aggregate(
        F.zip_with(
            esub,
            F.col("csub"),
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = e.crossJoin(F.broadcast(subcents)).select(
        "vec_id", "m", "k", l2.alias("__d")
    )
    best = (
        scored.groupBy("vec_id", "m")
        .agg(F.min(F.struct(F.col("__d"), F.col("k"))).alias("__b"))
        .select("vec_id", "m", F.col("__b.k").alias("code"))
    )
    return best.groupBy("vec_id").agg(
        *[
            F.max(F.when(F.col("m") == m, F.col("code")))
            .cast("int")
            .alias(f"code{m}")
            for m in range(4)
        ]
    )


# 4 bands x 8 bits for the registered query: the operator's 100 TB
# default stays (8, 8) — tuned for threshold ~0.95 recall — but the
# correctness query exercises the identical code path at half the
# interpreted-HOF signature cost and a quarter of the candidate pairs.
_Q116_BANDS = 4


def _q116_oracle() -> str:
    """Banded LSH is approximate-but-deterministic, exactly like q63:
    every hyperplane comes from a seeded driver-side RNG and is inlined
    as repr'd double literals, so the oracle reproduces the per-band
    sign-bit signatures, the any-band collision candidate set, and the
    exact re-score bit-for-bit."""
    from .operators.simsearch import hyperplanes

    def dot_sql(vcol: str, plane: list[float]) -> str:
        lit = "[" + ", ".join(repr(x) for x in plane) + "]"
        return (
            f"LIST_SUM(LIST_TRANSFORM(LIST_ZIP({vcol}, {lit}), "
            f"p -> CAST(p[1] AS DOUBLE) * p[2]))"
        )

    sigs = []
    for band in range(_Q116_BANDS):
        planes = hyperplanes(dim=64, n_planes=8, seed=42 + 1000 * band)
        sigs.append(
            " + ".join(
                f"(CASE WHEN {dot_sql('embedding', p)} >= 0"
                f" THEN {1 << i} ELSE 0 END)"
                for i, p in enumerate(planes)
            )
        )
    sig_list = "[" + ", ".join(sigs) + "]"
    cos = _COS_QC.format(a="ea.embedding", b="eb.embedding")
    return f"""
    WITH sigs AS (
        SELECT vec_id, {sig_list} AS sig FROM embeddings
    ), tagged AS (
        SELECT vec_id, band, sig[band + 1] AS s
        FROM sigs, UNNEST(RANGE(0, {_Q116_BANDS})) AS r(band)
    ), cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM tagged a JOIN tagged b
          ON a.band = b.band AND a.s = b.s AND a.vec_id < b.vec_id
    )
    SELECT c.vec_a, c.vec_b, ROUND({cos}, 6) AS sim_r
    FROM cand c
      JOIN embeddings ea ON ea.vec_id = c.vec_a
      JOIN embeddings eb ON eb.vec_id = c.vec_b
    WHERE {cos} >= 0.35
    """


@query("q116_lsh_neardup_pairs", _q116_oracle())
def q116(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH embedding near-dup pairs — the sub-quadratic default
    at 100 TB (q67 is the exact/exhaustive variant). N bands of 8
    sign-bits: candidates are same-(band, signature) pairs only, so the
    shuffle carries O(docs x bands) rows and the pair space is
    O(sum_b |bucket|^2) << O(n^2); survivors get the exact
    sequential-order cosine re-score, making precision 1 and the whole
    output deterministic (seeded hyperplanes) — hence oracle-checkable
    despite being an approximation.

    vectorized=True: signatures come from the blocked-BLAS mapInPandas
    path (one dgemm per Arrow batch) instead of 32 inlined dot-product
    aggregates — the expression tree's codegen COMPILE alone cost more
    than all the row work at sf0.1 (measured ~3.3s -> see BENCH_r05).
    Sign bits are identical up to fp-summation order on |dot|~1e-13
    ties; the differential oracle (sequential-order SQL) guards it."""
    e = load(spark, sf_dir, "embeddings")
    pairs = S.embedding_neardup_pairs_lsh(
        e, threshold=0.35, n_bands=_Q116_BANDS, band_bits=8, dim=64, seed=42,
        vectorized=True,
    )
    return pairs.select("vec_a", "vec_b", F.round("sim", 6).alias("sim_r"))


@query(
    "q117_jsonl_orc_roundtrip",
    """
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           MIN(lang) AS min_lang, MAX(lang) AS max_lang
    FROM documents GROUP BY source
    """,
)
def q117(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interchange-format round-trip: documents -> JSONL (the lingua
    franca of LLM corpus tooling) -> ORC -> aggregate. The oracle reads
    the ORIGINAL parquet, so the checked invariant is that two full
    serialize/deserialize hops are lossless for every value that feeds
    the aggregate (ids, counts, unicode text lengths, string ordering).
    JSON is read back with the explicit source schema — schema
    inference on JSONL demotes absent-in-sample fields and is banned
    on the 100 TB path for the same reason.

    The staging directory is a FIXED path keyed by (input dir, THIS
    process) — not mkdtemp-per-call: every write below is
    mode=overwrite, so bench warmup + repeats + correctness sweeps
    reuse two table copies of disk instead of accumulating one pair
    per invocation, while the pid component keeps two concurrent
    processes on the same input from racing overwrite writes into one
    directory (the lazily re-read ORC result could otherwise reflect
    the other process's in-flight write). The returned DataFrame
    lazily re-reads the ORC path, so the path must outlive this call:
    a session-temp dir does, an auto-removed one would not; stale
    per-pid dirs from finished processes are cleaned opportunistically."""
    import hashlib
    import tempfile

    d = load(spark, sf_dir, "documents")
    key = hashlib.sha1(sf_dir.encode()).hexdigest()[:10]
    base = os.path.join(
        tempfile.gettempdir(), f"q117_roundtrip_{key}_{os.getpid()}"
    )
    # opportunistic cleanup of dirs left by other (dead) processes
    import glob as _glob
    import shutil as _shutil

    for other in _glob.glob(
        os.path.join(tempfile.gettempdir(), f"q117_roundtrip_{key}_*")
    ):
        pid = other.rsplit("_", 1)[-1]
        if pid != str(os.getpid()) and pid.isdigit():
            try:
                os.kill(int(pid), 0)  # raises if the process is gone
            except ProcessLookupError:
                _shutil.rmtree(other, ignore_errors=True)
            except PermissionError:
                pass  # alive under another uid: leave it
    jsonl_path, orc_path = f"{base}/docs_jsonl", f"{base}/docs_orc"
    d.write.mode("overwrite").json(jsonl_path)
    back_json = spark.read.schema(d.schema).json(jsonl_path)
    back_json.write.mode("overwrite").orc(orc_path)
    back = spark.read.orc(orc_path)
    return back.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("doc_id").alias("id_sum"),
        F.min("lang").alias("min_lang"),
        F.max("lang").alias("max_lang"),
    )

@query(
    "q118_semantic_dedup",
    f"""
    -- SemDeDup keep-set, reproduced exactly: centroid seed = the
    -- max(16, ceil(sqrt(corpus))) lowest-id vectors — the SAME
    -- sqrt-cells derivation the operator enforces by default
    -- (simsearch.derive_n_cells), so the oracle tracks any corpus
    -- size — then TWO unrolled k-means iterations (6dp-rounded
    -- means, tie-broken argmax); drop any vector with a lower-id
    -- same-cell neighbor at cosine >= 0.30; report survivors and
    -- their cell.
    WITH nc AS (
        SELECT GREATEST(16, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT)) AS k
        FROM embeddings
    ), cents0 AS (
        SELECT cell, cvec FROM (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) AS cell,
                   embedding AS cvec
            FROM embeddings
        ) WHERE cell <= (SELECT k FROM nc)
    ), {_kmeans_ctes(2)}, cents AS (
        SELECT cell, cvec FROM cents2
    ), assign_scored AS (
        SELECT e.vec_id, e.embedding AS v, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_COS_QC.format(a='e.embedding', b='c.cvec')} DESC,
                                           c.cell ASC) AS rn
        FROM embeddings e CROSS JOIN cents c
    ), assigned AS (
        SELECT vec_id, v, cell FROM assign_scored WHERE rn = 1
    ), dups AS (
        SELECT DISTINCT a.vec_id
        FROM assigned a JOIN assigned b USING (cell)
        WHERE b.vec_id < a.vec_id
          AND {_COS_QC.format(a='a.v', b='b.v')} >= 0.30
    )
    SELECT s.vec_id, CAST(s.cell AS INTEGER) AS cell
    FROM assigned s LEFT JOIN dups d ON s.vec_id = d.vec_id
    WHERE d.vec_id IS NULL
    """,
)
def q118(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication, SemDeDup-style (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embedding corpus, then
    within each cluster drop every vector with ANY lower-id neighbor
    above the cosine threshold — one within-cell self-join +
    anti-join, no iteration (see semantic_dedup for how this differs
    from a literal greedy sweep on chains). Fully deterministic:
    n_cells DERIVED by the operator's default sqrt-cells rule
    max(16, ceil(sqrt(corpus))) — 23 cells at the 500-vector driver
    scale, 45 at sf0.1 — first-n-by-id seed, two fixed k-means
    iterations (6dp-rounded means), tie-broken assignment; so the
    approximate keep-set itself is oracle-checkable, like q68's IVF
    and q116's banded LSH. Assignment runs the blocked-BLAS path (the at-scale
    default); its keep-set is pinned IDENTICAL to the expression path
    the oracle mirrors, at BOTH driver scales (pytest parity tests) —
    argmax cells differ only on fp near-ties, absent in this data. At
    scale: corpus partitioned by cell, dedup becomes per-partition
    with no global shuffle."""
    e = load(spark, sf_dir, "embeddings")
    kept = S.semantic_dedup(
        e, threshold=0.30, id_col="vec_id",
        vec_col="embedding", vectorized=True, refine_iters=2,
    )
    return kept.select("vec_id", "cell")

@query(
    "q119_hash_split",
    """
    -- Deterministic hash split: md5 of (salt || doc_id), first two hex
    -- chars compared as STRINGS (cross-engine safe: no integer parsing
    -- of hex needed). 'cc' = 204/256 = 79.7% train; 'e6' = 230/256 =
    -- 89.8% cumulative -> ~10% val, ~10% test.
    WITH h AS (
        SELECT doc_id, n_chars,
               SUBSTR(MD5('split-v1:' || CAST(doc_id AS VARCHAR)), 1, 2) AS hh
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN hh < 'cc' THEN 'train'
                WHEN hh < 'e6' THEN 'val'
                ELSE 'test' END AS split
    FROM h
    """,
)
def q119(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/val/test assignment — the split every
    training pipeline needs to be STABLE across runs, engines, and
    data arrival order. Hash-based (salted md5 of the id), so a
    document's split never changes when the corpus grows, and the
    split is re-derivable by any engine with md5 (thresholds compare
    HEX PREFIX STRINGS — no hex->int parsing, which engines disagree
    on). Pure expression; scales embarrassingly (no shuffle at all).
    Salt the key to re-deal splits; version the salt ('split-v1') so
    provenance is explicit."""
    d = load(spark, sf_dir, "documents")
    hh = F.substring(
        F.md5(F.concat(F.lit("split-v1:"), F.col("doc_id").cast("string"))), 1, 2
    )
    return d.select(
        "doc_id",
        F.when(hh < "cc", "train")
        .when(hh < "e6", "val")
        .otherwise("test")
        .alias("split"),
    )

@query(
    "q120_stream_static_join",
    """
    SELECT c.c_mktsegment, COUNT(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q120(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the everyday production
    streaming shape: a fact stream joined to a broadcast batch
    dimension (no state, no watermark on the static side; Spark
    re-reads the dim per micro-batch so reference-data updates flow
    in), then a stateful aggregate keyed by the small dim attribute.
    Complete-mode output on a finite AvailableNow source equals the
    batch join+groupBy the oracle runs. Sum in DECIMAL (exact,
    associative) per the float policy."""
    from .streaming.events import stream_static_enrich

    customer = load(spark, sf_dir, "customer")
    out = stream_static_enrich(
        spark, f"{sf_dir}/events.parquet", customer
    )
    return out.select(
        "c_mktsegment",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )

@query(
    "q121_gap_fill",
    """
    -- Hourly resample with gap-fill: each user's hourly activity on a
    -- dense spine from their first to last active hour; empty hours
    -- carry n_events = 0 and the last seen hourly value forward.
    WITH b AS (
        SELECT user_id, DATE_TRUNC('hour', ts) AS h, COUNT(*) AS n,
               SUM(CAST(value AS DECIMAL(27,4))) AS v
        FROM events GROUP BY 1, 2
    ), r AS (
        SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM b GROUP BY 1
    ), spine AS (
        SELECT user_id, UNNEST(GENERATE_SERIES(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM r
    )
    SELECT s.user_id,
           STRFTIME(s.h, '%Y-%m-%d %H:%M:%S') AS hour,
           COALESCE(CAST(b.n AS BIGINT), 0) AS n_events,
           CAST(LAST_VALUE(b.v IGNORE NULLS) OVER (
                PARTITION BY s.user_id ORDER BY s.h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS filled_value
    FROM spine s LEFT JOIN b ON s.user_id = b.user_id AND s.h = b.h
    """,
)
def q121(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill — the missing half of as-of
    joins for feature pipelines: snap events to an hourly grid, emit a
    DENSE per-user spine (sequence + explode, no driver loop), zero
    the empty hours, and forward-fill the last observed hourly sum
    with last(ignorenulls) over an unbounded-preceding frame. One
    aggregation + one spine join + one window, all on user_id —
    partition-aligned, no global shuffle beyond the keyed ones. The
    spine never leads with a NULL (it starts at each user's first
    active hour), so forward-fill is total. Hourly sums accumulate in
    DECIMAL per the float policy."""
    e = load(spark, sf_dir, "events")
    # the hourly aggregate feeds TWO consumers (the per-user range and
    # the spine's left join) — materialize the events scan+agg once
    # (b96566e discipline; eager because both consumers execute within
    # the one output job)
    b = (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    r = b.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    spine = r.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("interval 1 hour"))
        ).alias("h"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(b, ["user_id", "h"], "left")
        .select(
            "user_id",
            F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce(F.col("n"), F.lit(0)).alias("n_events"),
            F.last("v", ignorenulls=True).over(w).cast("double").alias(
                "filled_value"
            ),
        )
    )


# The DuckDB mirror of the BPE merge-chain token count (generated from
# the same MERGES table the Spark expression uses — see functions/bpe.py).
_BPE_COUNT_QC = count_expr_duckdb("text")


@query(
    "q122_bpe_token_packing",
    f"""
    -- Word-proxy vs BPE-merged token counts and the packing bins each
    -- implies (budget 256, contiguous doc_id-order packing per q114's
    -- recipe). The BPE count comes from functions/bpe.py's generated
    -- REPLACE-chain encoder, so this SQL runs the IDENTICAL merge
    -- table the Spark expression runs — bit-exact by construction.
    WITH t AS (
        SELECT doc_id, lang,
               LEN(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS n_ws,
               {_BPE_COUNT_QC} AS n_bpe
        FROM documents
    ), c AS (
        SELECT doc_id, lang, n_ws, n_bpe,
               COALESCE(SUM(n_ws) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS ws_before,
               COALESCE(SUM(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS bpe_before
        FROM t
    )
    SELECT doc_id, lang,
           CAST(n_ws AS BIGINT) AS n_ws,
           CAST(n_bpe AS BIGINT) AS n_bpe,
           CAST(ws_before // 256 AS BIGINT) AS bin_ws,
           CAST(bpe_before // 256 AS BIGINT) AS bin_bpe
    FROM c
    """,
)
def q122(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware sequence packing (VERDICT r5 item 4): q114's
    contiguous 256-budget packing computed twice — once with the
    whitespace word proxy, once with the in-repo deterministic BPE
    merge-table count (functions/bpe.py) — exposing how far the word
    proxy drifts from a subword tokenizer's bins (BPE counts run ~2x
    the word proxy on this corpus: multi-symbol words survive as
    several subwords). The BPE path is a pure JVM expression chain
    (regexp pre-tokenize + 40 REPLACE merge ranks inside transform();
    no Python workers), generated from the same merge table the
    DuckDB oracle embeds, so the approximate tokenizer itself is
    oracle-checked bit-exactly. The Arrow-batched pandas-UDF lane a
    REAL trained tokenizer (tiktoken public vocab) would use at scale
    is bpe.bpe_token_count_udf, pinned equal to this expression in
    pytest; both windows share one (lang) shuffle."""
    # single-row-group input: parallelize the REPLACE-chain map
    # (scan_parallel is a structural no-op on multi-file inputs)
    d = scan_parallel(load(spark, sf_dir, "documents"))
    n_ws = F.size(tokens(F.col("text")))
    n_bpe = F.expr(count_expr_spark("text"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        d.select(
            "doc_id",
            "lang",
            n_ws.cast("bigint").alias("n_ws"),
            n_bpe.cast("bigint").alias("n_bpe"),
        )
        .withColumn("__wsb", F.coalesce(F.sum("n_ws").over(w), F.lit(0)))
        .withColumn("__bpb", F.coalesce(F.sum("n_bpe").over(w), F.lit(0)))
        .select(
            "doc_id",
            "lang",
            "n_ws",
            "n_bpe",
            F.floor(F.col("__wsb") / 256).alias("bin_ws"),
            F.floor(F.col("__bpb") / 256).alias("bin_bpe"),
        )
    )


@query(
    "q123_bpe_chunk_manifest",
    f"""
    -- Chunk MANIFEST in BPE-token space (window 64, stride 48 — the
    -- q111 geometry, but over subword counts): the (doc, start, len)
    -- ranges a downstream tokenizer worker slices the encoded stream
    -- by. Pure integer arithmetic over the oracle-checked BPE count,
    -- so the manifest itself is bit-exact across engines.
    WITH t AS (
        SELECT doc_id, CAST({_BPE_COUNT_QC} AS BIGINT) AS n_bpe
        FROM documents
    )
    SELECT doc_id,
           CAST((s - 1) // 48 AS INT) AS chunk_idx,
           CAST(s AS BIGINT) AS tok_start,
           CAST(LEAST(CAST(s + 63 AS BIGINT), n_bpe) - s + 1 AS INT) AS n_tokens
    FROM t, UNNEST(RANGE(1, n_bpe + 1, 48)) AS r(s)
    WHERE n_bpe > 0
    """,
)
def q123(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-aware chunk manifest (q111's counterpart in subword
    space, completing VERDICT r5 item 4): overlapping 64-token windows
    at stride 48 over the deterministic BPE token count
    (functions/bpe.py), emitted as (doc, chunk, tok_start, n_tokens)
    ranges — the manifest a tokenize-then-slice worker consumes, so
    chunk geometry is fixed BEFORE the (expensive, Arrow-batched)
    encoding pass touches any text. Chunk starts come from a per-row
    sequence + explode: no join, no shuffle, corpus-linear."""
    # single-row-group input: parallelize the REPLACE-chain map
    # (scan_parallel is a structural no-op on multi-file inputs)
    d = scan_parallel(load(spark, sf_dir, "documents"))
    n_bpe = F.expr(count_expr_spark("text"))
    starts = F.sequence(
        F.lit(1).cast("bigint"),
        F.greatest(F.col("__n"), F.lit(1).cast("bigint")),
        F.lit(48).cast("bigint"),
    )
    return (
        d.select("doc_id", n_bpe.alias("__n"))
        .filter(F.col("__n") > 0)
        .select("doc_id", "__n", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.floor((F.col("s") - 1) / 48).cast("int").alias("chunk_idx"),
            F.col("s").cast("bigint").alias("tok_start"),
            (
                F.least(F.col("s") + 63, F.col("__n")) - F.col("s") + 1
            ).cast("int").alias("n_tokens"),
        )
    )


@query(
    "q124_hybrid_rrf_fusion",
    f"""
    -- Hybrid retrieval: fuse the sparse (BM25, q97's scorer) and the
    -- dense (exact cosine vs the vec_id=0 query vector) rankings via
    -- reciprocal-rank fusion, k=60 (Cormack et al. 2009). Both input
    -- rankings are deterministic (BM25 ranked on its 6dp-rounded
    -- score, cosine bit-exact across engines, all ties -> smaller
    -- id), so the fused list is oracle-checkable. FULL OUTER fuse:
    -- sf0.1 has docs with no embedding and vice versa.
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t FROM documents
    ), stats AS (
        SELECT AVG(LEN(t)) AS avgdl, COUNT(*) AS n_docs FROM toks
    ), tf AS (
        SELECT doc_id, LEN(t) AS dl, s AS term, COUNT(*) AS tf
        FROM toks, UNNEST(t) AS r(s)
        WHERE s IN ('spark', 'shuffle', 'partition')
        GROUP BY doc_id, LEN(t), s
    ), dfreq AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), bm AS (
        SELECT doc_id,
               ROUND(SUM(
                   LN(1 + (n_docs - df + 0.5) / (df + 0.5)) *
                   (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
               ), 6) AS bm25
        FROM tf JOIN dfreq USING (term) CROSS JOIN stats
        GROUP BY doc_id
    ), b_r AS (
        SELECT doc_id AS id,
               ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rank_b
        FROM bm QUALIFY rank_b <= 50
    ), cosd AS (
        SELECT vec_id,
               {_COS_QC.format(a='e.embedding', b='(SELECT embedding FROM embeddings WHERE vec_id = 0)')} AS cs
        FROM embeddings e WHERE vec_id <> 0
    ), c_r AS (
        SELECT vec_id AS id,
               ROW_NUMBER() OVER (ORDER BY cs DESC, vec_id ASC) AS rank_c
        FROM cosd QUALIFY rank_c <= 50
    ), fused AS (
        SELECT COALESCE(b.id, c.id) AS doc_id,
               ROUND(COALESCE(1.0 / (60 + b.rank_b), 0)
                     + COALESCE(1.0 / (60 + c.rank_c), 0), 6) AS rrf_r
        FROM b_r b FULL OUTER JOIN c_r c ON b.id = c.id
    )
    SELECT doc_id, rrf_r,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf_r DESC, doc_id ASC) AS INT) AS rank
    FROM fused QUALIFY rank <= 20
    """,
)
def q124(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval fusion — the RAG-stack ranker:
    BM25 (q97's corpus-wide scorer) and exact cosine against a fixed
    query vector, fused by reciprocal-rank fusion (1/(60+rank), the
    rank-only combiner that needs no score calibration between
    rankers). Top-50 per ranker via distributed TakeOrdered
    (orderBy+limit — no global window), rank indices assigned
    driver-side over the collected <=50 rows (warning-free, the
    first_n_centroids pattern), FULL OUTER fuse because each ranker
    covers a different id subset at sf0.1. BM25 ranks on its
    6dp-rounded score (cross-engine-stable); cosine is bit-exact by
    construction, so the fused list itself is oracle-checked."""
    from pyspark.sql import types as T

    d = load(spark, sf_dir, "documents")
    e = load(spark, sf_dir, "embeddings")
    terms = ("spark", "shuffle", "partition")
    toks = d.select("doc_id", F.split(normalize_text("text"), " ").alias("t"))
    stats = toks.agg(
        F.avg(F.size("t")).alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        toks.select("doc_id", F.size("t").alias("dl"), F.explode("t").alias("term"))
        .filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    score = idf * (F.col("tf") * 2.2) / (
        F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
    )
    bm = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(score), 6).alias("bm25"))
    )
    top_b = bm.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(50).collect()

    # literal vec_id 0, matching the oracle's scalar subquery exactly
    # (a min-id pick could silently diverge from the SQL mirror if the
    # id space ever changed); missing id 0 fails loudly on both sides
    qv = anchor_embedding(e, 0)
    # one parsed literal instead of 64 per-element F.lit py4j calls
    # (the _json_arr_lit discipline; identical double values)
    qlit = S._json_arr_lit([float(x) for x in qv], "double")
    cosd = e.filter(F.col("vec_id") != 0).select(
        "vec_id", cosine(F.col("embedding"), qlit).alias("cs")
    )
    top_c = cosd.orderBy(F.col("cs").desc(), F.col("vec_id").asc()).limit(50).collect()

    rank_schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("rank", T.IntegerType(), False),
        ]
    )
    b_r = spark.createDataFrame(
        [(int(r["doc_id"]), i + 1) for i, r in enumerate(top_b)], rank_schema
    ).withColumnRenamed("rank", "rank_b")
    c_r = spark.createDataFrame(
        [(int(r["vec_id"]), i + 1) for i, r in enumerate(top_c)], rank_schema
    ).withColumnRenamed("rank", "rank_c")
    fused = b_r.join(c_r, "id", "full").select(
        F.col("id").alias("doc_id"),
        F.round(
            F.coalesce(1.0 / (60 + F.col("rank_b")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rank_c")), F.lit(0.0)),
            6,
        ).alias("rrf_r"),
    )
    top = fused.orderBy(F.col("rrf_r").desc(), F.col("doc_id").asc()).limit(20).collect()
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("rrf_r", T.DoubleType(), False),
            T.StructField("rank", T.IntegerType(), False),
        ]
    )
    return spark.createDataFrame(
        [(int(r["doc_id"]), float(r["rrf_r"]), i + 1) for i, r in enumerate(top)],
        out_schema,
    )


@query(
    "q125_quality_model_score",
    """
    -- Model-scored quality filtering: a linear scorer over q92's
    -- handcrafted features with fixed (inline) weights + sigmoid —
    -- the fasttext-style shape production pipelines use once the
    -- hand rules graduate to a trained filter. The feature extractor
    -- and the score are pure per-row expressions (zero shuffles);
    -- weights would come from training, the dataflow is identical.
    -- Score rounded to 6dp (transcendental cross-engine policy);
    -- keep thresholds on the ROUNDED score for engine stability.
    WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents),
    f AS (
        SELECT doc_id,
               LEN(w) AS n_words,
               LIST_SUM(LIST_TRANSFORM(w, x -> LEN(x))) * 1.0 / LEN(w) AS mwl,
               LEN(LIST_FILTER(w, x -> x IN ('a','the'))) * 1.0 / LEN(w) AS stop_frac,
               LEN(LIST_DISTINCT(w)) * 1.0 / LEN(w) AS ttr
        FROM t
    ), s AS (
        SELECT doc_id,
               -9.0 + 1.2 * mwl - 5.0 * stop_frac + 4.0 * ttr
                    + 0.35 * LN(CAST(n_words AS DOUBLE)) AS z
        FROM f
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-z)), 6) AS quality_r,
           ROUND(1.0 / (1.0 + EXP(-z)), 6) >= 0.5 AS keep
    FROM s
    """,
)
def q125(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned-filter scoring shape: sigmoid(w . features) over the
    q92 feature family (mean word length, stopword fraction,
    type-token ratio, log word count) with inline literal weights —
    exactly how a trained fasttext/logistic quality filter deploys
    (weights are data, the dataflow is this). Pure per-row
    higher-order array expressions: ZERO shuffles, no UDFs, the ideal
    100 TB map-only shape; swap the literals for trained weights and
    nothing else changes. Keep decision thresholds on the 6dp-rounded
    score so both engines agree bit-for-bit."""
    d = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    base = d.select("doc_id", w.alias("w"))
    n = F.size("w")
    mwl = (
        F.aggregate("w", F.lit(0).cast("long"), lambda a, x: a + F.length(x))
        * 1.0
        / n
    )
    stop_frac = F.size(F.filter("w", lambda x: x.isin("a", "the"))) * 1.0 / n
    ttr = F.size(F.array_distinct("w")) * 1.0 / n
    z = (
        F.lit(-9.0)
        + 1.2 * mwl
        - 5.0 * stop_frac
        + 4.0 * ttr
        + 0.35 * F.log(n.cast("double"))
    )
    q = F.round(1.0 / (1.0 + F.exp(-z)), 6)
    return base.select(
        "doc_id", q.alias("quality_r"), (q >= 0.5).alias("keep")
    )


@query(
    "q126_variant_json",
    """
    -- Typed path extraction from semi-structured event props, grouped
    -- per event type. Spark side parses each props string ONCE into a
    -- VariantType value (Spark 4's binary semi-structured encoding —
    -- the engine-native replacement for repeated get_json_object
    -- string re-parses) and extracts "$.k" as a typed int; DuckDB
    -- mirrors with its JSON extraction. Integer-only aggregates, so
    -- the check is bit-exact.
    WITH kx AS (
        SELECT event_type,
               CASE WHEN json_valid(props)
                    THEN TRY_CAST(props->>'$.k' AS BIGINT) END AS k
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           MIN(k) AS k_min,
           MAX(k) AS k_max,
           COUNT(*) FILTER (WHERE k IS NULL) AS n_missing
    FROM kx
    GROUP BY event_type
    """,
)
def q126(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured querying through Spark 4 VariantType: props is
    parsed ONCE per row into the binary variant encoding
    (parse_json), then "$.k" is extracted as a typed int
    (try_variant_get) — the scale path for JSON-heavy corpora, where
    repeated get_json_object calls re-parse the string per extraction
    while a variant parses once and serves every path. One map-side-
    combinable groupBy on event_type; integer aggregates keep the
    oracle bit-exact. try_variant_get (not variant_get) so malformed
    or missing paths surface as NULLs — counted in n_missing, the
    quarantine column — instead of failing the batch."""
    e = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.try_parse_json("props"), "$.k", "bigint")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.count_if(F.col("k").isNull()).alias("n_missing"),
        )
    )




# MinHash r=1,b=16 collision-graph CTEs over the doc_id<100 slice,
# shared by q127 (PageRank hubs) and q129 (edit-distance verify) —
# the SQL mirror of D.minhash_bands(num_hashes=16, band_size=1).
# Defines toks/sh/mh/bands; bands = (doc, band, band_hash).
_MINHASH_BAND_CTES = f"""toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents WHERE doc_id < 100
    ), sh AS (
        SELECT DISTINCT doc_id, ARRAY_TO_STRING(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t) - 1, 1))) AS r(i)
        WHERE LEN(t) >= 3
    ), mh AS (
        SELECT doc_id, seed, MIN(MD5(CAST(seed AS VARCHAR) || '|' || s)) AS h
        FROM sh CROSS JOIN UNNEST(RANGE(1, 17)) AS r(seed)
        GROUP BY doc_id, seed
    ), bands AS (
        SELECT doc_id AS doc, CAST(seed - 1 AS BIGINT) AS band,
               MD5(STRING_AGG(h, '' ORDER BY seed)) AS band_hash
        FROM mh GROUP BY doc_id, CAST(seed - 1 AS BIGINT)
    )"""


def _loose_band_collisions(bands, symmetric: bool):
    """Spark side of the shared collision graph: distinct colliding doc
    pairs from the banded signatures — both directions for graph
    algorithms (q127), ordered pairs for pair scoring (q129)."""
    a = bands.alias("a")
    b = bands.alias("b")
    cond = (
        (F.col("a.doc") != F.col("b.doc"))
        if symmetric
        else (F.col("a.doc") < F.col("b.doc"))
    )
    return (
        a.join(b, on=["band", "band_hash"])
        .filter(cond)
        .select(F.col("a.doc").alias("src"), F.col("b.doc").alias("dst"))
        .distinct()
    )


@query(
    "q127_neardup_pagerank",
    f"""
    -- PageRank over a MinHash-LSH collision graph (q91's recipe at
    -- r=1,b=16 — one minhash per band, the loose-banding operating
    -- point that targets low-similarity recall, giving a non-trivial
    -- graph on this corpus slice):
    -- rank near-dup "hubs" — documents colliding with many others —
    -- the centrality signal a dedup pipeline uses to pick canonical
    -- representatives (keep the hub, drop satellites). THREE unrolled
    -- power iterations in integer FIXED POINT (micro-rank units,
    -- floor division, damping 850/1000) — exact arithmetic, so the
    -- ranking is bit-identical across engines BY CONSTRUCTION (a
    -- double-rounded variant hit a 6dp rounding boundary).
    WITH {_MINHASH_BAND_CTES}, edges AS (
        SELECT DISTINCT a.doc AS src, b.doc AS dst
        FROM bands a JOIN bands b USING (band, band_hash)
        WHERE a.doc <> b.doc
    ), nodes AS (
        SELECT DISTINCT doc FROM bands
    ), deg AS (
        SELECT src AS doc, COUNT(*) AS deg FROM edges GROUP BY src
    ), pr0 AS (
        SELECT doc, CAST(1000000 AS BIGINT) AS rn_u FROM nodes
    ), pr1 AS (
        SELECT n.doc,
               CAST(150000 + (850 * COALESCE(SUM(p.rn_u // d.deg), 0)) // 1000
                    AS BIGINT) AS rn_u
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.doc
        LEFT JOIN pr0 p ON p.doc = e.src
        LEFT JOIN deg d ON d.doc = e.src
        GROUP BY n.doc
    ), pr2 AS (
        SELECT n.doc,
               CAST(150000 + (850 * COALESCE(SUM(p.rn_u // d.deg), 0)) // 1000
                    AS BIGINT) AS rn_u
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.doc
        LEFT JOIN pr1 p ON p.doc = e.src
        LEFT JOIN deg d ON d.doc = e.src
        GROUP BY n.doc
    ), pr3 AS (
        SELECT n.doc,
               CAST(150000 + (850 * COALESCE(SUM(p.rn_u // d.deg), 0)) // 1000
                    AS BIGINT) AS rn_u
        FROM nodes n
        LEFT JOIN edges e ON e.dst = n.doc
        LEFT JOIN pr2 p ON p.doc = e.src
        LEFT JOIN deg d ON d.doc = e.src
        GROUP BY n.doc
    )
    SELECT p.doc, p.rn_u / 1000000.0 AS pagerank_r,
           CAST(COALESCE(d.deg, 0) AS BIGINT) AS degree
    FROM pr3 p LEFT JOIN deg d USING (doc)
    """,
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup hub ranking: fixed-iteration PageRank
    (operators/graph.py::pagerank — 3 power iterations, damping 0.85,
    mean-1 normalization, integer FIXED-POINT micro-rank units with
    floor division, so the arithmetic is exact and the ranking
    bit-identical across engines by construction) over the q91-recipe
    MinHash-LSH collision graph at the loose r=1,b=16 operating
    point, joined with each node's collision degree. The centrality
    signal a dedup pipeline uses to pick the canonical representative
    of a near-dup cluster. Every iteration is a join +
    map-side-combinable groupBy; the oracle unrolls the identical
    iterations as CTEs — an iterative graph algorithm, hash-checked
    end to end."""
    from .operators.graph import pagerank

    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    bands = D.minhash_bands(d, "text", "doc_id", num_hashes=16, band_size=1)
    edges = _loose_band_collisions(bands, symmetric=True)
    # materialize the (tiny) graph once: the unrolled iterations would
    # otherwise re-execute the shingle->minhash->band subtree per
    # iteration (observed: 18 scans / 21 exchanges in the lazy plan)
    edges = edges.localCheckpoint()
    nodes = bands.select("doc").distinct().localCheckpoint()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    pr = pagerank(edges, nodes, iters=3, damping=0.85)
    return (
        pr.join(deg, pr["doc"] == deg["src"], "left")
        .select(
            pr["doc"],
            F.col("rn").alias("pagerank_r"),
            F.coalesce(F.col("deg"), F.lit(0)).cast("bigint").alias("degree"),
        )
    )


@query(
    "q128_incremental_rollup",
    """
    -- Incremental view maintenance, checked against the full rebuild:
    -- the Spark side maintains a per-user rollup through a keyed
    -- UPDATE of every 10th event (value + 100) by aggregating ONLY
    -- the changed rows (retract old, apply new — operators/ivm.py);
    -- the oracle recomputes the rollup from scratch over the updated
    -- fact table. Equality is exact because sums are maintained in
    -- DECIMAL (associative), not double. The driver-visible surface
    -- is integer MICRO-UNITS (sum * 1e6 as BIGINT, exact since scale
    -- is 6), not DECIMAL: the r6 driver hash flagged the DECIMAL
    -- column despite bit-exact values under every local probe, so the
    -- q127/q150 fixed-point discipline applies to the output too.
    SELECT user_id,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(CASE WHEN event_id % 10 = 0 THEN value + 100
                              ELSE value END AS DECIMAL(28,6)))
                * 1000000 AS BIGINT) AS value_sum_micro
    FROM events
    GROUP BY user_id
    """,
)
def q128(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental rollup maintenance (operators/ivm.py): a per-user
    count+sum rollup is built over the original events, then every
    10th event is UPDATED (value + 100) and the rollup is maintained
    by aggregating ONLY the changed rows — retract the old versions,
    apply the new — never rescanning the fact table (at 100 TB: the
    daily delta is GBs, the fact table TBs; this is the relational
    core of Materialize/DLT-style maintained views). The oracle
    recomputes from scratch over the updated table, so the driver
    check IS the maintained==rebuilt invariant, cross-engine. Sums
    maintained in DECIMAL: associative, so the equality is exact, not
    ulp-lucky (a double-summed variant would drift by summation
    order). The DRIVER-VISIBLE column is integer micro-units
    (value_sum * 1e6 as BIGINT — exact, scale is 6): the r6 driver
    hashed the DECIMAL(28,6) column as a mismatch even though values
    were bit-exact under bitdiff at 3 scales, a vanilla-session
    driver sim, and a TZ probe; an integer surface removes Decimal
    canonicalization (scale/trailing-zero/type-tag) from the hash
    entirely, the same fixed-point discipline q127/q150 use."""
    from .operators.ivm import apply_rollup_delta, build_rollup

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    rollup0 = build_rollup(e, ["user_id"], {"value_sum": "value"})
    changed = e.filter(F.col("event_id") % 10 == 0)
    applied = changed.withColumn("value", F.col("value") + 100)
    maintained = apply_rollup_delta(
        rollup0, applied, changed, ["user_id"], {"value_sum": "value"}
    )
    return maintained.select(
        "user_id",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("value_sum").cast("decimal(28,6)") * F.lit(1000000))
        .cast("long")
        .alias("value_sum_micro"),
    )


@query(
    "q129_editdist_verify",
    f"""
    -- Edit-distance verification of LSH candidate pairs: the
    -- candidate-generation/verification split every fuzzy-match
    -- pipeline uses — cheap banding proposes pairs (q127's r=1,b=16
    -- collision graph), an exact but expensive measure verifies ONLY
    -- those pairs (never the n^2 space). Here the verifier is
    -- Levenshtein over each doc's 48-char normalized prefix.
    WITH {_MINHASH_BAND_CTES}, pairs AS (
        SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
        FROM bands a JOIN bands b USING (band, band_hash)
        WHERE a.doc < b.doc
    ), px AS (
        SELECT doc_a, doc_b,
               SUBSTR({_NORM_SQL.format(c='da.text')}, 1, 48) AS pa,
               SUBSTR({_NORM_SQL.format(c='db.text')}, 1, 48) AS pb
        FROM pairs
        JOIN documents da ON da.doc_id = doc_a
        JOIN documents db ON db.doc_id = doc_b
    )
    SELECT doc_a, doc_b,
           CAST(LEVENSHTEIN(pa, pb) AS INTEGER) AS edit_dist
    FROM px
    WHERE LEVENSHTEIN(pa, pb) <= 38
    """,
)
def q129(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation/verification fuzzy matching: LSH banding
    (q127's loose r=1,b=16 graph) proposes candidate pairs, exact
    Levenshtein over 48-char normalized prefixes verifies them —
    never touching the O(n^2) pair space. Edit distance is the
    verifier every entity-resolution / fuzzy-dedup pipeline reaches
    for once candidates are cheap; both engines implement classic
    Levenshtein identically (pinned on ASCII in the oracle). The
    distance compute is JVM-side (F.levenshtein, codegen) on
    broadcast-joined prefix pairs; threshold keeps confirmed
    near-matches only."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    bands = D.minhash_bands(d, "text", "doc_id", num_hashes=16, band_size=1)
    pairs = _loose_band_collisions(bands, symmetric=False).select(
        F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
    )
    prefix = F.substring(normalize_text("text"), 1, 48)
    texts = d.select("doc_id", prefix.alias("p"))
    px = (
        pairs.join(
            F.broadcast(texts.select(F.col("doc_id").alias("doc_a"), F.col("p").alias("pa"))),
            "doc_a",
        )
        .join(
            F.broadcast(texts.select(F.col("doc_id").alias("doc_b"), F.col("p").alias("pb"))),
            "doc_b",
        )
    )
    dist = F.levenshtein("pa", "pb")
    return (
        px.filter(dist <= 38)
        .select("doc_a", "doc_b", dist.cast("int").alias("edit_dist"))
    )


@query(
    "q130_unigram_logprob",
    f"""
    -- CCNet-style LM quality scoring, unigram core: fit token
    -- log-probs on the corpus itself (pass 1), score each document by
    -- mean negative log-likelihood (pass 2) — low-perplexity docs are
    -- "in-domain", high are noise. The real CCNet uses a pretrained
    -- 5-gram KenLM; the dataflow (broadcast-able LM table + one
    -- explode-join-agg pass) is identical, the model is data.
    WITH toks AS (
        SELECT doc_id, UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS w
        FROM documents
    ), vocab AS (
        SELECT w, COUNT(*) AS c FROM toks GROUP BY w
    ), tot AS (
        SELECT SUM(c) AS n FROM vocab
    ), lp AS (
        SELECT w, LN(c * 1.0 / n) AS lp FROM vocab CROSS JOIN tot
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           ROUND(AVG(-l.lp), 6) AS nll_r
    FROM toks t JOIN lp l USING (w)
    GROUP BY t.doc_id
    """,
)
def q130(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM perplexity scoring (the CCNet quality-filter shape):
    pass 1 fits token log-probs on the corpus (a groupBy over the
    exploded tokens — at scale this LM table is vocabulary-sized and
    broadcasts), pass 2 scores every document by mean negative
    log-likelihood with one explode + broadcast join + per-doc AVG.
    Production swaps the fitted table for a pretrained n-gram model
    (KenLM exported to rows) and adds OOV smoothing — the model is
    data, the dataflow is exactly this. 6dp rounding on the mean (the
    order-dependent-sum policy); token counts integer-exact."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(normalize_text("text"), " ")).alias("w")
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("n"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "w", F.log(F.col("c") * 1.0 / F.col("n")).alias("lp")
    )
    return (
        toks.join(F.broadcast(lp), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(-F.col("lp")), 6).alias("nll_r"),
        )
    )


@query(
    "q131_dsir_importance",
    f"""
    -- DSIR-style data selection (Xie et al. 2023, arXiv:2302.03169):
    -- score every document by its importance weight for a TARGET
    -- domain — sum over tokens of log(p_target / p_background) with
    -- add-one smoothing, unigram features. Target = the lang='en'
    -- slice, background = the whole corpus; documents whose token
    -- distribution looks target-like score high and get sampled into
    -- the training mix. Both distributions are vocabulary-sized
    -- tables fitted in one pass each and broadcast for the scoring
    -- join — the fit-then-score shape of importance resampling.
    WITH toks AS (
        SELECT doc_id, lang,
               UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS w
        FROM documents
    ), vocab AS (
        SELECT w,
               COUNT(*) AS c_bg,
               COUNT(*) FILTER (WHERE lang = 'en') AS c_tg
        FROM toks GROUP BY w
    ), tot AS (
        SELECT SUM(c_bg) AS n_bg, SUM(c_tg) AS n_tg,
               COUNT(*) AS v
        FROM vocab
    ), ratio AS (
        SELECT w,
               LN((c_tg + 1.0) / (n_tg + v)) - LN((c_bg + 1.0) / (n_bg + v))
                   AS llr
        FROM vocab CROSS JOIN tot
    )
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(SUM(r.llr), 6) AS importance_r,
           ROUND(SUM(r.llr), 6) > 0 AS target_like
    FROM toks t JOIN ratio r USING (w)
    GROUP BY t.doc_id
    """,
)
def q131(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights for domain-targeted data selection:
    fit unigram distributions for the target slice (lang='en') and
    the background corpus in ONE shared pass (conditional count
    aggregates), add-one smoothing, then score every document with
    sum(log p_target/p_background) via a broadcast join over the
    vocabulary-sized log-ratio table — the fit-then-score dataflow of
    importance resampling (production uses hashed n-gram buckets; the
    feature map is data, the plan is identical). target_like
    thresholds the 6dp-rounded weight at 0 for an engine-stable
    verdict column."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(normalize_text("text"), " ")).alias("w"),
    )
    vocab = toks.groupBy("w").agg(
        F.count(F.lit(1)).alias("c_bg"),
        F.count_if(F.col("lang") == "en").alias("c_tg"),
    )
    tot = vocab.agg(
        F.sum("c_bg").alias("n_bg"),
        F.sum("c_tg").alias("n_tg"),
        F.count(F.lit(1)).alias("v"),
    )
    ratio = vocab.crossJoin(F.broadcast(tot)).select(
        "w",
        (
            F.log((F.col("c_tg") + 1.0) / (F.col("n_tg") + F.col("v")))
            - F.log((F.col("c_bg") + 1.0) / (F.col("n_bg") + F.col("v")))
        ).alias("llr"),
    )
    imp = F.round(F.sum("llr"), 6)
    return (
        toks.join(F.broadcast(ratio), "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            imp.alias("importance_r"),
            (imp > 0).alias("target_like"),
        )
    )




# Winnowing fingerprint CTEs shared by q132/q133 — the SQL mirror of
# operators/textops.py::winnow_minima (3-gram md5, min over window-4,
# valid starts only). Defines toks/kg/winfp; winfp = (doc_id, i, wmin).
_WINNOW_CTES = f"""toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), kg AS (
        SELECT doc_id, i, LEN(t) - 2 AS n_kg,
               MD5(ARRAY_TO_STRING(t[i:i+2], ' ')) AS h
        FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t) - 1, 1))) AS r(i)
        WHERE LEN(t) >= 3
    ), winfp AS (
        SELECT doc_id, i, n_kg,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
        FROM kg
        QUALIFY i <= n_kg - 3
    )"""


@query(
    "q132_winnowing_fingerprints",
    f"""
    -- Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    -- SIGMOD 2003 — the MOSS algorithm): hash every 3-gram, slide a
    -- window of 4 consecutive k-gram hashes, keep each window's
    -- MINIMUM — guaranteeing any shared substring of >= 6 tokens
    -- contributes a shared fingerprint, with a bounded fingerprint
    -- density (the property plain MinHash lacks: winnowing is
    -- POSITION-local, so it catches partial overlap/containment, not
    -- just whole-document resemblance).
    WITH {_WINNOW_CTES}
    SELECT doc_id,
           CAST(MAX(n_kg) AS BIGINT) AS n_kgrams,
           CAST(COUNT(DISTINCT wmin) AS BIGINT) AS n_fingerprints,
           MIN(wmin) AS min_fp
    FROM winfp
    GROUP BY doc_id
    """,
)
def q132(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (the MOSS local-fingerprinting
    algorithm): 3-gram hashes, min over each sliding window of 4 —
    any shared >= 6-token substring between two documents shares a
    fingerprint, which is what makes winnowing catch PARTIAL overlap
    (quotation, containment) that whole-document MinHash resemblance
    misses; fingerprint density is bounded at ~2/(w+1). One
    posexplode + one bounded ROWS window per doc + one distinct
    aggregate — no self-joins; the window frame is 4 rows regardless
    of document length, so the plan is corpus-linear. Hashes are md5
    strings, min/distinct lexicographic — bit-exact across engines."""
    d = load(spark, sf_dir, "documents")
    return (
        X.winnow_minima(d)
        .groupBy("doc_id")
        .agg(
            F.max("n_kg").cast("bigint").alias("n_kgrams"),
            F.count_distinct("wmin").cast("bigint").alias("n_fingerprints"),
            F.min("wmin").alias("min_fp"),
        )
    )


@query(
    "q133_partial_overlap_pairs",
    f"""
    -- Partial-overlap detection: documents sharing winnowing
    -- fingerprints (q132's 3-gram/window-4 scheme) — the cross-doc
    -- join that turns local fingerprints into a containment/quotation
    -- detector, which whole-document resemblance (MinHash q35) and
    -- full-text hashing (q30) both miss. Stop-fingerprints (shared by
    -- > 20 docs — boilerplate) are dropped BEFORE the pair join, the
    -- same hot-key cap discipline as q34's max_df: the shuffle is
    -- bounded per fingerprint, never all-pairs.
    WITH {_WINNOW_CTES}, fp AS (
        SELECT DISTINCT doc_id, wmin FROM winfp
    ), keep_fp AS (
        SELECT wmin FROM fp GROUP BY wmin
        HAVING COUNT(*) BETWEEN 2 AND 20
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(COUNT(*) AS BIGINT) AS shared_fp
    FROM fp a
    JOIN keep_fp k ON a.wmin = k.wmin
    JOIN fp b ON b.wmin = a.wmin AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 3
    """,
)
def q133(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document partial-overlap pairs: q132's winnowing
    fingerprints joined across documents — two docs sharing >= 3
    fingerprints share (with winnowing's guarantee) multiple >=
    6-token substrings: quotation/containment detection that neither
    whole-doc resemblance (q35) nor exact hashing (q30) provides.
    Scale shape: distinct (doc, fingerprint) pairs, stop-fingerprints
    (in > 20 docs: boilerplate) dropped before the fingerprint-keyed
    self-join — bounded bucket sizes, the q34 max_df discipline, never
    the n^2 doc-pair space."""
    d = load(spark, sf_dir, "documents")
    # the winnowing subtree (tokenize + rolling windows + distinct)
    # feeds THREE consumers — the stop-fingerprint aggregate and both
    # self-join sides — and re-executed per branch without a barrier
    # (the b96566e multi-consumer discipline; eager because the
    # self-join's two scans race within one job)
    fp = (
        X.winnow_minima(d)
        .select("doc_id", "wmin")
        .distinct()
        .localCheckpoint(eager=True)
    )
    keep = (
        fp.groupBy("wmin")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= 20))
        .select("wmin")
    )
    fpk = fp.join(F.broadcast(keep), "wmin")
    a = fpk.alias("a")
    b = fpk.alias("b")
    return (
        a.join(b, on="wmin")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared_fp"))
        .filter(F.col("shared_fp") >= 3)
    )


@query(
    "q134_cdc_chunking",
    f"""
    -- Content-defined chunking (LBFS/rsync-style): a chunk boundary
    -- opens wherever the hash of the rolling 3-gram ending at a token
    -- falls in a 1/16 class (hex prefix '0') — so chunk identity is a
    -- function of CONTENT, not position: an insertion early in a doc
    -- shifts q111's fixed windows at every later offset but leaves
    -- all CDC chunks after the next boundary byte-identical (the
    -- property dedup storage and training-data caches rely on).
    -- Expected chunk length = 16 tokens.
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), tk AS (
        SELECT doc_id, i, t[i] AS w,
               CASE WHEN i >= 3 AND SUBSTR(MD5(
                        ARRAY_TO_STRING(t[i-2:i], ' ')), 1, 1) = '0'
                    THEN 1 ELSE 0 END AS b
        FROM toks, UNNEST(RANGE(1, LEN(t) + 1)) AS r(i)
        WHERE LEN(t) >= 1
    ), chunked AS (
        SELECT doc_id, i, w,
               SUM(b) OVER (PARTITION BY doc_id ORDER BY i) AS cid
        FROM tk
    )
    SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           MD5(STRING_AGG(w, ' ' ORDER BY i)) AS chunk_md5
    FROM chunked
    GROUP BY doc_id, cid
    """,
)
def q134(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking: boundaries where the rolling 3-gram
    hash lands in a 1/16 class (expected 16-token chunks) — chunk
    identity depends on content alone, so edits only perturb chunks
    up to the next boundary while q111's fixed windows shift at every
    later offset (the invariance dedup storage, embedding caches and
    incremental re-tokenization rely on). One posexplode + one
    per-doc running-sum window + one grouped md5 — corpus-linear, no
    joins; chunk text is identified by md5 so the oracle compares
    byte-exact without duplicating corpus text."""
    d = load(spark, sf_dir, "documents")
    return X.cdc_chunks(d, "text", "doc_id")


@query(
    "q135_ewma_fold",
    """
    -- Per-user EWMA (alpha = 0.5) over time-ordered event values — an
    -- ordered stateful FOLD expressed as a pure engine op on both
    -- sides: Spark aggregate() over the sorted value array, DuckDB
    -- list_reduce over LIST(... ORDER BY ...). Identical sequential
    -- double arithmetic in identical order -> bit-exact without any
    -- rounding policy (0.5*x is an exponent shift; the adds happen in
    -- the same sequence). Rounded to 6dp in the OUTPUT only, as a
    -- defensive final cast.
    WITH ordered AS (
        SELECT user_id,
               LIST(value ORDER BY ts ASC, event_id ASC) AS vals
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(LEN(vals) AS BIGINT) AS n_events,
           ROUND(LIST_REDUCE(vals, (acc, x) -> acc * 0.5 + x * 0.5), 6)
               AS ewma_r
    FROM ordered
    """,
)
def q135(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered stateful fold without leaving the engine: per-user
    exponentially-weighted moving average (alpha=0.5) over
    time-ordered values — collect_list + array_sort gives the
    deterministic sequence (ties broken by event_id), then a single
    sequential aggregate() fold. This is the batch twin of the
    streaming applyInPandasWithState sessionizer (q70): same
    per-key-ordered-state semantics, but JVM higher-order functions,
    no Python workers, one shuffle on user_id. Both engines run the
    identical double operations in the identical order, so the fold
    is bit-exact BEFORE the defensive 6dp output rounding."""
    e = load(spark, sf_dir, "events")
    ordered = (
        e.groupBy("user_id")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(ts, event_id, value))),"
                " x -> x.value)"
            ).alias("vals")
        )
    )
    fold = F.expr(
        "aggregate(slice(vals, 2, size(vals) - 1), vals[0],"
        " (acc, x) -> acc * 0.5D + x * 0.5D)"
    )
    return ordered.select(
        "user_id",
        F.size("vals").cast("bigint").alias("n_events"),
        F.round(fold, 6).alias("ewma_r"),
    )


@query(
    "q136_maxsim_late_interaction",
    f"""
    -- Late-interaction (ColBERT-style) retrieval: treat each 64-dim
    -- embedding as FOUR 16-dim "token vectors" (the q115 sub-slice
    -- scheme) and score doc D for query Q by MaxSim =
    -- sum over query subvectors of max over doc subvectors of cosine
    -- — the multi-vector scoring that beats single-vector dot
    -- products on fine-grained relevance, as one relational plan:
    -- explode subvectors, one broadcast of the 4 query slices, a
    -- (vec, query-slice) MAX group, a per-vec SUM, top-20.
    WITH q AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
    ), qsub AS (
        SELECT mq, (SELECT qv FROM q)[1 + 16 * mq : 16 + 16 * mq] AS qs
        FROM UNNEST([0, 1, 2, 3]) AS v(mq)
    ), dsub AS (
        SELECT e.vec_id, u.m, e.embedding[1 + 16 * u.m : 16 + 16 * u.m] AS ds
        FROM embeddings e, UNNEST([0, 1, 2, 3]) AS u(m)
        WHERE e.vec_id <> 0
    ), best AS (
        SELECT d.vec_id, s.mq,
               MAX({_COS_QC.format(a='s.qs', b='d.ds')}) AS b
        FROM dsub d CROSS JOIN qsub s
        GROUP BY d.vec_id, s.mq
    ), scored AS (
        SELECT vec_id, ROUND(SUM(b), 6) AS maxsim_r
        FROM best GROUP BY vec_id
    )
    SELECT vec_id, maxsim_r,
           CAST(ROW_NUMBER() OVER (ORDER BY maxsim_r DESC, vec_id ASC) AS INT)
               AS rank
    FROM scored QUALIFY rank <= 20
    """,
)
def q136(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-vector late-interaction scoring (the ColBERT MaxSim
    shape): each embedding is sliced into four 16-dim subvectors
    (q115's scheme standing in for per-token vectors — the real thing
    stores array<array<float>>; the plan is identical), the query's
    four slices broadcast, and MaxSim computed as max-per-query-slice
    then sum — one explode + broadcast join + two map-side-combinable
    aggregations, no windows over the corpus. Ranking on the
    6dp-rounded sum (4-term double sum policy), ties to smaller id;
    the top-20 rank index is driver-built over the collected rows
    (q124's warning-free pattern)."""
    from pyspark.sql import types as T

    e = load(spark, sf_dir, "embeddings")
    qv = anchor_embedding(e, 0)
    qsubs = [
        F.array(*[F.lit(float(x)) for x in qv[16 * m : 16 * (m + 1)]])
        for m in range(4)
    ]
    dsub = e.filter(F.col("vec_id") != 0).select(
        "vec_id",
        F.explode(F.array(*[F.lit(m) for m in range(4)])).alias("m"),
        "embedding",
    ).select(
        "vec_id", "m", F.expr("slice(embedding, 1 + 16 * m, 16)").alias("ds")
    )
    per_q = None
    for mq in range(4):
        s = dsub.select(
            "vec_id",
            F.lit(mq).alias("mq"),
            cosine(F.col("ds"), qsubs[mq]).alias("c"),
        )
        per_q = s if per_q is None else per_q.unionByName(s)
    scored = (
        per_q.groupBy("vec_id", "mq")
        .agg(F.max("c").alias("b"))
        .groupBy("vec_id")
        .agg(F.round(F.sum("b"), 6).alias("maxsim_r"))
    )
    top = scored.orderBy(
        F.col("maxsim_r").desc(), F.col("vec_id").asc()
    ).limit(20).collect()
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("maxsim_r", T.DoubleType(), False),
            T.StructField("rank", T.IntegerType(), False),
        ]
    )
    return spark.createDataFrame(
        [(int(r["vec_id"]), float(r["maxsim_r"]), i + 1) for i, r in enumerate(top)],
        out_schema,
    )


def _repetition_signal_frame(t: "DataFrame", barrier: bool = False):
    """Shared Gopher repetition-signal machinery for q137 and the q148
    pipeline (one definition, so a threshold or signal change cannot
    silently drift the composite from its component query — the
    pytest invariant n_in == q137 keep count depends on this).
    ``t`` must carry (doc_id, norm, t) plus any passthrough columns.
    Returns (frame, dup_word, dup_tri, top_frac): the frame adds
    n_tokens/n_distinct/n_tri/n_tri_distinct and the left-joined
    modal-bigram columns; the three expressions are the 6dp-rounded
    signals.

    ``barrier=True`` materializes ``t`` once (localCheckpoint) before
    the two consumers (per-row signals, bigram explode). Worth it only
    when the caller layers MORE consumers on the same tokenization
    downstream (q148's fused pipeline: measured 7.1s -> 5.1s at
    sf0.1); for the standalone q137 the store+reload of the token
    arrays costs more than the second tokenize (measured ~par), so it
    defaults off.

    Callers spread the RAW text rows (scan_parallel on the scan,
    below the normalize/tokenize projection): the exchange then
    carries narrow (id, text) rows and the regex-heavy tokenize runs
    on every core, instead of shipping (norm, token-array) rows that
    were tokenized by the scan's single task (guide §2.3)."""
    if barrier:
        t = t.localCheckpoint(eager=False)
    base = (
        t.withColumn("n_tokens", F.size("t").cast("bigint"))
        .withColumn("n_distinct", F.size(F.array_distinct("t")).cast("bigint"))
        .withColumn(
            "n_tri", F.size(shingles_from_tokens(F.col("t"), 3)).cast("bigint")
        )
        .withColumn(
            "n_tri_distinct",
            F.size(F.array_distinct(shingles_from_tokens(F.col("t"), 3)))
            .cast("bigint"),
        )
    )
    bg = (
        t.select(
            "doc_id",
            F.explode(shingles_from_tokens(F.col("t"), 2)).alias("bigram"),
        )
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # modal bigram via min(struct(-cnt, bigram)) — the argmin trick
    # gives (highest count, then lexicographically smallest bigram)
    # as ONE partial-aggregable hash aggregate; the previous
    # row_number() formulation needed a per-doc sort window (an extra
    # shuffle + sort) for the same deterministic result
    topbg = bg.groupBy("doc_id").agg(
        F.min(
            F.struct(
                (-F.col("cnt")).alias("negcnt"),
                F.col("bigram").alias("bigram"),
                F.col("cnt").alias("cnt"),
            )
        ).alias("m")
    ).select(
        "doc_id", F.col("m.bigram").alias("bigram"), F.col("m.cnt").alias("cnt")
    )
    j = base.join(topbg, "doc_id", "left")
    dup_word = F.round(
        F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
            (F.col("n_tokens") - F.col("n_distinct")) / F.col("n_tokens")
        ),
        6,
    )
    dup_tri = F.round(
        F.when(F.col("n_tri") == 0, F.lit(0.0)).otherwise(
            (F.col("n_tri") - F.col("n_tri_distinct")) / F.col("n_tri")
        ),
        6,
    )
    top_frac = F.round(
        F.when(F.length("norm") == 0, F.lit(0.0)).otherwise(
            F.coalesce(F.col("cnt") * F.length("bigram"), F.lit(0)).cast("double")
            / F.length("norm")
        ),
        6,
    )
    return j, dup_word, dup_tri, top_frac


# Gopher-style keep thresholds on the 6dp-rounded signals (Rae et al.
# 2021 Table A1 spirit): ONE definition shared by q137 and q148.
def _repetition_keep(dup_word, dup_tri, top_frac):
    return (dup_word <= 0.5) & (dup_tri <= 0.3) & (top_frac <= 0.18)


@query(
    "q137_repetition_filters",
    f"""
    -- Gopher-style repetition quality signals (Rae et al. 2021 §A1.1,
    -- the filters every web-scale LLM corpus applies): per document,
    -- the fraction of duplicate word occurrences, the fraction of
    -- duplicate 3-gram occurrences, and the fraction of characters
    -- covered by the most frequent word 2-gram; a doc is kept when
    -- all three are under the published-style thresholds. The word
    -- and 3-gram signals are pure per-row array arithmetic; only the
    -- top-2-gram mode needs a (doc, bigram) count.
    WITH toks AS (
        SELECT doc_id, {_NORM_SQL.format(c='text')} AS norm,
               STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), base AS (
        SELECT doc_id, norm, t,
               CAST(LEN(t) AS BIGINT) AS n_tokens,
               CAST(LEN(LIST_DISTINCT(t)) AS BIGINT) AS n_distinct
        FROM toks
    ), tri AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tri,
               CAST(COUNT(DISTINCT ARRAY_TO_STRING(t[i - 2 : i], ' '))
                    AS BIGINT) AS n_tri_distinct
        FROM toks, UNNEST(RANGE(3, LEN(t) + 1)) AS r(i)
        GROUP BY doc_id
    ), bg AS (
        SELECT doc_id, ARRAY_TO_STRING(t[i : i + 1], ' ') AS bigram,
               COUNT(*) AS cnt
        FROM toks, UNNEST(RANGE(1, LEN(t))) AS r(i)
        GROUP BY doc_id, ARRAY_TO_STRING(t[i : i + 1], ' ')
    ), topbg AS (
        SELECT doc_id, bigram, cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, bigram ASC) AS rn
        FROM bg
    )
    SELECT b.doc_id, b.n_tokens,
           ROUND(CASE WHEN b.n_tokens = 0 THEN 0.0
                 ELSE (b.n_tokens - b.n_distinct) * 1.0 / b.n_tokens END,
                 6) AS dup_word_frac,
           ROUND(CASE WHEN COALESCE(tri.n_tri, 0) = 0 THEN 0.0
                 ELSE (tri.n_tri - tri.n_tri_distinct) * 1.0 / tri.n_tri END,
                 6) AS dup_trigram_frac,
           g.bigram AS top_bigram,
           ROUND(CASE WHEN LEN(b.norm) = 0 THEN 0.0
                 ELSE COALESCE(g.cnt * LEN(g.bigram), 0) * 1.0
                      / LEN(b.norm) END, 6) AS top_bigram_frac,
           CAST(CASE WHEN
                ROUND(CASE WHEN b.n_tokens = 0 THEN 0.0
                      ELSE (b.n_tokens - b.n_distinct) * 1.0 / b.n_tokens END,
                      6) <= 0.5
                AND ROUND(CASE WHEN COALESCE(tri.n_tri, 0) = 0 THEN 0.0
                      ELSE (tri.n_tri - tri.n_tri_distinct) * 1.0
                           / tri.n_tri END, 6) <= 0.3
                AND ROUND(CASE WHEN LEN(b.norm) = 0 THEN 0.0
                      ELSE COALESCE(g.cnt * LEN(g.bigram), 0) * 1.0
                           / LEN(b.norm) END, 6) <= 0.18
                THEN 1 ELSE 0 END AS INT) AS keep
    FROM base b
    LEFT JOIN tri ON tri.doc_id = b.doc_id
    LEFT JOIN topbg g ON g.doc_id = b.doc_id AND g.rn = 1
    """,
)
def q137(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021, Table A1): the
    three repetition signals production corpora filter on —
    duplicate-word fraction (1 - distinct/total tokens),
    duplicate-3-gram fraction, and the character fraction covered by
    the modal word 2-gram — plus the keep decision at Gopher-style
    thresholds (0.5 / 0.3 / 0.18 on the 6dp-rounded signals, so the
    comparison can't straddle float noise).

    Scale shape: the word and 3-gram signals are PER-ROW array
    expressions (size/array_distinct over the token array — no
    shuffle, map-only, document-length-bounded); only the modal
    bigram needs state, and that is one (doc_id, bigram) hash
    aggregate with map-side combine followed by a doc_id-partitioned
    row_number — never a corpus-global window. All ratios are exact
    integer-over-integer doubles, identical IEEE results both
    engines, rounded 6dp per the float policy."""
    # spread the RAW rows so normalize+tokenize runs on every core
    # (structural no-op on multi-file inputs)
    d = scan_parallel(load(spark, sf_dir, "documents"))
    t = d.select(
        "doc_id",
        normalize_text("text").alias("norm"),
        tokens("text").alias("t"),
    )
    j, dup_word, dup_tri, top_frac = _repetition_signal_frame(t)
    return j.select(
        "doc_id",
        "n_tokens",
        dup_word.alias("dup_word_frac"),
        dup_tri.alias("dup_trigram_frac"),
        F.col("bigram").alias("top_bigram"),
        top_frac.alias("top_bigram_frac"),
        _repetition_keep(dup_word, dup_tri, top_frac).cast("int").alias("keep"),
    )


@query(
    "q138_setsim_prefix_join",
    f"""
    -- EXACT Jaccard >= 3/5 similarity join over 3-gram shingle sets.
    -- The oracle computes the full exact answer directly (shared-
    -- shingle join + per-doc set sizes + integer-rational threshold);
    -- the Spark side must produce the IDENTICAL set through prefix
    -- filtering — which is what makes this a correctness check of the
    -- pruning's losslessness, not just of the arithmetic.
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS tk
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, ARRAY_TO_STRING(tk[i : i + 2], ' ') AS s
        FROM toks, UNNEST(RANGE(1, LEN(tk) - 1)) AS r(i)
        WHERE LEN(tk) >= 3
    ), sz AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT p.doc_a, p.doc_b,
           CAST(p.inter AS BIGINT) AS inter,
           CAST(sa.n + sb.n - p.inter AS BIGINT) AS un,
           ROUND(p.inter * 1.0 / (sa.n + sb.n - p.inter), 6) AS jacc_r
    FROM pairs p
    JOIN sz sa ON sa.doc_id = p.doc_a
    JOIN sz sb ON sb.doc_id = p.doc_b
    WHERE p.inter * 5 >= (sa.n + sb.n - p.inter) * 3
    """,
)
def q138(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity join with lossless prefix filtering
    (PPJoin/AllPairs, Xiao et al. WWW'08): every document pair whose
    3-gram shingle sets have Jaccard >= 0.6 — the EXACT-answer
    alternative to MinHash-LSH (q35/q116) when a dedup keep-set must
    be reproducible and recall-complete. The Spark plan orders each
    doc's shingles by global document frequency (rarest first), joins
    only on each doc's first |d| - ceil(0.6|d|) + 1 shingles
    (provably lossless for J >= 0.6), then exactly verifies the
    candidate-bounded pair set; the DuckDB oracle computes the
    unpruned exact answer, so a hash match PROVES the pruning dropped
    nothing on this corpus. Threshold and prefix length are exact
    integer arithmetic (3/5 rational, integer ceil) — no float
    boundary. See operators/dedup.py::setsim_prefix_join for the
    100 TB shape argument (skew-inverted join keys, candidate-bounded
    verify)."""
    d = load(spark, sf_dir, "documents")
    return D.setsim_prefix_join(d, "text", "doc_id", n=3, t_num=3, t_den=5)


@query(
    "q139_temperature_mixture",
    """
    -- Temperature-based mixture reweighting (the multilingual /
    -- multi-source sampling scheme of mC4 / XLM-R: group weight
    -- proportional to n^alpha, alpha = 0.5, flattening the source
    -- distribution so head groups stop drowning tail groups), with a
    -- deterministic LCG-hash coin deciding each doc. Float policy:
    -- sqrt is IEEE-correctly-rounded in both engines; the per-group
    -- weights are rounded to 6dp and summed EXACTLY in decimal (the
    -- only order-dependent step), then every downstream ratio is a
    -- single-expression double computation identical on both sides.
    WITH g AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(ROUND(SQRT(COUNT(*)), 6) AS DECIMAL(27,6)) AS w
        FROM documents GROUP BY lang, source
    ), t AS (
        SELECT CAST(SUM(w) AS DOUBLE) AS wsum,
               CAST(SUM(n_docs) AS DOUBLE) AS total FROM g
    ), rates AS (
        SELECT g.lang, g.source, g.n_docs,
               LEAST(1.0, ((CAST(g.w AS DOUBLE) / t.wsum)
                           * (t.total * 0.5)) / g.n_docs) AS rate
        FROM g, t
    )
    SELECT r.lang, r.source, r.n_docs,
           ROUND(r.rate, 6) AS rate_r,
           CAST(COUNT_IF((((d.doc_id % 2147483648) * 1103515245 + 12345) % 2147483648)
                         % 1000000
                         < CAST(FLOOR(r.rate * 1000000) AS BIGINT))
                AS BIGINT) AS n_kept
    FROM rates r JOIN documents d
      ON d.lang = r.lang AND d.source = r.source
    GROUP BY r.lang, r.source, r.n_docs, r.rate
    """,
)
def q139(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-sampled data mixture (mC4/XLM-R style): per
    (lang, source) group, sampling weight proportional to n^0.5 —
    the alpha-temperature flattening every multilingual/multi-source
    pre-training mix applies — normalized into per-group keep rates
    against a half-corpus budget, each document decided by the
    reproducible q89 LCG id-hash coin (never rand()).

    Scale shape: one map-side-combinable group count (the groups
    table is dims-sized), the 1-row weight total joined back by
    broadcast-cross (never a corpus window), and one broadcast join
    of the per-group rate onto the corpus with a shuffle-free filter
    + re-aggregate. Determinism: the only order-dependent float step
    (summing group weights) is done in exact decimal on 6dp-rounded
    sqrt weights; every later ratio is single-expression double
    arithmetic, bitwise-identical across engines; the keep threshold
    is an explicit floor compared as integers."""
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.sqrt(F.count(F.lit(1))), 6)
        .cast("decimal(27,6)")
        .alias("w"),
    )
    t = g.agg(
        F.sum("w").cast("double").alias("wsum"),
        F.sum("n_docs").cast("double").alias("total"),
    )
    rates = g.crossJoin(F.broadcast(t)).select(
        "lang",
        "source",
        "n_docs",
        F.least(
            F.lit(1.0),
            ((F.col("w").cast("double") / F.col("wsum"))
             * (F.col("total") * F.lit(0.5)))
            / F.col("n_docs"),
        ).alias("rate"),
    )
    # NOTE on the final `% 1000000`: 2^31 is not a multiple of 1e6, so
    # the coin carries a tiny modulo bias (~2147/2148 extra mass on the
    # low residues) — realized keep rates sit a hair ABOVE nominal.
    # Deterministic and engine-identical (the oracle repeats the same
    # expression), so cross-engine equality is unaffected; stated here
    # so baseline-drift analysis doesn't misattribute it. Comparing
    # `lcg < floor(rate * 2^31)` directly would remove the bias at the
    # cost of re-anchoring every kept-set golden.
    coin = (((F.col("doc_id") % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000000
    kept = (
        d.join(F.broadcast(rates), ["lang", "source"])
        .groupBy("lang", "source", "n_docs", "rate")
        .agg(
            F.count_if(
                coin < F.floor(F.col("rate") * 1000000).cast("bigint")
            )
            .cast("bigint")
            .alias("n_kept")
        )
    )
    return kept.select(
        "lang",
        "source",
        "n_docs",
        F.round("rate", 6).alias("rate_r"),
        "n_kept",
    )


@query(
    "q140_hard_negative_mining",
    f"""
    -- Hard-negative mining for contrastive training (DPR / SimCSE
    -- recipe): for each query vector, the top-5 most-similar corpus
    -- vectors with a DIFFERENT label — "hard" because they are
    -- near-positives the model must learn to push apart; same-label
    -- rows are excluded as presumed positives. Queries are the 8
    -- smallest vec_ids (deterministic anchor set).
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS qv, label AS q_label
        FROM embeddings WHERE vec_id < 8
    ), scored AS (
        SELECT q.q_id, e.vec_id AS neg_id, e.label,
               ROUND({_COS_QC.format(a='q.qv', b='e.embedding')}, 6) AS cos_r
        FROM q JOIN embeddings e
          ON e.label <> q.q_label AND e.vec_id <> q.q_id
    )
    SELECT q_id, neg_id, label, cos_r,
           CAST(rnk AS INT) AS rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY q_id ORDER BY cos_r DESC, neg_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 5
    """,
)
def q140(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (the DPR/SimCSE contrastive-training
    retrieval shape): for each of 8 anchor queries, the top-5
    highest-cosine corpus vectors carrying a DIFFERENT label —
    near-positives the loss must separate; same-label vectors are
    excluded as presumed positives via a theta-join predicate.

    Scale shape: the 8-row query side is broadcast (one corpus pass,
    no shuffle of the corpus); ranking is a window partitioned BY
    QUERY (8 bounded partitions, never a corpus-global window); ties
    broken (cos_r DESC, neg_id ASC) on the 6dp-rounded score per the
    float policy. At real scale the anchor set is thousands of
    training queries — same plan, more broadcast rows, or the
    IVF-bucketed variant (q68) when the anchor side outgrows
    broadcast."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("q_label"),
    )
    scored = (
        e.join(
            F.broadcast(q),
            (F.col("label") != F.col("q_label"))
            & (F.col("vec_id") != F.col("q_id")),
        )
        .select(
            "q_id",
            F.col("vec_id").alias("neg_id"),
            "label",
            F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cos_r"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos_r").desc(), F.col("neg_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("q_id", "neg_id", "label", "cos_r", "rank")
    )


@query(
    "q141_exactsubstr_coverage",
    f"""
    -- ExactSubstr-style duplicate-span coverage (Lee et al. 2022,
    -- "Deduplicating Training Data Makes LMs Better"): for every
    -- position whose 8-token gram also appears in ANOTHER document,
    -- mark tokens [i, i+7] duplicated; per doc, report the union
    -- length of those spans. Equal-length intervals make the union
    -- exact with one lead() window: each marked position contributes
    -- min(8, next_start - start), the last contributes 8.
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), grams AS (
        SELECT doc_id, i, MD5(ARRAY_TO_STRING(t[i : i + 7], ' ')) AS g
        FROM toks, UNNEST(RANGE(1, LEN(t) - 6)) AS r(i)
        WHERE LEN(t) >= 8
    ), dupg AS (
        SELECT g FROM grams GROUP BY g
        HAVING COUNT(DISTINCT doc_id) > 1
    ), marked AS (
        SELECT gr.doc_id, gr.i,
               LEAD(gr.i) OVER (PARTITION BY gr.doc_id ORDER BY gr.i) AS nxt
        FROM grams gr JOIN dupg ON dupg.g = gr.g
    ), cov AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS dup_positions,
               CAST(SUM(CASE WHEN nxt IS NULL THEN 8
                        ELSE LEAST(8, nxt - i) END) AS BIGINT) AS covered
        FROM marked GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(LEN(b.t) AS BIGINT) AS n_tokens,
           COALESCE(c.dup_positions, 0) AS dup_positions,
           COALESCE(c.covered, 0) AS covered_tokens,
           ROUND(COALESCE(c.covered, 0) * 1.0 / LEN(b.t), 6) AS coverage_frac
    FROM toks b LEFT JOIN cov c ON c.doc_id = b.doc_id
    """,
)
def q141(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document exact-substring duplication coverage (the
    ExactSubstr dedup statistic of Lee et al. 2022): a position is
    duplicated when its 8-token gram occurs in at least one OTHER
    document; the per-doc output is the exact union length of the
    8-token spans those positions open — the quantity ExactSubstr
    dedup cuts out of training data. (Winnowing q132/q133 detects
    such overlap probabilistically with sampled fingerprints; this is
    the exact accounting at a fixed gram length.)

    Scale shape: grams are md5-hashed BEFORE the df aggregate (the
    shuffle carries 32-byte keys, never 8-word strings), the
    duplicated-gram set is a grams-keyed aggregate (map-side
    combinable count-distinct over doc_id, bounded by 2 via an early
    HAVING), the position join is gram-keyed, and the interval union
    is ONE lead() window partitioned per document — equal-length
    intervals make that exact, no sweep-line needed. Suffix arrays
    (the paper's single-node tool) don't distribute; the gram-join
    formulation is how this is run at corpus scale."""
    # spread the RAW text rows (narrow) so tokenize + the 8-gram
    # explode run on every core; exactsubstr_grams itself never
    # shuffles the token arrays (no-op on multi-file inputs)
    d = scan_parallel(load(spark, sf_dir, "documents"))
    toks = d.select("doc_id", tokens("text").alias("t"))
    grams = D.exactsubstr_grams(toks).localCheckpoint(eager=False)
    dupg = D.cross_doc_dup_grams(grams)
    marked = grams.join(dupg, "g").select("doc_id", "i")
    w = Window.partitionBy("doc_id").orderBy("i")
    cov = (
        marked.withColumn("nxt", F.lead("i").over(w))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("dup_positions"),
            F.sum(
                F.when(F.col("nxt").isNull(), F.lit(8)).otherwise(
                    F.least(F.lit(8), F.col("nxt") - F.col("i"))
                )
            )
            .cast("bigint")
            .alias("covered"),
        )
    )
    return (
        toks.join(cov, "doc_id", "left")
        .select(
            "doc_id",
            F.size("t").cast("bigint").alias("n_tokens"),
            F.coalesce("dup_positions", F.lit(0)).alias("dup_positions"),
            F.coalesce("covered", F.lit(0)).alias("covered_tokens"),
            F.round(
                F.coalesce("covered", F.lit(0)) * F.lit(1.0) / F.size("t"), 6
            ).alias("coverage_frac"),
        )
    )


@query(
    "q142_countmin_sketch",
    f"""
    -- Count-min sketch construction + query, exactly reproduced:
    -- 4 salted hash rows x 256 buckets (bucket key = first two hex
    -- chars of md5 — compared as STRINGS, no hex->int parsing, the
    -- q119 cross-engine rule). The sketch is built as ONE grouped
    -- aggregate; each probe token's estimate is the min over its 4
    -- cells; the oracle rebuilds the identical sketch, so the gate
    -- checks the sketch CONSTRUCTION, and the exact join checks the
    -- CMS guarantee est >= exact.
    WITH tok AS (
        SELECT UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS w
        FROM documents
    ), tokf AS (
        SELECT w FROM tok WHERE LENGTH(w) > 0
    ), cells AS (
        SELECT r.i AS row_id, SUBSTR(MD5('cms' || r.i || ':' || w), 1, 2) AS b,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM tokf, UNNEST([0, 1, 2, 3]) AS r(i)
        GROUP BY r.i, SUBSTR(MD5('cms' || r.i || ':' || w), 1, 2)
    ), exact AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM tokf GROUP BY w
        ORDER BY n DESC, w ASC LIMIT 20
    )
    SELECT e.w AS token, e.n AS exact_count,
           MIN(c.cnt) AS cms_estimate,
           CAST(MIN(c.cnt) >= e.n AS INT) AS no_undercount
    FROM exact e
    JOIN cells c
      ON c.b = SUBSTR(MD5('cms' || c.row_id || ':' || e.w), 1, 2)
    GROUP BY e.w, e.n
    """,
)
def q142(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters (Cormode & Muthukrishnan): the
    mergeable frequency sketch streaming/distributed pipelines use
    when exact token counts don't fit — built here as one grouped
    aggregate over (hash row, bucket) with 4 salted md5 rows x 256
    hex-prefix buckets, then queried for the exact top-20 tokens with
    estimate = min over the 4 cells. The oracle rebuilds the sketch
    cell-for-cell (deterministic construction — this is what makes an
    approximate structure oracle-checkable), and the exact-count join
    verifies the one-sided CMS guarantee (never undercounts).

    Scale shape: the sketch build is a 1024-key hash aggregate with
    map-side combine — each executor combines locally into its own
    1024 counters and ships ONE sketch-sized partial regardless of
    corpus size (the textbook mergeable-sketch property, same class
    as approx_count_distinct's HLL at q62); bucket ids stay hex
    STRINGS end-to-end (engines disagree on hex->int parsing). The
    top-20 probe side is corpus-derived here for self-containment; at
    100 TB the probe set is a fixed keyword list and the exact
    groupBy disappears."""
    d = load(spark, sf_dir, "documents")
    tok = (
        d.select(F.explode(tokens("text")).alias("w"))
        .filter(F.length("w") > 0)
    )
    tok = tok.localCheckpoint(eager=False)
    cells = (
        tok.select(
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("row_id"),
            F.col("w"),
        )
        .select(
            "row_id",
            F.substring(
                F.md5(F.concat(F.lit("cms"), F.col("row_id"), F.lit(":"), F.col("w"))),
                1,
                2,
            ).alias("b"),
        )
        .groupBy("row_id", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    exact = (
        tok.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(20)
    )
    probe = exact.select(
        F.col("w").alias("token"),
        F.col("n").alias("exact_count"),
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("row_id"),
    ).withColumn(
        "b",
        F.substring(
            F.md5(F.concat(F.lit("cms"), F.col("row_id"), F.lit(":"), F.col("token"))),
            1,
            2,
        ),
    )
    return (
        probe.join(F.broadcast(cells), ["row_id", "b"])
        .groupBy("token", "exact_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .select(
            "token",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_count"))
            .cast("int")
            .alias("no_undercount"),
        )
    )


@query(
    "q143_mmr_rerank",
    f"""
    -- Maximal Marginal Relevance (Carbonell & Goldstein 1998): the
    -- RAG-stack diversification re-ranker. Candidates = top-16 by
    -- cosine to the query; then greedily select 8, each step picking
    -- argmax of 0.7*rel - 0.3*max-sim-to-already-selected (ties to
    -- the smaller vec_id). The greedy recurrence runs as a RECURSIVE
    -- CTE carrying the selected list; every similarity is rounded to
    -- 6dp BEFORE the greedy so both engines take identical branches.
    WITH RECURSIVE q AS (
        SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
    ), cand AS (
        SELECT vec_id, embedding,
               ROUND({_COS_QC.format(a='(SELECT qv FROM q)', b='embedding')},
                     6) AS rel_r
        FROM embeddings WHERE vec_id <> 0
        ORDER BY rel_r DESC, vec_id ASC LIMIT 16
    ), sims AS (
        SELECT a.vec_id AS a, b.vec_id AS b,
               ROUND({_COS_QC.format(a='a.embedding', b='b.embedding')},
                     6) AS sim_r
        FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ), sel AS (
        SELECT 1 AS step,
               [(SELECT vec_id FROM cand
                 ORDER BY rel_r DESC, vec_id ASC LIMIT 1)] AS picks
        UNION ALL
        SELECT step + 1,
               LIST_APPEND(picks, (
                   SELECT c.vec_id FROM cand c
                   WHERE NOT LIST_CONTAINS(picks, c.vec_id)
                   ORDER BY 0.7 * c.rel_r - 0.3 * COALESCE(
                            (SELECT MAX(s.sim_r) FROM sims s
                             WHERE s.a = c.vec_id
                               AND LIST_CONTAINS(picks, s.b)), 0.0) DESC,
                            c.vec_id ASC
                   LIMIT 1))
        FROM sel WHERE step < 8
    ), final AS (
        SELECT picks FROM sel WHERE step = 8
    )
    SELECT picks[i] AS vec_id, CAST(i AS INT) AS sel_rank, c.rel_r
    FROM final, UNNEST(RANGE(1, 9)) AS r(i)
    JOIN cand c ON c.vec_id = picks[i]
    """,
)
def q143(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified re-ranking (Carbonell & Goldstein 1998), the
    standard RAG diversification pass: take the top-16 cosine
    candidates for the query, then greedily emit 8 results maximizing
    0.7*relevance - 0.3*redundancy (max similarity to anything
    already selected), ties to the smaller id.

    Scale shape: relevance is ONE broadcast-query corpus pass (the
    q32 brute-force shape, or q68's IVF at scale); the greedy
    recurrence is inherently sequential but runs over only k
    candidates — 16 rows of driver-side metadata (the q136
    precedent), with the 16x16 similarity matrix computed as Spark
    expressions so the driver loop does arithmetic on the SAME
    6dp-rounded doubles the oracle's recursive CTE sees. Candidate
    count, not corpus size, bounds the sequential part — which is why
    MMR deployments re-rank top-k, never the corpus."""
    from pyspark.sql import types as T

    e = load(spark, sf_dir, "embeddings")
    # one parsed literal instead of 64 per-element F.lit py4j calls
    # (the _json_arr_lit discipline; identical double values)
    qv = S._json_arr_lit(
        [float(x) for x in anchor_embedding(e, 0)], "double"
    )
    cand_df = (
        e.filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            "embedding",
            F.round(cosine(qv, F.col("embedding")), 6).alias("rel_r"),
        )
        .orderBy(F.col("rel_r").desc(), F.col("vec_id").asc())
        .limit(16)
        # pinned: the global top-16 sort feeds .collect() AND both
        # sides of the sims crossJoin — without this the corpus
        # scan+sort re-executes per consumer (the repo's standard
        # multi-consumer localCheckpoint rule)
        .localCheckpoint(eager=False)
    )
    cand = cand_df.collect()
    sims_rows = (
        cand_df.alias("a")
        .crossJoin(cand_df.alias("b"))
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("a"),
            F.col("b.vec_id").alias("b"),
            F.round(
                cosine(F.col("a.embedding"), F.col("b.embedding")), 6
            ).alias("sim_r"),
        )
        .collect()
    )
    sim = {(r["a"], r["b"]): r["sim_r"] for r in sims_rows}
    rel = {r["vec_id"]: r["rel_r"] for r in cand}
    remaining = sorted(rel)
    picks: list[int] = []
    first = max(remaining, key=lambda v: (rel[v], -v))
    picks.append(first)
    remaining.remove(first)
    while len(picks) < 8:
        best = max(
            remaining,
            key=lambda v: (
                0.7 * rel[v] - 0.3 * max(sim[(v, s)] for s in picks),
                -v,
            ),
        )
        picks.append(best)
        remaining.remove(best)
    out_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("sel_rank", T.IntegerType(), False),
            T.StructField("rel_r", T.DoubleType(), False),
        ]
    )
    return spark.createDataFrame(
        [(int(v), i + 1, float(rel[v])) for i, v in enumerate(picks)],
        out_schema,
    )


@query(
    "q144_bitext_margin_mining",
    f"""
    -- Margin-based parallel-corpus mining (Artetxe & Schwenk 2019,
    -- the LASER/CCMatrix recipe): label-0 vectors play the source
    -- language, label-1 the target; a pair's score is its cosine
    -- DIVIDED by the mean of the two sides' k-NN cosines (k = 4) —
    -- the margin criterion that suppresses "hub" vectors which are
    -- close to everything and would dominate raw-cosine matching.
    -- Keep each source's best target where rounded margin >= 1.0.
    WITH src AS (
        SELECT vec_id, embedding FROM embeddings WHERE label = 0
    ), tgt AS (
        SELECT vec_id, embedding FROM embeddings WHERE label = 1
    ), cp AS (
        SELECT s.vec_id AS x, t.vec_id AS y,
               ROUND({_COS_QC.format(a='s.embedding', b='t.embedding')}, 6)
                   AS cos_r
        FROM src s CROSS JOIN tgt t
    ), kx AS (
        SELECT x, CAST(SUM(CAST(cos_r AS DECIMAL(27,6))) AS DOUBLE) / 4 AS ax
        FROM (SELECT x, y, cos_r, ROW_NUMBER() OVER (
                  PARTITION BY x ORDER BY cos_r DESC, y ASC) AS rn FROM cp)
        WHERE rn <= 4 GROUP BY x
    ), ky AS (
        SELECT y, CAST(SUM(CAST(cos_r AS DECIMAL(27,6))) AS DOUBLE) / 4 AS ay
        FROM (SELECT x, y, cos_r, ROW_NUMBER() OVER (
                  PARTITION BY y ORDER BY cos_r DESC, x ASC) AS rn FROM cp)
        WHERE rn <= 4 GROUP BY y
    ), m AS (
        SELECT cp.x, cp.y, cp.cos_r,
               cp.cos_r / ((kx.ax + ky.ay) / 2) AS margin
        FROM cp JOIN kx ON kx.x = cp.x JOIN ky ON ky.y = cp.y
    )
    SELECT x AS src_id, y AS tgt_id, cos_r,
           ROUND(margin, 6) AS margin_r
    FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY x ORDER BY margin DESC, y ASC) AS rn FROM m)
    WHERE rn = 1 AND ROUND(margin, 6) >= 1.0
    """,
)
def q144(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-based bitext mining (Artetxe & Schwenk 2019) — the
    LASER/CCMatrix criterion for mining parallel training pairs from
    two monolingual embedding spaces: score = cosine / mean(x's k-NN
    cosine, y's k-NN cosine), which cancels out hub vectors that
    raw-cosine matching over-selects; keep each source's best target
    at margin >= 1.0 (better-than-its-neighborhood).

    Scale shape: the cross score matrix is a broadcast join (source
    side broadcast, one pass over the target side); both k-NN means
    are windows partitioned per vector with a bounded 4-row frame
    contribution, summed in decimal per the float policy; the final
    best-match is a per-source window. At real scale the dense
    |src|x|tgt| matrix is replaced by IVF/LSH candidate generation
    (q63/q68) followed by this exact margin re-score on candidates —
    the published two-stage deployment; the relational margin logic
    is unchanged."""
    e = load(spark, sf_dir, "embeddings")
    src = e.filter(F.col("label") == 0).select(
        F.col("vec_id").alias("x"), F.col("embedding").alias("ex")
    )
    tgt = e.filter(F.col("label") == 1).select(
        F.col("vec_id").alias("y"), F.col("embedding").alias("ey")
    )
    cp = (
        tgt.join(F.broadcast(src))
        .select(
            "x",
            "y",
            F.round(cosine(F.col("ex"), F.col("ey")), 6).alias("cos_r"),
        )
        .localCheckpoint(eager=False)
    )
    wx = Window.partitionBy("x").orderBy(F.col("cos_r").desc(), F.col("y").asc())
    kx = (
        cp.withColumn("rn", F.row_number().over(wx))
        .filter(F.col("rn") <= 4)
        .groupBy("x")
        .agg(
            (F.sum(F.col("cos_r").cast("decimal(27,6)")).cast("double") / 4)
            .alias("ax")
        )
    )
    wy = Window.partitionBy("y").orderBy(F.col("cos_r").desc(), F.col("x").asc())
    ky = (
        cp.withColumn("rn", F.row_number().over(wy))
        .filter(F.col("rn") <= 4)
        .groupBy("y")
        .agg(
            (F.sum(F.col("cos_r").cast("decimal(27,6)")).cast("double") / 4)
            .alias("ay")
        )
    )
    m = (
        cp.join(kx, "x")
        .join(ky, "y")
        .withColumn(
            "margin",
            F.col("cos_r") / ((F.col("ax") + F.col("ay")) / 2),
        )
    )
    wbest = Window.partitionBy("x").orderBy(
        F.col("margin").desc(), F.col("y").asc()
    )
    return (
        m.withColumn("rn", F.row_number().over(wbest))
        .filter((F.col("rn") == 1) & (F.round("margin", 6) >= 1.0))
        .select(
            F.col("x").alias("src_id"),
            F.col("y").alias("tgt_id"),
            "cos_r",
            F.round("margin", 6).alias("margin_r"),
        )
    )


def _cut_covered(j: DataFrame) -> DataFrame:
    """Positional span-cut shared by q145/q164/q170/q171 — the single
    implementation lives in operators/dedup.py::cut_covered (the CLI
    decontamination verb consumes the same expressions with
    include_text=True, so the NULL/empty-text edge rules cannot
    drift between the query and CLI copies)."""
    return D.cut_covered(j)



@query(
    "q145_exactsubstr_cut",
    f"""
    -- The actionable half of q141: actually CUT the cross-document
    -- duplicated 8-token spans out of each document (what ExactSubstr
    -- dedup does to training data) and fingerprint the surviving
    -- text. Position sets stay per-document and span-bounded; the
    -- rewrite is a per-doc ordered re-aggregation.
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), grams AS (
        SELECT doc_id, i, MD5(ARRAY_TO_STRING(t[i : i + 7], ' ')) AS g
        FROM toks, UNNEST(RANGE(1, LEN(t) - 6)) AS r(i)
        WHERE LEN(t) >= 8
    ), dupg AS (
        SELECT g FROM grams GROUP BY g
        HAVING COUNT(DISTINCT doc_id) > 1
    ), covered AS (
        SELECT DISTINCT gr.doc_id, p.j
        FROM grams gr JOIN dupg ON dupg.g = gr.g,
             UNNEST(RANGE(gr.i, gr.i + 8)) AS p(j)
    ), kept AS (
        SELECT tk.doc_id, tk.i, tk.w
        FROM (SELECT doc_id, i, t[i] AS w
              FROM toks, UNNEST(RANGE(1, LEN(t) + 1)) AS r(i)) tk
        ANTI JOIN covered c ON c.doc_id = tk.doc_id AND c.j = tk.i
    )
    SELECT b.doc_id,
           CAST(LEN(b.t) AS BIGINT) AS n_tokens,
           CAST(LEN(b.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
           MD5(COALESCE(k.clean, '')) AS clean_md5
    FROM toks b LEFT JOIN (
        SELECT doc_id, COUNT(*) AS n_kept,
               STRING_AGG(w, ' ' ORDER BY i) AS clean
        FROM kept GROUP BY doc_id
    ) k ON k.doc_id = b.doc_id
    """,
)
def q145(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr span-cut rewrite (Lee et al. 2022): remove every
    token covered by a cross-document duplicated 8-gram and emit the
    md5 of the surviving text — q141 measures the duplication, this
    performs the dedup rewrite the paper applies to training data.

    Scale shape: same hashed-gram df join as q141; covered positions
    explode only from DUPLICATED gram positions (span-bounded, not
    corpus-bounded) and collapse to one per-doc sorted array; the
    rewrite itself is a single ARRAY-NATIVE positional filter
    (filter(t, (x, i) -> ...) — no per-token explode of the corpus,
    no re-sort: original token order is preserved by construction).
    The md5 fingerprint makes the rewritten text oracle-checkable
    without shipping full texts through the compare."""
    # spread the RAW text rows (narrow) so tokenize + the 8-gram
    # explode run on every core; exactsubstr_grams itself never
    # shuffles the token arrays (no-op on multi-file inputs)
    d = scan_parallel(load(spark, sf_dir, "documents"))
    toks = d.select("doc_id", tokens("text").alias("t"))
    grams = D.exactsubstr_grams(toks).localCheckpoint(eager=False)
    dupg = D.cross_doc_dup_grams(grams)
    covered = (
        D.exactsubstr_covered_positions(grams, dupg)
        .groupBy("doc_id")
        .agg(F.collect_set("j").alias("cov"))
    )
    j = toks.join(covered, "doc_id", "left").withColumn(
        "cov", F.coalesce("cov", F.array().cast("array<bigint>"))
    )
    return _cut_covered(j)


@query(
    "q146_quantile_binning",
    """
    -- Equal-frequency feature discretization: NTILE(4) bins of
    -- document length within each language — the feature-engineering
    -- primitive behind length-balanced batch construction and
    -- quantile-bucketed quality tiers. NTILE over a TOTAL order
    -- (n_chars, doc_id) is deterministic and its uneven-remainder
    -- distribution (earlier buckets get the extras) is specified
    -- identically in both engines.
    SELECT lang, CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(n_chars) AS lo_chars,
           MAX(n_chars) AS hi_chars
    FROM (
        SELECT lang, n_chars,
               NTILE(4) OVER (PARTITION BY lang
                              ORDER BY n_chars ASC, doc_id ASC) AS bin
        FROM documents
    )
    GROUP BY lang, bin
    """,
)
def q146(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency quantile binning (feature discretization): 4
    NTILE bins of n_chars per language with per-bin count and value
    range — the primitive behind quantile-tiered curation (q100 keeps
    by a percentile cut; this materializes the full bin structure).
    Deterministic because the window orders by the TOTAL key
    (n_chars, doc_id); NTILE's remainder rule (first buckets take the
    extras) is identical across engines. One lang-partitioned window
    + one small aggregate; at scale, exact NTILE over a skewed
    partition is the known hot spot and the documented swap is
    approx_percentile cutpoints (q41's sketch) — same output schema,
    sketch-bounded error."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    return (
        d.select("lang", "n_chars", F.ntile(4).over(w).alias("bin"))
        .groupBy("lang", F.col("bin").cast("int").alias("bin"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.min("n_chars").alias("lo_chars"),
            F.max("n_chars").alias("hi_chars"),
        )
    )


@query(
    "q147_ks_drift",
    """
    -- Exact two-sample Kolmogorov-Smirnov distance between every
    -- pair of sources' length distributions — the distribution-drift
    -- monitor for data pipelines (did src_a's docs change shape vs
    -- src_b's?). All arithmetic is INTEGER until the final display
    -- division: D = max over v of |c_a(v) * n_b - c_b(v) * n_a|,
    -- ks = D / (n_a * n_b) — no float CDFs, so the max and its
    -- argmin location are engine-exact by construction.
    WITH vals AS (
        SELECT source, n_chars AS v FROM documents
    ), h AS (
        SELECT source, v, CAST(COUNT(*) AS BIGINT) AS k
        FROM vals GROUP BY source, v
    ), n AS (
        SELECT source, CAST(SUM(k) AS BIGINT) AS n FROM h GROUP BY source
    ), grid AS (
        SELECT DISTINCT v FROM vals
    ), cum AS (
        SELECT s.source, g.v,
               CAST(SUM(COALESCE(h.k, 0)) OVER (
                   PARTITION BY s.source ORDER BY g.v) AS BIGINT) AS c
        FROM (SELECT DISTINCT source FROM vals) s
        CROSS JOIN grid g
        LEFT JOIN h ON h.source = s.source AND h.v = g.v
    ), pairs AS (
        SELECT a.source AS src_a, b.source AS src_b
        FROM (SELECT DISTINCT source FROM vals) a
        JOIN (SELECT DISTINCT source FROM vals) b ON a.source < b.source
    ), d AS (
        SELECT p.src_a, p.src_b, ca.v,
               ABS(ca.c * nb.n - cb.c * na.n) AS dd,
               na.n AS n_a, nb.n AS n_b
        FROM pairs p
        JOIN cum ca ON ca.source = p.src_a
        JOIN cum cb ON cb.source = p.src_b AND cb.v = ca.v
        JOIN n na ON na.source = p.src_a
        JOIN n nb ON nb.source = p.src_b
    )
    SELECT src_a, src_b, n_a, n_b,
           CAST(dd AS BIGINT) AS d_num,
           v AS ks_at,
           ROUND(dd * 1.0 / (n_a * n_b), 6) AS ks_r
    FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY src_a, src_b ORDER BY dd DESC, v ASC) AS rn
        FROM d
    )
    WHERE rn = 1
    """,
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift statistic between
    every source pair's document-length distributions — the
    distribution-shift alarm a production corpus pipeline runs when a
    crawler or upstream feed changes behavior. Integer-exact: with
    c_a(v) the cumulative count at value v, the statistic maximizes
    |c_a*n_b - c_b*n_a| (a BIGINT), and only the final reported ratio
    divides — no float CDF comparisons, so max location and value are
    deterministic across engines (ties at the max go to the smallest
    v).

    Scale shape: per-source histograms (map-side combinable), CDFs
    via one source-partitioned cumulative window over the pooled
    value grid (evaluating both step functions on a shared superset
    of jump points changes nothing — D is constant on plateaus), and
    a pair x grid equi-join that is dims x grid sized, never
    corpus-sized. 190 pairs x ~2k grid points here; at 100 TB the
    grid compresses to sketch quantiles (q41) with bounded KS error."""
    d = load(spark, sf_dir, "documents")
    vals = d.select("source", F.col("n_chars").alias("v"))
    h = vals.groupBy("source", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    n = h.groupBy("source").agg(F.sum("k").cast("bigint").alias("n"))
    grid = vals.select("v").distinct()
    srcs = vals.select("source").distinct()
    cum = (
        srcs.crossJoin(grid)
        .join(h, ["source", "v"], "left")
        .withColumn(
            "c",
            F.sum(F.coalesce("k", F.lit(0)))
            .over(Window.partitionBy("source").orderBy("v"))
            .cast("bigint"),
        )
        .select("source", "v", "c")
    )
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
    )
    dd = (
        pairs.join(
            cum.select(
                F.col("source").alias("src_a"), "v", F.col("c").alias("ca")
            ),
            "src_a",
        )
        .join(
            cum.select(
                F.col("source").alias("src_b"), "v", F.col("c").alias("cb")
            ),
            ["src_b", "v"],
        )
        .join(n.select(F.col("source").alias("src_a"), F.col("n").alias("n_a")), "src_a")
        .join(n.select(F.col("source").alias("src_b"), F.col("n").alias("n_b")), "src_b")
        .withColumn("dd", F.abs(F.col("ca") * F.col("n_b") - F.col("cb") * F.col("n_a")))
    )
    w = Window.partitionBy("src_a", "src_b").orderBy(
        F.col("dd").desc(), F.col("v").asc()
    )
    return (
        dd.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "src_a",
            "src_b",
            "n_a",
            "n_b",
            F.col("dd").cast("bigint").alias("d_num"),
            F.col("v").alias("ks_at"),
            F.round(F.col("dd") * 1.0 / (F.col("n_a") * F.col("n_b")), 6).alias(
                "ks_r"
            ),
        )
    )


@query(
    "q148_curation_pipeline_v2",
    f"""
    -- End-to-end curation pipeline v2, composing the round-6 ops in
    -- production order: Gopher repetition filters (q137) -> cross-doc
    -- ExactSubstr span cut over the SURVIVORS (q145 — dedup after
    -- filtering, so boilerplate that failed quality never pollutes
    -- the gram table) -> temperature-sampled mixture rebalance
    -- (q139) -> per-(lang, source) accounting of what the final
    -- training mix contains.
    WITH toks AS (
        SELECT doc_id, lang, source, {_NORM_SQL.format(c='text')} AS norm,
               STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), base AS (
        SELECT doc_id, lang, source, norm, t,
               CAST(LEN(t) AS BIGINT) AS n_tokens,
               CAST(LEN(LIST_DISTINCT(t)) AS BIGINT) AS n_distinct
        FROM toks
    ), tri AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tri,
               CAST(COUNT(DISTINCT ARRAY_TO_STRING(t[i - 2 : i], ' '))
                    AS BIGINT) AS n_tri_distinct
        FROM toks, UNNEST(RANGE(3, LEN(t) + 1)) AS r(i)
        GROUP BY doc_id
    ), bg AS (
        SELECT doc_id, ARRAY_TO_STRING(t[i : i + 1], ' ') AS bigram,
               COUNT(*) AS cnt
        FROM toks, UNNEST(RANGE(1, LEN(t))) AS r(i)
        GROUP BY doc_id, ARRAY_TO_STRING(t[i : i + 1], ' ')
    ), topbg AS (
        SELECT doc_id, bigram, cnt,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY cnt DESC, bigram ASC) AS rn
        FROM bg
    ), surv AS (
        SELECT b.doc_id, b.lang, b.source, b.t, b.n_tokens
        FROM base b
        LEFT JOIN tri ON tri.doc_id = b.doc_id
        LEFT JOIN topbg g ON g.doc_id = b.doc_id AND g.rn = 1
        WHERE ROUND(CASE WHEN b.n_tokens = 0 THEN 0.0
                    ELSE (b.n_tokens - b.n_distinct) * 1.0 / b.n_tokens END,
                    6) <= 0.5
          AND ROUND(CASE WHEN COALESCE(tri.n_tri, 0) = 0 THEN 0.0
                    ELSE (tri.n_tri - tri.n_tri_distinct) * 1.0
                         / tri.n_tri END, 6) <= 0.3
          AND ROUND(CASE WHEN LEN(b.norm) = 0 THEN 0.0
                    ELSE COALESCE(g.cnt * LEN(g.bigram), 0) * 1.0
                         / LEN(b.norm) END, 6) <= 0.18
    ), grams AS (
        SELECT doc_id, i, MD5(ARRAY_TO_STRING(t[i : i + 7], ' ')) AS g
        FROM surv, UNNEST(RANGE(1, LEN(t) - 6)) AS r(i)
        WHERE LEN(t) >= 8
    ), dupg AS (
        SELECT g FROM grams GROUP BY g
        HAVING COUNT(DISTINCT doc_id) > 1
    ), covered AS (
        SELECT DISTINCT gr.doc_id, p.j
        FROM grams gr JOIN dupg ON dupg.g = gr.g,
             UNNEST(RANGE(gr.i, gr.i + 8)) AS p(j)
    ), cut AS (
        SELECT s.doc_id, s.lang, s.source, s.n_tokens,
               COALESCE(c.n_cov, 0) AS n_removed,
               s.n_tokens - COALESCE(c.n_cov, 0) AS n_remaining
        FROM surv s LEFT JOIN (
            SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cov
            FROM covered GROUP BY doc_id
        ) c ON c.doc_id = s.doc_id
    ), g2 AS (
        SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_in,
               CAST(ROUND(SQRT(COUNT(*)), 6) AS DECIMAL(27,6)) AS w
        FROM cut GROUP BY lang, source
    ), t2 AS (
        SELECT CAST(SUM(w) AS DOUBLE) AS wsum,
               CAST(SUM(n_in) AS DOUBLE) AS total FROM g2
    ), rates AS (
        SELECT g2.lang, g2.source, g2.n_in,
               LEAST(1.0, ((CAST(g2.w AS DOUBLE) / t2.wsum)
                           * (t2.total * 0.5)) / g2.n_in) AS rate
        FROM g2, t2
    )
    SELECT r.lang, r.source, r.n_in, ROUND(r.rate, 6) AS rate_r,
           CAST(COUNT_IF(
               (((c.doc_id % 2147483648) * 1103515245 + 12345)
                % 2147483648) % 1000000
               < CAST(FLOOR(r.rate * 1000000) AS BIGINT)) AS BIGINT)
               AS n_kept,
           CAST(COALESCE(SUM(c.n_removed) FILTER (WHERE
               (((c.doc_id % 2147483648) * 1103515245 + 12345)
                % 2147483648) % 1000000
               < CAST(FLOOR(r.rate * 1000000) AS BIGINT)), 0) AS BIGINT)
               AS tokens_removed,
           CAST(COALESCE(SUM(c.n_remaining) FILTER (WHERE
               (((c.doc_id % 2147483648) * 1103515245 + 12345)
                % 2147483648) % 1000000
               < CAST(FLOOR(r.rate * 1000000) AS BIGINT)), 0) AS BIGINT)
               AS tokens_final
    FROM rates r JOIN cut c ON c.lang = r.lang AND c.source = r.source
    GROUP BY r.lang, r.source, r.n_in, r.rate
    """,
)
def q148(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline v2 — the round-6 operators composed in the
    order a production corpus build runs them: Gopher repetition
    filters (q137's three signals and thresholds) -> cross-document
    ExactSubstr span cutting over the survivors only (q145's gram
    machinery; filtering FIRST keeps rejected boilerplate out of the
    duplicate-gram table) -> temperature-sampled mixture rebalance
    (q139's alpha = 0.5 scheme re-normalized over the filtered
    corpus) -> per-(lang, source) accounting: docs in, keep rate,
    docs kept, tokens cut as duplicates, tokens delivered.

    Plan shape at scale: the repetition stage adds one (doc, bigram)
    aggregate; the cut stage one hashed-gram df aggregate + one
    span-bounded position join; the mixture one dims-sized group
    table broadcast back — every corpus-sized dataflow is a map or a
    content-keyed shuffle, and the whole pipeline never materializes
    an intermediate corpus copy (one DAG, Catalyst fuses the
    stages). q99 is pipeline v1 (quality rules + exact dedup); this
    is its round-6 successor with repetition-aware filtering and
    span-level (not whole-doc) dedup."""
    # spread the RAW rows so normalize+tokenize runs on every core
    # (structural no-op on multi-file inputs)
    d = scan_parallel(load(spark, sf_dir, "documents"))
    t = d.select(
        "doc_id",
        "lang",
        "source",
        normalize_text("text").alias("norm"),
        tokens("text").alias("t"),
    )
    jj, dup_word, dup_tri, top_frac = _repetition_signal_frame(t, barrier=True)
    surv = (
        jj.filter(_repetition_keep(dup_word, dup_tri, top_frac))
        .select("doc_id", "lang", "source", "t", "n_tokens")
        .localCheckpoint(eager=False)
    )
    grams = D.exactsubstr_grams(surv).localCheckpoint(eager=False)
    dupg = D.cross_doc_dup_grams(grams)
    ncov = (
        D.exactsubstr_covered_positions(grams, dupg)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cov"))
    )
    cut = surv.join(ncov, "doc_id", "left").select(
        "doc_id",
        "lang",
        "source",
        "n_tokens",
        F.coalesce("n_cov", F.lit(0)).alias("n_removed"),
        (F.col("n_tokens") - F.coalesce("n_cov", F.lit(0))).alias("n_remaining"),
    )
    g2 = cut.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_in"),
        F.round(F.sqrt(F.count(F.lit(1))), 6).cast("decimal(27,6)").alias("w"),
    )
    t2 = g2.agg(
        F.sum("w").cast("double").alias("wsum"),
        F.sum("n_in").cast("double").alias("total"),
    )
    rates = g2.crossJoin(F.broadcast(t2)).select(
        "lang",
        "source",
        "n_in",
        F.least(
            F.lit(1.0),
            ((F.col("w").cast("double") / F.col("wsum"))
             * (F.col("total") * F.lit(0.5)))
            / F.col("n_in"),
        ).alias("rate"),
    )
    # NOTE on the final `% 1000000`: 2^31 is not a multiple of 1e6, so
    # the coin carries a tiny modulo bias (~2147/2148 extra mass on the
    # low residues) — realized keep rates sit a hair ABOVE nominal.
    # Deterministic and engine-identical (the oracle repeats the same
    # expression), so cross-engine equality is unaffected; stated here
    # so baseline-drift analysis doesn't misattribute it. Comparing
    # `lcg < floor(rate * 2^31)` directly would remove the bias at the
    # cost of re-anchoring every kept-set golden.
    coin = (((F.col("doc_id") % 2147483648) * 1103515245 + 12345) % 2147483648) % 1000000
    keep = coin < F.floor(F.col("rate") * 1000000).cast("bigint")
    return (
        cut.join(F.broadcast(rates), ["lang", "source"])
        .groupBy("lang", "source", "n_in", "rate")
        .agg(
            F.count_if(keep).cast("bigint").alias("n_kept"),
            F.coalesce(F.sum(F.when(keep, F.col("n_removed"))), F.lit(0))
            .cast("bigint")
            .alias("tokens_removed"),
            F.coalesce(F.sum(F.when(keep, F.col("n_remaining"))), F.lit(0))
            .cast("bigint")
            .alias("tokens_final"),
        )
        .select(
            "lang",
            "source",
            "n_in",
            F.round("rate", 6).alias("rate_r"),
            "n_kept",
            "tokens_removed",
            "tokens_final",
        )
    )


def _ndcg_tables() -> tuple[str, str, str, str]:
    """Discount / ideal-DCG literal tables for q149, generated ONCE in
    Python and injected into BOTH engines as 12dp DECIMAL STRING
    literals — log2 is not IEEE-correctly-rounded, so computing the
    discounts independently in the JVM and DuckDB could differ by an
    ulp; identical literals make the arithmetic identical by
    construction. Returns (spark_discount_case, sql_discount_case,
    spark_idcg_case, sql_idcg_case) keyed by rank / relevant-count."""
    import math
    from decimal import Decimal

    disc = [Decimal(f"{1.0 / math.log2(i + 1):.12f}") for i in range(1, 11)]
    idcg = []
    acc = Decimal(0)
    for d in disc:
        acc += d
        idcg.append(acc)
    d_spark = "CASE rank " + " ".join(
        f"WHEN {i + 1} THEN CAST('{disc[i]}' AS DECIMAL(27,12))"
        for i in range(10)
    ) + " END"
    d_sql = d_spark
    i_spark = "CASE n_rel10 " + " ".join(
        f"WHEN {i + 1} THEN CAST('{idcg[i]}' AS DECIMAL(27,12))"
        for i in range(10)
    ) + " END"
    i_sql = i_spark
    return d_spark, d_sql, i_spark, i_sql


_Q149_D, _Q149_D_SQL, _Q149_I, _Q149_I_SQL = _ndcg_tables()


@query(
    "q149_retrieval_eval",
    f"""
    -- Retrieval-quality evaluation (P@10 / MRR / nDCG@10): score the
    -- cosine ranking against label-match relevance for 8 anchor
    -- queries — the eval harness every retrieval/RAG pipeline runs.
    -- Discounts and ideal-DCG values are 12dp DECIMAL literals
    -- generated once and shared verbatim with the Spark side (log2
    -- is not correctly-rounded; identical literals sidestep it);
    -- sums run exact in decimal, only the final ratios are doubles.
    WITH q AS (
        SELECT vec_id AS q_id, embedding AS qv, label AS q_label
        FROM embeddings WHERE vec_id < 8
    ), scored AS (
        SELECT q.q_id, e.vec_id AS y,
               CASE WHEN e.label = q.q_label THEN 1 ELSE 0 END AS rel,
               ROUND({_COS_QC.format(a='q.qv', b='e.embedding')}, 6) AS cos_r
        FROM q JOIN embeddings e ON e.vec_id <> q.q_id
    ), ranked AS (
        SELECT q_id, y, rel,
               ROW_NUMBER() OVER (PARTITION BY q_id
                                  ORDER BY cos_r DESC, y ASC) AS rank
        FROM scored
    ), top10 AS (
        SELECT * FROM ranked WHERE rank <= 10
    ), agg AS (
        SELECT q_id,
               CAST(SUM(rel) AS BIGINT) AS n_rel10,
               MIN(CASE WHEN rel = 1 THEN rank END) AS first_rel,
               SUM(CASE WHEN rel = 1 THEN {_Q149_D_SQL}
                        ELSE CAST('0' AS DECIMAL(27,12)) END) AS dcg
        FROM top10 GROUP BY q_id
    )
    SELECT q_id, n_rel10,
           ROUND(n_rel10 * 1.0 / 10, 6) AS p10_r,
           ROUND(COALESCE(1.0 / first_rel, 0.0), 6) AS mrr_r,
           CASE WHEN n_rel10 = 0 THEN 0.0
                ELSE ROUND(CAST(dcg AS DOUBLE)
                           / CAST({_Q149_I_SQL} AS DOUBLE), 6) END AS ndcg_r
    FROM agg
    """,
)
def q149(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval evaluation metrics — precision@10, MRR, nDCG@10 — of
    the cosine ranking against label-match relevance for 8 anchor
    queries: the eval side of the retrieval stack (q32 ranks, q140
    mines negatives, q124 fuses; this GRADES them). Float policy
    taken seriously for once-transcendental constants: the 1/log2
    discount and ideal-DCG tables are 12dp DECIMAL literals generated
    once in Python and injected into BOTH engines, DCG accumulates
    exactly in decimal, and only the final ratios are double. Scale
    shape: broadcast anchor join, one corpus pass, per-query bounded
    windows — evaluation cost is queries x corpus, embarrassingly
    parallel."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("q_label"),
    )
    scored = e.join(F.broadcast(q), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        F.col("vec_id").alias("y"),
        (F.col("label") == F.col("q_label")).cast("int").alias("rel"),
        F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cos_r"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_r").desc(), F.col("y").asc())
    top10 = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )
    agg = top10.groupBy("q_id").agg(
        F.sum("rel").cast("bigint").alias("n_rel10"),
        F.min(F.when(F.col("rel") == 1, F.col("rank"))).alias("first_rel"),
        F.sum(
            F.when(F.col("rel") == 1, F.expr(_Q149_D)).otherwise(
                F.expr("CAST('0' AS DECIMAL(27,12))")
            )
        ).alias("dcg"),
    )
    return agg.select(
        "q_id",
        "n_rel10",
        F.round(F.col("n_rel10") * 1.0 / 10, 6).alias("p10_r"),
        F.round(F.coalesce(1.0 / F.col("first_rel"), F.lit(0.0)), 6).alias(
            "mrr_r"
        ),
        F.when(F.col("n_rel10") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.col("dcg").cast("double") / F.expr(_Q149_I).cast("double"), 6
            )
        )
        .alias("ndcg_r"),
    )


@query(
    "q150_decayed_activity",
    """
    -- Time-decayed user activity score with EXACT half-life weights:
    -- weight = 2^-(whole days old) built from an integer bit-shift
    -- (1::BIGINT << k) — a dyadic rational every engine represents
    -- exactly, unlike EXP()/POWER() whose last-ulp rounding is
    -- engine-specific. value * 2^-k only shifts the float exponent
    -- (exact), so the only rounding anywhere is the policy decimal
    -- cast feeding the order-independent sum.
    WITH mx AS (
        SELECT MAX(CAST(FLOOR(EPOCH(ts)) AS BIGINT)) AS m FROM events
    ), w AS (
        SELECT user_id,
               value / (1::BIGINT << LEAST(
                   CAST((mx.m - CAST(FLOOR(EPOCH(ts)) AS BIGINT)) // 86400
                        AS BIGINT), 62))
                   AS dv
        FROM events, mx
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(dv AS DECIMAL(27,12))) AS DOUBLE), 6)
               AS decayed_r
    FROM w GROUP BY user_id
    """,
)
def q150(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement scoring (the recency-weighted feature
    every ranking/credit pipeline maintains): each event's value is
    halved for every whole day of age relative to the corpus max
    timestamp. Determinism trick worth naming: the half-life weight
    is 2^-k built from an INTEGER bit-shift, an exactly-representable
    dyadic rational — multiplying a double by it only decrements the
    exponent, so the per-row product is EXACT in both engines and no
    EXP/POWER last-ulp divergence exists; the only rounding is the
    policy decimal cast feeding the order-independent sum. Scale
    shape: one scalar max (broadcast), then a map + one user-keyed
    hash aggregate with map-side combine — streaming-friendly (the
    same fold runs incrementally as new days arrive by rescaling)."""
    e = load(spark, sf_dir, "events")
    mx = e.agg(F.max(F.unix_timestamp("ts")).alias("m"))
    k = F.least(
        F.floor((F.col("m") - F.unix_timestamp("ts")) / 86400).cast("bigint"),
        F.lit(62),
    )
    return (
        e.crossJoin(F.broadcast(mx))
        .select("user_id", "value", k.alias("k"))
        .select(
            "user_id",
            F.expr(
                "value / shiftleft(cast(1 as bigint), cast(k as int))"
            ).alias("dv"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(
                F.sum(F.col("dv").cast("decimal(27,12)")).cast("double"), 6
            ).alias("decayed_r"),
        )
    )


@query(
    "q151_inverted_index",
    f"""
    -- Inverted-index construction (the IR/map-reduce classic): token
    -- -> document frequency, total term frequency, and an
    -- md5-fingerprinted posting list "docid:tf,..." ordered by
    -- zero-padded doc id (padding makes LEXICOGRAPHIC order equal
    -- numeric order, so both engines serialize the identical list
    -- without engine-specific numeric-sort-of-strings behavior;
    -- width 19 = int64 max digits — LPAD truncates, so a narrower
    -- pad would collapse distinct large ids).
    WITH tf AS (
        SELECT doc_id, w AS token, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id,
                     UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS w
              FROM documents)
        WHERE LENGTH(w) > 0
        GROUP BY doc_id, w
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           MD5(STRING_AGG(LPAD(CAST(doc_id AS VARCHAR), 19, '0')
                          || ':' || CAST(tf AS VARCHAR), ','
                          ORDER BY LPAD(CAST(doc_id AS VARCHAR), 19, '0')))
               AS postings_md5
    FROM tf GROUP BY token
    HAVING COUNT(*) >= 50
    """,
)
def q151(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the canonical large-scale
    dataflow (map-reduce's original workload, the build side of
    BM25/q97): per token, document frequency, total term frequency,
    and the posting list itself, fingerprinted. Posting entries are
    keyed by ZERO-PADDED doc id so lexicographic sort order equals
    numeric order — both engines serialize the identical byte string
    and the md5 proves full posting-list equality without shipping
    postings through the compare. Scale shape: one (doc, token)
    aggregate, one token aggregate (both map-side combinable) — the
    df >= 50 floor bounds output to the useful vocabulary; postings
    for a hot token are one group's collect, the documented shard
    point for web-scale postings (split by doc-id range)."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("token"))
        .filter(F.length("token") > 0)
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    # pad to 19 = int64 max width: LPAD TRUNCATES beyond its length in
    # both engines, so a 12-char pad would collapse distinct 13-digit
    # ids (>= 10^12 — real corpus id scale) to one key and break both
    # posting order and uniqueness
    entry = F.concat(
        F.lpad(F.col("doc_id").cast("string"), 19, "0"),
        F.lit(":"),
        F.col("tf").cast("string"),
    )
    return (
        tf.select("token", "tf", entry.alias("e"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("total_tf"),
            F.md5(F.concat_ws(",", F.sort_array(F.collect_list("e")))).alias(
                "postings_md5"
            ),
        )
        .filter(F.col("df") >= 50)
    )


@query(
    "q152_markov_transitions",
    """
    -- First-order Markov transition matrix over per-user event
    -- sequences (behavioral model estimation): order each user's
    -- events by the TOTAL key (ts, event_id), pair each event with
    -- its predecessor via lag, count transitions, and normalize per
    -- source state. Counts are exact integers; the probability is
    -- one integer-over-integer division.
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
    ), t AS (
        SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    )
    SELECT prev, next, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev), 6) AS p_r
    FROM t
    """,
)
def q152(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov chain estimation over user event streams —
    the transition-probability matrix behind next-action prediction
    and anomaly scoring (a jump with near-zero learned probability is
    the anomaly signal). Sequences are ordered by the TOTAL key
    (ts, event_id) so lag() is deterministic under timestamp ties;
    transition counts are exact integers and each row probability is
    a single integer-ratio division. Scale shape: one user-partitioned
    lag window (sequences never leave their partition), one
    (prev, next) hash aggregate — states x states output (25 rows
    here), corpus-size-independent; the normalizing window runs over
    that dims-sized table, not the corpus."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev")
    )
    t = (
        seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", F.col("event_type").alias("next"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wp = Window.partitionBy("prev")
    return t.select(
        "prev",
        "next",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(wp), 6).alias("p_r"),
    )


@query(
    "q153_stream_dedup_ttl",
    """
    SELECT event_type, COUNT(DISTINCT event_id) AS n
    FROM events GROUP BY event_type
    """,
)
def q153(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with WATERMARK-EVICTED state
    (dropDuplicatesWithinWatermark, Spark 3.5+): q44's dropDuplicates
    keeps every seen key in the state store forever — unbounded state
    on an unbounded key space, the classic long-running-stream
    failure; this variant bounds state to the watermark horizon and
    deduplicates redeliveries arriving within it (the at-least-once
    retry case that causes real duplicates). On the finite fixture
    every duplicate is within-horizon, so the streamed result equals
    the relational COUNT(DISTINCT) the oracle runs — checking both
    the dedup semantics and that eviction dropped nothing it
    shouldn't."""
    from .streaming.events import (
        read_events_stream,
        streaming_dedup_within_watermark,
    )

    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    out = streaming_dedup_within_watermark(stream)
    return out.select("event_type", F.col("n").cast("bigint").alias("n"))


def _poisson1_thresholds() -> list[int]:
    """Cumulative Poisson(1) CDF cut points scaled to the LCG's 2^31
    integer range — computed ONCE here and injected into both engines
    as INTEGER literals, so the draw weights are exact integer
    comparisons with no cross-engine exp() in sight. P(X <= k) =
    e^-1 * sum_{j<=k} 1/j!."""
    import math

    e1 = math.exp(-1.0)
    cum, acc, fact = [], 0.0, 1.0
    for k in range(5):
        if k > 0:
            fact *= k
        acc += 1.0 / fact
        cum.append(int(math.floor(e1 * acc * 2147483648)))
    return cum


_P1 = _poisson1_thresholds()


def _bootstrap_weight_sql(u: str) -> str:
    """Piecewise inverse-CDF: uniform integer -> Poisson(1) weight."""
    return (
        f"CASE WHEN {u} < {_P1[0]} THEN 0 WHEN {u} < {_P1[1]} THEN 1 "
        f"WHEN {u} < {_P1[2]} THEN 2 WHEN {u} < {_P1[3]} THEN 3 "
        f"WHEN {u} < {_P1[4]} THEN 4 ELSE 5 END"
    )


@query(
    "q154_poisson_bootstrap",
    f"""
    -- Poisson bootstrap (the distributed resampling scheme: each of
    -- 32 virtual resamples weights every row by an independent
    -- Poisson(1) count, so no resample ever needs a corpus pass of
    -- its own — one exploded scan computes all draws). The uniform
    -- variate is the repo's overflow-safe LCG; the inverse-CDF cut
    -- points are INTEGER literals precomputed in Python (no exp() in
    -- either engine). Statistic: mean document length; the 32
    -- per-draw means give the percentile CI.
    WITH draws AS (
        SELECT d.d,
               {_bootstrap_weight_sql(
                   "(((doc_id % 2147483648) * 1103515245 + 12345"
                   " + d.d * 2654435761) % 2147483648)")} AS w,
               n_chars
        FROM documents, UNNEST(RANGE(0, 32)) AS d(d)
    ), per_draw AS (
        SELECT d, CAST(SUM(w) AS BIGINT) AS n_eff,
               ROUND(SUM(w * n_chars) * 1.0 / SUM(w), 6) AS mean_r
        FROM draws GROUP BY d
    ), arr AS (
        SELECT LIST_SORT(LIST(mean_r)) AS ms,
               CAST(COUNT(*) AS BIGINT) AS n_draws,
               CAST(SUM(CAST(mean_r AS DECIMAL(27,6))) AS DOUBLE)
                   / COUNT(*) AS est
        FROM per_draw
    )
    SELECT n_draws,
           ROUND(est, 6) AS est_r,
           ms[2] AS ci_lo_r,
           ms[31] AS ci_hi_r
    FROM arr
    """,
)
def q154(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap confidence interval for a corpus statistic
    (mean document length) — THE distributed uncertainty estimator:
    classical bootstrap resampling needs each resample to draw n rows
    WITH replacement (a corpus-sized shuffle per resample); the
    Poisson approximation weights every row by an independent
    Poisson(1) count instead, so ONE exploded map pass computes all
    32 resamples and each executor contributes partial sums — no
    resample ever materializes. Determinism: the uniform variate is
    the overflow-safe LCG coin salted per draw; the inverse-CDF cut
    points are integer literals computed once in Python (both engines
    compare integers — no exp()); per-draw means are exact
    integer-ratio doubles rounded 6dp, and the CI is order statistics
    2/31 of the 32 sorted means. Scale: 32x map fan-out + a 32-key
    aggregate with map-side combine; the fan-out constant is the
    documented cost knob."""
    d = load(spark, sf_dir, "documents")
    u = (
        "(((doc_id % 2147483648) * 1103515245 + 12345"
        " + d * 2654435761) % 2147483648)"
    )
    draws = d.select(
        "doc_id",
        "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(31))).alias("d"),
    ).select(
        "d",
        "n_chars",
        F.expr(_bootstrap_weight_sql(u)).alias("w"),
    )
    per_draw = draws.groupBy("d").agg(
        F.sum("w").cast("bigint").alias("n_eff"),
        F.round(
            F.sum(F.col("w") * F.col("n_chars")) * 1.0 / F.sum("w"), 6
        ).alias("mean_r"),
    )
    arr = per_draw.agg(
        F.sort_array(F.collect_list("mean_r")).alias("ms"),
        F.count(F.lit(1)).cast("bigint").alias("n_draws"),
        (
            F.sum(F.col("mean_r").cast("decimal(27,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("est"),
    )
    return arr.select(
        "n_draws",
        F.round("est", 6).alias("est_r"),
        F.element_at("ms", 2).alias("ci_lo_r"),
        F.element_at("ms", 31).alias("ci_hi_r"),
    )


@query(
    "q155_grouped_ols",
    f"""
    -- Distributed least-squares fit per group, closed form: regress
    -- token count on character count within each language via the
    -- normal equations. Both variables are INTEGERS, so all four
    -- sufficient statistics (Sx, Sy, Sxy, Sxx) are EXACT integer
    -- sums — the slope/intercept are each ONE double division of
    -- exact integers, bit-identical across engines with no
    -- accumulation-order concerns at all. This is how regression
    -- runs at 100 TB: map-side-combinable moments, closed-form solve.
    WITH o AS (
        SELECT lang,
               n_chars AS x,
               LEN(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS y
        FROM documents
    ), m AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM o GROUP BY lang
    )
    SELECT lang, n,
           ROUND((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx), 6)
               AS slope_r,
           ROUND((sy * 1.0 / n)
                 - ((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx))
                   * (sx * 1.0 / n), 6) AS intercept_r
    FROM m
    """,
)
def q155(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ordinary-least-squares fit (tokens-per-character rate
    per language) via the normal equations — the closed-form
    distributed regression pattern: each executor combines the four
    integer sufficient statistics map-side, one dims-sized group
    emerges, and slope/intercept are single double divisions of EXACT
    integers (both variables are ints, so there is literally no float
    accumulation anywhere — stronger than the decimal-sum policy).
    The model itself is the per-language chars→tokens calibration a
    token-budget planner uses when only byte counts are known. At
    100 TB: same plan, unchanged — sufficient statistics are the
    canonical mergeable form of linear models."""
    d = load(spark, sf_dir, "documents")
    o = d.select(
        "lang",
        F.col("n_chars").alias("x"),
        F.size(tokens("text")).alias("y"),
    )
    m = o.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) * 1.0 / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "lang",
        "n",
        F.round(slope, 6).alias("slope_r"),
        F.round(
            (F.col("sy") * 1.0 / F.col("n")) - slope * (F.col("sx") * 1.0 / F.col("n")),
            6,
        ).alias("intercept_r"),
    )


@query(
    "q156_blocking_quality",
    f"""
    -- Blocking-quality evaluation (the entity-resolution/dedup
    -- meta-metrics): how good is MinHash-LSH banding (q35's 16-hash/
    -- 4-band scheme) as a CANDIDATE GENERATOR against exact 3-gram
    -- Jaccard >= 3/5 ground truth (q138's join)? Reports pair
    -- completeness (recall: caught true pairs / true pairs) and
    -- reduction ratio (1 - candidates / all-pairs) — the two numbers
    -- every blocking scheme is judged by before anyone trusts it at
    -- scale.
    WITH toks AS (
        -- evaluation STRATUM: the first 1000 ids — blocking quality is
        -- always measured on a bounded ground-truth sample (the exact
        -- pair join is quadratic-ish; the candidate generator being
        -- graded is the thing that must scale, not the grader)
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents WHERE doc_id < 1000
    ), sh AS (
        SELECT DISTINCT doc_id, ARRAY_TO_STRING(t[i : i + 2], ' ') AS s
        FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
        WHERE LEN(t) >= 3
    ), sz AS (
        SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id
    ), truth AS (
        SELECT p.doc_a, p.doc_b
        FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     COUNT(*) AS inter
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id) p
        JOIN sz sa ON sa.doc_id = p.doc_a
        JOIN sz sb ON sb.doc_id = p.doc_b
        WHERE p.inter * 5 >= (sa.n + sb.n - p.inter) * 3
    ), mh AS (
        SELECT doc_id, seed, MIN(MD5(CAST(seed AS VARCHAR) || '|' || s)) AS h
        FROM sh CROSS JOIN UNNEST(RANGE(1, 17)) AS r(seed)
        GROUP BY doc_id, seed
    ), bands AS (
        SELECT doc_id, (seed - 1) // 4 AS band,
               MD5(STRING_AGG(h, '' ORDER BY seed)) AS bh
        FROM mh GROUP BY doc_id, (seed - 1) // 4
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ), caught AS (
        SELECT t.doc_a, t.doc_b FROM truth t
        JOIN cand c ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    ), stats AS (
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM caught) AS n_caught,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM sz) AS n_docs
    )
    SELECT n_true, n_cand, n_caught, n_docs,
           ROUND(CASE WHEN n_true = 0 THEN 1.0
                 ELSE n_caught * 1.0 / n_true END, 6) AS recall_r,
           ROUND(1.0 - n_cand * 2.0 / (n_docs * (n_docs - 1)), 6)
               AS reduction_r
    FROM stats
    """,
)
def q156(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation — pair completeness and reduction
    ratio of MinHash-LSH banding (q35's scheme) measured against the
    exact Jaccard >= 3/5 ground truth (q138's prefix join): the two
    meta-metrics that decide whether a blocking scheme is trustworthy
    before it gates a dedup at scale. Composition is the point: the
    TRUTH side reuses the exact prefix-filtered join, the CANDIDATE
    side reuses the production banding operator — the eval grades one
    registered operator with another, so the number it reports is
    about the real code paths. All counts exact integers; the two
    ratios are single double divisions rounded 6dp. At 100 TB the
    truth side is sampled (ground truth on a stratum), the candidate
    side unchanged — the standard methodology."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    truth = D.setsim_prefix_join(d, "text", "doc_id", n=3, t_num=3, t_den=5).select(
        "doc_a", "doc_b"
    )
    cand = D.minhash_candidate_pairs(
        d, "text", "doc_id", num_hashes=16, band_size=4, shingle_n=3
    )
    truth = truth.localCheckpoint(eager=False)
    cand = cand.localCheckpoint(eager=False)
    caught = truth.join(cand, ["doc_a", "doc_b"])
    # n_docs = docs contributing >= 1 shingle = docs with >= 3 tokens:
    # count that directly instead of building (and deduplicating) a
    # third shingle table just to count its distinct doc ids
    n_docs_df = (
        d.select(tokens("text").alias("__t"))
        .filter(F.size("__t") >= 3)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
    stats = (
        truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_true"))
        .crossJoin(cand.agg(F.count(F.lit(1)).cast("bigint").alias("n_cand")))
        .crossJoin(caught.agg(F.count(F.lit(1)).cast("bigint").alias("n_caught")))
        .crossJoin(n_docs_df)
    )
    return stats.select(
        "n_true",
        "n_cand",
        "n_caught",
        "n_docs",
        F.round(
            F.when(F.col("n_true") == 0, F.lit(1.0)).otherwise(
                F.col("n_caught") * 1.0 / F.col("n_true")
            ),
            6,
        ).alias("recall_r"),
        F.round(
            1.0 - F.col("n_cand") * 2.0 / (F.col("n_docs") * (F.col("n_docs") - 1)),
            6,
        ).alias("reduction_r"),
    )


@query(
    "q157_provenance_dedup",
    f"""
    -- Multi-source provenance dedup: when identical content arrives
    -- from several sources, keep ONE copy chosen by a DETERMINISTIC
    -- source ordering, not by arrival order — the rule real corpus
    -- assemblies use so dedup never discards the best-provenance
    -- copy. The ordering here is lexicographic source name — an
    -- ARBITRARY but deterministic stand-in for an explicit quality
    -- rank table (it is NOT quality-ordered: 'src_crawl' sorts
    -- before 'src_curated'); ties within a source break to the
    -- smallest doc id. Also reports the full provenance set per
    -- surviving fingerprint.
    WITH fp AS (
        -- content key = md5 of the SORTED DISTINCT token set: the
        -- bag-of-words identity — invariant to word order and
        -- repetition, the cheap canonical key sitting between exact
        -- text equality (q30) and shingle similarity (q34); this
        -- corpus has no byte-exact duplicates but plenty of bag-equal
        -- near-copies, which is precisely the multi-source case
        SELECT doc_id, source,
               MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
                   STRING_SPLIT({_NORM_SQL.format(c='text')}, ' '))), ' '))
                   AS fp
        FROM documents
    ), ranked AS (
        SELECT fp, doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY fp
                                  ORDER BY source ASC, doc_id ASC) AS rn
        FROM fp
    ), prov AS (
        SELECT fp,
               CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
               STRING_AGG(DISTINCT source, ',' ORDER BY source) AS sources
        FROM fp GROUP BY fp
    )
    SELECT p.fp, p.n_copies, p.n_sources, p.sources,
           r.doc_id AS keep_id, r.source AS keep_source
    FROM prov p JOIN ranked r ON r.fp = p.fp AND r.rn = 1
    WHERE p.n_copies > 1
    """,
)
def q157(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Provenance-aware dedup across sources, keyed by the
    bag-of-words fingerprint (sorted distinct token set — word-order
    and repetition invariant, the cheap canonical identity between
    q30's exact text hash and q34's shingle similarity): for content
    that occurs more than once, the keeper is selected by a
    deterministic source ordering (q30's exact dedup keeps min-id
    blind to origin; real corpus assemblies rank sources —
    license-clean or curated feeds over crawls — so the surviving
    copy has the best provenance), and every surviving fingerprint
    carries its full source set for attribution/audit. The ordering
    used here is plain lexicographic source name — ARBITRARY, not
    quality-ordered ('src_crawl' < 'src_curated', so a crawl copy can
    win); a production deployment replaces it with an explicit
    priority-rank dimension broadcast-joined in front of the same
    keeper window, which changes nothing else in the plan. One content-hash shuffle (uniform keys,
    unskewable) + a fingerprint-partitioned keeper window + one
    aggregate — q30's scale shape with provenance attached."""
    d = load(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(tokens("text"))))
        ).alias("fp"),
    )
    w = Window.partitionBy("fp").orderBy(
        F.col("source").asc(), F.col("doc_id").asc()
    )
    ranked = fp.withColumn("rn", F.row_number().over(w))
    prov = fp.groupBy("fp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.count_distinct("source").cast("bigint").alias("n_sources"),
        F.concat_ws(",", F.array_sort(F.collect_set("source"))).alias("sources"),
    )
    return (
        prov.filter(F.col("n_copies") > 1)
        .join(
            ranked.filter(F.col("rn") == 1).select(
                "fp",
                F.col("doc_id").alias("keep_id"),
                F.col("source").alias("keep_source"),
            ),
            "fp",
        )
        .select("fp", "n_copies", "n_sources", "sources", "keep_id", "keep_source")
    )


@query(
    "q158_exact_auc",
    f"""
    -- Exact tie-corrected AUC (Mann-Whitney U with MIDRANKS) of a
    -- quality score against a binary label, in pure integer
    -- arithmetic: group rows by distinct score, cumulative counts
    -- give 2*midrank = 2*cum_before + cnt + 1 (integers), and
    -- AUC = (2*S_pos - n_pos*(n_pos+1)) / (2*n_pos*n_neg) — ONE
    -- double division at the end, so the statistic is engine-exact
    -- including under heavy score ties (where naive rank tie-breaks
    -- would make AUC depend on sort order).
    WITH scored AS (
        SELECT doc_id,
               ROUND(LEN(LIST_DISTINCT(STRING_SPLIT(
                         {_NORM_SQL.format(c='text')}, ' '))) * 1.0
                     / LEN(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')),
                     6) AS score,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
        FROM documents
    ), by_score AS (
        SELECT score, CAST(COUNT(*) AS BIGINT) AS c,
               CAST(SUM(pos) AS BIGINT) AS p
        FROM scored GROUP BY score
    ), ranked AS (
        SELECT score, c, p,
               CAST(COALESCE(SUM(c) OVER (
                   ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cum_before
        FROM by_score
    ), agg AS (
        SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
               CAST(SUM(c - p) AS BIGINT) AS n_neg,
               CAST(SUM(p * (2 * cum_before + c + 1)) AS BIGINT) AS s2_pos
        FROM ranked
    )
    SELECT n_pos, n_neg,
           ROUND((s2_pos - n_pos * (n_pos + 1)) * 1.0
                 / (2 * n_pos * n_neg), 6) AS auc_r
    FROM agg
    """,
)
def q158(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact AUC of a quality signal (type-token ratio) against a
    binary label (lang = 'en') — the classifier-evaluation statistic
    every learned data filter (q125's shape) is judged by, computed
    tie-CORRECTLY: the Mann-Whitney midrank formulation turns AUC
    into pure integer arithmetic (2*midrank and the U statistic are
    integers; only the final ratio divides), so heavy ties in a
    6dp-rounded score can't make the result depend on sort order —
    the failure mode of naive rank-then-sum implementations.

    Scale shape: rows collapse to DISTINCT SCORE groups first
    (map-side combinable; cardinality bounded by the score's
    resolution, 10^6 here, regardless of corpus size), then one
    ordered cumulative window over that bounded table — the corpus
    never sorts. This is the same histogram trick approximate-AUC
    systems use, except at 6dp resolution it is EXACT."""
    d = load(spark, sf_dir, "documents")
    t = tokens("text")
    # /* bounded */ The unpartitioned cumulative window below is safe
    # ONLY because scores are rounded to `dp` decimals of a ratio in
    # [0, 1]: at most 10^dp + 1 distinct rows ever reach it,
    # independent of corpus size. The guard makes that contract
    # explicit — raising the resolution past 7dp (>10^7 window rows,
    # ~100MB+ of single-partition state) must come with a two-level
    # prefix-sum (per-range partial sums + a tiny carry join) instead
    # of silently recreating a corpus-wide single-partition sort.
    dp = 6
    if dp > 7:  # ValueError, not assert: the guard must survive python -O
        raise ValueError(
            "q158 AUC: score resolution above 7dp unbounds the global "
            "cumulative window — switch to a two-level prefix-sum first"
        )
    scored = d.select(
        F.round(
            F.size(F.array_distinct(t)) * F.lit(1.0) / F.size(t), dp
        ).alias("score"),
        (F.col("lang") == "en").cast("int").alias("pos"),
    )
    by_score = scored.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    w = (
        Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = by_score.withColumn(
        "cum_before", F.coalesce(F.sum("c").over(w), F.lit(0)).cast("bigint")
    )
    agg = ranked.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum(F.col("c") - F.col("p")).cast("bigint").alias("n_neg"),
        F.sum(F.col("p") * (2 * F.col("cum_before") + F.col("c") + 1))
        .cast("bigint")
        .alias("s2_pos"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.round(
            (F.col("s2_pos") - F.col("n_pos") * (F.col("n_pos") + 1))
            * F.lit(1.0)
            / (2 * F.col("n_pos") * F.col("n_neg")),
            6,
        ).alias("auc_r"),
    )


@query(
    "q159_stratified_split",
    """
    -- Stratified train/val/test split: EXACT 80/10/10 proportions
    -- WITHIN every language stratum (q119's hash split is uniform
    -- only in expectation and only globally — a small stratum can
    -- land all-train by chance; evaluation sets need every stratum
    -- represented at the declared rate). Deterministic shuffle: rank
    -- docs inside the stratum by salted md5 (then doc_id), assign by
    -- integer comparison against the stratum size — no floats, no
    -- randomness, bit-identical on any engine.
    WITH h AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY MD5('strat-v1:' || CAST(doc_id AS VARCHAR)),
                            doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN rn * 10 <= n * 8 THEN 'train'
                WHEN rn * 10 <= n * 9 THEN 'val'
                ELSE 'test' END AS split
    FROM h
    """,
)
def q159(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified split with exact per-stratum proportions — the
    sibling of q119's hash split for the case where every stratum
    (language, source, domain) must hit the 80/10/10 rate exactly, not
    just in expectation: a 40-doc language under the uniform hash
    split has a ~1.3% chance of a completely empty val split; here it
    gets exactly 4 val docs. The in-stratum order is a salted-md5
    ranking, so membership is deterministic, engine-reproducible, and
    re-dealable by salt version. Integer-only assignment:
    rn*10 <= n*8 is floor(0.8n) without touching floats.

    Scale shape: one hash-partitioned window per stratum (the same
    shuffle any per-key ranking costs); no global sort, no driver
    state. A skewed mega-stratum makes a single-partition window — at
    100 TB pre-split such strata by a salted sub-key and re-join, the
    standard skew treatment (operators/skew.py)."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("strat-v1:"), F.col("doc_id").cast("string"))),
        F.col("doc_id"),
    )
    wn = Window.partitionBy("lang")
    h = d.select(
        "doc_id",
        "lang",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return h.select(
        "doc_id",
        "lang",
        F.when(F.col("rn") * 10 <= F.col("n") * 8, "train")
        .when(F.col("rn") * 10 <= F.col("n") * 9, "val")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "q160_bigram_logprob",
    f"""
    -- Bigram-LM perplexity scoring (the CCNet/KenLM quality filter one
    -- order up from q130's unigram): fit conditional bigram log-probs
    -- on the corpus with add-one smoothing over the unigram vocab,
    -- score each document by mean negative log-likelihood of its
    -- bigrams. Bigrams come from the token ARRAY by index (engine-
    -- portable; no reliance on UNNEST preserving order).
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), bi AS (
        SELECT doc_id,
               UNNEST(list_transform(
                   generate_series(1, LEN(t) - 1),
                   i -> t[i] || ' ' || t[i + 1]
               )) AS bg
        FROM toks
        WHERE LEN(t) >= 2
    ), big AS (
        SELECT bg, COUNT(*) AS c12 FROM bi GROUP BY bg
    ), uni AS (
        SELECT STRING_SPLIT(bg, ' ')[1] AS w1, SUM(c12) AS c1
        FROM big GROUP BY 1
    ), v AS (
        SELECT COUNT(*) AS vocab FROM uni
    ), lp AS (
        SELECT b.bg,
               LN((b.c12 + 1.0) / (u.c1 + v.vocab)) AS lp
        FROM big b
        JOIN uni u ON STRING_SPLIT(b.bg, ' ')[1] = u.w1
        CROSS JOIN v
    )
    SELECT bi.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-lp.lp), 6) AS nll2_r
    FROM bi JOIN lp USING (bg)
    GROUP BY bi.doc_id
    """,
)
def q160(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram LM scoring — q130's CCNet shape one Markov order up,
    which is where LM-based quality filtering starts to separate
    fluent text from keyword soup (a unigram model scores a shuffled
    document identically; a bigram model does not). Conditional
    probability P(w2|w1) = (c12+1)/(c1+V), add-one smoothed over the
    left-context vocabulary; documents scored by mean NLL of their
    bigrams in one explode + broadcast-join + per-doc AVG pass.

    Bigrams are built by ARRAY INDEX (transform over 1..len-1), not by
    windowing over exploded rows — row order after an explode is not a
    contract anywhere, array order is. At scale both model tables
    (bigram + left-context) are vocabulary-sized, fitted map-side-
    combinable, and broadcast for scoring; production swaps them for a
    pretrained KenLM exported to rows (the model is data, the dataflow
    is this). 6dp mean per the float policy; counts integer-exact."""
    d = load(spark, sf_dir, "documents")
    t = tokens(normalize_text("text"))
    # the bigram table feeds the model fit AND the scoring join; an
    # unpinned plan re-scans + re-explodes the corpus for each use
    # (4 scans). localCheckpoint(eager=False) computes it once and
    # serves both consumers from executor-local blocks — the
    # cache-once-reuse-thrice trade (q156 precedent); at larger scale
    # the same role is played by writing the bigram table out once.
    bi = (
        d.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(t[i - 1], ' ', t[i]))"
                )
            ).alias("bg"),
        )
        .localCheckpoint(eager=False)
    )
    big = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    w1 = F.split(F.col("bg"), " ").getItem(0)
    uni = big.groupBy(w1.alias("w1")).agg(F.sum("c12").alias("c1"))
    vocab = uni.agg(F.count(F.lit(1)).alias("vocab"))
    lp = (
        big.join(F.broadcast(uni), w1 == uni.w1)
        .crossJoin(F.broadcast(vocab))
        .select(
            "bg",
            F.log((F.col("c12") + 1.0) / (F.col("c1") + F.col("vocab"))).alias(
                "lp"
            ),
        )
    )
    return (
        bi.join(F.broadcast(lp), "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(F.avg(-F.col("lp")), 6).alias("nll2_r"),
        )
    )


@query(
    "q161_zipf_slope",
    f"""
    -- Zipf power-law fit of the token frequency distribution: OLS of
    -- ln(count) on ln(rank) over the top-1000 ranks. Natural corpora
    -- sit near slope -1; a corpus slice drifting toward 0 (flat:
    -- boilerplate/templating) or strongly steeper (vocabulary
    -- collapse) fails the diagnostic. Each ln is rounded to 6dp and
    -- summed as DECIMAL so every aggregate is exact and associative;
    -- the final closed-form combination runs in IEEE double on
    -- identical inputs — deterministic on both engines.
    WITH vocab AS (
        SELECT w, COUNT(*) AS c
        FROM (
            SELECT UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS w
            FROM documents
        ) GROUP BY w
    ), top AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS rk
        FROM vocab
        ORDER BY c DESC, w ASC
        LIMIT 1000
    ), pts AS (
        SELECT CAST(ROUND(LN(rk), 6) AS DECIMAL(18,6)) AS x,
               CAST(ROUND(LN(c), 6) AS DECIMAL(18,6)) AS y
        FROM top
    ), s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(x) AS sx, SUM(y) AS sy,
               SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
               SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
        FROM pts
    )
    SELECT n AS n_ranks,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                 6) AS slope_r,
           ROUND((CAST(sy AS DOUBLE) - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * CAST(sx AS DOUBLE)) / n,
                 6) AS intercept_r
    FROM s
    """,
)
def q161(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-slope corpus diagnostic: fit ln(count) ~ ln(rank) by
    closed-form OLS over the top-1000 vocabulary ranks (ties broken by
    token, so the ranking is total and engine-stable). Natural-language
    corpora follow Zipf's law with slope near -1; scraped slices
    dominated by templates/boilerplate flatten toward 0 and
    vocabulary-collapsed slices steepen — a one-number drift check for
    a curation pipeline's output (complements q147's KS drift, which
    needs a reference corpus; this is absolute).

    Scale shape: the vocab agg is map-side combinable; the top-1000 is
    orderBy+limit — Spark plans a TakeOrdered (per-partition top-k +
    driver k-merge), NEVER a full sort — and everything after runs on
    1000 rows. Float policy: ln values rounded to 6dp then summed in
    DECIMAL (exact, associative — a 1000-term double sum would be
    order-dependent); only the final scalar combination is IEEE double
    on bit-identical operands."""
    d = load(spark, sf_dir, "documents")
    toks = d.select(F.explode(tokens(normalize_text("text"))).alias("w"))
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    top = (
        vocab.orderBy(F.col("c").desc(), F.col("w").asc())
        .limit(1000)
        .select(
            "c",
            F.row_number()
            .over(Window.orderBy(F.col("c").desc(), F.col("w").asc()))
            .alias("rk"),
        )
    )
    pts = top.select(
        F.round(F.log("rk"), 6).cast("decimal(18,6)").alias("x"),
        F.round(F.log("c"), 6).cast("decimal(18,6)").alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,12)")).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,12)")).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.alias("n_ranks"),
        F.round(slope, 6).alias("slope_r"),
        F.round((sy - slope * sx) / n, 6).alias("intercept_r"),
    )


@query(
    "q162_tokenizer_fertility",
    f"""
    -- Tokenizer fertility by language: BPE tokens per word and
    -- chars/bytes per BPE token, the data-mix diagnostic multilingual
    -- tokenizer pipelines watch (a language whose fertility is 2x
    -- another's pays 2x the context budget for the same text). The
    -- BPE count is functions/bpe.py's generated REPLACE chain — the
    -- IDENTICAL merge table on both engines — and the ratios are
    -- integer micro-units (exact DIV arithmetic, no float drift).
    WITH t AS (
        SELECT lang,
               {_NORM_SQL.format(c='text')} AS nm,
               CAST({_BPE_COUNT_QC} AS BIGINT) AS n_bpe
        FROM documents
    ), g AS (
        SELECT lang,
               COUNT(*) AS n_docs,
               SUM(LEN(STRING_SPLIT(nm, ' '))) AS total_words,
               SUM(n_bpe) AS total_bpe,
               SUM(LENGTH(nm)) AS total_chars,
               SUM(STRLEN(nm)) AS total_bytes
        FROM t GROUP BY lang
        HAVING SUM(n_bpe) > 0 AND SUM(LEN(STRING_SPLIT(nm, ' '))) > 0
    )
    SELECT lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(total_words AS BIGINT) AS total_words,
           CAST(total_bpe AS BIGINT) AS total_bpe,
           CAST(total_chars AS BIGINT) AS total_chars,
           CAST(total_bytes AS BIGINT) AS total_bytes,
           CAST(total_bpe * 1000000 // total_words AS BIGINT)
               AS fertility_ppm,
           CAST(total_chars * 1000000 // total_bpe AS BIGINT)
               AS chars_per_tok_ppm,
           CAST(total_bytes * 1000000 // total_bpe AS BIGINT)
               AS bytes_per_tok_ppm
    FROM g
    """,
)
def q162(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language (VERDICT r8 item 9): per-lang
    BPE-tokens-per-word (the classic fertility metric — how many
    subwords the tokenizer splits a word into) plus chars-per-token
    and bytes-per-token, over the same deterministic BPE merge chain
    as q122 (functions/bpe.py, oracle-checked bit-exactly). This is
    the metric a data-mix owner reads to see which languages are
    token-expensive under the current vocabulary.

    Scale shape: one scan, per-row expression work (the REPLACE chain
    is pure JVM codegen), then a map-side-combinable groupBy(lang) of
    five integer sums — |langs| rows out. Ratios are integer DIV in
    parts-per-million so the comparison is exact arithmetic on both
    engines, never an order-dependent float."""
    # single-row-group input: parallelize the REPLACE-chain map
    # (scan_parallel is a structural no-op on multi-file inputs)
    d = scan_parallel(load(spark, sf_dir, "documents"))
    nm = normalize_text("text")
    per_doc = d.select(
        "lang",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n_ws"),
        F.expr(count_expr_spark("text")).cast("bigint").alias("n_bpe"),
        F.length(nm).cast("bigint").alias("n_chars"),
        F.octet_length(nm).cast("bigint").alias("n_bytes"),
    )
    g = per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_ws").cast("bigint").alias("total_words"),
        F.sum("n_bpe").cast("bigint").alias("total_bpe"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
    )
    return g.filter(
        (F.col("total_bpe") > 0) & (F.col("total_words") > 0)
    ).select(
        "lang",
        "n_docs",
        "total_words",
        "total_bpe",
        "total_chars",
        "total_bytes",
        F.expr("total_bpe * 1000000 DIV total_words").alias("fertility_ppm"),
        F.expr("total_chars * 1000000 DIV total_bpe").alias(
            "chars_per_tok_ppm"
        ),
        F.expr("total_bytes * 1000000 DIV total_bpe").alias(
            "bytes_per_tok_ppm"
        ),
    )


@query(
    "q163_embedding_drift",
    """
    -- Embedding-space drift vs a reference corpus: split the vectors
    -- into a deterministic reference half (even vec_id) and candidate
    -- half (odd), then per label report the centroid SHIFT (L2 between
    -- the halves' mean vectors) and the VARIANCE RATIO (candidate
    -- dispersion / reference dispersion). Complements q147's
    -- univariate KS: this is the multivariate first/second-moment
    -- check an embedding-pipeline owner runs when the encoder or the
    -- upstream mix changes. Float policy: per-(label,dim) moments are
    -- rounded to 6dp and the cross-dimension folds run in DECIMAL
    -- (exact, associative); only the final sqrt/divide is IEEE double
    -- on bit-identical operands.
    WITH pos AS (
        SELECT label, vec_id % 2 AS side, CAST(i AS INTEGER) AS pos,
               CAST(embedding[i] AS DOUBLE) AS x
        FROM embeddings, UNNEST(RANGE(1, LEN(embedding) + 1)) AS r(i)
        WHERE label IS NOT NULL
    ), moments AS (
        SELECT label, pos,
               CAST(ROUND(AVG(CASE WHEN side = 0 THEN x END), 6)
                    AS DECIMAL(18,6)) AS mu_r,
               CAST(ROUND(AVG(CASE WHEN side = 1 THEN x END), 6)
                    AS DECIMAL(18,6)) AS mu_c,
               CAST(ROUND(VAR_POP(CASE WHEN side = 0 THEN x END), 6)
                    AS DECIMAL(18,6)) AS var_r,
               CAST(ROUND(VAR_POP(CASE WHEN side = 1 THEN x END), 6)
                    AS DECIMAL(18,6)) AS var_c
        FROM pos GROUP BY label, pos
    ), folded AS (
        SELECT label,
               SUM(CAST((mu_c - mu_r) * (mu_c - mu_r) AS DECIMAL(38,12)))
                   AS ss,
               SUM(CAST(var_r AS DECIMAL(38,12))) AS svr,
               SUM(CAST(var_c AS DECIMAL(38,12))) AS svc
        FROM moments GROUP BY label
    ), counts AS (
        SELECT label,
               SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END) AS n_ref,
               SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END) AS n_cur
        FROM embeddings WHERE label IS NOT NULL GROUP BY label
    )
    SELECT f.label,
           CAST(c.n_ref AS BIGINT) AS n_ref,
           CAST(c.n_cur AS BIGINT) AS n_cur,
           ROUND(SQRT(CAST(f.ss AS DOUBLE)), 6) AS centroid_shift_r,
           ROUND(CAST(f.svc AS DOUBLE) / CAST(f.svr AS DOUBLE), 6)
               AS var_ratio_r
    FROM folded f JOIN counts c ON c.label = f.label
    WHERE f.svr > 0
    """,
)
def q163(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift vs a reference corpus (VERDICT r8 item
    9): per-label centroid shift (L2 between the reference and
    candidate halves' mean vectors) + variance ratio — the
    multivariate moment check that catches encoder swaps and upstream
    mix changes q147's univariate KS can miss. The halves split
    deterministically on vec_id parity so the oracle sees identical
    inputs; in production the reference is last month's snapshot.

    Scale shape: posexplode to (label, side, dim) narrow rows — ONE
    shuffle on (label, dim), map-side combined (conditional AVG /
    VAR_POP fold per side in the same agg, so the corpus is scanned
    once); the fold to per-label scalars runs on |labels| x dims rows.
    Float policy: q161's — per-cell moments rounded to 6dp, then
    DECIMAL sums across dims (exact), final sqrt/ratio in double on
    bit-identical operands."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("label").isNotNull())
    pos = e.select(
        "label",
        (F.col("vec_id") % 2).alias("side"),
        F.posexplode("embedding").alias("pos0", "x0"),
    ).select(
        "label", "side", (F.col("pos0") + 1).alias("pos"),
        F.col("x0").cast("double").alias("x"),
    )
    ref = F.when(F.col("side") == 0, F.col("x"))
    cur = F.when(F.col("side") == 1, F.col("x"))
    moments = pos.groupBy("label", "pos").agg(
        F.round(F.avg(ref), 6).cast("decimal(18,6)").alias("mu_r"),
        F.round(F.avg(cur), 6).cast("decimal(18,6)").alias("mu_c"),
        F.round(F.var_pop(ref), 6).cast("decimal(18,6)").alias("var_r"),
        F.round(F.var_pop(cur), 6).cast("decimal(18,6)").alias("var_c"),
    )
    diff2 = (F.col("mu_c") - F.col("mu_r")) * (F.col("mu_c") - F.col("mu_r"))
    folded = moments.groupBy("label").agg(
        F.sum(diff2.cast("decimal(38,12)")).alias("ss"),
        F.sum(F.col("var_r").cast("decimal(38,12)")).alias("svr"),
        F.sum(F.col("var_c").cast("decimal(38,12)")).alias("svc"),
    )
    counts = e.groupBy("label").agg(
        F.sum((F.col("vec_id") % 2 == 0).cast("long"))
        .cast("bigint")
        .alias("n_ref"),
        F.sum((F.col("vec_id") % 2 == 1).cast("long"))
        .cast("bigint")
        .alias("n_cur"),
    )
    return (
        folded.join(counts, "label")
        .filter(F.col("svr") > 0)
        .select(
            "label",
            "n_ref",
            "n_cur",
            F.round(F.sqrt(F.col("ss").cast("double")), 6).alias(
                "centroid_shift_r"
            ),
            F.round(
                F.col("svc").cast("double") / F.col("svr").cast("double"), 6
            ).alias("var_ratio_r"),
        )
    )


@query(
    "q164_decontamination_cut",
    f"""
    -- The actionable half of q94 (the way q145 operationalized q141):
    -- CUT every token of a training document covered by a 3-gram that
    -- also occurs in the held-out eval sources, and fingerprint the
    -- surviving text — the rewrite a decontamination pass applies
    -- before pretraining, not just the overlap report.
    WITH toks AS (
        SELECT doc_id, source, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), grams AS (
        SELECT doc_id, source, i, MD5(ARRAY_TO_STRING(t[i : i + 2], ' ')) AS g
        FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
        WHERE LEN(t) >= 3
    ), eval_g AS (
        SELECT DISTINCT g FROM grams WHERE source IN ('src0','src1','src2')
    ), covered AS (
        SELECT DISTINCT gr.doc_id, p.j
        FROM grams gr JOIN eval_g e ON e.g = gr.g,
             UNNEST(RANGE(gr.i, gr.i + 3)) AS p(j)
        WHERE gr.source NOT IN ('src0','src1','src2')
    ), kept AS (
        SELECT tk.doc_id, tk.i, tk.w
        FROM (SELECT doc_id, i, t[i] AS w
              FROM toks, UNNEST(RANGE(1, LEN(t) + 1)) AS r(i)
              WHERE source NOT IN ('src0','src1','src2')) tk
        ANTI JOIN covered c ON c.doc_id = tk.doc_id AND c.j = tk.i
    )
    SELECT b.doc_id,
           CAST(LEN(b.t) AS BIGINT) AS n_tokens,
           CAST(LEN(b.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
           MD5(COALESCE(k.clean, '')) AS clean_md5
    FROM (SELECT doc_id, t FROM toks
          WHERE source NOT IN ('src0','src1','src2')) b
    LEFT JOIN (
        SELECT doc_id, COUNT(*) AS n_kept,
               STRING_AGG(w, ' ' ORDER BY i) AS clean
        FROM kept GROUP BY doc_id
    ) k ON k.doc_id = b.doc_id
    """,
)
def q164(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination REWRITE (VERDICT r8 item 9 — q94's detection
    turned actionable, the way q145 operationalized q141): remove
    every training-doc token covered by a 3-gram shingle that occurs
    anywhere in the held-out eval sources, and emit the md5 of the
    surviving text plus cut counts. This is the pass that actually
    protects the benchmark: q94 tells you HOW contaminated a doc is,
    this produces the decontaminated corpus.

    Scale shape: same positional-gram machinery as q145
    (operators/dedup.py exactsubstr_grams at n=3 — md5-hashed grams,
    the shuffle never carries word strings). The eval gram set is
    eval-corpus-sized (small by construction — benchmarks are MBs,
    training data is TBs), so the hit join is a broadcast/semi join at
    scale; covered positions explode only from HIT gram positions
    (span-bounded); the rewrite is q145's single array-native
    positional filter — no per-token corpus explode, no re-sort."""
    # spread the RAW text rows (narrow) so tokenize + the 3-gram
    # explode run on every core; exactsubstr_grams itself never
    # shuffles the token arrays (no-op on multi-file inputs)
    d = scan_parallel(load(spark, sf_dir, "documents"))
    eval_srcs = ("src0", "src1", "src2")
    toks = d.select("doc_id", "source", tokens(F.col("text")).alias("t"))
    train = toks.filter(~F.col("source").isin(*eval_srcs)).select(
        "doc_id", "t"
    )
    evald = toks.filter(F.col("source").isin(*eval_srcs)).select("doc_id", "t")
    eval_g = D.exactsubstr_grams(evald, n=3).select("g").distinct()
    covered = (
        D.exactsubstr_grams(train, n=3)
        .join(eval_g, "g")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + 2)).alias("j"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("j").alias("cov"))
    )
    j = train.join(covered, "doc_id", "left").withColumn(
        "cov", F.coalesce("cov", F.array().cast("array<bigint>"))
    )
    return _cut_covered(j)


# Deterministic messy-URL derivation for q165, shared by both engines:
# crawl metadata with every canonicalization hazard the operator
# handles — scheme case, www., default ports, duplicate slashes,
# trailing slashes, tracking params (order-varied), fragments. The
# testdata has no URL column, so the URL is a pure function of the doc
# row (source -> site, lang+doc_id -> page); the CANONICALIZATION and
# the dedup downstream are the operators under test.
_URL_SQL = """(
    CASE doc_id % 3 WHEN 0 THEN 'HTTPS' WHEN 1 THEN 'https'
         ELSE 'http' END
    || '://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END
    || source || '.org'
    || CASE WHEN doc_id % 5 = 0 THEN
           CASE WHEN doc_id % 3 = 2 THEN ':80' ELSE ':443' END
       ELSE '' END
    || '/' || lang
    || CASE WHEN doc_id % 7 = 0 THEN '//' ELSE '/' END
    || 'p' || CAST(doc_id % 5 AS VARCHAR)
    || CASE WHEN doc_id % 2 = 1 THEN '/' ELSE '' END
    || CASE WHEN doc_id % 2 = 0 THEN '?v=1&utm_source=feed'
       ELSE '?utm_campaign=z' || CAST(doc_id AS VARCHAR) || '&v=1' END
    || CASE WHEN doc_id % 3 = 1 THEN '#sec' ELSE '' END
)"""


def _url_col() -> F.Column:
    """Spark twin of _URL_SQL (same rules, same branch order)."""
    did = F.col("doc_id")
    return F.concat(
        F.when(did % 3 == 0, F.lit("HTTPS"))
        .when(did % 3 == 1, F.lit("https"))
        .otherwise(F.lit("http")),
        F.lit("://"),
        F.when(did % 2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".org"),
        F.when(
            did % 5 == 0,
            F.when(did % 3 == 2, F.lit(":80")).otherwise(F.lit(":443")),
        ).otherwise(F.lit("")),
        F.lit("/"),
        F.col("lang"),
        F.when(did % 7 == 0, F.lit("//")).otherwise(F.lit("/")),
        F.lit("p"),
        (did % 5).cast("string"),
        F.when(did % 2 == 1, F.lit("/")).otherwise(F.lit("")),
        F.when(did % 2 == 0, F.lit("?v=1&utm_source=feed")).otherwise(
            F.concat(
                F.lit("?utm_campaign=z"), did.cast("string"), F.lit("&v=1")
            )
        ),
        F.when(did % 3 == 1, F.lit("#sec")).otherwise(F.lit("")),
    )


@query(
    "q165_url_canonical_dedup",
    f"""
    -- URL canonicalization + per-URL dedup (the RefinedWeb/CCNet
    -- first pass): collapse scheme case, www., default ports,
    -- duplicate/trailing slashes, tracking params (value- AND
    -- order-independent) and fragments into one canonical string,
    -- keep the smallest doc_id per canonical URL, and report the
    -- collapse per registrable domain. The canonical form here is
    -- functions/urls.py's rule list mirrored in DuckDB SQL.
    WITH u AS (
        SELECT doc_id, {U.canonical_url_sql(_URL_SQL)} AS canon
        FROM documents
    ), per_url AS (
        SELECT canon, {U.registrable_domain_sql('canon')} AS domain,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(MIN(doc_id) AS BIGINT) AS keep_id
        FROM u GROUP BY canon
    )
    SELECT domain,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(SUM(n_docs) - COUNT(*) AS BIGINT) AS n_removed,
           CAST(SUM(keep_id) AS BIGINT) AS kept_id_sum,
           MIN(canon) AS min_url, MAX(canon) AS max_url
    FROM per_url GROUP BY domain
    """,
)
def q165(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + per-URL dedup (VERDICT r9 item 6b, the
    RefinedWeb shape): canonicalize every document's URL
    (functions/urls.py — scheme/host case, www., default ports,
    duplicate + trailing slashes, tracking-param removal with the
    survivors SORTED so param order never splits a page, fragment
    strip), dedup per canonical URL keeping the smallest doc_id, and
    report the collapse per registrable domain (n_docs vs n_urls,
    removed count, keeper id-sum, min/max canonical URL as value
    witnesses). The testdata has no URL column, so a deterministic
    messy URL is derived per row (_URL_SQL twin expressions) carrying
    every hazard the canonicalizer handles; the canonicalization and
    dedup are the operators under test, byte-compared via the oracle.

    Scale shape: canonicalization is pure per-row expression work
    (regexp/array builtins inside whole-stage codegen — no UDF, no
    shuffle); dedup is ONE hash shuffle on the canonical string with
    map-side combine, then a |domains|-sized second agg. At 100 TB
    the canonical-URL groupBy is the standard dedup exchange; truly
    viral URLs are bounded per-key aggregates (count+min), so skew
    cannot OOM a task — AQE skew-split handles stragglers. The
    registrable-domain extraction is the last-two-labels heuristic; a
    PSL table broadcast in front keeps the same plan shape."""
    d = load(spark, sf_dir, "documents")
    # NOTE: the two-step select is readability only — Catalyst's
    # CollapseProject merges adjacent deterministic projections, so
    # canonical_url()'s ~dozen references to its input DO inline the
    # derivation expression. That is fine here: the derived URL is a
    # small concat (not q34's exploded-shingle shape) and runtime
    # re-evaluation is covered by codegen subexpression elimination
    # (spark.sql.subexpressionElimination, default on). If the input
    # expression ever becomes expensive, a real barrier is needed
    # (localCheckpoint / the groupBy exchange), not a second select.
    u = d.select("doc_id", _url_col().alias("url")).select(
        "doc_id", U.canonical_url("url").alias("canon")
    )
    per_url = u.groupBy("canon").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("keep_id"),
    )
    return (
        per_url.withColumn("domain", U.registrable_domain(F.col("canon")))
        .groupBy("domain")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
            (F.sum("n_docs") - F.count(F.lit(1)))
            .cast("bigint")
            .alias("n_removed"),
            F.sum("keep_id").cast("bigint").alias("kept_id_sum"),
            F.min("canon").alias("min_url"),
            F.max("canon").alias("max_url"),
        )
    )


@query(
    "q166_ngram_novelty",
    f"""
    -- n-gram novelty / memorization-risk scoring (VERDICT r9 item
    -- 6c): for each doc, the fraction of its 3-gram occurrences
    -- whose gram is UNSEEN in the corpus so far (every earlier
    -- doc_id — dump arrival order). Low novelty = the doc is mostly
    -- re-statements of earlier data = high memorization risk and low
    -- marginal training value; the per-doc score is what a curation
    -- pass thresholds on. Grams are md5-hashed (32-byte keys, never
    -- word strings); ratios are integer ppm (exact on both engines).
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), grams AS (
        SELECT doc_id, MD5(ARRAY_TO_STRING(t[i : i + 2], ' ')) AS g
        FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
        WHERE LEN(t) >= 3
    ), first_seen AS (
        SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
    ), per_doc AS (
        SELECT gr.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_grams,
               CAST(SUM(CASE WHEN f.first_doc = gr.doc_id THEN 1
                             ELSE 0 END) AS BIGINT) AS n_novel
        FROM grams gr JOIN first_seen f ON f.g = gr.g
        GROUP BY gr.doc_id
    )
    SELECT b.doc_id,
           COALESCE(p.n_grams, 0) AS n_grams,
           COALESCE(p.n_novel, 0) AS n_novel,
           CAST(CASE WHEN p.n_grams > 0
                THEN p.n_novel * 1000000 // p.n_grams END AS BIGINT)
               AS novelty_ppm,
           CAST(CASE WHEN p.n_grams > 0
                THEN (p.n_grams - p.n_novel) * 1000000 // p.n_grams END
                AS BIGINT) AS risk_ppm
    FROM toks b LEFT JOIN per_doc p ON p.doc_id = b.doc_id
    """,
)
def q166(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram novelty / memorization-risk score (VERDICT r9 item 6c):
    per doc, the fraction of its 3-gram occurrences whose gram does
    not occur in ANY earlier document (doc_id = dump arrival order;
    production substitutes the (dump_seq, row) ordering the reference
    A24 dump model provides). q141 measures symmetric cross-doc
    duplication; this is the ORDER-RESPECTING marginal-value variant:
    the second copy of a passage scores zero novelty while the first
    keeps full credit, which is exactly the asymmetry a keep-the-
    first curation policy needs.

    Scale shape: the gram table is q141/q145/q164's shared
    exactsubstr_grams (md5-hashed 32-byte shuffle keys); first-seen is
    a gram-keyed MIN(doc_id) with map-side combine; the join back is
    gram-keyed on two co-partitioned children of the SAME exchange
    (one gram shuffle feeds both the aggregate and the probe); the
    per-doc rollup is a doc-keyed second agg. Nothing is pairwise and
    no state exceeds a bounded aggregate per gram, so a 100x corpus
    scales the two exchanges linearly."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("t"))
    grams = D.exactsubstr_grams(toks, n=3).localCheckpoint(eager=False)
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long"))
            .cast("bigint")
            .alias("n_novel"),
        )
    )
    j = toks.join(per_doc, "doc_id", "left")
    n_grams = F.coalesce("n_grams", F.lit(0).cast("bigint"))
    return j.select(
        "doc_id",
        n_grams.alias("n_grams"),
        F.coalesce("n_novel", F.lit(0).cast("bigint")).alias("n_novel"),
        F.when(
            F.col("n_grams") > 0,
            F.expr("n_novel * 1000000 DIV n_grams"),
        )
        .cast("bigint")
        .alias("novelty_ppm"),
        F.when(
            F.col("n_grams") > 0,
            F.expr("(n_grams - n_novel) * 1000000 DIV n_grams"),
        )
        .cast("bigint")
        .alias("risk_ppm"),
    )


@query(
    "q167_incremental_neardup",
    f"""
    -- Cross-dump incremental near-dup (VERDICT r9 item 6a): dedup a
    -- NEW dump (doc_id % 5 = 4 — the deterministic stand-in for the
    -- latest A24 dump) against the PERSISTED banded-MinHash index of
    -- everything imported before, at O(batch). The oracle is the
    -- maintained == rebuilt proof: it recomputes the FULL corpus's
    -- bands from scratch and keeps collision pairs touching the new
    -- dump — by construction identical to probe(new vs index) UNION
    -- (new vs new). Candidates get the exact 3-gram Jaccard re-score
    -- (precision 1, fully deterministic, hence hashable).
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), sh AS (
        SELECT DISTINCT doc_id, ARRAY_TO_STRING(t[i:i+2], ' ') AS s
        FROM toks, UNNEST(RANGE(1, GREATEST(LEN(t) - 1, 1))) AS r(i)
        WHERE LEN(t) >= 3
    ), mh AS (
        SELECT doc_id, seed, MIN(MD5(CAST(seed AS VARCHAR) || '|' || s)) AS h
        FROM sh CROSS JOIN UNNEST(RANGE(1, 17)) AS r(seed)
        GROUP BY doc_id, seed
    ), bands AS (
        SELECT doc_id, (seed - 1) // 4 AS band,
               MD5(STRING_AGG(h, '' ORDER BY seed)) AS bh
        FROM mh GROUP BY doc_id, (seed - 1) // 4
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
        WHERE a.doc_id % 5 = 4 OR b.doc_id % 5 = 4
    ), common AS (
        SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS common
        FROM cand c
          JOIN sh sa ON sa.doc_id = c.doc_a
          JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
        GROUP BY c.doc_a, c.doc_b
    ), sizes AS (
        SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id
    )
    SELECT m.doc_a, m.doc_b, m.common,
           ROUND(m.common * 1.0 / (sa.n_sh + sb.n_sh - m.common), 6)
               AS jaccard_r
    FROM common m
      JOIN sizes sa ON sa.doc_id = m.doc_a
      JOIN sizes sb ON sb.doc_id = m.doc_b
    """,
)
def q167(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dump incremental near-dup (VERDICT r9 item 6a — the
    reference's A24/A25 dump model married to the MinHash-LSH dedup
    pillar): the banded-signature table of every previously imported
    dump is a PERSISTED INDEX (bands are per-doc facts, so index
    maintenance is a pure append of the new dump's bands — the MV
    discipline applied to an index); deduping a new dump costs
    O(batch): shingle/hash only the new docs, probe the index with a
    (band, band_hash) equi-join, add new-vs-new collisions, then
    exact-Jaccard re-score the candidates. The old corpus is never
    re-shingled. The oracle rebuilds bands for the FULL corpus and
    filters to pairs touching the new dump — maintained == rebuilt.

    Scale shape: probe shuffle carries O(new_docs x bands) rows
    against an index read pre-bucketed by band_hash (warehouse
    ``bucket`` layout: the index side co-locates without a shuffle —
    tests/test_operators.py pins the bucketed variant); candidate
    re-score joins explode only CANDIDATE pairs' shingles, never the
    corpus cross product. At 100 TB the index is a warehouse table
    maintained by the same changed-bucket merge as every other MV,
    and a dump's dedup cost tracks the dump, not the corpus
    (tools/scale_probe.py --incremental-neardup)."""
    d = load(spark, sf_dir, "documents")
    # The self-contained registered query materializes the band index
    # inline (ONE corpus scan, checkpointed, split by dump membership
    # — band rows are per-doc facts, so filter(old)/filter(new) of the
    # full table IS index ∪ new-batch); production reads the index
    # from the warehouse table instead and only the new dump is ever
    # shingled (tests/test_operators.py::TestIncrementalNeardupIndex,
    # tools/scale_probe.py --incremental-neardup).
    bands = D.minhash_bands(
        d, "text", "doc_id", num_hashes=16, band_size=4
    ).localCheckpoint(eager=False)
    is_new_band = F.col("doc") % 5 == 4
    cand = D.incremental_neardup_candidates(
        bands.filter(~is_new_band), bands.filter(is_new_band)
    )
    # candidate-BOUNDED exact re-score (r10 What's-wrong #1 closed):
    # documents is semi-joined to the distinct candidate ids before
    # tokenize/shingle, so the re-score never re-shingles the corpus
    # — per-dump dedup cost tracks the dump end to end
    return D.rescore_candidates(d, cand, "text", "doc_id", n=3)


@query(
    "q168_ann_index_probe",
    f"""
    -- Cross-dump ANN probe (round 11 — the q167 dump model applied to
    -- similarity search, backed by the PERSISTED IVF index lane in
    -- plans/ops.py): the index corpus is everything imported before
    -- (vec_id % 5 <> 4); the new dump's vectors are the query batch.
    -- Centroids are frozen from the INDEX corpus (first-16-by-id seed
    -- + ONE unrolled Lloyd iteration, 6dp means, tie-broken argmax)
    -- and the probe searches 4 cells per query — fully deterministic,
    -- so the approximate index is reproducible in SQL.
    WITH corpus AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 <> 4
    ), q AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 4
    ), cents0 AS (
        SELECT cell, cvec FROM (
            SELECT ROW_NUMBER() OVER (ORDER BY vec_id ASC) AS cell,
                   embedding AS cvec
            FROM corpus
        ) WHERE cell <= 16
    ), {_kmeans_ctes(1, "corpus")}, cents AS (
        SELECT cell, cvec FROM cents1
    ), assign_scored AS (
        SELECT e.vec_id AS neighbor_id, e.embedding AS cv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_COS_QC.format(a='e.embedding', b='c.cvec')} DESC,
                                           c.cell ASC) AS rn
        FROM corpus e CROSS JOIN cents c
    ), assigned AS (
        SELECT neighbor_id, cv, cell FROM assign_scored WHERE rn = 1
    ), probe_scored AS (
        SELECT q.vec_id AS query_id, q.embedding AS qv, c.cell,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_COS_QC.format(a='q.embedding', b='c.cvec')} DESC,
                                           c.cell ASC) AS pr
        FROM q CROSS JOIN cents c
    ), probes AS (
        SELECT query_id, qv, cell FROM probe_scored WHERE pr <= 4
    ), scored AS (
        SELECT p.query_id, a.neighbor_id,
               {_COS_QC.format(a='p.qv', b='a.cv')} AS sim
        FROM assigned a JOIN probes p USING (cell)
        WHERE p.query_id <> a.neighbor_id
    ), ranked AS (
        SELECT query_id, neighbor_id, sim,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, ROUND(sim, 6) AS sim_r,
           CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dump ANN probe against a FROZEN IVF index (round 11 —
    VERDICT r10 What's-missing #3 made a registry row): the new dump's
    embeddings (vec_id % 5 == 4, the q167/A24 dump stand-in) are the
    query batch; neighbors come only from the previously imported
    corpus, whose centroids (first-16 seed + one deterministic Lloyd
    iteration) are the frozen cell function a persisted index carries.

    The production lane is the WAREHOUSE-TABLE index: plans/ops.py
    ``create_ann_index`` stores (vec_id, embedding, cell) bucketed by
    cell with the centroids in table properties, ``update_ann_index``
    maintains it from the change feed at O(changed) — departing rows
    re-locate their old cell from the frozen centroids, no index scan
    — and ``probe_ann_index`` answers a query batch reading only the
    probed cells' buckets (maintained == rebuilt and probe parity with
    this query's dataflow pinned in TestAnnIndex). This registered
    query materializes the same dataflow inline so the oracle can
    byte-compare it.

    Scale shape: assignment is one broadcast(centroids) cross join +
    argmax agg per corpus vector (precomputed in the index table at
    production); the probe is an equi-join on cell against a
    broadcast 4-cells-per-query probe set — at 100 TB a query batch
    reads n_probe/n_cells of the corpus via bucket pruning
    (tools/scale_probe.py --ann-index: probe flat at 200x corpus
    growth while exact brute-force grows 36x)."""
    e = load(spark, sf_dir, "embeddings")
    is_new = F.col("vec_id") % 5 == 4
    corpus, queries_df = e.filter(~is_new), e.filter(is_new)
    # vectorized=True: blocked-BLAS cell assignment + fused Lloyd
    # partials (the at-scale default, same as q118) — argmax parity
    # with the expression path the oracle mirrors is pinned by the
    # semantic-dedup parity test and by q68, which keeps running the
    # expression path end-to-end against the same kind of oracle;
    # bitdiff-verified at sf0.001 + sf0.01.
    topk = S.ivf_topk(
        corpus, queries_df, k=10, n_cells=16, n_probe=4,
        vectorized=True, refine_iters=1,
    )
    return topk.select(
        "query_id", "neighbor_id", F.round("sim", 6).alias("sim_r"), "rank"
    )


@query(
    "q169_domain_reputation_gate",
    f"""
    -- Per-domain reputation gating doc retention (round 11 — the
    -- RefinedWeb second pass over q165's registrable domain): a
    -- domain's reputation is aggregated from its documents (URL-level
    -- duplication rate + short-doc rate, integer ppm), then broadcast
    -- back so every document carries its domain's verdict. Retention
    -- keeps docs whose domain shows dup_ppm <= 660000 AND
    -- short_ppm <= 100000.
    WITH u AS (
        SELECT doc_id, text,
               {U.canonical_url_sql(_URL_SQL)} AS canon
        FROM documents
    ), d AS (
        SELECT doc_id, text, canon,
               {U.registrable_domain_sql('canon')} AS domain
        FROM u
    ), rep AS (
        SELECT domain,
               CAST(COUNT(*) AS BIGINT) AS domain_docs,
               CAST((COUNT(*) - COUNT(DISTINCT canon)) * 1000000
                    // COUNT(*) AS BIGINT) AS dup_ppm,
               CAST(SUM(CASE WHEN (CASE WHEN LENGTH(TRIM(text)) = 0
                                   THEN 0
                                   ELSE LEN(STRING_SPLIT_REGEX(
                                            TRIM(text), '\\s+')) END) < 20
                         THEN 1 ELSE 0 END) * 1000000
                    // COUNT(*) AS BIGINT) AS short_ppm
        FROM d GROUP BY domain
    )
    SELECT d.doc_id, d.domain, rep.domain_docs, rep.dup_ppm,
           rep.short_ppm,
           (rep.dup_ppm <= 660000 AND rep.short_ppm <= 100000)
               AS retained
    FROM d JOIN rep USING (domain)
    """,
)
def q169(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain reputation aggregation gating document retention
    (round 11 registry row (b) — RefinedWeb's domain-level second
    pass, built on q165's canonicalization + PSL registrable domain):
    documents score their domain by URL-duplication rate (canonical
    URLs collapsing = scraped/mirrored content) and short-doc rate
    (boilerplate farms), both integer ppm; every document is then
    gated by its domain's verdict — the per-DOMAIN decision that
    individual per-doc filters cannot express.

    Scale shape: a TWO-LEVEL aggregation — one hash shuffle on domain
    (COUNT/SUM are map-side-combinable; the COUNT(DISTINCT canon) is
    Spark's standard two-phase expand, keyed by (domain, canon) — the
    same exchange the dedup already pays) — then the |domains|-sized
    reputation table joins BACK via broadcast, so the corpus is
    scanned once and shuffled once; no per-doc second shuffle. At
    100 TB a mega-domain is a bounded aggregate (no per-key state
    beyond the partial sums), and the broadcast side stays
    domain-sized regardless of corpus growth."""
    d = load(spark, sf_dir, "documents")
    # one canonicalize+PSL pass: base is consumed by the reputation
    # aggregate AND the per-doc verdict join — without a barrier the
    # regex-heavy URL canonicalization runs twice over the corpus
    # (measured 4.2s -> 1.2s at sf0.1). The barriered frame is narrow
    # (id, short flag, canon, domain); text folds into the flag first.
    base = (
        d.select(
            "doc_id",
            (token_count("text") < 20).cast("long").alias("__short"),
            U.canonical_url(_url_col()).alias("canon"),
        )
        .withColumn("domain", U.registrable_domain(F.col("canon")))
        .localCheckpoint(eager=False)
    )
    rep = (
        base.groupBy("domain")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("domain_docs"),
            F.countDistinct("canon").alias("__n_urls"),
            F.sum("__short").alias("__n_short"),
        )
        .select(
            "domain",
            "domain_docs",
            F.expr(
                "(domain_docs - __n_urls) * 1000000 DIV domain_docs"
            ).cast("bigint").alias("dup_ppm"),
            F.expr("__n_short * 1000000 DIV domain_docs")
            .cast("bigint")
            .alias("short_ppm"),
        )
    )
    return base.select("doc_id", "domain").join(
        F.broadcast(rep), "domain"
    ).select(
        "doc_id",
        "domain",
        "domain_docs",
        "dup_ppm",
        "short_ppm",
        (
            (F.col("dup_ppm") <= 660000) & (F.col("short_ppm") <= 100000)
        ).alias("retained"),
    )


@query(
    "q170_sentence_span_dedup",
    f"""
    -- Sentence-level span dedup (round 11 registry row (c) -- C4's
    -- three-sentence rule, Raffel et al. 2020: remove any
    -- three-sentence span occurring MORE THAN ONCE in the dataset,
    -- within- or cross-document): the q145/q164 positional-cut
    -- machinery at sentence granularity. The fixture text carries no
    -- sentence punctuation, so a deterministically punctuated twin is
    -- derived per row (a period after every 5th token -- the q165
    -- derive-the-missing-column precedent) and the REAL sentence
    -- splitter parses it back before the span logic runs.
    WITH toks AS (
        SELECT doc_id, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS w
        FROM documents
    ), ptext AS (
        SELECT doc_id,
               CASE WHEN LEN(w) > 0 THEN
                   ARRAY_TO_STRING(LIST_TRANSFORM(
                       RANGE(0, CAST(CEIL(LEN(w) / 5.0) AS BIGINT)),
                       g -> ARRAY_TO_STRING(w[g * 5 + 1 : g * 5 + 5], ' ')
                            || '.'), ' ')
               ELSE '' END AS p
        FROM toks
    ), sents AS (
        SELECT doc_id,
               LIST_FILTER(STRING_SPLIT(REGEXP_REPLACE(p, '([.!?]) ',
                   '\\1' || CHR(1), 'g'), CHR(1)), x -> x <> '') AS t
        FROM ptext
    ), spans AS (
        SELECT doc_id, i, MD5(ARRAY_TO_STRING(t[i : i + 2], ' ')) AS g
        FROM sents, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
        WHERE LEN(t) >= 3
    ), dupg AS (
        SELECT g FROM spans GROUP BY g HAVING COUNT(*) > 1
    ), covered AS (
        SELECT DISTINCT s.doc_id, p.j
        FROM spans s JOIN dupg USING (g),
             UNNEST(RANGE(s.i, s.i + 3)) AS p(j)
    ), kept AS (
        SELECT sk.doc_id, sk.i, sk.w
        FROM (SELECT doc_id, i, t[i] AS w
              FROM sents, UNNEST(RANGE(1, LEN(t) + 1)) AS r(i)) sk
        ANTI JOIN covered c ON c.doc_id = sk.doc_id AND c.j = sk.i
    )
    SELECT b.doc_id,
           CAST(LEN(b.t) AS BIGINT) AS n_sentences,
           CAST(LEN(b.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
           MD5(COALESCE(k.clean, '')) AS clean_md5
    FROM sents b LEFT JOIN (
        SELECT doc_id, COUNT(*) AS n_kept,
               STRING_AGG(w, ' ' ORDER BY i) AS clean
        FROM kept GROUP BY doc_id
    ) k ON k.doc_id = b.doc_id
    """,
)
def q170(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-level span dedup -- C4's three-sentence rule (round 11
    registry row (c)): any three-sentence span occurring more than
    once in the corpus (within- OR cross-document -- C4's occurrence
    rule, unlike q145's distinct-doc ExactSubstr rule) is cut from
    every document carrying it; output is the per-doc sentence count,
    removed count, and the md5 of the surviving text.

    Shares the q145/q164 machinery wholesale at sentence granularity:
    ``exactsubstr_grams(n=3)`` over the SENTENCE array (md5-hashed
    32-byte span keys), a span-keyed occurrence aggregate, positional
    cover explode bounded to duplicated spans, and the O(|t| + |cov|)
    array-native ``_cut_covered`` rewrite. The sentence splitter
    (split at [.!?]+space via a CHR(1) sentinel -- no lookbehind, so
    both engines' regex dialects agree) runs on a deterministically
    punctuated twin of the fixture text (period after every 5th
    token), since the testdata carries none -- the q165 precedent for
    deriving a missing column; on real data the splitter consumes the
    raw text directly.

    Scale shape: sentence spans shrink the gram table ~5x vs token
    8-grams (one row per SENTENCE position, not token position); the
    dup aggregate is map-side-combinable on 32-byte keys; cover
    positions explode only from DUPLICATED spans; the rewrite is
    per-doc array work with no second corpus shuffle. Same linear
    discipline as q145 (200k-token regression pinned there)."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens("text").alias("__t"))
    n_grp = (F.ceil(F.size("__t") / F.lit(5))).cast("int")
    ptext = F.when(
        F.size("__t") > 0,
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), n_grp - 1),
                lambda g: F.concat(
                    F.concat_ws(
                        " ", F.slice(F.col("__t"), g * 5 + 1, 5)
                    ),
                    F.lit("."),
                ),
            ),
        ),
    ).otherwise(F.lit(""))
    sent_arr = F.filter(
        F.split(
            F.regexp_replace(ptext, r"([.!?]) ", "$1\u0001"), "\u0001"
        ),
        lambda x: x != F.lit(""),
    )
    # sfr feeds both the span table and the final cut join; the
    # barrier runs the tokenize + sentence re-derivation once
    # (measured 3.6s -> 1.2s at sf0.1)
    sfr = toks.select("doc_id", sent_arr.alias("t")).localCheckpoint(
        eager=False
    )
    spans = D.exactsubstr_grams(sfr, n=3).localCheckpoint(eager=False)
    dupg = (
        spans.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("g")
    )
    covered = (
        D.exactsubstr_covered_positions(spans, dupg, n=3)
        .groupBy("doc_id")
        .agg(F.collect_set("j").alias("cov"))
    )
    j = sfr.join(covered, "doc_id", "left").withColumn(
        "cov", F.coalesce("cov", F.array().cast("array<bigint>"))
    )
    return _cut_covered(j).withColumnRenamed("n_tokens", "n_sentences")


@query(
    "q171_decontam_index_probe",
    f"""
    -- Maintained-decontamination-index probe (round 12 registry slot
    -- a): only the NEW dump's documents (doc_id % 5 = 4 — the A24/A25
    -- new-dumps-only stand-in q167/q168 use) are probed against the
    -- eval suite's persisted gram set and span-cut. The production
    -- lane is the WAREHOUSE-TABLE index: plans/ops.py
    -- register_decontam_index persists the eval corpus' DISTINCT
    -- (doc, gram) edges bucketed by gram hash, sync_decontam_index
    -- maintains it from the eval corpus' change feed at O(changed),
    -- and probe_decontam_index answers a dump at O(batch) reading
    -- only the buckets the dump's own grams route to — the eval
    -- grams are never re-derived per dump. This row materializes the
    -- same dataflow inline so DuckDB can byte-compare it.
    WITH toks AS (
        SELECT doc_id, source, STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ') AS t
        FROM documents
    ), grams AS (
        SELECT doc_id, source, i, MD5(ARRAY_TO_STRING(t[i : i + 2], ' ')) AS g
        FROM toks, UNNEST(RANGE(1, LEN(t) - 1)) AS r(i)
        WHERE LEN(t) >= 3
    ), eval_g AS (
        SELECT DISTINCT g FROM grams WHERE source IN ('src0','src1','src2')
    ), covered AS (
        SELECT DISTINCT gr.doc_id, p.j
        FROM grams gr JOIN eval_g e ON e.g = gr.g,
             UNNEST(RANGE(gr.i, gr.i + 3)) AS p(j)
        WHERE gr.source NOT IN ('src0','src1','src2')
          AND gr.doc_id % 5 = 4
    ), kept AS (
        SELECT tk.doc_id, tk.i, tk.w
        FROM (SELECT doc_id, i, t[i] AS w
              FROM toks, UNNEST(RANGE(1, LEN(t) + 1)) AS r(i)
              WHERE source NOT IN ('src0','src1','src2')
                AND doc_id % 5 = 4) tk
        ANTI JOIN covered c ON c.doc_id = tk.doc_id AND c.j = tk.i
    )
    SELECT b.doc_id,
           CAST(LEN(b.t) AS BIGINT) AS n_tokens,
           CAST(LEN(b.t) - COALESCE(k.n_kept, 0) AS BIGINT) AS n_removed,
           MD5(COALESCE(k.clean, '')) AS clean_md5
    FROM (SELECT doc_id, t FROM toks
          WHERE source NOT IN ('src0','src1','src2')
            AND doc_id % 5 = 4) b
    LEFT JOIN (
        SELECT doc_id, COUNT(*) AS n_kept,
               STRING_AGG(w, ' ' ORDER BY i) AS clean
        FROM kept GROUP BY doc_id
    ) k ON k.doc_id = b.doc_id
    """,
)
def q171(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination as the A24/A25 dump loop runs it (round 12 —
    VERDICT r11 next-round #3): probe ONE new dump against the
    maintained eval gram index and span-cut the hits, instead of
    q164's re-derive-everything pass over the whole corpus.

    Production lane (pinned maintained == rebuilt and probe parity in
    TestDecontamIndex): plans/ops.py register_decontam_index /
    sync_decontam_index / probe_decontam_index — the eval suite's
    (doc, gram) edges live bucketed by gram hash, advance at
    O(eval changes) under PipelineConfig.auto_maintain_indexes, and a
    dump probe reads only the b/N buckets its own grams hash to.

    Scale shape: the dump side is |dump| x grams narrow rows (md5
    keys, never word strings — operators/dedup.py exactsubstr_grams);
    the index side is eval-corpus-sized by construction, so the hit
    join is semi/broadcast-sized at 100 TB; covered positions explode
    only from HIT gram positions (span-bounded); the rewrite is
    q145's array-native positional filter (_cut_covered)."""
    # deliberately NOT spread: the dump side is 1/5 of the corpus and
    # ``toks`` feeds three consumers (dump grams, eval grams, the
    # final join), so a scan-level exchange triples in the plan while
    # the map work it spreads is dump-sized — measured A/B at sf0.1:
    # unspread 1.09 s vs spread 1.20 s vs r13's wide-array spread 1.28 s
    d = load(spark, sf_dir, "documents")
    eval_srcs = ("src0", "src1", "src2")
    toks = d.select("doc_id", "source", tokens(F.col("text")).alias("t"))
    dump = toks.filter(
        (~F.col("source").isin(*eval_srcs)) & (F.col("doc_id") % 5 == 4)
    ).select("doc_id", "t")
    evald = toks.filter(F.col("source").isin(*eval_srcs)).select(
        "doc_id", "t"
    )
    eval_g = D.exactsubstr_grams(evald, n=3).select("g").distinct()
    covered = (
        D.exactsubstr_grams(dump, n=3)
        .join(eval_g, "g")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("i"), F.col("i") + 2)).alias("j"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.collect_set("j").alias("cov"))
    )
    j = dump.join(covered, "doc_id", "left").withColumn(
        "cov", F.coalesce("cov", F.array().cast("array<bigint>"))
    )
    return _cut_covered(j)


@query(
    "q172_bloom_dedup_prepass",
    f"""
    -- Bloom-filter dedup pre-pass (round 12 registry slot b — the
    -- Dolma/BFF shape): membership of each NEW dump document's
    -- content fingerprint in a DETERMINISTIC Bloom filter built over
    -- the prior corpus — 3 salted md5 hash rows x 4096 bits, bit ids
    -- the first 3 hex chars of the salted md5 (hex STRINGS end to
    -- end, the q119/q142 cross-engine rule). The filter is O(1)
    -- memory at any corpus size; the oracle rebuilds it bit-for-bit
    -- and the exact join verifies the Bloom contract: a true
    -- duplicate is NEVER missed (no_false_negative is 1 on every
    -- row); hits are only 'maybe' (the FP rate is bounded in
    -- TestBloomPrepass).
    WITH fps AS (
        SELECT doc_id, MD5({_NORM_SQL.format(c='text')}) AS fp
        FROM documents
    ), old AS (
        SELECT DISTINCT fp FROM fps WHERE doc_id % 5 != 4
    ), newd AS (
        SELECT doc_id, fp FROM fps WHERE doc_id % 5 = 4
    ), bits AS (
        SELECT DISTINCT r.i AS row_id,
               SUBSTR(MD5('bff' || r.i || ':' || fp), 1, 3) AS b
        FROM old, UNNEST([0, 1, 2]) AS r(i)
    ), hits AS (
        SELECT n.doc_id, CAST(COUNT(*) AS BIGINT) AS nhit
        FROM newd n
        JOIN bits c
          ON c.b = SUBSTR(MD5('bff' || c.row_id || ':' || n.fp), 1, 3)
        GROUP BY n.doc_id
    ), exact AS (
        SELECT DISTINCT n.doc_id FROM newd n JOIN old o ON o.fp = n.fp
    )
    SELECT n.doc_id,
           CAST(COALESCE(h.nhit, 0) = 3 AS INT) AS maybe_dup,
           CAST(e.doc_id IS NOT NULL AS INT) AS exact_dup,
           CAST(COALESCE(h.nhit, 0) = 3 OR e.doc_id IS NULL AS INT)
               AS no_false_negative
    FROM newd n
    LEFT JOIN hits h ON h.doc_id = n.doc_id
    LEFT JOIN exact e ON e.doc_id = n.doc_id
    """,
)
def q172(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom pre-pass for exact dedup at dump granularity (round 12 —
    VERDICT r11 next-round #4, the Dolma/BFF shape made a registry
    row): before the exact q30 fingerprint join, each new dump is
    probed against a FIXED-SIZE Bloom filter of the prior corpus'
    content fingerprints; only maybe-hits need the exact join at all.

    operators/dedup.py ``bloom_bits`` builds the filter as distinct
    (row_id, bit) rows — k=3 salted md5 rows, 3-hex-char bit ids
    (m=4096 per row) — and ``bloom_maybe_member`` probes it with k
    broadcast joins. Mergeable by construction (bits(A ∪ B) ==
    bits(A) ∪ bits(B)), so per-snapshot sidecars union into the
    corpus filter without rescanning history — the O(1)-memory dedup
    lane where even the exact gram/fingerprint table is too big.

    Scale shape: the filter build is a map-side-combined distinct
    whose key space is bounded by k·4096 regardless of corpus size
    (the mergeable-sketch property, q62/q142's class); every probe
    join is a broadcast of the fixed-size filter. The exact-truth join
    here exists to PROVE the contract (no false negatives, bounded
    false positives) — at 100 TB it runs only on maybe-hits."""
    from canvas_data_loader_spark.functions.text import fingerprint

    d = load(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 4
    old, new = d.filter(~is_new), d.filter(is_new)
    bits = D.bloom_bits(old, "text").localCheckpoint(eager=False)
    probe = D.bloom_maybe_member(new, bits, "text", "doc_id")
    old_fp = old.select(fingerprint("text").alias("__fp")).distinct()
    ex = (
        new.select("doc_id", fingerprint("text").alias("__fp"))
        .join(
            F.broadcast(old_fp.withColumn("__e", F.lit(1))), "__fp", "left"
        )
        .select(
            "doc_id",
            F.col("__e").isNotNull().cast("int").alias("exact_dup"),
        )
    )
    return probe.join(ex, "doc_id").select(
        "doc_id",
        "maybe_dup",
        "exact_dup",
        ((F.col("maybe_dup") == 1) | (F.col("exact_dup") == 0))
        .cast("int")
        .alias("no_false_negative"),
    )


@query(
    "q173_ccnet_ppl_buckets",
    f"""
    -- CCNet perplexity partition (round 12 registry slot c — Wenzek
    -- et al. 2020's head/middle/tail split, the canonical quality
    -- partition public corpus builds apply before sampling): per-LANG
    -- terciles of the LM quality score (q130's unigram NLL — the real
    -- CCNet uses a pretrained 5-gram KenLM; the model is data, the
    -- dataflow identical). Bucket assignment is RANK arithmetic
    -- (rn*3 vs n), not value-threshold comparison: integer-exact on
    -- both engines, no interpolated-quantile knife edges; scores ride
    -- as integer micro-units per the q128 cross-engine policy.
    WITH toks AS (
        SELECT doc_id, lang,
               UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS w
        FROM documents
    ), vocab AS (
        SELECT w, COUNT(*) AS c FROM toks GROUP BY w
    ), tot AS (
        SELECT SUM(c) AS n FROM vocab
    ), lp AS (
        SELECT w, LN(c * 1.0 / n) AS lp FROM vocab CROSS JOIN tot
    ), scores AS (
        SELECT t.doc_id, t.lang,
               CAST(FLOOR(ROUND(AVG(-l.lp), 6) * 1000000 + 0.5) AS BIGINT)
                   AS nll_micro
        FROM toks t JOIN lp l USING (w)
        GROUP BY t.doc_id, t.lang
    ), ranked AS (
        SELECT doc_id, lang, nll_micro,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY nll_micro, doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM scores
    )
    SELECT doc_id, lang, nll_micro,
           CASE WHEN rn * 3 <= n THEN 'head'
                WHEN rn * 3 <= 2 * n THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM ranked
    """,
)
def q173(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity buckets (round 12 — VERDICT
    r11 next-round #5): every public corpus build's quality partition
    — per-language terciles of the LM score, head = most in-domain.
    Reuses q130's fit-then-score LM dataflow (vocabulary-sized
    log-prob table, broadcast for the scoring join).

    Exactness: bucket boundaries are RANK terciles (row_number * 3 vs
    partition count — pure integer arithmetic, deterministic tie-break
    on (score, doc_id)), not interpolated-quantile value thresholds,
    so the oracle comparison has no float knife edges; the score
    itself rides as integer micro-units (q128 policy: FLOOR of the
    6dp-rounded mean * 1e6 + 0.5).

    Scale shape: the LM fit is one token-keyed aggregate (map-side
    combined, vocabulary-sized output -> broadcast); scoring is one
    groupBy(doc) shuffle; the partition is one window over the
    DOC-COUNT-sized score table (narrow rows — the corpus text never
    enters the sort). At 100 TB production precomputes per-lang
    CUTOFF VALUES on a sample and broadcasts them (CCNet's actual
    mode, a map-only assignment); the rank form here is the exact
    semantics that calibration approximates."""
    from pyspark.sql import Window

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(normalize_text("text"), " ")).alias("w"),
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("n"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "w", F.log(F.col("c") * 1.0 / F.col("n")).alias("lp")
    )
    scores = (
        toks.join(F.broadcast(lp), "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.floor(
                F.round(F.avg(-F.col("lp")), 6) * 1000000 + F.lit(0.5)
            )
            .cast("bigint")
            .alias("nll_micro")
        )
    )
    w = Window.partitionBy("lang").orderBy("nll_micro", "doc_id")
    wn = Window.partitionBy("lang")
    ranked = scores.select(
        "doc_id",
        "lang",
        "nll_micro",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "nll_micro",
        F.when(F.col("rn") * 3 <= F.col("n"), "head")
        .when(F.col("rn") * 3 <= 2 * F.col("n"), "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )


@query(
    "q174_bloom_index_probe",
    f"""
    -- Maintained counting-Bloom index probe (round 13 registry slot —
    -- VERDICT r12 next-round #1 as a dump-loop row): the q172 filter
    -- promoted to a PERSISTED index that honors DELETES. The prior
    -- corpus registered the filter; a retirement wave departed
    -- (doc_id % 7 = 0) and the maintenance decremented their bits —
    -- cells at zero EXPIRE, so a bit only the departed docs set no
    -- longer fires. The oracle rebuilds the filter from the SURVIVOR
    -- set (maintained == rebuilt, the counting filter's linearity);
    -- exactness of the maintenance fold itself is pinned both
    -- protocols in TestBloomIndex. Bit ids stay hex strings
    -- (q119/q142 cross-engine rule).
    WITH fps AS (
        SELECT doc_id, MD5({_NORM_SQL.format(c='text')}) AS fp
        FROM documents
    ), survivors AS (
        SELECT doc_id, fp FROM fps
        WHERE doc_id % 5 != 4 AND doc_id % 7 != 0
    ), newd AS (
        SELECT doc_id, fp FROM fps WHERE doc_id % 5 = 4
    ), bits AS (
        SELECT DISTINCT r.i AS row_id,
               SUBSTR(MD5('bff' || r.i || ':' || fp), 1, 3) AS b
        FROM survivors, UNNEST([0, 1, 2]) AS r(i)
    ), hits AS (
        SELECT n.doc_id, CAST(COUNT(*) AS BIGINT) AS nhit
        FROM newd n
        JOIN bits c
          ON c.b = SUBSTR(MD5('bff' || c.row_id || ':' || n.fp), 1, 3)
        GROUP BY n.doc_id
    ), exact AS (
        SELECT DISTINCT n.doc_id
        FROM newd n JOIN survivors s ON s.fp = n.fp
    )
    SELECT n.doc_id,
           CAST(COALESCE(h.nhit, 0) = 3 AS INT) AS maybe_dup,
           CAST(e.doc_id IS NOT NULL AS INT) AS exact_dup,
           CAST(COALESCE(h.nhit, 0) = 3 OR e.doc_id IS NULL AS INT)
               AS no_false_negative
    FROM newd n
    LEFT JOIN hits h ON h.doc_id = n.doc_id
    LEFT JOIN exact e ON e.doc_id = n.doc_id
    """,
)
def q174(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe a new dump against the MAINTAINED counting-Bloom index
    (round 13 — VERDICT r12 next-round #1): the Dolma/BFF per-dump
    operating model with deletes. The prior corpus' filter was
    registered as counting cells (row_id, b, cnt); a retirement wave
    (doc_id % 7 == 0) departed, and maintenance DECREMENTED its bits
    instead of being unable to unset them — a cell at zero expires, so
    retired-only content stops flagging, while content a surviving
    duplicate still holds keeps its bits (the no-false-negative
    contract survives deletes, which a plain bit set cannot offer).

    Production lane (pinned maintained == rebuilt on both commit
    protocols in TestBloomIndex): plans/ops.py register_bloom_index /
    sync_bloom_index / probe_bloom_index — the filter lives as a
    bucketed warehouse table, advances at O(batch + touched cells)
    from the source change feed under auto-maintenance, and every
    probe broadcasts the fixed-size filter. Here the same fold runs
    expression-side: cells(old) minus cells(departed), drop at zero —
    the counting filter's linearity makes the two identical.

    Scale shape: both count aggs are map-side combined with key space
    bounded by k·16^hex_chars (≤12288 cells) regardless of corpus
    size; the fold join is cell-sized; every probe join broadcasts the
    filter — the dump is the only big frame and it streams through
    map-side joins. Reference tie: the A24/A25 new-dumps-only loop
    (/root/reference/src/main.rs:119-138)."""
    from canvas_data_loader_spark.functions.text import fingerprint

    d = load(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 4
    old, new = d.filter(~is_new), d.filter(is_new)
    departed = old.filter(F.col("doc_id") % 7 == 0)
    registered = D.bloom_bit_counts(old, "text")
    dec = D.bloom_bit_counts(departed, "text").withColumnRenamed("cnt", "d")
    cells = (
        registered.join(dec, ["row_id", "b"], "left")
        .select(
            "row_id",
            "b",
            (F.col("cnt") - F.coalesce(F.col("d"), F.lit(0))).alias("cnt"),
        )
        .filter(F.col("cnt") > 0)
    )
    bits = cells.select("row_id", "b").localCheckpoint(eager=False)
    probe = D.bloom_maybe_member(new, bits, "text", "doc_id")
    survivors = old.filter(F.col("doc_id") % 7 != 0)
    surv_fp = survivors.select(fingerprint("text").alias("__fp")).distinct()
    ex = (
        new.select("doc_id", fingerprint("text").alias("__fp"))
        .join(
            F.broadcast(surv_fp.withColumn("__e", F.lit(1))), "__fp", "left"
        )
        .select(
            "doc_id",
            F.col("__e").isNotNull().cast("int").alias("exact_dup"),
        )
    )
    return probe.join(ex, "doc_id").select(
        "doc_id",
        "maybe_dup",
        "exact_dup",
        ((F.col("maybe_dup") == 1) | (F.col("exact_dup") == 0))
        .cast("int")
        .alias("no_false_negative"),
    )


@query(
    "q175_audio_stats",
    """
    -- Audio decode stats (round 13 registry slot — VERDICT r12
    -- next-round #5): the WAV/PCM lane proven end-to-end THROUGH the
    -- container format. The Spark side synthesizes a deterministic
    -- 16-bit PCM waveform per document (sample i of doc d =
    -- ((d*31 + i*7) % 2001) - 1000, n = 50 + d % 100 samples at 8 kHz),
    -- serializes it into real RIFF/WAVE bytes (stdlib `wave`), then
    -- DECODES those bytes back with operators/multimodal.py decode_wav
    -- and emits exact-integer stats. The oracle computes the same
    -- stats from the closed-form sample definition — any header
    -- mis-parse, channel/frame confusion, or sample-width slip breaks
    -- the equality. All columns integer (q128 cross-engine policy).
    WITH ids AS (
        SELECT doc_id FROM documents WHERE doc_id % 10 = 0
    ), s AS (
        SELECT doc_id,
               ((doc_id * 31 + r.i * 7) % 2001) - 1000 AS v
        FROM ids, UNNEST(range(0, 50 + doc_id % 100)) AS r(i)
    )
    SELECT doc_id AS media_id,
           CAST(1 AS INT) AS n_channels,
           CAST(8000 AS INT) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           CAST(COUNT(*) * 1000 // 8000 AS BIGINT) AS duration_ms,
           CAST(COUNT(*) AS BIGINT) AS n_samples,
           CAST(SUM(v * v) AS BIGINT) AS sum_sq,
           CAST(MAX(ABS(v)) AS INT) AS peak
    FROM s GROUP BY doc_id
    """,
)
def q175(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV audio stats through a REAL container round-trip (round 13 —
    VERDICT r12 next-round #5): per-document deterministic PCM16
    waveforms are serialized into RIFF/WAVE bytes and decoded back by
    the stdlib-`wave` lane (operators/multimodal.py encode_wav_pcm16 /
    decode_wav / audio_stats — capability-free, unlike the PIL-gated
    image decode). Stats ride as exact integers — duration in floor
    milliseconds, loudness as (sum_sq, n_samples) so corpus RMS merges
    from partials — and the oracle derives them from the closed-form
    waveform definition, so the equality proves the encode→decode pair
    preserves every sample bit.

    Scale shape: both stages are map-side mapInPandas passes (encode,
    decode) with zero shuffles before the final compare-friendly
    projection; media rows are wide, so batches are bounded by Arrow's
    maxRecordsPerBatch (the module-top sizing rule). At 100 TB the
    encode stage is replaced by real ingested payloads; the decode
    pass's shape is identical."""
    import pandas as _pd

    from canvas_data_loader_spark.operators.multimodal import (
        audio_stats,
        encode_wav_pcm16,
    )

    d = load(spark, sf_dir, "documents")
    ids = d.filter(F.col("doc_id") % 10 == 0).select("doc_id")

    def encode(it):
        for pdf in it:
            out = []
            for did in pdf["doc_id"]:
                did = int(did)
                n = 50 + did % 100
                samples = [((did * 31 + i * 7) % 2001) - 1000 for i in range(n)]
                out.append(
                    {
                        "media_id": did,
                        "payload": encode_wav_pcm16(samples, 8000),
                    }
                )
            yield _pd.DataFrame(out, columns=["media_id", "payload"])

    media = ids.mapInPandas(encode, "media_id long, payload binary")
    return audio_stats(media).select(
        "media_id",
        "n_channels",
        "sample_rate",
        "n_frames",
        "duration_ms",
        "n_samples",
        "sum_sq",
        F.col("peak").cast("int").alias("peak"),
    )


@query(
    "q176_ivfpq_packed_codes",
    """
    -- IVF-PQ packed codes (round 13 registry slot — VERDICT r12
    -- next-round #4): the compressed representation the persisted
    -- IVF-PQ index stores (plans/ops.py create_ivfpq_index), verified
    -- BIT-EXACTLY against an oracle that re-derives the whole
    -- pipeline in SQL — L2 normalization, the deterministic codebook
    -- (sub-slices of the first 8 vectors by id), per-subspace
    -- squared-L2 argmin with ties to the smallest code, and the
    -- 8-bits-per-subspace BIGINT packing. Bit-exactness works because
    -- every float fold is ORDER-PINNED on both engines: Spark
    -- F.aggregate and DuckDB list_reduce are both left folds over the
    -- array order, and (0.0 + x) == x in IEEE, so the sums agree to
    -- the last bit — no rounding policy needed (contrast the 6dp rule
    -- for order-UNpinned SUM/AVG aggregates).
    WITH v AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
        FROM embeddings
    ), u AS (
        SELECT vec_id,
               CASE WHEN nrm = 0 THEN list_transform(e, x -> 0.0)
                    ELSE list_transform(e, x -> x / nrm) END AS u
        FROM (
            SELECT vec_id, e,
                   sqrt(list_reduce(list_transform(e, x -> x * x),
                                    (a, b) -> a + b)) AS nrm
            FROM v
        )
    ), train AS (
        SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS c, u
        FROM (SELECT vec_id, u FROM u ORDER BY vec_id LIMIT 8)
    ), cb AS (
        SELECT m.m, t.c, list_slice(t.u, m.m * 8 + 1, m.m * 8 + 8) AS w
        FROM train t, (SELECT UNNEST(range(0, 8)) AS m) m
    ), dist AS (
        SELECT q.vec_id, cb.m, cb.c,
               list_reduce(
                   list_transform(
                       list_slice(q.u, cb.m * 8 + 1, cb.m * 8 + 8),
                       (x, i) -> (x - cb.w[i]) * (x - cb.w[i])
                   ),
                   (a, b) -> a + b
               ) AS d
        FROM u q, cb
    ), codes AS (
        SELECT vec_id, m,
               CAST(list_position(dl, list_min(dl)) - 1 AS BIGINT) AS code
        FROM (
            SELECT vec_id, m, LIST(d ORDER BY c) AS dl
            FROM dist GROUP BY vec_id, m
        )
    )
    SELECT vec_id, CAST(SUM(code << (8 * m)) AS BIGINT) AS code
    FROM codes GROUP BY vec_id
    """,
)
def q176(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed product-quantization codes — what the IVF-PQ compressed
    index persists per vector (round 13, plans/ops.py
    create_ivfpq_index: 8 subspaces x 8 codewords over the
    L2-normalized embedding, argmin squared-L2 per subspace with ties
    to the smallest code, packed 8 bits per subspace into one BIGINT).
    Storing the code instead of the vector is what makes a 100 TB ANN
    index disk-feasible (measured >= 4x smaller in TestIvfPqIndex; the
    probe re-scores exactly from the SOURCE vectors, so compression
    never costs correctness — probe == raw-vector probe at covering
    rescore_c, pinned).

    Oracle-exactness note: the entire float pipeline is left-fold
    order-pinned on both engines (F.aggregate == list_reduce with an
    IEEE-neutral 0.0 seed), so the comparison is BIT-exact — the
    normalization barrier (operators/simsearch.py _unit_expr behind a
    localCheckpoint) exists for codegen size, not numerics.

    Scale shape: one corpus pass, zero shuffles (the codebook is 8
    driver rows inlined as literals); the barrier materializes narrow
    (id, unit-vector) rows once."""
    e = load(spark, sf_dir, "embeddings")
    cb = S.pq_codebook(e, 8, 8, "vec_id", "embedding")
    pre = e.select(
        "vec_id", S._unit_expr("embedding").alias("__u")
    ).localCheckpoint(eager=False)
    return pre.select(
        "vec_id", S.pq_encode_expr(cb, "__u", True).alias("code")
    )


@query(
    "q177_join_view_maintenance",
    """
    -- Join-view IVM fold (round 13 registry slot — VERDICT r12
    -- next-round #2 as an oracle row): a fact(orders)⋈dim(customer)
    -- materialized view advanced INCREMENTALLY through a change wave
    -- on BOTH sides — fact inserts (o_orderkey % 5 = 4), fact updates
    -- (priority -> 'RUSHED' on base keys % 7 = 0, % 9 != 0), fact
    -- deletes (base keys % 9 = 0), dim updates (segment -> 'MOVED' on
    -- c_custkey % 11 = 0, % 13 != 0) and dim deletes (% 13 = 0).
    -- The Spark side replays the production refresh_join_view motion
    -- (touched join keys recomputed WHOLESALE from state ± feed
    -- against the head dim, untouched view rows carried as-is); the
    -- oracle simply joins the FINAL states — equality proves the
    -- fold. The production lane itself (watermarks, pending sidecar,
    -- bucket pruning, both commit protocols) is pinned maintained ==
    -- rebuilt in TestJoinViews.
    WITH fact_final AS (
        SELECT o_orderkey, o_custkey,
               CASE WHEN o_orderkey % 5 != 4 AND o_orderkey % 7 = 0
                         AND o_orderkey % 9 != 0
                    THEN 'RUSHED' ELSE o_orderpriority
               END AS o_orderpriority
        FROM orders
        WHERE o_orderkey % 5 = 4
           OR (o_orderkey % 5 != 4 AND o_orderkey % 9 != 0)
    ), dim_final AS (
        SELECT c_custkey, c_nationkey,
               CASE WHEN c_custkey % 11 = 0 AND c_custkey % 13 != 0
                    THEN 'MOVED' ELSE c_mktsegment
               END AS c_mktsegment
        FROM customer
        WHERE c_custkey % 13 != 0
    )
    SELECT f.o_orderkey, f.o_custkey, f.o_orderpriority,
           d.c_nationkey, d.c_mktsegment
    FROM fact_final f
    JOIN dim_final d ON f.o_custkey = d.c_custkey
    """,
)
def q177(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental join-view maintenance, proven against the oracle
    (round 13 — VERDICT r12 next-round #2): the star-schema view the
    reference's dw_type vocabulary implies (/root/reference/src/
    api_client.rs:407-408 tags every table "dimension" or "fact";
    column dimension links at 441-450 declare the join keys). The
    view is ``orders INNER JOIN customer ON o_custkey = c_custkey``
    materialized from a base state, then advanced through one change
    wave touching BOTH sides with all three DML motions each.

    The fold is the production one — this query calls the SAME
    ``plans/ops.py::_jv_split`` the warehouse lane uses, and replays
    ``refresh_join_view``'s incremental branch expression-side:

    - touched join keys = fk values named by the fact feed (insert /
      update / delete images) ∪ dim pks named by the dim feed;
    - state = (view ∪ pending-sidecar) restricted to touched keys,
      minus fact-feed row keys, plus the feed's applied rows;
    - re-split state against the HEAD dim restricted to touched keys;
    - untouched view rows carry over untouched (the per-key set
      replacement merge_bucketed performs in production).

    The oracle joins the final states directly, so any fold error —
    a missed touched key, a stale dim payload, an undead deleted row,
    a dropped pending row re-matched late — breaks the equality.

    Scale shape (same as production): cost is O(|feeds| + touched
    buckets); the untouched-carryover is an fk anti-join against the
    touched-key set (bucket-pruned reads + per-key merge in the real
    lane, never a fact or dim scan)."""
    from .plans.ops import _jv_split

    fact_cols = ["o_orderkey", "o_custkey", "o_orderpriority"]
    # the fold references each source from many branches (base, feed
    # images, touched keys) — materialize the narrow projections once
    # behind a lazy barrier instead of re-scanning parquet per branch
    o = (
        load(spark, sf_dir, "orders")
        .select(*fact_cols)
        .localCheckpoint(eager=False)
    )
    c = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", "c_mktsegment")
        .localCheckpoint(eager=False)
    )
    okey, ckey = F.col("o_orderkey"), F.col("c_custkey")
    dim_cols = ["c_nationkey", "c_mktsegment"]
    dim0 = c.select("c_custkey", *dim_cols)

    # --- base state: the view as first materialized ---------------
    is_new = okey % 5 == 4
    base = o.filter(~is_new)
    view0, pend0 = _jv_split(base, dim0, "o_custkey", "c_custkey", dim_cols)

    # --- the change wave ------------------------------------------
    inserts = o.filter(is_new)
    upd = base.filter((okey % 7 == 0) & (okey % 9 != 0)).withColumn(
        "o_orderpriority", F.lit("RUSHED")
    )
    dels = base.filter(okey % 9 == 0)
    dim_upd = (ckey % 11 == 0) & (ckey % 13 != 0)
    dim_final = dim0.filter(ckey % 13 != 0).withColumn(
        "c_mktsegment",
        F.when(dim_upd, F.lit("MOVED")).otherwise(F.col("c_mktsegment")),
    )

    # --- the incremental fold (refresh_join_view's motion) --------
    feed_keys = (
        inserts.select("o_orderkey")
        .unionByName(upd.select("o_orderkey"))
        .unionByName(dels.select("o_orderkey"))
    )
    applied = inserts.unionByName(upd)
    dim_feed_keys = c.filter(
        ((ckey % 11 == 0) & (ckey % 13 != 0)) | (ckey % 13 == 0)
    ).select(ckey.alias("o_custkey"))
    touched = (
        inserts.select("o_custkey")
        .unionByName(upd.select("o_custkey"))
        .unionByName(dels.select("o_custkey"))
        .unionByName(dim_feed_keys)
        .distinct()
    )
    state = (
        view0.select(*fact_cols)
        .unionByName(pend0.select(*fact_cols))
        .join(touched, "o_custkey", "semi")
        .join(feed_keys, "o_orderkey", "left_anti")
        .unionByName(applied)
    )
    dim_head = dim_final.join(
        touched.withColumnRenamed("o_custkey", "c_custkey"),
        "c_custkey",
        "semi",
    )
    matched, _pend = _jv_split(
        state, dim_head, "o_custkey", "c_custkey", dim_cols
    )
    return view0.join(touched, "o_custkey", "left_anti").unionByName(matched)


@query(
    "q178_ccnet_cutoff_assign",
    f"""
    -- CCNet production scorer, cutoff form (round 13 registry slot —
    -- VERDICT r12 next-round #7 proven through the oracle gate, not
    -- just pytest): per-lang tercile CUTOFF VALUES calibrated on a
    -- subset (doc_id % 3 != 0 — the sampled-calibration CCNet
    -- actually runs), then EVERY doc bucketed by comparing its score
    -- against the broadcast cutoffs — the map-only assignment that
    -- scores a new dump in one pass at 100 TB, zero windows over the
    -- corpus. Cutoff values are rank-tie independent (a tie spanning
    -- the boundary contributes the same MAX either way), so the
    -- comparison has no knife edges; scores ride as integer
    -- micro-units (q128 policy). A lang absent from the calibration
    -- falls to 'tail' on both engines (NULL comparison -> ELSE).
    WITH toks AS (
        SELECT doc_id, lang,
               UNNEST(STRING_SPLIT({_NORM_SQL.format(c='text')}, ' ')) AS w
        FROM documents
    ), vocab AS (
        SELECT w, COUNT(*) AS c FROM toks GROUP BY w
    ), tot AS (
        SELECT SUM(c) AS n FROM vocab
    ), lp AS (
        SELECT w, LN(c * 1.0 / n) AS lp FROM vocab CROSS JOIN tot
    ), scores AS (
        SELECT t.doc_id, t.lang,
               CAST(FLOOR(ROUND(AVG(-l.lp), 6) * 1000000 + 0.5) AS BIGINT)
                   AS nll_micro
        FROM toks t JOIN lp l USING (w)
        GROUP BY t.doc_id, t.lang
    ), calib AS (
        SELECT lang, nll_micro,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY nll_micro, doc_id
               ) AS rn,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM scores WHERE doc_id % 3 != 0
    ), cuts AS (
        SELECT lang,
               MAX(CASE WHEN rn * 3 <= n THEN nll_micro END) AS c1,
               MAX(CASE WHEN rn * 3 <= 2 * n THEN nll_micro END) AS c2
        FROM calib GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.nll_micro,
           CASE WHEN s.nll_micro <= c.c1 THEN 'head'
                WHEN s.nll_micro <= c.c2 THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM scores s LEFT JOIN cuts c ON s.lang = c.lang
    """,
)
def q178(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet cutoff-form assignment, proven against the oracle (round
    13 — VERDICT r12 next-round #7 as a registry row): the PRODUCTION
    mode of the q173 partition. q173's rank form needs a window over
    the whole score table; real CCNet calibrates per-lang cutoff
    VALUES on a sample and bucket-assigns every doc with a broadcast
    comparison — this query runs exactly that, calling the SAME
    ``plans/ops.py::ccnet_cutoff_values`` / ``ccnet_assign`` helpers
    the maintained warehouse artifact lane uses
    (register/refresh_ccnet_cutoffs, pinned maintained == recompute in
    TestCcnetCutoffs).

    Calibration = docs with doc_id % 3 != 0 (the sampled-calibration
    shape); scoring = the full corpus against the q130/q173 unigram
    LM. The oracle recomputes the cutoffs relationally, so a wrong
    max-rank rule, a tie mishandled at a boundary, or a dropped
    uncalibrated-lang default breaks the equality. Uncalibrated langs
    fall to 'tail' (conservative) via NULL-comparison semantics that
    agree across engines.

    Scale shape: LM fit = one token aggregate (broadcast-sized
    output); scoring = one groupBy(doc); calibration window runs over
    the SUBSET's doc-count-sized score rows only; the assignment is a
    broadcast join + map — the production dump-scoring pass touches
    the corpus exactly once."""
    from .plans.ops import ccnet_assign, ccnet_cutoff_values

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.explode(F.split(normalize_text("text"), " ")).alias("w"),
    )
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("n"))
    lp = vocab.crossJoin(F.broadcast(tot)).select(
        "w", F.log(F.col("c") * 1.0 / F.col("n")).alias("lp")
    )
    scores = (
        toks.join(F.broadcast(lp), "w")
        .groupBy("doc_id", "lang")
        .agg(
            F.floor(
                F.round(F.avg(-F.col("lp")), 6) * 1000000 + F.lit(0.5)
            )
            .cast("bigint")
            .alias("nll_micro")
        )
        .localCheckpoint(eager=False)
    )
    cutoffs = ccnet_cutoff_values(
        scores.filter(F.col("doc_id") % 3 != 0)
    )
    return ccnet_assign(scores, cutoffs)
