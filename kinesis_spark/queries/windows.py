"""Window-function operators (SURVEY.md §2B: ranking / analytic / frames).

Determinism: every window ORDER BY ends in a unique key (orderkey /
custkey) so ranks and frames are total orders; running/frame sums use exact
DECIMAL so frame evaluation order can't change the double result.

Scale: windows partitioned by customer/nation shuffle once on the
partition key — same shuffle a groupBy would need; no global sorts except
where the result is a global ranking (and then it's top-k-limited).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_spark.io import load_table
from kinesis_spark.queries import register


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


@register(
    "w1_top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
)
WHERE rn <= 3
""",
    tags=("window", "topk"),
)
def w1_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: row_number + filter (the scalable top-k idiom —
    one shuffle on the group key, no global sort)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "w2_running_revenue",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders
WHERE o_custkey <= 200
""",
    tags=("window", "frame"),
)
def w2_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum over an explicit ROWS frame (exact decimal)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@register(
    "w3_order_gaps",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       LAG(o_orderdate) OVER w AS prev_orderdate,
       DATE_DIFF('day', LAG(o_orderdate) OVER w, o_orderdate) AS days_since_prev,
       LEAD(o_orderkey) OVER w AS next_orderkey
FROM orders
WHERE o_custkey <= 100
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    tags=("window", "analytic"),
)
def w3_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics: inter-order gap per customer."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev.alias("prev_orderdate"),
        F.datediff(F.col("o_orderdate"), prev).cast("bigint").alias("days_since_prev"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@register(
    "w4_moving_avg_quantity",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg_qty
FROM lineitem
WHERE l_suppkey <= 10
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""",
    tags=("window", "frame"),
)
def w4_moving_avg_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame (5-row moving average), exact decimal mean."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(-4, Window.currentRow)
    )
    return l.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(_dec("l_quantity")).over(w).cast("double") / F.count(F.lit(1)).over(w))
        .alias("moving_avg_qty"),
    )


@register(
    "w5_nation_revenue_rank",
    oracle="""
SELECT n_name, revenue,
       RANK() OVER (ORDER BY revenue DESC, n_name) AS rev_rank,
       DENSE_RANK() OVER (ORDER BY revenue DESC, n_name) AS rev_dense_rank,
       CAST(NTILE(4) OVER (ORDER BY revenue DESC, n_name) AS BIGINT) AS quartile
FROM (
  SELECT n.n_name,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  GROUP BY n.n_name
)
""",
    tags=("window", "ranking", "join"),
)
def w5_nation_revenue_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile over an aggregate (25-row input → trivial sort)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast("decimal(3,2)")
    revenue = F.col("l_extendedprice").cast("decimal(12,2)") * (
        one - F.col("l_discount").cast("decimal(4,2)")
    )
    agg = (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("n_name"))
    return agg.select(
        "n_name",
        "revenue",
        F.rank().over(w).cast("bigint").alias("rev_rank"),
        F.dense_rank().over(w).cast("bigint").alias("rev_dense_rank"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "w6_distribution_funcs",
    oracle="""
SELECT o_orderkey, o_orderpriority,
       CAST(RANK() OVER w AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST() OVER w AS cume,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile
FROM orders
WHERE o_orderkey <= 2000
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
""",
    tags=("window", "ranking"),
)
def w6_distribution_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking/distribution window functions (rank, dense_rank,
    percent_rank, cume_dist, ntile). The ORDER BY includes the unique
    o_orderkey: ntile and cume_dist are position-dependent within ties,
    so a non-total order would be engine-nondeterministic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "w7_value_navigation",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS first_price,
       CAST(LAST_VALUE(o_totalprice) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
            AS DOUBLE) AS last_price,
       CAST(NTH_VALUE(o_totalprice, 2) OVER w AS DOUBLE) AS second_price
FROM orders
WHERE o_custkey <= 300
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
    tags=("window", "navigation"),
)
def w7_value_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-navigation window functions: first_value over a growing
    frame, last_value over the full-partition frame (the default
    growing frame makes last_value == current row — the classic
    gotcha), nth_value(2). Total order inside each customer partition
    keeps all three engine-deterministic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 300)
    grow = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    full = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.first("o_totalprice").over(grow).cast("double").alias("first_price"),
        F.last("o_totalprice").over(full).cast("double").alias("last_price"),
        F.nth_value("o_totalprice", 2).over(grow).cast("double").alias("second_price"),
    )


@register(
    "w8_range_frame_trailing",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER
            (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS trailing_30d_spend
FROM orders
WHERE o_custkey <= 200
""",
    tags=("window", "range-frame"),
)
def w8_range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame over event time: trailing-30-day spend per
    customer. Unlike w4's ROWS frame, RANGE bounds are value-based — all
    orders within the interval enter the frame, however many rows that
    is; ties on o_orderdate share a frame so the result is deterministic
    without a unique-key tiebreak. Exact decimal sums, cast at the end.

    The RANGE key is unix_date over the date part (days since epoch),
    not an epoch-seconds cast: o_orderdate is TIMESTAMP_NTZ, and
    NTZ->TIMESTAMP->long goes through the session timezone, so a DST
    gap inside the 30-day window would make two midnights 30*86400±3600
    apart and silently shift the frame boundary vs the oracle's pure
    interval arithmetic. Day arithmetic has no such hazard; the fixture
    timestamps are midnight-only (asserted in tests), so day granularity
    is lossless vs the oracle's second-granularity INTERVAL frame."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_date(F.col("o_orderdate").cast("date")))
        .rangeBetween(-30, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(14,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_30d_spend"),
    )
