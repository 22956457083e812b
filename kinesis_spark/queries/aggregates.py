"""Aggregation operators beyond plain groupBy (SURVEY.md §2B): distinct
aggregates, rollup/cube/grouping sets, conditional aggregation, pivot.

Scale: grouping keys are low-cardinality (status/priority/flag) → partial
aggregation collapses map-side; COUNT(DISTINCT) expands to a two-phase
aggregate Catalyst plans automatically (no driver collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.queries import register


def _dec(col: str, prec: int = 12, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


@register(
    "a1_distinct_counts",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_acctbal
FROM customer
GROUP BY c_mktsegment
""",
    tags=("aggregate", "distinct"),
)
def a1_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct customer/nation counts per market segment — the
    baseline COUNT(DISTINCT) expansion (two-phase aggregate)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.sum(_dec("c_acctbal")).cast("double").alias("total_acctbal"),
    )


@register(
    "a2_rollup_order_status",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
""",
    tags=("aggregate", "rollup"),
)
def a2_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals: (status, priority) → (status) → ()."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
    )


@register(
    "a3_cube_lineitem_flags",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
""",
    tags=("aggregate", "cube"),
)
def a3_cube_lineitem_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All grouping combinations of the two flags."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_dec("l_quantity")).cast("double").alias("total_qty"),
    )


@register(
    "a4_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
""",
    tags=("aggregate", "grouping-sets"),
)
def a4_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit grouping sets via SQL (the DataFrame API has no direct
    grouping-sets call; SQL is the idiomatic Spark surface for it)."""
    o = load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("a4_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM a4_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "a5_conditional_agg",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
       CAST(SUM(CASE WHEN l_discount > 0.05
                     THEN CAST(l_extendedprice AS DECIMAL(12,2))
                     ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
         AS discounted_revenue
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("aggregate", "conditional"),
)
def a5_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-inside-SUM conditional aggregation per line status, exact
    decimal money math."""
    l = load_table(spark, sf_dir, "lineitem")
    zero = F.lit(0).cast("decimal(12,2)")
    return l.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("n_large"),
        F.sum(
            F.when(F.col("l_discount") > 0.05, _dec("l_extendedprice")).otherwise(zero)
        )
        .cast("double")
        .alias("discounted_revenue"),
    )


@register(
    "a6_pivot_event_types",
    oracle="""
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY user_id
""",
    tags=("aggregate", "pivot"),
)
def a6_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let pivot scan for distinct
    values at scale — that's an extra job over the whole table)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
        # absent pivot cells surface as NULL after the agg — count itself
        # never returns NULL, so this is the one null-handling layer
        .fillna(0, subset=["click", "error", "purchase", "signup", "view"])
    )


@register(
    "a7_exact_percentiles",
    oracle="""
SELECT event_type,
       quantile_cont("value", 0.25) AS p25,
       quantile_cont("value", 0.50) AS p50,
       quantile_cont("value", 0.90) AS p90,
       quantile_cont("value", 0.99) AS p99
FROM events
GROUP BY event_type
""",
    tags=("aggregate", "percentile"),
)
def a7_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` and
    DuckDB ``quantile_cont`` share linear interpolation on the sorted
    values — verified bit-identical). Exact percentile sorts per group;
    at 100 TB prefer a8's sketch unless exactness is required."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.25D)").alias("p25"),
        F.expr("percentile(value, 0.50D)").alias("p50"),
        F.expr("percentile(value, 0.90D)").alias("p90"),
        F.expr("percentile(value, 0.99D)").alias("p99"),
    )


def _sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw sketch aggregation — the 100 TB path for distincts and
    quantiles: HyperLogLog++ (``approx_count_distinct``) and the
    Greenwald-Khanna/KLL-style ``percentile_approx``. Both are
    mergeable, bounded-memory, one-pass — no per-group sort, no exact
    distinct shuffle. The ESTIMATES themselves are engine-internal
    (DuckDB's HLL/quantile sketches produce different values, and
    Spark's depend on partial-merge order), so a8 exposes them only as
    within-published-error booleans; tests/test_sketches.py pins the
    raw accuracy here against exact answers."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "a8_sketch_aggregates",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS hll_ok,
       TRUE AS p50_ok
FROM events
GROUP BY event_type
""",
    tags=("aggregate", "sketch", "approx"),
)
def a8_sketch_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates with driver-checkable error bounds (was the
    registry's one rows-only aggregate through r6 — VERDICT r6 task 6
    folded its a8c companion in so every ``a*`` entry is oracle-backed):
    the exact answers ride along as bigints; the HLL++ and
    percentile_approx estimates collapse to within-published-error
    booleans (a sketch regression flips one to FALSE and fails the hash
    compare). Raw estimates stay available via ``_sketch_estimates``.

    COUNT(DISTINCT) is kept OUT of the sketch aggregation on purpose:
    combining it with percentile_approx makes Catalyst's distinct
    rewrite (Expand) instantiate and merge one accuracy-10000
    QuantileSummaries state per (event_type, user_id) partial group —
    measured 3.8 s vs 0.3 s for either aggregate alone at sf0.1. The
    exact distinct count instead runs as its own two-stage partial agg
    (group by (type, user) then count per type) and joins back on the
    group key — both sides are #event_types rows, so the join is a
    broadcast of a handful of rows."""
    e = load_table(spark, sf_dir, "events")
    base = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.expr("percentile(value, 0.5D)").alias("exact_p50"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_p50"),
    )
    distinct_users = (
        e.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    # eqNullSafe: a NULL event_type group survives the oracle's GROUP BY
    # but a null-rejecting equi-join would silently drop it here
    g = base.join(
        distinct_users,
        base["event_type"].eqNullSafe(distinct_users["event_type"]),
    ).drop(distinct_users["event_type"])
    hll_tol = F.greatest(F.lit(2.0), 0.05 * F.col("exact_users"))
    p50_tol = 0.02 * F.greatest(F.lit(1.0), F.abs(F.col("exact_p50")))
    return g.select(
        "event_type",
        "n_events",
        "exact_users",
        (F.abs(F.col("approx_users") - F.col("exact_users")) <= hll_tol).alias("hll_ok"),
        (F.abs(F.col("approx_p50") - F.col("exact_p50")) <= p50_tol).alias("p50_ok"),
    )


@register(
    "a9_unpivot_nation_metrics",
    oracle="""
WITH wide AS (
  SELECT n.n_nationkey,
         CAST(COALESCE(c.n_customers, 0) AS BIGINT) AS customers,
         CAST(COALESCE(s.n_suppliers, 0) AS BIGINT) AS suppliers
  FROM nation n
  LEFT JOIN (SELECT c_nationkey, COUNT(*) AS n_customers
             FROM customer GROUP BY c_nationkey) c
    ON n.n_nationkey = c.c_nationkey
  LEFT JOIN (SELECT s_nationkey, COUNT(*) AS n_suppliers
             FROM supplier GROUP BY s_nationkey) s
    ON n.n_nationkey = s.s_nationkey
)
SELECT n_nationkey, metric, CAST(value AS BIGINT) AS value
FROM wide
UNPIVOT (value FOR metric IN (customers, suppliers))
""",
    tags=("aggregate", "unpivot"),
)
def a9_unpivot_nation_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide per-nation metric columns → long
    (nation, metric, value) rows — the inverse of a6's pivot."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey")
    c = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("n_nationkey"))
        .agg(F.count(F.lit(1)).alias("customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("n_nationkey"))
        .agg(F.count(F.lit(1)).alias("suppliers"))
    )
    wide = (
        n.join(c, "n_nationkey", "left")
        .join(s, "n_nationkey", "left")
        .fillna(0, subset=["customers", "suppliers"])
    )
    return wide.unpivot(
        ids=["n_nationkey"],
        values=["customers", "suppliers"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "a10_windowed_distinct_users",
    oracle="""
SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day_start,
       event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events
GROUP BY DATE_TRUNC('day', ts), event_type
""",
    tags=("aggregate", "distinct", "window"),
)
def a10_windowed_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per (day, event_type): exact distinct counting,
    written as an explicit two-level aggregate instead of
    COUNT(DISTINCT)+COUNT(*) in one agg — the combined form makes
    Catalyst Expand every input row into two copies (one per aggregate
    path) before the first shuffle. Here level 1 partial-aggregates
    (day, type, user) event counts map-side, so the first exchange
    carries each observed triple once; level 2 collapses triples to
    (n_users, n_events). Exactness is the point — a8's HLL is the
    sketch alternative when an approximate count suffices."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy(
        F.date_trunc("day", "ts").alias("day_start"),
        "event_type",
        "user_id",
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return per_user.groupBy("day_start", "event_type").agg(
        # count(col) skips the NULL-user group, matching
        # COUNT(DISTINCT user_id) semantics; n_events still counts all
        F.count("user_id").alias("n_users"),
        F.sum("cnt").alias("n_events"),
    )


@register(
    "a11_weighted_avg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))
                * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
         AS qty_weighted_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_weight
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("aggregate", "weighted"),
)
def a11_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted mean price per return flag: both the weighted
    sum and the weight sum are exact decimals; the single double
    division at the end is deterministic — the pattern for any exact
    weighted statistic at scale."""
    l = load_table(spark, sf_dir, "lineitem")
    wsum = F.sum(_dec("l_extendedprice", 14) * _dec("l_quantity"))
    w = F.sum(_dec("l_quantity"))
    return l.groupBy("l_returnflag").agg(
        (wsum.cast("double") / w.cast("double")).alias("qty_weighted_price"),
        w.cast("double").alias("total_weight"),
    )


@register(
    "a12_hll_sketch_union",
    oracle="""
WITH per_type AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users
  FROM events GROUP BY event_type
),
overall AS (
  SELECT COUNT(DISTINCT user_id) AS exact_total FROM events
)
SELECT event_type, exact_users, TRUE AS type_estimate_ok,
       (SELECT exact_total FROM overall) AS exact_total,
       TRUE AS union_estimate_ok
FROM per_type
""",
    tags=("aggregate", "sketch", "hll", "union"),
)
def a12_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches — the 100 TB rollup pattern:
    build one Datasketches HLL per event_type (hll_sketch_agg), then
    UNION the binary sketches (hll_union_agg) for the overall count
    instead of re-scanning events. That merge is what approx_count_
    distinct can't do: partial sketches survive as data and compose
    across rollup levels / incremental loads. Driver-checkable shape:
    exact counts ride along, estimates collapse to within-bound
    booleans (HLL lgK=12 → ~1.6% rsd; 3-sigma bound + small-count
    slack)."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id", 12).alias("sketch"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    # the rolled-up union rides a WINDOW over the per-type spine — the
    # former .agg()-and-crossJoin-back re-derived per_type, i.e. a
    # second full events scan + distinct (r7 plan audit). exact_total
    # stays its own scan by necessity: a global COUNT(DISTINCT) is not
    # derivable from the per-type exact counts.
    from pyspark.sql.window import Window as _W

    _wall = _W.rowsBetween(_W.unboundedPreceding, _W.unboundedFollowing)
    exact_total = e.agg(F.count_distinct("user_id").alias("exact_total"))
    tol = lambda exact: F.greatest(F.lit(16.0), 0.05 * exact)  # noqa: E731
    return (
        per_type.select(
            "event_type",
            "exact_users",
            (
                F.abs(
                    F.hll_sketch_estimate("sketch") - F.col("exact_users")
                ) <= tol(F.col("exact_users"))
            ).alias("type_estimate_ok"),
            F.hll_sketch_estimate(F.hll_union_agg("sketch").over(_wall)).alias(
                "approx_total"
            ),
        )
        .crossJoin(F.broadcast(exact_total))
        .select(
            "event_type",
            "exact_users",
            "type_estimate_ok",
            "exact_total",
            (
                F.abs(F.col("approx_total") - F.col("exact_total"))
                <= tol(F.col("exact_total"))
            ).alias("union_estimate_ok"),
        )
    )


CM_DEPTH = 4  # independent hash rows
CM_WIDTH = 64  # buckets per row


@register(
    "a13_heavy_hitters_countmin",
    oracle=f"""
WITH u AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
js AS (SELECT unnest(range({CM_DEPTH})) AS j),
hashed AS (
  SELECT user_id, j,
         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % {CM_WIDTH} AS bucket
  FROM u, js
),
sketch AS (SELECT j, bucket, COUNT(*) AS cnt FROM hashed GROUP BY j, bucket),
truec AS (SELECT user_id, COUNT(*) AS true_cnt FROM u GROUP BY user_id),
top AS (SELECT * FROM truec ORDER BY true_cnt DESC, user_id LIMIT 20),
probes AS (
  SELECT t.user_id, t.true_cnt, j,
         CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST(t.user_id AS VARCHAR)), 1, 15))
              AS BIGINT) % {CM_WIDTH} AS bucket
  FROM top t, js
)
SELECT p.user_id, p.true_cnt,
       MIN(s.cnt) AS est_cnt,
       MIN(s.cnt) >= p.true_cnt AS within_bound
FROM probes p JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket
GROUP BY p.user_id, p.true_cnt
""",
    tags=("agg", "sketch", "countmin"),
)
def a13_heavy_hitters_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation, checked against true counts
    for the top-20 users: build a 4x64 sketch (salted-md5 row hashes),
    then estimate each heavy hitter's frequency as the MIN over its 4
    counters. All integer math → bit-identical across engines, including
    the overestimate guarantee column (est >= true, always true for
    count-min).

    Scale shape: the sketch build is ONE groupBy over (j, bucket) — 256
    cells regardless of input size, with map-side partial aggregation
    carrying at most 256 rows per task; the probe side is a broadcast
    join of 20x4 keys against those cells. The true-count pass exists
    only to verify the estimate; a production pipeline ships the 256-cell
    sketch alone (mergeable across shards by cell-wise addition).

    NULL user_ids are excluded on BOTH engines (a14's convention): a
    NULL tying at the top-20 boundary would otherwise be picked by
    Spark's nulls-first ascending order but skipped by DuckDB's
    nulls-last, diverging the heavy-hitter sets.
    """
    u = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .filter(F.col("user_id").isNotNull())
    )

    def bucket(j: int, col: str):
        return F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{j}:"), F.col(col).cast("string"))), 1, 15
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(CM_WIDTH),
        )

    hashed = u.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("bigint").alias("j"),
                        bucket(j, "user_id").alias("bucket"),
                    )
                    for j in range(CM_DEPTH)
                ]
            )
        ).alias("jb")
    ).select("jb.j", "jb.bucket")
    sketch = hashed.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cnt"))

    top = (
        u.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), "user_id")
        .limit(20)
    )
    probes = top.select(
        "user_id",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).cast("bigint").alias("j"),
                        bucket(j, "user_id").alias("bucket"),
                    )
                    for j in range(CM_DEPTH)
                ]
            )
        ).alias("jb"),
    ).select("user_id", "true_cnt", "jb.j", "jb.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cnt").alias("est_cnt"))
        .withColumn("within_bound", F.col("est_cnt") >= F.col("true_cnt"))
    )


@register(
    "a14_theta_segment_algebra",
    oracle="""
WITH seg AS (SELECT DISTINCT event_type, user_id FROM events
             WHERE user_id IS NOT NULL),
pairs(seg_a, seg_b) AS (VALUES ('click', 'purchase'),
                               ('view', 'click'),
                               ('signup', 'error'))
SELECT p.seg_a, p.seg_b,
       (SELECT COUNT(DISTINCT s.user_id) FROM seg s
         WHERE s.event_type IN (p.seg_a, p.seg_b)) AS union_users,
       (SELECT COUNT(*) FROM
          (SELECT user_id FROM seg WHERE event_type = p.seg_a
           INTERSECT
           SELECT user_id FROM seg WHERE event_type = p.seg_b))
         AS intersect_users,
       (SELECT COUNT(*) FROM
          (SELECT user_id FROM seg WHERE event_type = p.seg_a
           EXCEPT
           SELECT user_id FROM seg WHERE event_type = p.seg_b))
         AS only_a_users
FROM pairs p
""",
    tags=("agg", "sketch", "theta", "setops"),
)
def a14_theta_segment_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience set algebra on Datasketches THETA sketches: per-segment
    (event_type) sketches of the user id support UNION, INTERSECTION and
    DIFFERENCE cardinalities — the "users in A ∩ B" question HLL cannot
    answer (HLL only unions; a12 covers that face). One sketch per
    segment, then pure sketch-on-sketch algebra per pair.

    Scale shape: ``theta_sketch_agg`` partial-aggregates map-side (the
    shuffle carries ≤ 4 KiB per (segment × task)); the pair table is a
    3-row literal broadcast against the 5-row sketch relation, and the
    set algebra runs on fixed-size sketch binaries — corpus cost is ONE
    events scan no matter how many pair queries follow. At 100 TB the
    same sketches persist to parquet and answer every segment-overlap
    question without re-reading events (the a12/rollup.py pattern).

    Exactness: theta sketches are exact below their nominal-entries
    threshold (4096 here vs ≤1500 fixture users), so the estimates are
    integers and the DuckDB oracle checks them bit-for-bit; above the
    threshold the same plan degrades to ±1.6% estimates — that mode is
    bounds-tested like a8 via tests/test_sketches.py.
    """
    e = load_table(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    pairs = spark.createDataFrame(
        [("click", "purchase"), ("view", "click"), ("signup", "error")],
        "seg_a string, seg_b string",
    )
    a = sk.select(F.col("event_type").alias("seg_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("seg_b"), F.col("sk").alias("sk_b"))
    # LEFT joins: a pair whose segment has zero events must still emit a
    # row (the oracle always returns all 3 pairs) — a missing sketch is
    # an empty set, handled by the when() arms below
    joined = pairs.join(F.broadcast(a), "seg_a", "left").join(
        F.broadcast(b), "seg_b", "left"
    )
    est = F.theta_sketch_estimate
    has_a = F.col("sk_a").isNotNull()
    has_b = F.col("sk_b").isNotNull()
    union_users = (
        F.when(has_a & has_b, est(F.theta_union("sk_a", "sk_b")))
        .when(has_a, est(F.col("sk_a")))
        .when(has_b, est(F.col("sk_b")))
        .otherwise(F.lit(0))
    )
    intersect_users = F.when(
        has_a & has_b, est(F.theta_intersection("sk_a", "sk_b"))
    ).otherwise(F.lit(0))
    only_a_users = (
        F.when(has_a & has_b, est(F.theta_difference("sk_a", "sk_b")))
        .when(has_a, est(F.col("sk_a")))
        .otherwise(F.lit(0))
    )
    return joined.select(
        "seg_a",
        "seg_b",
        union_users.cast("bigint").alias("union_users"),
        intersect_users.cast("bigint").alias("intersect_users"),
        only_a_users.cast("bigint").alias("only_a_users"),
    )


@register(
    "a15_exact_correlation",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2)))
           AS sxx,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy,
         SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n,
       CAST(CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(CAST(n AS DECIMAL(38,0)) * n AS DOUBLE) AS DOUBLE)
         AS covar_pop,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
                * SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 9) AS corr,
       ROUND(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) / CAST(n AS DOUBLE), 9)
         AS stddev_pop_qty
FROM s
""",
    tags=("aggregate", "moments", "exact"),
)
def a15_exact_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group covariance / Pearson correlation / stddev computed from
    EXACT decimal power sums — the deterministic replacement for Spark's
    native ``corr``/``covar_pop``/``stddev_pop``, whose one-pass
    co-moment updates accumulate in doubles and therefore depend on
    partition order (different cluster layout → different last bits —
    unacceptable when the number feeds a driver hash or a reproducibility
    audit). Here every input is a 2-dp decimal, the five power sums
    (Σx, Σy, Σx², Σy², Σxy) are exact DECIMAL arithmetic — associative,
    so partial aggregation in ANY order is bit-identical — and each
    statistic is derived from them with a FIXED short sequence of
    correctly-rounded double ops (cast, subtract, sqrt, divide), rounded
    to 9 dp for the cross-engine surface.

    Plan shape: one scan, one partial-agg shuffle carrying 6 fixed-width
    accumulator columns per group — the same cost as a plain SUM; the
    moment algebra is per-group scalar work. DECIMAL(38) headroom: Σxy
    at 100 TB is ~1e12 rows x 1e7 products = 1e19, 19 digits of 38.
    """
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    cov_num = (n * F.col("sxy") - sx * sy).cast("double")
    var_x = (n * F.col("sxx") - sx * sx).cast("double")
    var_y = (n * F.col("syy") - sy * sy).cast("double")
    return s.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        # n*n through DECIMAL on BOTH engines: Spark long*long silently
        # wraps past n ~ 3e9 rows/group, and DuckDB BIGINT*BIGINT does
        # not promote — it errors loudly; the decimal cast keeps the
        # product exact and the two engines identical
        (cov_num / (n.cast("decimal(38,0)") * n).cast("double")).alias("covar_pop"),
        F.round(cov_num / (F.sqrt(var_x) * F.sqrt(var_y)), 9).alias("corr"),
        F.round(F.sqrt(var_x) / n.cast("double"), 9).alias("stddev_pop_qty"),
    )
