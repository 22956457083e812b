"""Join-shape operators (SURVEY.md §2B): outer, anti, range (inequality),
and as-of. The as-of join uses the scalable union+window formulation — one
shuffle, no pairwise blowup — rather than a join+filter+rank over all
candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_spark.io import load_table
from kinesis_spark.queries import register


def _asof_merged(
    e: DataFrame,
    anchor_type: str,
    cand_type: str,
    anchor_prefix: str,
    cand_prefix: str,
    anchor_marker: int,
) -> DataFrame:
    """The shared as-of scaffold (j4 backward, j7 forward, j8 nearest):
    ONE events scan filtered to the two participating types, with the
    anchor/candidate projections made CONDITIONAL on event_type — no
    union of two separately filtered reads, so the fact table's columns
    are read once, not twice, and the isin filter pushes to the scan.

    Emits user_id, ts, marker, tie, {cand}_id/_ts, {anchor}_id/_ts.
    ``anchor_marker`` fixes the sort position at equal ts (0 ⇒ anchor
    first, candidates land in its FOLLOWING frame; 1 ⇒ candidates
    first, visible to the PRECEDING frame — i.e. >= semantics).
    ``tie`` (event_id) is the final window order key in every consumer,
    so equal-(user_id, ts, type) rows pick deterministically."""
    is_anchor = F.col("event_type") == anchor_type
    return e.filter(F.col("event_type").isin(anchor_type, cand_type)).select(
        "user_id",
        "ts",
        F.when(is_anchor, F.lit(anchor_marker))
        .otherwise(F.lit(1 - anchor_marker))
        .alias("marker"),
        F.col("event_id").alias("tie"),
        F.when(~is_anchor, F.col("event_id")).alias(f"{cand_prefix}_id"),
        F.when(~is_anchor, F.col("ts")).alias(f"{cand_prefix}_ts"),
        F.when(is_anchor, F.col("event_id")).alias(f"{anchor_prefix}_id"),
        F.when(is_anchor, F.col("ts")).alias(f"{anchor_prefix}_ts"),
    )


@register(
    "j1_left_outer_order_counts",
    oracle="""
SELECT c.c_custkey, c.c_name,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))),
                     CAST(0 AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
""",
    tags=("join", "outer"),
)
def j1_left_outer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (count = 0).

    Scale note: aggregate orders BEFORE the join — the join input shrinks
    from |orders| to |customers|, and the join key is then unique on both
    sides.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("_spent"),
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_name",
            F.coalesce(F.col("_n"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("_spent"), zero).cast("double").alias("total_spent"),
        )
    )


@register(
    "j2_anti_inactive_customers",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01'
)
""",
    tags=("join", "anti"),
)
def j2_anti_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join (NOT EXISTS): customers with no orders since 2000."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_mktsegment"
    )


@register(
    "j3_range_join_price_bands",
    oracle="""
WITH bands(band_name, lo, hi) AS (
  VALUES ('budget', 0.0, 500.0),
         ('mid', 500.0, 1500.0),
         ('premium', 1500.0, 100000000.0)
)
SELECT b.band_name, COUNT(*) AS n_parts,
       CAST(SUM(CAST(p.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM part p
JOIN bands b ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band_name
""",
    tags=("join", "range"),
)
def j3_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality (range) join against a tiny banding dim — broadcast
    nested loop, the right physical plan for a 3-row band table."""
    p = load_table(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 500.0), ("mid", 500.0, 1500.0), ("premium", 1500.0, 1e8)],
        "band_name string, lo double, hi double",
    )
    return (
        p.join(
            F.broadcast(bands),
            (p.p_retailprice >= bands.lo) & (p.p_retailprice < bands.hi),
        )
        .groupBy("band_name")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@register(
    "j4_asof_click_before_purchase",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.event_id AS click_id,
       c.ts AS click_ts
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN
     (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    tags=("join", "asof"),
)
def j4_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the most recent click at-or-before it.

    Scalable formulation: union clicks+purchases, sort once per user, and
    carry the last click forward with last(ignorenulls) — O(n log n) within
    each user partition, one shuffle total, versus the naive join+rank
    which materializes every (purchase, earlier-click) pair.

    Ties: clicks sort before the purchase at equal ts (marker order,
    matching ASOF's >= semantics), and event_id is the final order key
    so equal-(user_id, ts) clicks pick deterministically (largest id
    wins backward) — (user_id, ts) is unique in today's fixture, but
    the pick must not depend on partition order if that changes.
    """
    e = load_table(spark, sf_dir, "events")
    merged = _asof_merged(e, "purchase", "click", "purchase", "click", 1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "marker", "tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        merged.select(
            "user_id",
            "marker",
            "purchase_id",
            "purchase_ts",
            F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
            F.last("click_ts", ignorenulls=True).over(w).alias("click_ts"),
        )
        .filter(F.col("marker") == 1)
        .select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
    )


@register(
    "j5_full_outer_nation_activity",
    oracle="""
SELECT COALESCE(co.c_nationkey, so.s_nationkey) AS nationkey,
       COALESCE(co.n_customers, 0) AS n_customers,
       COALESCE(so.n_suppliers, 0) AS n_suppliers
FROM (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer
      WHERE c_acctbal > 9500 GROUP BY c_nationkey) co
FULL OUTER JOIN
     (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier
      WHERE s_acctbal > 5000 GROUP BY s_nationkey) so
ON co.c_nationkey = so.s_nationkey
""",
    tags=("join", "full-outer"),
)
def j5_full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9500)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return c.join(s, c.c_nationkey == s.s_nationkey, "full_outer").select(
        F.coalesce(c.c_nationkey, s.s_nationkey).alias("nationkey"),
        F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
    )


@register(
    "j6_salted_skew_join",
    oracle="""
SELECT c.c_mktsegment,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e."value" AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment
""",
    tags=("join", "skew", "salt"),
)
def j6_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join for skewed keys, proven semantics-preserving by the
    plain-join oracle: the fact side gets a salt from a uniform hash of
    its row id, the dim side is replicated SALT times (explode of a
    sequence), and the join runs on (key, salt) — a hot key's rows
    spread over SALT reducers instead of one. At these SFs AQE's skew
    handling suffices; this operator is the explicit variant for
    1000-executor skew that AQE can't split (e.g. a single key bigger
    than one executor's memory)."""
    from kinesis_spark.skew import salted_join

    joined = salted_join(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
        fact_key="user_id",
        dim_key="c_custkey",
        salt_source="event_id",
        num_salts=8,
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
    )


@register(
    "j7_asof_forward_fulfillment",
    oracle="""
WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'view')
SELECT purchase_id, user_id, purchase_ts, view_id, view_ts FROM (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
         v.event_id AS view_id, v.ts AS view_ts,
         ROW_NUMBER() OVER (PARTITION BY p.event_id
                            ORDER BY v.ts, v.event_id) AS rn
  FROM p LEFT JOIN v ON p.user_id = v.user_id AND v.ts >= p.ts
) WHERE rn = 1
""",
    tags=("join", "asof", "forward"),
)
def j7_asof_forward_fulfillment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for each purchase, the EARLIEST view at-or-after
    it (j4 is the backward variant). Same scalable union+window shape —
    one shuffle, no pairwise candidate blowup — but with a
    currentRow→unboundedFollowing frame and first(ignorenulls).

    Tie handling: at equal ts the view must be eligible (<= semantics), so
    views sort AFTER the purchase marker at the same ts and land inside
    the purchase row's following frame. event_id is the final order key,
    so equal-(ts, type) events pick deterministically (smallest id wins
    forward) — the oracle encodes the same rank-1 choice.
    """
    e = load_table(spark, sf_dir, "events")
    merged = _asof_merged(e, "purchase", "view", "purchase", "view", 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "marker", "tie")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        merged.select(
            "user_id",
            "marker",
            "purchase_id",
            "purchase_ts",
            F.first("view_id", ignorenulls=True).over(w).alias("view_id"),
            F.first("view_ts", ignorenulls=True).over(w).alias("view_ts"),
        )
        .filter(F.col("marker") == 0)
        .select("purchase_id", "user_id", "purchase_ts", "view_id", "view_ts")
    )


@register(
    "j8_asof_nearest_click",
    oracle="""
WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'click'),
back AS (
  SELECT purchase_id, user_id, purchase_ts, click_id, click_ts FROM (
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts,
           ROW_NUMBER() OVER (PARTITION BY p.event_id
                              ORDER BY c.ts DESC, c.event_id DESC) AS rn
    FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
  ) WHERE rn = 1
),
fwd AS (
  SELECT purchase_id, click_id, click_ts FROM (
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id, c.ts AS click_ts,
           ROW_NUMBER() OVER (PARTITION BY p.event_id
                              ORDER BY c.ts, c.event_id) AS rn
    FROM p LEFT JOIN c ON p.user_id = c.user_id AND c.ts >= p.ts
  ) WHERE rn = 1
)
SELECT b.purchase_id, b.user_id, b.purchase_ts,
       CASE WHEN f.click_ts IS NULL THEN b.click_id
            WHEN b.click_ts IS NULL THEN f.click_id
            WHEN epoch_us(b.purchase_ts) - epoch_us(b.click_ts)
                 <= epoch_us(f.click_ts) - epoch_us(b.purchase_ts)
                 THEN b.click_id ELSE f.click_id END AS click_id,
       CASE WHEN f.click_ts IS NULL THEN b.click_ts
            WHEN b.click_ts IS NULL THEN f.click_ts
            WHEN epoch_us(b.purchase_ts) - epoch_us(b.click_ts)
                 <= epoch_us(f.click_ts) - epoch_us(b.purchase_ts)
                 THEN b.click_ts ELSE f.click_ts END AS click_ts
FROM back b JOIN fwd f USING (purchase_id)
""",
    tags=("join", "asof", "nearest"),
)
def j8_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join: for each purchase, the click closest in time on
    EITHER side (ties → the earlier/backward click, matching pandas
    merge_asof(direction='nearest') tie-breaking).

    One union + ONE window pass computes both candidates — last click in
    the preceding frame and first click in the following frame — then a
    row-local CASE picks the closer. Still a single shuffle; the naive
    formulation joins every purchase to every candidate click and ranks.

    Equal-ts clicks sort before the purchase marker, so they are seen by
    the backward frame (diff 0) and always win the tie, preserving >=
    semantics on the backward side. event_id is the final order key:
    equal-(ts, type) clicks pick deterministically (largest id backward,
    smallest forward) — mirrored by the oracle's rank-1 ordering.
    """
    e = load_table(spark, sf_dir, "events")
    merged = _asof_merged(e, "purchase", "click", "purchase", "click", 1)
    order = Window.partitionBy("user_id").orderBy("ts", "marker", "tie")
    wb = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    cand = merged.select(
        "user_id",
        "marker",
        "purchase_id",
        "purchase_ts",
        F.last("click_id", ignorenulls=True).over(wb).alias("b_id"),
        F.last("click_ts", ignorenulls=True).over(wb).alias("b_ts"),
        F.first("click_id", ignorenulls=True).over(wf).alias("f_id"),
        F.first("click_ts", ignorenulls=True).over(wf).alias("f_ts"),
    ).filter(F.col("marker") == 1)
    b_diff = F.unix_micros("purchase_ts") - F.unix_micros("b_ts")
    f_diff = F.unix_micros("f_ts") - F.unix_micros("purchase_ts")
    pick_back = F.col("f_ts").isNull() | (
        F.col("b_ts").isNotNull() & (b_diff <= f_diff)
    )
    return cand.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.when(pick_back, F.col("b_id")).otherwise(F.col("f_id")).alias("click_id"),
        F.when(pick_back, F.col("b_ts")).otherwise(F.col("f_ts")).alias("click_ts"),
    )


@register(
    "j9_interval_overlap_join",
    oracle="""
SELECT l.l_orderkey, l.l_linenumber,
       o.o_orderkey AS audit_id,
       CAST(date_diff('day',
              greatest(CAST(l.l_shipdate AS DATE), CAST(o.o_orderdate AS DATE)),
              least(CAST(l.l_shipdate AS DATE) + CAST(1 + l.l_partkey % 14 AS INTEGER),
                    CAST(o.o_orderdate AS DATE) + 20)) + 1
            AS BIGINT) AS overlap_days
FROM lineitem l
JOIN orders o
  ON o.o_orderkey % 61 = 0
 AND l.l_partkey % 25 = 0
 AND CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + 20
 AND CAST(o.o_orderdate AS DATE)
     <= CAST(l.l_shipdate AS DATE) + CAST(1 + l.l_partkey % 14 AS INTEGER)
""",
    tags=("join", "interval", "overlap"),
)
def j9_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: delivery windows (shipdate + a
    part-dependent transit time) x audit windows (orderdate + 20 days);
    emit every overlapping pair with its overlap length. The interval
    analog of j3's point-in-range join — the shape behind downtime
    attribution, promo-exposure, and session-x-incident questions.

    Naive overlap joins are pure inequality theta-joins — Spark would
    fall back to BroadcastNestedLoopJoin (O(|A| x |B|), a 100 TB
    non-starter). This plan restores an EQUI-join via temporal
    bucketing: each interval explodes to the calendar months it covers
    (bounded fan-out: window lengths are capped at 14/20 days, so at
    most 2 buckets per interval), the join key is the month, and the
    exact overlap predicate filters inside the hash join. A pair
    overlapping in two shared months would match twice, so the match is
    anchored to ONE bucket — the month of the later interval start
    (both sides provably cover it when they overlap) — which makes the
    equi-join duplicate-free with no DISTINCT pass. Scale: shuffle is
    ~2 rows per interval on month keys; months with heavy traffic
    parallelize by AQE skew splitting.
    """
    month = lambda c: F.trunc(c, "month")  # noqa: E731
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 25 == 0)
    a = li.select(
        "l_orderkey",
        "l_linenumber",
        F.to_date("l_shipdate").alias("a_start"),
        F.date_add(
            F.to_date("l_shipdate"), (1 + F.col("l_partkey") % 14).cast("int")
        ).alias("a_end"),
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 61 == 0)
    b = o.select(
        F.col("o_orderkey").alias("audit_id"),
        F.to_date("o_orderdate").alias("b_start"),
        F.date_add(F.to_date("o_orderdate"), 20).alias("b_end"),
    )
    am = a.withColumn(
        "m",
        F.explode(
            F.sequence(month(F.col("a_start")), month(F.col("a_end")),
                       F.expr("interval 1 month"))
        ),
    )
    bm = b.withColumn(
        "m",
        F.explode(
            F.sequence(month(F.col("b_start")), month(F.col("b_end")),
                       F.expr("interval 1 month"))
        ),
    )
    joined = am.join(bm, "m").filter(
        (F.col("a_start") <= F.col("b_end"))
        & (F.col("b_start") <= F.col("a_end"))
        # anchor: count the pair only in the later-start month
        & (F.col("m") == F.greatest(month(F.col("a_start")), month(F.col("b_start"))))
    )
    overlap = (
        F.datediff(
            F.least("a_end", "b_end"), F.greatest("a_start", "b_start")
        )
        + 1
    ).cast("bigint")
    return joined.select(
        "l_orderkey", "l_linenumber", "audit_id", overlap.alias("overlap_days")
    )


@register(
    "j10_bloom_prefilter_join",
    oracle="""
SELECT strftime(date_trunc('month', CAST(o.o_orderdate AS DATE)), '%Y-%m')
         AS order_month,
       COUNT(*) AS n_lineitems,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS urgent_revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY order_month
""",
    tags=("join", "bloom", "runtime-filter"),
)
def j10_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join with an explicit bloom runtime filter: urgent
    orders x lineitem, where the build side's join keys are first
    aggregated into an 8 KiB bloom bitmap that prefilters lineitem
    ROW-LOCALLY before the shuffle (kinesis_spark.bloom.probe_bloom_dense
    — a broadcast dense-array index per row, no explode, no extra shuffle of the fact
    table). False positives survive the prefilter and are dropped by the
    exact join, so the result is identical to the plain join — the bloom
    only sheds shuffle volume (here ~80% of lineitem rows; at 100 TB
    this is THE lever when both join sides are too big to broadcast and
    the probe side is selective).

    This hand-built filter is the always-on, engine-independent version
    of Spark's own runtime bloom pushdown
    (spark.sql.optimizer.runtime.bloomFilter.enabled), which only
    triggers under creation-cost heuristics; composing it from
    DataFrame primitives keeps the plan auditable and the technique
    portable to any source the optimizer can't see through."""
    from kinesis_spark.bloom import build_bloom, densify_bloom, probe_bloom_dense

    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    dense = densify_bloom(build_bloom(o, "o_orderkey"))
    lf = probe_bloom_dense(l, dense, "l_orderkey").filter(
        F.col("maybe_member")
    ).drop("maybe_member")
    joined = lf.join(o, lf.l_orderkey == o.o_orderkey)
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    )
    return (
        joined.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias(
                "order_month"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            rev.cast("double").alias("urgent_revenue"),
        )
    )


@register(
    "j11_asof_tolerance",
    oracle="""
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 1 HOUR
            THEN c.event_id END AS click_id,
       CASE WHEN c.ts IS NOT NULL AND p.ts - c.ts <= INTERVAL 1 HOUR
            THEN c.ts END AS click_ts
FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN
     (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
      WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    tags=("join", "asof", "tolerance"),
)
def j11_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join (pandas ``merge_asof(tolerance=...)``,
    kdb wj): the most recent click at-or-before each purchase counts ONLY
    if it is within 1 hour — a stale match attributes nothing. Because
    backward as-of picks the NEAREST preceding candidate, the tolerance
    is a row-local post-filter on j4's carried columns (if the nearest
    click is too old, every older one is as well), so the plan cost is
    exactly j4's: one events scan, one per-user window, zero extra
    shuffles. The bound compares timestamp DIFFERENCES against an
    INTERVAL on both engines — no epoch casts, no timezone dependence.
    """
    e = load_table(spark, sf_dir, "events")
    merged = _asof_merged(e, "purchase", "click", "purchase", "click", 1)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "marker", "tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        merged.select(
            "user_id",
            "marker",
            "purchase_id",
            "purchase_ts",
            F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
            F.last("click_ts", ignorenulls=True).over(w).alias("click_ts"),
        )
        .filter(F.col("marker") == 1)
    )
    within = F.col("click_ts").isNotNull() & (
        (F.col("purchase_ts") - F.col("click_ts")) <= F.expr("INTERVAL 1 HOUR")
    )
    return carried.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        F.when(within, F.col("click_id")).alias("click_id"),
        F.when(within, F.col("click_ts")).alias("click_ts"),
    )
