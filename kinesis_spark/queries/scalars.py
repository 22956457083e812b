"""Scalar-function operators (SURVEY.md §2B: string / date / math / array /
map / json). Everything is a built-in ``pyspark.sql.functions`` expression —
JVM-side, whole-stage-codegen'd; no Python in the row path.

Determinism notes: transcendental functions (ln/exp/trig) are NOT
guaranteed bit-identical across libm implementations, so these queries
stick to correctly-rounded IEEE ops (sqrt, rounding, abs, exact int math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_spark.io import load_table
from kinesis_spark.queries import register


@register(
    "sc1_string_funcs",
    oracle="""
SELECT p_partkey,
       UPPER(p_brand) AS brand_upper,
       CAST(regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS BIGINT) AS brand_num,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_type, 1, 4) AS type_prefix,
       CONCAT(p_brand, '/', p_type) AS brand_type,
       REPLACE(p_type, 'ECONOMY', 'ECO') AS type_short,
       CAST(CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS BIGINT) AS has_red,
       TRIM(' ' || p_name || ' ') AS name_trimmed,
       LPAD(p_brand, 12, '*') AS brand_padded,
       str_split(p_name, ' ')[1] AS first_word
FROM part
WHERE p_partkey <= 500
""",
    tags=("scalar", "string"),
)
def sc1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery (case, trim, pad, substring, replace,
    split, concat) cross-checked against DuckDB semantics."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).cast("bigint").alias("brand_num"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.substring("p_type", 1, 4).alias("type_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace("p_type", "ECONOMY", "ECO").alias("type_short"),
        F.when(F.col("p_name").like("%red%"), 1).otherwise(0).cast("bigint").alias("has_red"),
        # trim demonstrated on a padded value (p_name has no edge spaces)
        F.trim(F.concat(F.lit(" "), F.col("p_name"), F.lit(" "))).alias("name_trimmed"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
    )


@register(
    "sc2_date_funcs",
    oracle="""
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
       CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
       CAST(QUARTER(o_orderdate) AS BIGINT) AS order_quarter,
       CAST(DAY(o_orderdate) AS BIGINT) AS order_day,
       CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
       o_orderdate + INTERVAL 90 DAY AS due_date,
       DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_epoch_start
FROM orders
WHERE o_orderkey <= 1000
""",
    tags=("scalar", "date"),
)
def sc2_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery (trunc, extract, add/diff) on
    UTC-pinned timestamps. The oracle's DATE_TRUNC is CAST to TIMESTAMP
    (DuckDB yields DATE, Spark TIMESTAMP — same class of accidental
    string-form agreement the e1 fix removed)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.quarter("o_orderdate").cast("bigint").alias("order_quarter"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
    )


@register(
    "sc3_math_funcs",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice, 1) AS price_rounded,
       CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
       ABS(l_extendedprice - 1000.0) AS dist_from_1000,
       SQRT(l_quantity) AS qty_sqrt,
       CAST(POWER(l_quantity, 2) AS DOUBLE) AS qty_sq,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod
FROM lineitem
WHERE l_orderkey <= 600
""",
    tags=("scalar", "math"),
)
def sc3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery (round, floor/ceil, abs, sqrt, power, mod)
    with bit-deterministic cross-engine results. log/trig are
    DELIBERATELY absent: transcendentals are not correctly rounded and
    differ between JVM and libm in the last ulp (module header; s12's
    review measured it) — sqrt/power-of-2 are the IEEE-exact subset."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 600)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_rounded"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.abs(F.col("l_extendedprice") - 1000.0).alias("dist_from_1000"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        F.pow("l_quantity", 2).cast("double").alias("qty_sq"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
    )


@register(
    "sc4_array_funcs",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_component,
       CAST(list_max(embedding) AS DOUBLE) AS max_component,
       CAST(list_min(embedding) AS DOUBLE) AS min_component,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive
FROM embeddings
WHERE vec_id <= 100
""",
    tags=("scalar", "array"),
)
def sc4_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over embedding vectors — all codegen'd, no UDF."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") <= 100)
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        # try_element_at: ANSI element_at would THROW on an empty array
        # while the oracle's embedding[1] returns NULL — try_ matches
        F.try_element_at("embedding", F.lit(1)).cast("double").alias("first_component"),
        F.array_max("embedding").cast("double").alias("max_component"),
        F.array_min("embedding").cast("double").alias("min_component"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("bigint").alias("n_positive"),
    )


@register(
    "sc5_json_funcs",
    oracle="""
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
       CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS prop_k_mod,
       CAST(CASE WHEN json_extract_string(props, '$.missing') IS NULL THEN 1 ELSE 0 END AS BIGINT)
         AS missing_is_null
FROM events
WHERE event_id <= 2000
""",
    tags=("scalar", "json"),
)
def sc5_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") <= 2000)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.select(
        "event_id",
        "event_type",
        k.alias("prop_k"),
        (k % 10).alias("prop_k_mod"),
        F.when(F.get_json_object("props", "$.missing").isNull(), 1)
        .otherwise(0)
        .cast("bigint")
        .alias("missing_is_null"),
    )


@register(
    "sql1_pure_sql_api",
    oracle="""
SELECT n.n_name AS nation,
       COUNT(DISTINCT c.c_custkey) AS n_customers,
       COUNT(o.o_orderkey) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_spend
FROM nation n
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY n.n_name
""",
    tags=("sql", "join", "aggregate"),
)
def sql1_pure_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: tables registered as temp views, the query
    authored as ANSI SQL via spark.sql — same Catalyst plan space as the
    DataFrame API (dims still broadcast, aggregates still two-phase).

    Views are NAMESPACED (sql1_*): a bare-named temp view would shadow
    any catalog table of the same name for the rest of the shared
    driver session, pinned to whichever sf_dir ran last."""
    for t in ("nation", "customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sql1_{t}")
    return spark.sql("""
        SELECT n.n_name AS nation,
               COUNT(DISTINCT c.c_custkey) AS n_customers,
               COUNT(o.o_orderkey) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
                 AS total_spend
        FROM sql1_nation n
        JOIN sql1_customer c ON c.c_nationkey = n.n_nationkey
        JOIN sql1_orders o   ON o.o_custkey = c.c_custkey
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
    """)


@register(
    "sc6_null_safety",
    oracle="""
SELECT o_orderkey,
       COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
       TRY_CAST(o_orderpriority AS INTEGER) AS bad_cast_is_null,
       CAST(CASE WHEN o_totalprice > 100000 THEN NULL
                 ELSE o_totalprice END AS DOUBLE) AS capped_price,
       CAST(COALESCE(CASE WHEN o_totalprice > 100000 THEN NULL
                          ELSE o_totalprice END, -1.0) AS DOUBLE) AS filled_price,
       (o_custkey IS NOT NULL AND o_orderkey % 2 = 0) AS even_with_cust
FROM orders
WHERE o_orderkey <= 1000
""",
    tags=("scalar", "null"),
)
def sc6_null_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling surface: NULLIF/COALESCE, TRY_CAST of unparseable
    strings (NULL, never an error — the ANSI-safe path), NULL injection
    and backfill, three-valued boolean logic."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    capped = F.when(F.col("o_totalprice") > 100000, None).otherwise(
        F.col("o_totalprice")
    )
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.col("o_orderpriority").try_cast("int").alias("bad_cast_is_null"),
        capped.cast("double").alias("capped_price"),
        F.coalesce(capped, F.lit(-1.0)).cast("double").alias("filled_price"),
        (F.col("o_custkey").isNotNull() & (F.col("o_orderkey") % 2 == 0)).alias(
            "even_with_cust"
        ),
    )


@register(
    "sc7_url_parsing",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || lang || '/doc/'
           || CAST(doc_id AS VARCHAR) || '?ref=corpus' AS url
  FROM documents WHERE doc_id < 200
)
SELECT doc_id, url,
       regexp_extract(url, '^https?://([^/]+)', 1) AS host,
       regexp_extract(url, '^https?://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '\\?(.*)$', 1) AS query,
       split_part(regexp_extract(url, '^https?://([^/]+)', 1), '.', 1)
         AS subdomain
FROM u
""",
    tags=("scalar", "url", "string"),
)
def sc7_url_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL construction + parsing: Spark's parse_url (JVM-side
    java.net.URI parsing) cross-checked against pure-regex extraction in
    the oracle — proving the built-in's HOST/PATH/QUERY semantics on
    well-formed URLs."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    url = F.concat(
        F.lit("https://"), "source", F.lit(".example.com/"), "lang",
        F.lit("/doc/"), F.col("doc_id").cast("string"), F.lit("?ref=corpus"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.split(F.parse_url("url", F.lit("HOST")), r"\.").getItem(0).alias("subdomain"),
    )


@register(
    "sc8_map_funcs",
    oracle="""
WITH o AS (
  SELECT o_orderkey, o_orderstatus, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey < 400
),
entries AS (
  SELECT o_orderkey, 'status' AS k, o_orderstatus AS v FROM o
  UNION ALL
  SELECT o_orderkey, 'month', strftime(o_orderdate, '%Y-%m') FROM o
  UNION ALL
  SELECT o_orderkey, 'prio', upper(str_split(o_orderpriority, '-')[1]) FROM o
)
SELECT o_orderkey, CAST(3 AS INT) AS n_entries, k AS entry_key, v AS entry_value
FROM entries
WHERE v IS NOT NULL AND LENGTH(v) > 0
""",
    tags=("scalar", "map"),
)
def sc8_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType scalar surface: build per-row maps (``create_map`` +
    ``map_concat``), rewrite values (``transform_values``), drop empties
    (``map_filter``), then relationalize with ``map_entries`` + explode.
    The oracle replays the final relation (DuckDB's MAP would stringify
    differently in the compare, so the map ops live on the Spark side
    and the contract is the exploded rows).

    Scale shape: map-only pass over a keyed subset; maps stay row-local
    (never a shuffle key), which is the correct use of MapType at scale
    — shuffling map columns widens rows for no pruning benefit."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    m = F.map_concat(
        F.create_map(F.lit("status"), F.col("o_orderstatus")),
        F.create_map(
            F.lit("month"), F.date_format("o_orderdate", "yyyy-MM"),
            F.lit("prio"), F.split("o_orderpriority", "-")[0],
        ),
    )
    cleaned = F.map_filter(
        F.transform_values(m, lambda k, v: F.upper(v)),
        lambda k, v: v.isNotNull() & (F.length(v) > 0),
    )
    # keep 'status' as-is (single-char, upper is identity there anyway —
    # the oracle mirrors upper() on every value)
    return (
        o.select(
            "o_orderkey",
            F.size(m).alias("n_entries"),
            F.explode(F.map_entries(cleaned)).alias("e"),
        )
        .select(
            "o_orderkey",
            "n_entries",
            F.col("e.key").alias("entry_key"),
            F.col("e.value").alias("entry_value"),
        )
    )


@register(
    "sc9_bitwise_funcs",
    oracle="""
WITH b AS (
  SELECT o_orderstatus,
         o_orderkey & 255 AS masked,
         (o_orderkey << 3) >> 1 AS shifted,
         bit_count(o_orderkey) AS popcnt
  FROM orders
)
SELECT o_orderstatus,
       CAST(SUM(popcnt) AS BIGINT) AS total_popcnt,
       CAST(BIT_AND(masked) AS BIGINT) AS and_mask,
       CAST(BIT_OR(masked) AS BIGINT) AS or_mask,
       CAST(BIT_XOR(masked) AS BIGINT) AS xor_mask,
       CAST(MAX(shifted) AS BIGINT) AS max_shifted
FROM b
GROUP BY o_orderstatus
""",
    tags=("scalar", "bitwise"),
)
def sc9_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate surface: masks, shifts, popcount, and
    the BIT_AND/OR/XOR aggregates — exact integer ops, identical across
    engines. All JVM-side column expressions inside codegen; the
    aggregates partial-combine (bitwise ops are associative)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.col("o_orderkey").bitwiseAND(F.lit(255)).alias("masked"),
        F.shiftright(F.shiftleft("o_orderkey", 3), 1).alias("shifted"),
        F.bit_count("o_orderkey").cast("bigint").alias("popcnt"),
    )
    return o.groupBy("o_orderstatus").agg(
        F.sum("popcnt").cast("bigint").alias("total_popcnt"),
        F.bit_and("masked").cast("bigint").alias("and_mask"),
        F.bit_or("masked").cast("bigint").alias("or_mask"),
        F.bit_xor("masked").cast("bigint").alias("xor_mask"),
        F.max("shifted").cast("bigint").alias("max_shifted"),
    )


@register(
    "sc10_regex_funcs",
    oracle=r"""
SELECT p_partkey,
       CAST(regexp_matches(p_name, '^[a-z]+ [a-z]+$') AS BIGINT) AS two_words,
       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
       array_to_string(regexp_extract_all(p_name, '([a-z]{3})[a-z]*', 1), ',')
         AS stems,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       NULLIF(regexp_extract(p_name, '[a-z]{5,}'), '') AS long_word,
       CAST(CASE WHEN regexp_matches(p_name, 'w[a-z]+')
                 THEN strpos(p_name, regexp_extract(p_name, 'w[a-z]+'))
                 ELSE 0 END AS BIGINT) AS w_pos,
       regexp_replace(p_name, '([a-z]+) ([a-z]+)', '\2 \1') AS swapped,
       str_split_regex(p_type, '[AEIOU]+')[1] AS type_head
FROM part
WHERE p_partkey <= 500
""",
    tags=("scalar", "regex"),
)
def sc10_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Regex function battery (rlike, count, extract_all, replace-all,
    first-match, match position, capture-group backreference swap, regex
    split) cross-checked against DuckDB's RE2. Cross-engine bridges the
    battery exists to pin down: (1) Spark's regexp_replace replaces ALL
    matches while DuckDB's replaces the first — the oracle passes the
    'g' flag; (2) no-match yields NULL from Spark's regexp_substr but ''
    from DuckDB's regexp_extract — the oracle NULLIFs (safe: the {5,}
    quantifier can never match empty); (3) backreferences spell $2 in
    Java regex, \2 in RE2; (4) DuckDB has no regexp_instr — the oracle
    rebuilds it as strpos of the leftmost match, exact because the
    pattern is anchor-free (the extracted text cannot occur earlier,
    else IT would have been the leftmost match); (5) character classes
    are written explicitly ([aeiou], [a-z]) — never \d/\w/\s, whose
    Unicode breadth differs between Java regex and RE2. All expressions
    JVM-side in one codegen stage; at 100 TB this is a map-only scan."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 500)
    return p.select(
        "p_partkey",
        F.col("p_name").rlike(r"^[a-z]+ [a-z]+$").cast("bigint").alias("two_words"),
        F.regexp_count("p_name", F.lit(r"[aeiou]")).cast("bigint").alias("n_vowels"),
        F.array_join(
            F.regexp_extract_all("p_name", F.lit(r"([a-z]{3})[a-z]*"), 1), ","
        ).alias("stems"),
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("devoweled"),
        F.regexp_substr("p_name", F.lit(r"[a-z]{5,}")).alias("long_word"),
        F.regexp_instr("p_name", F.lit(r"w[a-z]+")).cast("bigint").alias("w_pos"),
        F.regexp_replace("p_name", r"([a-z]+) ([a-z]+)", r"$2 $1").alias("swapped"),
        F.split("p_type", "[AEIOU]+").getItem(0).alias("type_head"),
    )


@register(
    "sc11_nested_structs",
    oracle="""
WITH l AS (
  SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS ln,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem WHERE l_orderkey <= 600
)
SELECT l_orderkey,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       MIN(ln) AS first_ln,
       MAX(ln) AS last_ln,
       arg_max(ln, qty * 1000 + ln) AS top_qty_ln,
       CAST(SUM(CASE WHEN qty >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS heavy_cnt,
       CAST(SUM(qty) AS BIGINT) AS qty_total,
       CAST(MAX(CASE WHEN qty = 40 THEN 1 ELSE 0 END) AS BIGINT) AS any_40
FROM l GROUP BY l_orderkey
""",
    tags=("scalar", "nested", "struct", "higher-order"),
)
def sc11_nested_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested array-of-struct surface: collect each order's lines into a
    sorted array<struct<ln,qty>>, then answer every question with
    higher-order functions over that one nested column — element_at on
    struct fields, lambda filter/exists, an aggregate() fold, and
    array_max's lexicographic struct ordering as argmax (max qty, max ln
    on ties). The oracle verifies the same values relationally (DuckDB's
    arg_max over the collision-free qty*1000+ln key — ln <= 7, so the
    key is injective per group and orders exactly like (qty, ln)).

    At 100 TB this is the one-shuffle nested-build pattern: a single
    groupBy materializes the per-key document, every downstream
    extraction is map-side codegen over the nested column — no second
    shuffle, no explode-regroup round trip. qty is integer-valued in
    the fixture (cast pinned), so the fold is exact integer math."""
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 600)
    lines = l.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").cast("bigint").alias("ln"),
                    F.col("l_quantity").cast("bigint").alias("qty"),
                )
            )
        ).alias("lines")
    )
    return lines.select(
        "l_orderkey",
        F.size("lines").cast("bigint").alias("n_lines"),
        F.element_at("lines", 1)["ln"].alias("first_ln"),
        F.element_at("lines", -1)["ln"].alias("last_ln"),
        F.array_max(
            F.transform("lines", lambda x: F.struct(x["qty"], x["ln"]))
        )["ln"].alias("top_qty_ln"),
        F.size(F.filter("lines", lambda x: x["qty"] >= 30))
        .cast("bigint")
        .alias("heavy_cnt"),
        F.aggregate(
            "lines", F.lit(0).cast("bigint"), lambda acc, x: acc + x["qty"]
        ).alias("qty_total"),
        F.exists("lines", lambda x: x["qty"] == 40).cast("bigint").alias("any_40"),
    )
