"""End-to-end LLM training-data preparation pipeline as ONE query: the
composition the individual operators exist for, with a full DuckDB
oracle so the entire flow is driver-checkable bit-exactly.

    documents
      → language + quality gate        (t2/t3's filter shapes)
      → exact dedup, keep min doc_id   (d2's content-hash shape)
      → MinHash-LSH near-dup drop      (d3's banding, keep-lowest-id)
      → per (lang, source) corpus stats (exact BIGINT sums)

Scale shape: one documents scan feeds the whole pipeline (the gates are
projections/filters stacked before the first shuffle); the exact-dedup
groupBy shuffles 32-B hashes + ids; the near-dup stage shuffles
(doc_id, band_key) pairs and expands candidates within buckets (the
single-scan d3 form); the final rollup partial-aggregates to at most
|lang|x|source| rows. No stage widens the shuffle beyond hashes/ids —
document bodies never leave the map side after the gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_spark.io import ensure_min_partitions, load_table
from kinesis_spark.queries import register
from kinesis_spark.queries.dedup import (
    _minhash_sig_sql,
    _minhash_sig_spark,
    _shingles_of,
    BAND_ROWS,
    N_HASHES,
)

_KEEP_LANGS = ("en", "de", "fr", "es")
_MIN_TOKENS = 10
_LANGS_SQL = ", ".join(f"'{x}'" for x in _KEEP_LANGS)


@register(
    "p1_llm_prep_pipeline",
    oracle=f"""
WITH base AS (
  SELECT doc_id, text, lang, source,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_toks,
         CAST(LENGTH(text) AS BIGINT) AS n_chars
  FROM documents
  WHERE lang IN ({_LANGS_SQL})
    AND len(regexp_split_to_array(text, '\\s+')) >= {_MIN_TOKENS}
),
exact AS (
  SELECT b.* FROM base b
  JOIN (
    SELECT sha256(text) AS h, MIN(doc_id) AS keep
    FROM base GROUP BY sha256(text)
  ) k ON sha256(b.text) = k.h AND b.doc_id = k.keep
),
sigs AS (
  SELECT doc_id,
         {", ".join(_minhash_sig_sql(s) for s in range(N_HASHES))}
  FROM exact
),
bands AS (
  SELECT doc_id,
         unnest([mh0 || '|' || mh1, mh2 || '|' || mh3,
                 mh4 || '|' || mh5, mh6 || '|' || mh7]) AS band_key
  FROM sigs
),
drops AS (
  SELECT DISTINCT b.doc_id
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT lang, source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM exact
WHERE doc_id NOT IN (SELECT doc_id FROM drops)
GROUP BY lang, source
""",
    tags=("pipeline", "dedup", "text", "flagship"),
)
def p1_llm_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full prep flow in one plan (module docstring). Gates and
    hashes are projections over ONE scan; both dedup stages shuffle only
    hashes/ids; near-dup candidates expand within LSH buckets (the
    single-scan d3 form) and drop every non-minimal member."""
    from pyspark.sql.window import Window

    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    # Every stage is expressed as a window over the previous one rather
    # than an aggregate self-joined back: a DataFrame consumed twice
    # re-runs its whole upstream (no subtree reuse), which quadrupled
    # the scan count in the join formulation of this pipeline. Windows
    # keep it at ONE scan + four narrow shuffles (hash, band key, doc
    # id, rollup key).
    #
    # tokens barrier: toks referenced by the gate, the stats, and the
    # shingle pipeline — evaluate the split once
    base = d.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.explode(F.array(F.split("text", r"\s+"))).alias("toks"),
    ).filter(
        F.col("lang").isin(*_KEEP_LANGS) & (F.size("toks") >= _MIN_TOKENS)
    )

    # exact dedup: first doc_id per content hash (window, not agg+join);
    # the shuffle carries toks (needed downstream) but drops text
    wh = Window.partitionBy("h").orderBy("doc_id")
    exact = (
        base.select(
            "doc_id",
            "lang",
            "source",
            "toks",
            F.size("toks").cast("bigint").alias("n_toks"),
            F.length("text").cast("bigint").alias("n_chars"),
            F.sha2("text", 256).alias("h"),
        )
        .withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") == 1)
    )

    # shingle barrier so the 8 minhash expressions bind one array
    shb = exact.select(
        "doc_id", "lang", "source", "n_toks", "n_chars",
        F.explode(F.array(_shingles_of(F.col("toks")))).alias("shb"),
    )
    sigs = shb.select(
        "doc_id", "lang", "source", "n_toks", "n_chars",
        *_minhash_sig_spark(F.col("shb")),
    )
    band_key = F.explode(
        F.array(
            *[
                F.concat_ws("|", f"mh{BAND_ROWS * b}", f"mh{BAND_ROWS * b + 1}")
                for b in range(N_HASHES // BAND_ROWS)
            ]
        )
    )
    bands = sigs.select(
        "doc_id", "lang", "source", "n_toks", "n_chars",
        band_key.alias("band_key"),
    )
    # near-dup drop: a doc survives iff it is the minimal member of
    # EVERY bucket it lands in (same keep-lowest-id contract as the
    # oracle's a.doc_id < b.doc_id drop set)
    wb = Window.partitionBy("band_key")
    flagged = bands.withColumn("bucket_min", F.min("doc_id").over(wb))
    per_doc = flagged.groupBy("doc_id", "lang", "source", "n_toks", "n_chars").agg(
        F.max((F.col("doc_id") > F.col("bucket_min")).cast("int")).alias("dropped")
    )
    survivors = per_doc.filter(F.col("dropped") == 0)
    return survivors.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
    )


_CTX_TOKENS = 256  # context-window budget (tokens) for p2 packing


@register(
    "p2_sequence_packing",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(text, '\\s+')) AS BIGINT) AS n_toks
  FROM documents
),
cum AS (
  SELECT doc_id, source, n_toks,
         CAST(COALESCE(SUM(n_toks) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS cum_before
  FROM toks
)
SELECT doc_id, source, n_toks, cum_before,
       cum_before // {_CTX_TOKENS} AS start_window,
       (cum_before + n_toks - 1) // {_CTX_TOKENS} AS end_window,
       (cum_before + n_toks - 1) // {_CTX_TOKENS}
         - cum_before // {_CTX_TOKENS} + 1 AS n_windows,
       CAST((cum_before + n_toks - 1) // {_CTX_TOKENS}
            > cum_before // {_CTX_TOKENS} AS BOOLEAN) AS crosses_boundary
FROM cum
""",
    tags=("pipeline", "packing", "tokens"),
)
def p2_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-split sequence packing (the GPT-style pretraining
    layout): within each source shard, documents are concatenated in
    doc_id order and the token stream is cut into fixed 256-token context
    windows; each document reports the window span it lands in and
    whether it straddles a boundary. Pure BIGINT window arithmetic —
    cumulative token offset, then floor-division — so both engines agree
    exactly.

    Scale shape: packing is per-shard (Window.partitionBy(source)), so
    the sort is distributed across shards, never global; at 100 TB shards
    are the natural pack unit (each writer task emits one shard's
    windows). One scan, one shuffle on source."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", r"\s+")).cast("bigint").alias("n_toks"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = toks.withColumn(
        "cum_before", F.coalesce(F.sum("n_toks").over(w), F.lit(0).cast("bigint"))
    )
    start = F.expr(f"cum_before div {_CTX_TOKENS}")
    end = F.expr(f"(cum_before + n_toks - 1) div {_CTX_TOKENS}")
    return cum.select(
        "doc_id",
        "source",
        "n_toks",
        "cum_before",
        start.alias("start_window"),
        end.alias("end_window"),
        (end - start + F.lit(1)).alias("n_windows"),
        (end > start).alias("crosses_boundary"),
    )
