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
from kinesis_spark.queries import WS_RE, register
from kinesis_spark.queries.dedup import (
    _BAND_UNNEST_SQL,
    _band_key_expr,
    _minhash_sig_sql,
    _minhash_sig_spark,
    _shingles_of,
    EX_WINDOW,
    N_HASHES,
)

_KEEP_LANGS = ("en", "de", "fr", "es")
_MIN_TOKENS = 10
_LANGS_SQL = ", ".join(f"'{x}'" for x in _KEEP_LANGS)

# ONE definition of the language/length gate, Spark + oracle: the shared
# head of p1 (full build) and p3 (incremental batch-vs-corpus).
_BASE_CTE_SQL = f"""base AS (
  SELECT doc_id, text, lang, source,
         CAST(len(regexp_split_to_array(text, '{WS_RE}')) AS BIGINT) AS n_toks,
         CAST(LENGTH(text) AS BIGINT) AS n_chars
  FROM documents
  WHERE lang IN ({_LANGS_SQL})
    AND len(regexp_split_to_array(text, '{WS_RE}')) >= {_MIN_TOKENS}
)"""


def _gated_base(d: DataFrame) -> DataFrame:
    """Tokens barrier + language/min-length gate (the Spark side of
    _BASE_CTE_SQL). toks is carried for every downstream consumer so
    the regex split evaluates once per document."""
    return d.select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.explode(F.array(F.split("text", WS_RE))).alias("toks"),
    ).filter(F.col("lang").isin(*_KEEP_LANGS) & (F.size("toks") >= _MIN_TOKENS))


def _band_keys_of(df: DataFrame, *carry: str) -> DataFrame:
    """shingle barrier → minhash signature → exploded band keys. ONE
    definition for p1 (carries the stats columns) and p3 (bare doc_id);
    the banding itself is dedup._band_key_expr, shared with d3/d14 and
    the streaming near-dup."""
    shb = df.select(
        "doc_id", *carry, F.explode(F.array(_shingles_of(F.col("toks")))).alias("shb")
    )
    sigs = shb.select("doc_id", *carry, *_minhash_sig_spark(F.col("shb")))
    return sigs.select("doc_id", *carry, _band_key_expr().alias("band_key"))


@register(
    "p1_llm_prep_pipeline",
    oracle=f"""
WITH {_BASE_CTE_SQL},
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
         {_BAND_UNNEST_SQL}
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
    base = _gated_base(d)

    # exact dedup: first doc_id per content hash (window, not agg+join).
    # MinHash signatures are computed ROW-LOCALLY (shingle barrier + 8
    # array_min columns) BEFORE the hash exchange, so the shuffle
    # carries (ids, stats, h, 8x32-B hashes) instead of every
    # survivor's full token array — at 100 TB the former form moved
    # ~corpus bytes through the exact-dedup exchange just to band the
    # winners afterwards (guide §8: decide with small rows). Dup losers
    # now compute signatures they don't use (rn > 1 rows are filtered),
    # a row-local cost that measured FAR below the shuffled-toks cost:
    # sf0.1 alternating A/B 1.93 -> 1.09 s steady (−27..−43% across 3
    # blocks), bit-identical output (OPTIMIZATION_r12.md).
    carry = ["lang", "source", "n_toks", "n_chars"]
    pre = base.select(
        "doc_id",
        "lang",
        "source",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.sha2("text", 256).alias("h"),
        # explode-of-one-element-array = the shingle barrier (see
        # dedup._tokens_barrier): the 8 per-seed lambdas below bind one
        # computed array instead of re-running the shingle transform
        F.explode(F.array(_shingles_of(F.col("toks")))).alias("shb"),
    )
    sigs_rel = pre.select(
        "doc_id", *carry, "h", *_minhash_sig_spark(F.col("shb"))
    )
    wh = Window.partitionBy("h").orderBy("doc_id")
    exact = sigs_rel.withColumn("rn", F.row_number().over(wh)).filter(
        F.col("rn") == 1
    )

    bands = exact.select("doc_id", *carry, _band_key_expr().alias("band_key"))
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


P8_QUALITY_MIN = 0.31  # t2's heuristic score gate (keeps ~85% of fixtures)
_P8_STAGES = ["raw", "lang", "length", "quality", "exact_dedup", "near_dedup"]


def _register_p8() -> None:
    """p8 composes t2's quality score into p1's gate/dedup chain, so its
    oracle borrows t2's STOPWORDS — registered via a helper to keep the
    import local (textstats imports pipelines' WS_RE sibling constants)."""
    from kinesis_spark.queries.textstats import STOPWORDS

    stops_sql = ", ".join(f"'{s}'" for s in STOPWORDS)
    score_sql = (
        "0.4 * (CAST(n_stop AS DOUBLE) / n_toks)"
        " + 0.4 * (CAST(n_unique AS DOUBLE) / n_toks)"
        " + 0.2 * least(CAST(n_toks AS DOUBLE) / 100.0, 1.0)"
    )

    @register(
        "p8_pipeline_funnel",
        oracle=f"""
WITH f AS (
  SELECT doc_id, text, lang,
         CAST(len(regexp_split_to_array(text, '{WS_RE}')) AS BIGINT) AS n_toks,
         CAST(len(list_filter(regexp_split_to_array(text, '{WS_RE}'),
                   t -> list_contains([{stops_sql}], t))) AS BIGINT) AS n_stop,
         CAST(len(list_distinct(regexp_split_to_array(text, '{WS_RE}')))
              AS BIGINT) AS n_unique
  FROM documents
),
flags AS (
  SELECT doc_id, text, n_toks,
         lang IN ({_LANGS_SQL}) AS lang_ok,
         n_toks >= {_MIN_TOKENS} AS len_ok,
         ({score_sql}) >= {P8_QUALITY_MIN} AS q_ok
  FROM f
),
gated AS (SELECT * FROM flags WHERE lang_ok AND len_ok AND q_ok),
exact AS (
  SELECT g.* FROM gated g
  JOIN (
    SELECT sha256(text) AS h, MIN(doc_id) AS keep
    FROM gated GROUP BY sha256(text)
  ) k ON sha256(g.text) = k.h AND g.doc_id = k.keep
),
sigs AS (
  SELECT doc_id,
         {", ".join(_minhash_sig_sql(s) for s in range(N_HASHES))}
  FROM exact
),
bands AS (
  SELECT doc_id,
         {_BAND_UNNEST_SQL}
  FROM sigs
),
drops AS (
  SELECT DISTINCT b.doc_id
  FROM bands a JOIN bands b
    ON a.band_key = b.band_key AND a.doc_id < b.doc_id
),
near AS (SELECT * FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
stages AS (
            SELECT 0 AS stage, 'raw' AS stage_name,
                   COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens
            FROM flags
  UNION ALL SELECT 1, 'lang', COUNT(*), CAST(SUM(n_toks) AS BIGINT)
            FROM flags WHERE lang_ok
  UNION ALL SELECT 2, 'length', COUNT(*), CAST(SUM(n_toks) AS BIGINT)
            FROM flags WHERE lang_ok AND len_ok
  UNION ALL SELECT 3, 'quality', COUNT(*), CAST(SUM(n_toks) AS BIGINT)
            FROM gated
  UNION ALL SELECT 4, 'exact_dedup', COUNT(*), CAST(SUM(n_toks) AS BIGINT)
            FROM exact
  UNION ALL SELECT 5, 'near_dedup', COUNT(*), CAST(SUM(n_toks) AS BIGINT)
            FROM near
)
SELECT CAST(stage AS BIGINT) AS stage, stage_name,
       CAST(n_docs AS BIGINT) AS n_docs, n_tokens,
       CAST(n_docs AS DOUBLE) / (SELECT COUNT(*) FROM flags) AS retained_pct,
       CAST(COALESCE(LAG(n_docs) OVER (ORDER BY stage), n_docs) - n_docs
            AS BIGINT) AS dropped_here
FROM stages
""",
        tags=("pipeline", "funnel", "observability", "dedup", "quality"),
    )
    def p8_pipeline_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Pipeline funnel report — the observability face of the prep
        chain: how many documents (and tokens) survive each successive
        stage raw → language gate → length gate → quality gate (t2's
        heuristic score ≥ {qmin}) → exact dedup (p1's min-id rule) →
        near-dup drop (p1's band rule), with per-stage retention vs raw
        and the drop attributed to each stage. The report every corpus
        release ships next to its shards — a collapsed stage is visible
        as a cliff in dropped_here before anyone trains on the output.

        Plan shape: per-doc ``stage_reached`` is computed in ONE chain
        off ONE documents scan (plan-asserted in tests/test_plans.py):
        gates are row-local; every row rides the exact-dedup hash
        window and the band window, with non-candidates given
        per-doc-unique hash/band keys (singleton partitions — no skew,
        no effect on real buckets) so no branch ever re-scans the
        corpus; then the funnel is ONE 6-group aggregate + a descending
        cumulative window over the 6-row spine — stage counts are never
        6 separate scans."""
        from pyspark.sql.window import Window

        d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
        from kinesis_spark.queries.textstats import STOPWORDS as _ST

        stop_arr = F.array(*[F.lit(s) for s in _ST])
        toks = F.explode(F.array(F.split("text", WS_RE))).alias("toks")
        base = d.select("doc_id", "lang", "text", toks)
        n_toks = F.size("toks").cast("bigint")
        n_stop = F.size(
            F.filter("toks", lambda t: F.array_contains(stop_arr, t))
        ).cast("bigint")
        n_unique = F.size(F.array_distinct("toks")).cast("bigint")
        score = (
            0.4 * (n_stop.cast("double") / n_toks)
            + 0.4 * (n_unique.cast("double") / n_toks)
            + 0.2 * F.least(n_toks.cast("double") / 100.0, F.lit(1.0))
        )
        flags = base.select(
            "doc_id",
            "text",
            "toks",
            n_toks.alias("n_toks"),
            F.col("lang").isin(*_KEEP_LANGS).alias("lang_ok"),
            (n_toks >= _MIN_TOKENS).alias("len_ok"),
            (score >= P8_QUALITY_MIN).alias("q_ok"),
        )

        # ONE chain, no branches: every row rides the hash window and
        # the band window. Non-candidates (gated-out docs; exact-dup
        # losers in the band stage) carry per-doc-UNIQUE keys — they
        # form singleton window partitions (no skew, a sha2 hex can
        # never collide with the "ng-"/"x-" prefixes) and contribute
        # nothing to real buckets, so the verdicts are identical to the
        # former three-branch form while the corpus is scanned once.
        from kinesis_spark.queries.dedup import (
            _band_key_expr,
            _minhash_sig_spark,
            _shingles_of,
        )

        gate_ok = F.col("lang_ok") & F.col("len_ok") & F.col("q_ok")
        # MinHash signatures ROW-LOCAL before the hash exchange (p1's
        # r12 change, guide §8): the shuffle carries 8x32-B hashes
        # instead of every gate survivor's token array. Exact-dup
        # losers compute signatures whose band keys are later replaced
        # by their "x-" singleton key — exactly as the former form
        # replaced the keys it computed from their placeholder sigs —
        # so the output is identical while the exchange payload drops
        # from ~corpus bytes to ~330 B/doc. sf0.1 alternating A/B:
        # 3.57 -> 2.68 s steady (−20..−25% across 3 blocks).
        shb = F.when(gate_ok, _shingles_of(F.col("toks"))).otherwise(
            F.array(F.lit(""))
        )
        hashed = flags.select(
            "doc_id", "n_toks", "lang_ok", "len_ok", "q_ok",
            F.when(gate_ok, F.sha2("text", 256))
            .otherwise(F.concat(F.lit("ng-"), F.col("doc_id")))
            .alias("h"),
            *_minhash_sig_spark(shb),
        )
        wh = Window.partitionBy("h").orderBy("doc_id")
        ranked = hashed.withColumn("rn", F.row_number().over(wh))
        # eligibility gates the BAND KEY, not the signature: every
        # non-entrant (gated-out doc OR exact-dup loser) gets its
        # computed band keys replaced by a per-doc-unique "x-" key, so
        # it forms singleton band partitions and contributes nothing to
        # real buckets — identical verdicts to the former form, which
        # gated the shingle build instead (that required toks to
        # survive the hash exchange)
        eligible = gate_ok & (F.col("rn") == 1)  # the band-stage entrants
        carry = ["doc_id", "n_toks", "lang_ok", "len_ok", "q_ok", "rn"]
        banded = ranked.select(
            *carry,
            _band_key_expr().alias("band_key"),
        ).withColumn(
            # `eligible` resolves by name post-explode (its constituent
            # flags all ride `carry`)
            "band_key",
            F.when(eligible, F.col("band_key")).otherwise(
                F.concat(F.lit("x-"), F.col("doc_id"))
            ),
        )
        wb = Window.partitionBy("band_key")
        flagged = banded.withColumn("bucket_min", F.min("doc_id").over(wb))
        reached = flagged.groupBy(*carry).agg(
            F.max((F.col("doc_id") > F.col("bucket_min")).cast("int")).alias(
                "dropped"
            )
        ).select(
            "doc_id",
            "n_toks",
            F.when(~F.col("lang_ok"), 0)
            .when(~F.col("len_ok"), 1)
            .when(~F.col("q_ok"), 2)
            .when(F.col("rn") > 1, 3)
            .when(F.col("dropped") == 1, 4)
            .otherwise(5)
            .alias("stage_reached"),
        )
        per_stage = reached.groupBy("stage_reached").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("n_toks").cast("bigint").alias("tok"),
        )
        spine = spark.createDataFrame(
            [(i, name) for i, name in enumerate(_P8_STAGES)],
            "stage bigint, stage_name string",
        )
        joined = spine.join(
            per_stage, spine.stage == per_stage.stage_reached, "left"
        ).select(
            "stage",
            "stage_name",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("tok", F.lit(0)).alias("tok"),
        )
        # funnel: survivors of stage i = everyone whose journey ended at
        # a stage >= i (stage_reached counts its LAST survived stage)
        wdesc = (
            Window.orderBy(F.col("stage").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        wlag = Window.orderBy("stage")
        raw_total = F.sum("cnt").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        funnel = joined.select(
            "stage",
            "stage_name",
            F.sum("cnt").over(wdesc).cast("bigint").alias("n_docs"),
            F.sum("tok").over(wdesc).cast("bigint").alias("n_tokens"),
            raw_total.cast("bigint").alias("n0"),
        )
        return funnel.select(
            "stage",
            "stage_name",
            "n_docs",
            "n_tokens",
            (F.col("n_docs").cast("double") / F.col("n0")).alias("retained_pct"),
            (
                F.coalesce(F.lag("n_docs").over(wlag), F.col("n_docs"))
                - F.col("n_docs")
            )
            .cast("bigint")
            .alias("dropped_here"),
        )

    if p8_pipeline_funnel.__doc__:
        p8_pipeline_funnel.__doc__ = p8_pipeline_funnel.__doc__.format(
            qmin=P8_QUALITY_MIN
        )


_register_p8()


_CTX_TOKENS = 256  # context-window budget (tokens) for p2 packing


@register(
    "p2_sequence_packing",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(text, '[ \\t\\n\\f\\r\\x0B]+')) AS BIGINT) AS n_toks
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
        F.size(F.split("text", r"[ \t\n\f\r\x0B]+")).cast("bigint").alias("n_toks"),
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


@register(
    "p3_incremental_prep",
    oracle=f"""
WITH {_BASE_CTE_SQL},
corpus AS (SELECT * FROM base WHERE doc_id % 10 != 0),
batch AS (
  SELECT *, sha256(text) AS h,
         ROW_NUMBER() OVER (PARTITION BY sha256(text) ORDER BY doc_id) AS rn
  FROM base WHERE doc_id % 10 = 0
),
ch AS (SELECT DISTINCT sha256(text) AS h FROM corpus),
flagged AS (
  SELECT b.doc_id, b.lang, b.source, b.text, b.n_toks,
         (b.rn > 1 OR c.h IS NOT NULL) AS exact_dup
  FROM batch b LEFT JOIN ch c ON b.h = c.h
),
rsigs AS (
  SELECT doc_id,
         {", ".join(_minhash_sig_sql(s) for s in range(N_HASHES))}
  FROM flagged WHERE NOT exact_dup
),
csigs AS (
  SELECT doc_id,
         {", ".join(_minhash_sig_sql(s) for s in range(N_HASHES))}
  FROM corpus
),
rbands AS (
  SELECT doc_id, {_BAND_UNNEST_SQL}
  FROM rsigs
),
cbands AS (
  SELECT {_BAND_UNNEST_SQL}
  FROM csigs
),
near AS (
  SELECT DISTINCT r.doc_id
  FROM rbands r JOIN (SELECT DISTINCT band_key FROM cbands) c
    ON r.band_key = c.band_key
)
SELECT lang, source,
       COUNT(*) AS n_batch,
       CAST(SUM(CASE WHEN exact_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_dup,
       CAST(SUM(CASE WHEN NOT exact_dup
                      AND doc_id IN (SELECT doc_id FROM near)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_near_dup,
       CAST(SUM(CASE WHEN NOT exact_dup
                      AND doc_id NOT IN (SELECT doc_id FROM near)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       CAST(SUM(CASE WHEN NOT exact_dup
                      AND doc_id NOT IN (SELECT doc_id FROM near)
                     THEN n_toks ELSE 0 END) AS BIGINT) AS admitted_tokens
FROM flagged
GROUP BY lang, source
""",
    tags=("pipeline", "incremental", "dedup", "bloom"),
)
def p3_incremental_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL face of p1 — the production mode where a new crawl
    batch lands against an already-admitted corpus (doc_id % 10 == 0 is
    the batch, the rest the corpus; both behind the same language/length
    gates). Three stages, each scaled for corpus >> batch:

    1. exact dedup vs corpus through the d15 bloom machinery: the corpus
       collapses to a fixed 8 KiB bitmap (never shuffled, never
       broadcast wholesale); the batch probes row-locally and only
       bloom-POSITIVE hashes are verified exactly via a batch-scale
       broadcast semi-join. Within-batch dups drop by the same min-id
       window as p1.
    2. near-dup vs corpus: the batch's MinHash band keys equi-join the
       corpus band index (a production system persists that index
       incrementally; here it is derived in-query, which costs extra
       corpus scans — three total: bloom build, exact confirm, band
       index. Measured cheaper at bench scale than checkpointing the
       token-heavy intermediates; at 100 TB the PERSISTED index
       replaces ALL corpus rescans — that production mode is now a
       registered sibling, ``p7_incremental_prep_indexed`` over
       kinesis_spark/prep_index.py, identical report, zero corpus
       scans in the probe plan). Any shared band
       drops the batch doc — conservative LSH admission, resolvable
       later by d4's exact verify.
    3. per (lang, source) admission report: batch size, exact-dup,
       near-dup, admitted, admitted tokens — exact BIGINTs.

    The bloom is result-transparent (false positives re-checked), so the
    plain-SQL oracle replays the whole flow without modeling it."""
    from pyspark.sql.window import Window

    from kinesis_spark.bloom import build_bloom, densify_bloom, probe_bloom_dense
    from kinesis_spark.checkpoints import pin

    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    base = _gated_base(d)
    corpus = base.filter(F.col("doc_id") % 10 != 0)
    batch = base.filter(F.col("doc_id") % 10 == 0)

    wh = Window.partitionBy("h").orderBy("doc_id")
    bh = batch.select(
        "doc_id", "lang", "source", "toks",
        F.size("toks").cast("bigint").alias("n_toks"),
        F.sha2("text", 256).alias("h"),
    ).withColumn("rn", F.row_number().over(wh))

    ch = corpus.select(F.sha2("text", 256).alias("h"))
    dense = densify_bloom(build_bloom(ch, "h"))
    probed = probe_bloom_dense(bh, dense, "h")
    cand_keys = probed.filter(F.col("maybe_member")).select("h").distinct()
    confirmed = (
        ch.join(F.broadcast(cand_keys), "h", "left_semi")
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    # `flagged` is consumed three times (the near-dup probe, its report
    # join, and the rollup); Spark replays a forked subtree per consumer
    # — the unpinned plan scanned the documents parquet 22 TIMES
    # (plans/r11/p3_incremental_prep_before.txt), re-running the gate,
    # the batch window, the bloom build AND the corpus confirm join per
    # replay. Pinning the BATCH-SCALE flag relation (doc_id + gate
    # columns + toks, one row per batch doc — small by the incremental
    # contract, corpus never pinned) runs that subtree once; every
    # consumer reads the checkpoint (guide §3.3/§5: materialise the
    # intermediate to stop duplicated subtrees).
    flagged = (
        probed.join(F.broadcast(confirmed), "h", "left")
        .select(
            "doc_id", "lang", "source", "toks", "n_toks",
            ((F.col("rn") > 1) | F.coalesce("in_corpus", F.lit(False))).alias(
                "exact_dup"
            ),
        )
        .transform(pin)
    )

    rem = flagged.filter(~F.col("exact_dup"))
    cband_keys = _band_keys_of(corpus).select("band_key").distinct()
    near = (
        _band_keys_of(rem)
        .join(cband_keys, "band_key", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    report = flagged.join(near, "doc_id", "left").select(
        "lang", "source", "n_toks", "exact_dup",
        (~F.col("exact_dup") & F.coalesce("near_dup", F.lit(False))).alias("nd"),
        (~F.col("exact_dup") & ~F.coalesce("near_dup", F.lit(False))).alias("ok"),
    )
    return report.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.sum(F.col("exact_dup").cast("int")).cast("bigint").alias("n_exact_dup"),
        F.sum(F.col("nd").cast("int")).cast("bigint").alias("n_near_dup"),
        F.sum(F.col("ok").cast("int")).cast("bigint").alias("n_admitted"),
        F.sum(F.when(F.col("ok"), F.col("n_toks")).otherwise(0))
        .cast("bigint")
        .alias("admitted_tokens"),
    )


def _register_p7() -> None:
    """p7 = p3 through the PERSISTED index (prep_index.py): identical
    report, so it shares p3's oracle verbatim — registered via a helper
    because the decorator needs p3's already-registered oracle string."""
    from kinesis_spark.queries import REGISTRY

    p3_oracle = REGISTRY["p3_incremental_prep"].oracle

    @register(
        "p7_incremental_prep_indexed",
        oracle=p3_oracle,
        tags=("pipeline", "incremental", "dedup", "bloom", "index"),
    )
    def p7_incremental_prep_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
        """p3's admission report computed the PRODUCTION way (VERDICT r5
        task 7): the corpus-side artifacts — bloom bitmap, exact-hash
        store, MinHash band index — come from a PERSISTED index
        (kinesis_spark/prep_index.py) instead of three in-query corpus
        derivations, so the recurring per-batch plan scans the documents
        table exactly ONCE (the batch slice itself) vs p3's four scans.
        tests/test_prep_index.py plan-asserts the zero-corpus-scan
        property with the batch materialized as its own storage, and
        asserts report equality with p3 row for row.

        The index bootstraps once per (documents path, mtime) into the
        local tmp dir and is reused across calls — amortized exactly
        like production, where streaming/bloom_dedup.py maintains it
        incrementally instead."""
        from kinesis_spark.prep_index import (
            build_prep_index,
            ensure_local_index,
            incremental_prep_indexed,
        )

        d = load_table(spark, sf_dir, "documents")
        idx = ensure_local_index(
            sf_dir,
            "kinesis_prep_index",
            lambda scratch: build_prep_index(
                spark, d.filter(F.col("doc_id") % 10 != 0), scratch
            ),
        )
        return incremental_prep_indexed(
            spark, d.filter(F.col("doc_id") % 10 == 0), idx
        )

_register_p7()


def _p9_window_sql(ts: str = "ts") -> str:
    """One EX_WINDOW-token window hash in DuckDB terms, generated from
    the same constant as dedup.window_hashes (ts[pos] .. ts[pos+W-1]
    joined by single spaces, md5, first 15 hex digits as BIGINT)."""
    parts = [f"{ts}[pos]"] + [f"{ts}[pos+{j}]" for j in range(1, EX_WINDOW)]
    gram = " || ' ' || ".join(parts)
    return f"CAST(('0x' || substr(md5({gram}), 1, 15)) AS BIGINT)"


@register(
    "p9_incremental_span_excision",
    oracle=f"""
WITH ctoks AS (
  SELECT regexp_split_to_array(text, '{WS_RE}') AS ts FROM documents
  WHERE doc_id % 10 != 0
    AND len(regexp_split_to_array(text, '{WS_RE}')) >= {EX_WINDOW}
),
cg AS (
  SELECT DISTINCT {_p9_window_sql()} AS h
  FROM (SELECT ts, unnest(range(1, len(ts) - {EX_WINDOW - 2})) AS pos FROM ctoks)
),
toks AS (
  SELECT doc_id, regexp_split_to_array(text, '{WS_RE}') AS ts FROM documents
  WHERE doc_id % 10 = 0
    AND len(regexp_split_to_array(text, '{WS_RE}')) >= {EX_WINDOW}
),
occh AS (
  SELECT doc_id, pos, {_p9_window_sql()} AS h
  FROM (SELECT doc_id, ts, unnest(range(1, len(ts) - {EX_WINDOW - 2})) AS pos
        FROM toks)
),
flags AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, h,
           ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
    FROM occh) o
  WHERE rn > 1 OR h IN (SELECT h FROM cg)
),
tok AS (
  SELECT doc_id, unnest(range(1, len(ts) + 1)) AS tpos, ts FROM toks
),
tokf AS (
  SELECT t.doc_id, t.tpos, t.ts[t.tpos] AS tok,
         CASE WHEN f.pos IS NULL THEN 0 ELSE 1 END AS flag
  FROM tok t LEFT JOIN flags f ON f.doc_id = t.doc_id AND f.pos = t.tpos
),
cov AS (
  SELECT doc_id, tpos, tok, flag,
         SUM(flag) OVER (PARTITION BY doc_id ORDER BY tpos
                         RANGE BETWEEN {EX_WINDOW - 1} PRECEDING
                               AND CURRENT ROW) AS c
  FROM tokf
)
SELECT doc_id,
       COUNT(*) AS n_tokens,
       CAST(SUM(flag) AS BIGINT) AS n_cut_starts,
       CAST(SUM(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       md5(COALESCE(string_agg(CASE WHEN c = 0 THEN tok END, ' '
                               ORDER BY tpos), '')) AS clean_md5
FROM cov GROUP BY doc_id
""",
    tags=("pipeline", "incremental", "dedup", "substring", "index"),
)
def p9_incremental_span_excision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d18's duplicated-span excision run the PRODUCTION way — the p7
    pattern applied to substring dedup: the corpus's distinct window-
    gram hashes live in a PERSISTED index (prep_index.build_gram_index,
    bootstrapped once per documents (path, mtime)); each new batch
    (doc_id % 10 == 0, the p3/p7 split) cuts any window already in the
    corpus (the corpus holds the canonical copy) or repeated within the
    batch, and rebuilds its documents with d18's byte-pinned report.

    Scale shape: the recurring per-batch plan scans documents ONCE (the
    batch slice) — corpus grams come from the index via a batch-scale
    broadcast semi-confirm (the corpus-sized gram store is scanned
    single-column, never shuffled, never broadcast). Tested for report
    agreement on planted duplicates and plan-asserted zero-corpus-scan
    in tests/test_span_excision.py."""
    from kinesis_spark.prep_index import (
        build_gram_index,
        ensure_local_index,
        incremental_span_excision,
    )

    d = load_table(spark, sf_dir, "documents")
    idx = ensure_local_index(
        sf_dir,
        "kinesis_gram_index",
        lambda scratch: build_gram_index(
            spark, d.filter(F.col("doc_id") % 10 != 0), scratch
        ),
    )
    return incremental_span_excision(
        spark, d.filter(F.col("doc_id") % 10 == 0), idx
    )


@register(
    "p4_length_bucketing",
    oracle="""
WITH toks AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(text, '[ \\t\\n\\f\\r\\x0B]+')) AS n_tokens
  FROM documents
),
bucketed AS (
  SELECT source, n_tokens,
         length(bin(CAST(n_tokens AS BIGINT))) AS bucket
  FROM toks
)
SELECT source, CAST(bucket AS BIGINT) AS bucket,
       CAST((1 << bucket) - 1 AS BIGINT) AS bucket_cap,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(COUNT(*) * ((1 << bucket) - 1) AS BIGINT) AS padded_tokens,
       CAST(COUNT(*) * ((1 << bucket) - 1) - SUM(n_tokens) AS BIGINT)
         AS wasted_tokens,
       CAST(COUNT(*) * ((1 << bucket) - 1) - SUM(n_tokens) AS DOUBLE)
         / (COUNT(*) * ((1 << bucket) - 1)) AS waste_rate
FROM bucketed
GROUP BY source, bucket
""",
    tags=("pipeline", "training", "bucketing"),
)
def p4_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing report: documents grouped into
    power-of-two token-length buckets per source, with the padding waste
    each bucket would incur if its batch were padded to the bucket cap
    (2^b - 1 tokens). This is the batching-efficiency companion to p2's
    packing: packing concatenates into fixed windows, bucketing keeps
    documents whole and batches similar lengths together — the standard
    alternative when truncation/concatenation is unacceptable (SFT,
    eval) — and this report is what picks the bucket boundaries.

    The bucket is ``length(bin(n_tokens))`` = floor(log2(n)) + 1 —
    integer bit math, never float log2, so Spark and DuckDB agree
    bit-for-bit (the sim9 discipline). ``waste_rate`` is one double
    division of identical exact integers — deterministic.

    Scale shape: map-only tokenize + a (source, bucket)-keyed partial
    aggregation; cardinality is #sources x ~12 buckets, so the shuffle
    carries aggregate buffers only. At 100 TB this runs as a by-product
    of any corpus scan.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.size(F.split("text", r"[ \t\n\f\r\x0B]+")).cast("bigint").alias("n_tokens")
    )
    bucketed = toks.withColumn("bucket", F.length(F.bin("n_tokens")).cast("bigint"))
    # shiftleft's bit count must be a column here; the SQL form takes one
    cap = F.expr("CAST(shiftleft(1L, CAST(bucket AS INT)) - 1 AS BIGINT)")
    agg = bucketed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
    )
    return agg.select(
        "source",
        "bucket",
        cap.alias("bucket_cap"),
        "n_docs",
        "sum_tokens",
        (F.col("n_docs") * cap).cast("bigint").alias("padded_tokens"),
        (F.col("n_docs") * cap - F.col("sum_tokens"))
        .cast("bigint")
        .alias("wasted_tokens"),
        (
            (F.col("n_docs") * cap - F.col("sum_tokens")).cast("double")
            / (F.col("n_docs") * cap)
        ).alias("waste_rate"),
    )


CUR_PHASES = 4  # curriculum phases (quality quartiles)


def _p5_oracle() -> str:
    # reuse t2's registered oracle verbatim as the scoring CTE — ONE
    # definition of the quality score. pipelines imports before
    # textstats in load_all's alphabetical order, so force t2's
    # registration here (module import is idempotent; textstats does
    # not import pipelines, so no cycle)
    from kinesis_spark.queries import REGISTRY, textstats  # noqa: F401

    t2_sql = REGISTRY["t2_quality_score"].oracle
    return f"""
WITH scored AS ({t2_sql}),
thr AS (
  SELECT quantile_cont(quality_score, 0.25) AS q1,
         quantile_cont(quality_score, 0.50) AS q2,
         quantile_cont(quality_score, 0.75) AS q3
  FROM scored
)
SELECT s.doc_id, s.quality_score,
       CAST(1 + CASE WHEN s.quality_score > t.q1 THEN 1 ELSE 0 END
              + CASE WHEN s.quality_score > t.q2 THEN 1 ELSE 0 END
              + CASE WHEN s.quality_score > t.q3 THEN 1 ELSE 0 END
            AS BIGINT) AS phase
FROM scored s, thr t
"""


@register(
    "p5_curriculum_phases",
    oracle=_p5_oracle(),
    tags=("pipeline", "curriculum", "training"),
)
def p5_curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum phase assignment — the data-ordering stage of a
    curriculum-learning training run: documents split into {P} quality
    quartiles (t2's heuristic score, ONE shared definition), phase 1 =
    lowest quartile ... phase {P} = highest, so the loader can feed
    easy-to-hard (or the reverse) without a global sort of the corpus.

    Shape: phase boundaries are THREE exact interpolated percentiles
    (a7's cross-engine-verified ``percentile`` / ``quantile_cont``
    bridge) computed in one aggregate and broadcast back as a 1-row
    relation; assignment is a map-only threshold compare — so no
    ordering is ever materialized, and documents on a boundary value
    all land in the lower phase (deterministic; at corpus scale the
    quantile threshold IS the contract, not row-number parity).
    Honest scale caveat: EXACT ``percentile`` buffers every input value
    in its aggregation buffer and merges them onto one reducer — at
    100 TB that is materially the same funnel as the ``ntile({P})``
    -over-global-ORDER-BY it replaces. The exactness here is the
    oracle-parity contract; the at-scale variant swaps in
    ``approx_percentile`` (fixed-size KLL buffer, true partial agg,
    same map-only assignment), trading the boundary's exact value for
    a bounded-rank-error one — the thresholds move, the plan does not.

    Determinism: quality_score is exact-ratio double arithmetic (t2),
    percentile interpolation is bit-identical in both engines (a7),
    and the strict > compares are on identical doubles.
    """
    from kinesis_spark.queries.textstats import t2_quality_score

    scored = t2_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    thr = scored.agg(
        F.expr(
            "percentile(quality_score, array(0.25, 0.5, 0.75))"
        ).alias("qs")
    ).select(
        F.col("qs")[0].alias("q1"),
        F.col("qs")[1].alias("q2"),
        F.col("qs")[2].alias("q3"),
    )
    phase = (
        F.lit(1)
        + F.when(F.col("quality_score") > F.col("q1"), 1).otherwise(0)
        + F.when(F.col("quality_score") > F.col("q2"), 1).otherwise(0)
        + F.when(F.col("quality_score") > F.col("q3"), 1).otherwise(0)
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "quality_score",
        phase.cast("bigint").alias("phase"),
    )


if p5_curriculum_phases.__doc__:  # absent under python -OO
    p5_curriculum_phases.__doc__ = p5_curriculum_phases.__doc__.format(P=CUR_PHASES)


MIX_BUDGET_NUM, MIX_BUDGET_DEN = 3, 5  # token budget = 60% of the corpus


@register(
    "p6_mixture_waterfill",
    oracle=f"""
WITH per_src AS (
  SELECT source,
         COALESCE(TRY_CAST(regexp_extract(source, '[0-9]+') AS BIGINT), 0) + 1
           AS w,
         CAST(SUM(len(regexp_split_to_array(text, '{WS_RE}'))) AS BIGINT) AS t
  FROM documents GROUP BY source
),
tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS tt, CAST(SUM(w) AS BIGINT) AS ww
  FROM per_src
),
ranked AS (
  SELECT p.*,
         ROW_NUMBER() OVER (ORDER BY CAST(t AS DOUBLE) / w, source) AS rk,
         SUM(t) OVER (ORDER BY CAST(t AS DOUBLE) / w, source
                      ROWS UNBOUNDED PRECEDING) AS ct,
         SUM(w) OVER (ORDER BY CAST(t AS DOUBLE) / w, source
                      ROWS UNBOUNDED PRECEDING) AS cw
  FROM per_src p
),
base AS (
  SELECT r.*, t2.tt, t2.ww,
         (t2.tt * {MIX_BUDGET_NUM}) // {MIX_BUDGET_DEN} AS b
  FROM ranked r, tot t2
),
kstar AS (
  SELECT COALESCE(MAX(rk), 0) AS k
  FROM base WHERE t * (ww - cw) <= (b - ct) * w
),
lvl AS (
  SELECT k,
         COALESCE((SELECT ct FROM base WHERE rk = ks.k), 0) AS ctk,
         COALESCE((SELECT cw FROM base WHERE rk = ks.k), 0) AS cwk
  FROM kstar ks
)
SELECT b2.source,
       b2.t AS tokens_available,
       b2.w AS target_weight,
       b2.rk <= l.k AS saturated,
       CASE WHEN b2.rk <= l.k THEN CAST(b2.t AS DOUBLE)
            ELSE CAST((b2.b - l.ctk) * b2.w AS DOUBLE) / (b2.ww - l.cwk)
       END AS tokens_allocated,
       CASE WHEN b2.rk <= l.k THEN CAST(1.0 AS DOUBLE)
            ELSE CAST((b2.b - l.ctk) * b2.w AS DOUBLE) / (b2.ww - l.cwk) / b2.t
       END AS sample_rate
FROM base b2, lvl l
""",
    tags=("pipeline", "mixing", "budget", "training"),
)
def p6_mixture_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixture planner — water-filling token budgeting: given a
    token budget B ({num}/{den} of the corpus) and per-source target
    weights w_s, allocate each source min(t_s, lambda * w_s) tokens with
    ONE shared water level lambda chosen so allocations sum to B. A
    source too small for its target share saturates (take everything)
    and its unmet demand redistributes across the rest IN PROPORTION TO
    THEIR WEIGHTS — the allocation every mixture-training run (DoReMi /
    The Pile-style recipes) needs before s8/s12/s13 can sample to it.
    Target weights here derive from the source id (w = digits(source)+1
    — a deterministic non-uniform stand-in for a learned mixture).

    CLOSED FORM, not a loop: sort sources by the saturation ratio
    t_s/w_s; the saturated set is a PREFIX of that order, and the
    correct prefix length k* is simply the LARGEST k whose boundary
    source satisfies t_k * D_k <= N_k * w_k (N_k/D_k = the water level
    after saturating the first k; cross-multiplied exact-integer
    compare, no division) — verified equivalent to the iterative
    fixed point on 3000 randomized cases. One per-source aggregate
    (the only corpus-scale work), one 20-row window pass, one 1-row
    broadcast; at 100 TB the cost is exactly one tokenize-aggregate
    scan, the same shape as t1.

    Determinism: saturation tests and the k* argmax are exact integer
    arithmetic both engines; the only divisions are the final display
    values (one correctly-rounded double division shared by both
    engines — the ordering key's double division is likewise
    bit-identical cross-engine). sample_rate of a saturated source is
    exactly 1.0.
    """
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", WS_RE))).cast("bigint").alias("t")
    ).select(
        "source",
        (
            F.coalesce(
                F.expr("try_cast(regexp_extract(source, '[0-9]+', 0) as bigint)"),
                F.lit(0),
            )
            + 1
        ).alias("w"),
        "t",
    )
    from pyspark.sql.window import Window

    # EVERY global (tt/ww/b, k*, ctk/cwk) rides a window over the
    # per-source spine instead of an .agg() crossJoined back (r7 plan
    # audit): each agg-and-join-back re-derived `per_src` — the one
    # corpus-scale tokenize-aggregate — and the former tot→k*→level
    # chain re-derived it SIX times. Windows chain over the ~20-row
    # spine in the same single pass; the exact integer arithmetic is
    # unchanged.
    order = [(F.col("t").cast("double") / F.col("w")), F.col("source")]
    w_rk = Window.orderBy(*order)
    w_cum = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = per_src.select(
        "source",
        "w",
        "t",
        F.row_number().over(w_rk).alias("rk"),
        F.sum("t").over(w_cum).alias("ct"),
        F.sum("w").over(w_cum).alias("cw"),
        F.sum("t").over(w_all).cast("bigint").alias("tt"),
        F.sum("w").over(w_all).cast("bigint").alias("ww"),
    )
    base = ranked.withColumn(
        "b", F.expr(f"(tt * {MIX_BUDGET_NUM}) div {MIX_BUDGET_DEN}")
    )
    with_k = base.withColumn(
        "k",
        F.coalesce(
            F.max(
                F.when(
                    F.col("t") * (F.col("ww") - F.col("cw"))
                    <= (F.col("b") - F.col("ct")) * F.col("w"),
                    F.col("rk"),
                )
            ).over(w_all),
            F.lit(0),
        ),
    )
    out = with_k.withColumn(
        "ctk",
        F.coalesce(
            F.max(F.when(F.col("rk") == F.col("k"), F.col("ct"))).over(w_all),
            F.lit(0),
        ),
    ).withColumn(
        "cwk",
        F.coalesce(
            F.max(F.when(F.col("rk") == F.col("k"), F.col("cw"))).over(w_all),
            F.lit(0),
        ),
    )
    level = ((F.col("b") - F.col("ctk")) * F.col("w")).cast("double") / (
        F.col("ww") - F.col("cwk")
    )
    sat = F.col("rk") <= F.col("k")
    return out.select(
        "source",
        F.col("t").alias("tokens_available"),
        F.col("w").alias("target_weight"),
        sat.alias("saturated"),
        F.when(sat, F.col("t").cast("double")).otherwise(level).alias(
            "tokens_allocated"
        ),
        F.when(sat, F.lit(1.0)).otherwise(level / F.col("t")).alias("sample_rate"),
    )


if p6_mixture_waterfill.__doc__:  # absent under python -OO
    p6_mixture_waterfill.__doc__ = p6_mixture_waterfill.__doc__.format(
        num=MIX_BUDGET_NUM, den=MIX_BUDGET_DEN
    )


def _p11_oracle() -> str:
    from kinesis_spark.queries.textstats import _BPE_PAT_SQL

    return f"""
WITH c AS (
  SELECT lang, source,
         COUNT(*) AS n_docs,
         CAST(SUM(len(regexp_extract_all(text, '{_BPE_PAT_SQL}'))) AS BIGINT)
           AS bpe_tokens,
         CAST(SUM(len(regexp_split_to_array(text, '{WS_RE}'))) AS BIGINT)
           AS ws_tokens,
         CAST(SUM(LENGTH(text)) AS BIGINT) AS n_chars
  FROM documents
  GROUP BY lang, source
)
SELECT lang, source, n_docs, bpe_tokens, ws_tokens, n_chars,
       CAST(bpe_tokens AS DOUBLE) / ws_tokens AS fertility,
       CAST(n_chars AS DOUBLE) / bpe_tokens AS chars_per_token
FROM c
"""


@register(
    "p11_tokenizer_fertility",
    oracle=_p11_oracle(),
    tags=("pipeline", "tokenize", "report"),
)
def p11_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility report per (lang, source): BPE-ish tokens per
    whitespace word and characters per token — the compression table
    that prices every training mix (a source at fertility 2.0 costs 2x
    the compute of one at 1.0 for the same word count) and the standard
    gauge of tokenizer fit per language (high fertility on a language =
    the vocabulary under-serves it; multilingual-tokenizer papers
    report exactly this table).

    Plan shape: one corpus scan, both token counts evaluated per row by
    JVM regex (t8's pre-tokenizer, shared pattern constant), partial
    BIGINT sums into a (lang x source)-sized keyed rollup; the ratios
    are single IEEE divisions of exact integers — bit-identical
    cross-engine. At 100 TB this is a map-only pass plus a shuffle of
    ~|lang x source| rows.
    """
    from kinesis_spark.queries.textstats import _BPE_PAT

    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    n_bpe = F.size(F.regexp_extract_all("text", F.lit(_BPE_PAT), 0)).cast("bigint")
    n_ws = F.size(F.split("text", WS_RE)).cast("bigint")
    c = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_bpe).cast("bigint").alias("bpe_tokens"),
        F.sum(n_ws).cast("bigint").alias("ws_tokens"),
        F.sum(F.length("text").cast("bigint")).cast("bigint").alias("n_chars"),
    )
    return c.select(
        "lang", "source", "n_docs", "bpe_tokens", "ws_tokens", "n_chars",
        (F.col("bpe_tokens").cast("double") / F.col("ws_tokens")).alias("fertility"),
        (F.col("n_chars").cast("double") / F.col("bpe_tokens")).alias(
            "chars_per_token"
        ),
    )


from kinesis_spark.queries.textstats import STOPWORDS as _T2_STOPWORDS


@register(
    "p12_curriculum_interleave",
    oracle=f"""
WITH f AS (
  SELECT doc_id, source,
         CAST(len(regexp_split_to_array(text, '{WS_RE}')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(regexp_split_to_array(text, '{WS_RE}'),
                   t -> list_contains({list(_T2_STOPWORDS)!r}, t))) AS BIGINT) AS n_stop,
         CAST(len(list_distinct(regexp_split_to_array(text, '{WS_RE}')))
              AS BIGINT) AS n_unique
  FROM documents
),
q AS (
  SELECT doc_id, source,
         0.4 * (CAST(n_stop AS DOUBLE) / n_tokens)
           + 0.4 * (CAST(n_unique AS DOUBLE) / n_tokens)
           + 0.2 * least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) AS quality_score
  FROM f
),
nn AS (SELECT COUNT(*) AS n FROM documents),
rk AS (
  SELECT q.*, ROW_NUMBER() OVER (ORDER BY quality_score DESC, doc_id) AS grank
  FROM q
),
ph AS (
  SELECT rk.*, CAST(FLOOR((grank - 1) * 3.0 / n) + 1 AS BIGINT) AS phase
  FROM rk, nn
),
keyed AS (
  SELECT ph.*, md5('cur42:' || CAST(doc_id AS VARCHAR)) AS k FROM ph
),
ranked AS (
  SELECT keyed.*,
         CAST(ROW_NUMBER() OVER (PARTITION BY phase, source ORDER BY k, doc_id)
              AS BIGINT) AS ris,
         CAST(COUNT(*) OVER (PARTITION BY phase, source) AS BIGINT) AS nsrc
  FROM keyed
),
fin AS (SELECT ranked.*, CAST(ris AS DOUBLE) / nsrc AS progress FROM ranked)
SELECT doc_id, source, quality_score, phase,
       CAST(ROW_NUMBER() OVER (ORDER BY phase, progress, source, ris)
            AS BIGINT) AS global_pos
FROM fin
""",
    tags=("pipeline", "curriculum", "training", "schedule"),
)
def p12_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY CURRICULUM over the corpus: t2's quality score splits the
    documents into three equal phases (phase 1 = cleanest third), and
    within each phase the sources interleave proportionally (s17's
    schedule), so training consumes clean data first without ever
    starving a source — the standard curriculum+mixture composition.

    Both global orders (the quality tertile rank and the final schedule
    position) ride :func:`kinesis_spark.ordering.global_row_number` —
    range-partition, per-partition rank, broadcast offsets — so the
    plan has NO single-partition exchange (tests/test_plans.py), unlike
    the naive NTILE/ROW_NUMBER-over-everything formulation the oracle
    uses to pin the exact same output. The corpus count feeding the
    tertile arithmetic is one bounded scalar job.

    Scale shape: one scored scan + one (doc_id)-keyed equi-join of the
    (doc_id, source) projection, two range shuffles, per-(phase,source)
    windows — all parallel; shuffles carry ids, scores, and source
    labels, never document bodies."""
    from kinesis_spark.ordering import global_row_number
    from kinesis_spark.queries.textstats import t2_quality_score
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    n = d.count()  # bounded scalar: the tertile denominator
    scored = t2_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    base = d.join(scored, "doc_id").withColumn(
        "nq", -F.col("quality_score")
    )
    g = global_row_number(base, ["nq", "doc_id"], "grank")
    ph = g.withColumn(
        "phase",
        (F.floor((F.col("grank") - 1) * 3.0 / F.lit(float(n))) + 1).cast("bigint"),
    )
    keyed = ph.withColumn(
        "k", F.md5(F.concat(F.lit("cur42:"), F.col("doc_id").cast("string")))
    )
    w_src = Window.partitionBy("phase", "source").orderBy("k", "doc_id")
    ranked = (
        keyed.withColumn("ris", F.row_number().over(w_src).cast("bigint"))
        .withColumn(
            "nsrc",
            F.count(F.lit(1))
            .over(Window.partitionBy("phase", "source"))
            .cast("bigint"),
        )
        .withColumn("progress", F.col("ris").cast("double") / F.col("nsrc"))
    )
    return global_row_number(
        ranked, ["phase", "progress", "source", "ris"], "global_pos"
    ).select("doc_id", "source", "quality_score", "phase", "global_pos")


_P13_WINDOWS = (256, 1024, 4096)  # context windows priced by p13


@register(
    "p13_packing_policy_table",
    oracle=f"""
WITH toks AS (
  SELECT source,
         CAST(len(regexp_split_to_array(text, '{WS_RE}')) AS BIGINT) AS n_tokens
  FROM documents
),
win AS (SELECT UNNEST([{", ".join(str(w) for w in _P13_WINDOWS)}]) AS context_window),
perdoc AS (
  SELECT t.source, w.context_window, t.n_tokens,
         (t.n_tokens + w.context_window - 1) // w.context_window AS pad_seqs
  FROM toks t CROSS JOIN win w
),
agg AS (
  SELECT source, CAST(context_window AS BIGINT) AS context_window,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         CAST(SUM(pad_seqs) AS BIGINT) AS pad_sequences
  FROM perdoc
  GROUP BY source, context_window
)
SELECT source, context_window, n_docs, sum_tokens,
       CAST((sum_tokens + context_window - 1) // context_window AS BIGINT)
         AS pack_sequences,
       CAST(((sum_tokens + context_window - 1) // context_window)
            * context_window - sum_tokens AS BIGINT) AS pack_waste,
       CAST(sum_tokens AS DOUBLE)
         / (((sum_tokens + context_window - 1) // context_window)
            * context_window) AS pack_efficiency,
       pad_sequences,
       CAST(pad_sequences * context_window - sum_tokens AS BIGINT)
         AS pad_waste,
       CAST(sum_tokens AS DOUBLE) / (pad_sequences * context_window)
         AS pad_efficiency
FROM agg
""",
    tags=("pipeline", "training", "packing"),
)
def p13_packing_policy_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BATCHING-POLICY decision table (r10): for every (source,
    context window) cell, the token budget both standard policies would
    spend — PACK (p2's concat-and-split: sequences = ceil(total/W),
    waste < W per source) vs PAD (document-per-sequence, long docs
    split first: sequences = sum(ceil(n_i/W)), waste grows with the
    short-document tail) — with exact sequence counts, wasted tokens,
    and efficiency ratios. p4 prices one bucketing layout; this table
    prices the policy CHOICE across window sizes, which is the first
    decision a training-data pipeline makes and directly multiplies
    100 TB-scale compute cost.

    Exactness: per-doc ceilings and all sums are BIGINT on both engines
    (integer DIV, never float); the efficiency columns are one double
    division of identical exact integers. Scale shape: ONE map-only
    tokenize scan, a broadcast 3-row window relation, and a
    (source x window)-keyed partial aggregation — the shuffle carries
    ~|sources|x{n} aggregate buffers regardless of corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.size(F.split("text", WS_RE)).cast("bigint").alias("n_tokens")
    )
    win = F.broadcast(
        spark.createDataFrame(
            [(w,) for w in _P13_WINDOWS], "context_window long"
        )
    )
    perdoc = toks.crossJoin(win).withColumn(
        "pad_seqs",
        F.expr("(n_tokens + context_window - 1) DIV context_window"),
    )
    agg = perdoc.groupBy("source", "context_window").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
        F.sum("pad_seqs").cast("bigint").alias("pad_sequences"),
    )
    pack_seq = F.expr(
        "(sum_tokens + context_window - 1) DIV context_window"
    ).cast("bigint")
    return agg.select(
        "source",
        "context_window",
        "n_docs",
        "sum_tokens",
        pack_seq.alias("pack_sequences"),
        (pack_seq * F.col("context_window") - F.col("sum_tokens"))
        .cast("bigint")
        .alias("pack_waste"),
        (
            F.col("sum_tokens").cast("double")
            / (pack_seq * F.col("context_window"))
        ).alias("pack_efficiency"),
        "pad_sequences",
        (F.col("pad_sequences") * F.col("context_window") - F.col("sum_tokens"))
        .cast("bigint")
        .alias("pad_waste"),
        (
            F.col("sum_tokens").cast("double")
            / (F.col("pad_sequences") * F.col("context_window"))
        ).alias("pad_efficiency"),
    )


if p13_packing_policy_table.__doc__:  # absent under python -OO
    p13_packing_policy_table.__doc__ = p13_packing_policy_table.__doc__.format(
        n=len(_P13_WINDOWS)
    )


@register(
    "p14_temperature_mixture",
    oracle=f"""
WITH per_src AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len(regexp_split_to_array(text, '{WS_RE}'))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens FROM per_src),
shares AS (
  SELECT p.source, p.n_docs, p.n_tokens, t.total_tokens,
         CAST(p.n_tokens AS DOUBLE) / t.total_tokens AS token_share,
         CAST(ROUND(SQRT(CAST(p.n_tokens AS DOUBLE) / t.total_tokens), 6)
              AS DECIMAL(12,6)) AS w6
  FROM per_src p CROSS JOIN tot t
),
norm AS (SELECT CAST(SUM(w6) AS DECIMAL(22,6)) AS sum_w FROM shares)
SELECT s.source, s.n_docs, s.n_tokens, s.token_share,
       CAST(s.w6 AS DOUBLE) / CAST(n.sum_w AS DOUBLE) AS mix_weight,
       (CAST(s.w6 AS DOUBLE) / CAST(n.sum_w AS DOUBLE))
         * CAST(s.total_tokens AS DOUBLE) AS expected_tokens,
       ((CAST(s.w6 AS DOUBLE) / CAST(n.sum_w AS DOUBLE))
         * CAST(s.total_tokens AS DOUBLE)) / s.n_tokens AS epochs
FROM shares s CROSS JOIN norm n
""",
    tags=("pipeline", "mixture", "sampling", "training"),
)
def p14_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEMPERATURE-SCALED SOURCE MIXTURE — the sampling-weight table a
    multi-source pretraining run is configured from: each source's raw
    token share is flattened with temperature T=2 (weight proportional
    to share^(1/T) = sqrt(share), the multilingual-pretraining
    convention that upsamples small sources without letting any one
    source dominate), then normalized into mixture weights. The report
    prices the consequence per source: expected tokens drawn per epoch
    of the mixed stream and the implied per-source epoch multiplier
    (epochs > 1 = the source repeats; large values warn of memorization
    risk on tiny sources before a run is launched).

    Determinism: per-source counts are exact BIGINTs from one partial
    aggregation; token_share is one correctly-rounded bigint/bigint
    double division; sqrt is IEEE-correctly-rounded on both engines and
    rides the file-wide 6-dp bridge into DECIMAL(12,6), so the
    normalizer is an EXACT decimal sum (order-independent — a plain
    double sum here would expose both engines' aggregation order);
    the final weights/epochs are double ops on identical inputs in one
    fixed parenthesization, written identically in both engines.

    Scale shape: ONE corpus scan — the source-count-sized per-source
    relation is pinned (checkpoints.pin) before the plan forks into the
    total/normalizer branches, so the downstream one-row broadcasts and
    the final join all read the tiny pinned relation, not the corpus
    (three lineage branches would otherwise each replay the scan). The
    one shuffle carries (source, two counts), never text; no
    SinglePartition window over the data. Output is source-count-sized.
    At 100 TB this is a scan plus two scalar reductions."""
    from kinesis_spark.checkpoints import pin

    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", WS_RE)))
        .cast("bigint")
        .alias("n_tokens"),
    ).transform(pin)
    tot = per_src.agg(
        F.sum("n_tokens").cast("bigint").alias("total_tokens")
    )
    shares = per_src.crossJoin(F.broadcast(tot)).withColumn(
        "token_share",
        F.col("n_tokens").cast("double") / F.col("total_tokens"),
    ).withColumn(
        "w6",
        F.round(F.sqrt(F.col("token_share")), 6).cast("decimal(12,6)"),
    )
    norm = shares.agg(F.sum("w6").cast("decimal(22,6)").alias("sum_w"))
    weight = F.col("w6").cast("double") / F.col("sum_w").cast("double")
    expected = weight * F.col("total_tokens").cast("double")
    return shares.crossJoin(F.broadcast(norm)).select(
        "source",
        "n_docs",
        "n_tokens",
        "token_share",
        weight.alias("mix_weight"),
        expected.alias("expected_tokens"),
        (expected / F.col("n_tokens")).alias("epochs"),
    )


def _p15_oracle() -> str:
    from kinesis_spark.queries.textstats import CHUNK_STRIDE, CHUNK_TOKENS

    W, S = CHUNK_TOKENS, CHUNK_STRIDE
    spec = (
        "1 + GREATEST(0, (CAST(len(toks) AS BIGINT) - "
        f"{W} + {S} - 1) // {S})"
    )
    return f"""
WITH corpus_toks AS (
  SELECT doc_id, regexp_split_to_array(text, '{WS_RE}') AS toks
  FROM documents WHERE doc_id % 10 != 0
),
corpus_spec AS (
  SELECT doc_id, toks, {spec} AS n_chunks FROM corpus_toks
),
corpus_hashes AS (
  SELECT DISTINCT md5(array_to_string(
           list_slice(toks, g.i * {S} + 1, g.i * {S} + {W}), ' '))
         AS chunk_hash
  FROM corpus_spec, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
),
batch_toks AS (
  SELECT doc_id, regexp_split_to_array(text, '{WS_RE}') AS toks
  FROM documents WHERE doc_id % 10 = 0
),
batch_spec AS (
  SELECT doc_id, toks, {spec} AS n_chunks FROM batch_toks
),
scored AS (
  SELECT doc_id, CAST(g.i AS BIGINT) AS chunk_idx,
         CAST(len(list_slice(toks, g.i * {S} + 1, g.i * {S} + {W}))
              AS BIGINT) AS n_chunk_tokens,
         array_to_string(list_slice(toks, g.i * {S} + 1, g.i * {S} + {W}),
                         ' ') AS chunk_text,
         md5(array_to_string(
               list_slice(toks, g.i * {S} + 1, g.i * {S} + {W}), ' '))
           AS chunk_hash
  FROM batch_spec, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
),
ranked AS (
  SELECT scored.*,
         ROW_NUMBER() OVER (PARTITION BY chunk_hash
                            ORDER BY doc_id, chunk_idx) AS rn
  FROM scored
),
flagged AS (
  SELECT *, (rn > 1 OR chunk_hash IN (SELECT chunk_hash FROM corpus_hashes))
            AS dup
  FROM ranked
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(SUM(n_chunk_tokens) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN dup THEN n_chunk_tokens ELSE 0 END) AS BIGINT)
         AS tokens_dropped,
       md5(COALESCE(string_agg(CASE WHEN NOT dup THEN chunk_text END,
                               chr(10) ORDER BY chunk_idx), ''))
         AS clean_md5
FROM flagged GROUP BY doc_id
"""


@register(
    "p15_chunk_dedup_rewrite",
    oracle=_p15_oracle(),
    tags=("pipeline", "incremental", "dedup", "chunking", "index"),
)
def p15_chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d22's chunk-granularity dedup EXECUTED the production way
    (VERDICT r10 task 3) — d22 prices what chunk dedup would drop; this
    face drops it: the corpus's distinct chunk hashes live in a
    PERSISTED index (prep_index.build_chunk_index, bootstrapped once
    per documents (path, mtime)); each new batch (doc_id % 10 == 0,
    the p3/p9 split) is chunked on t20's schedule, a batch chunk is
    dropped when the corpus already owns its hash or it repeats within
    the batch (first (doc_id, chunk_idx) occurrence kept), and every
    batch document is rebuilt as its surviving chunk stream with a
    byte-pinning clean_md5 (d18's discipline, newline-joined chunk
    bodies in chunk order).

    Scale shape: zero corpus scans on the recurring path (the corpus
    enters only through the 16 B/chunk index, scanned single-column and
    confirmed via a batch-scale broadcast semi-join), and — stricter
    than p9 — chunk BODIES never cross an exchange: the dup decision
    runs on the hash-only chunk relation, and bodies are re-derived
    map-side from each batch document's own row after the narrow
    drop-list joins back. Both properties plan-asserted in
    tests/test_chunk_rewrite.py. See prep_index.chunk_dedup_rewrite
    for the full shape."""
    from kinesis_spark.prep_index import (
        build_chunk_index,
        chunk_dedup_rewrite,
        ensure_local_index,
    )

    d = load_table(spark, sf_dir, "documents")
    idx = ensure_local_index(
        sf_dir,
        "kinesis_chunk_index",
        lambda scratch: build_chunk_index(
            spark, d.filter(F.col("doc_id") % 10 != 0), scratch
        ),
    )
    return chunk_dedup_rewrite(
        spark, d.filter(F.col("doc_id") % 10 == 0), idx
    )


def _p16_oracle() -> str:
    from kinesis_spark.queries.textstats import CHUNK_STRIDE, CHUNK_TOKENS

    W, S, C = CHUNK_TOKENS, CHUNK_STRIDE, _CTX_TOKENS
    return f"""
WITH toks AS (
  SELECT doc_id, source, regexp_split_to_array(text, '{WS_RE}') AS toks
  FROM documents
),
spec AS (
  SELECT doc_id, source, toks,
         1 + GREATEST(0, (CAST(len(toks) AS BIGINT) - {W} + {S} - 1) // {S})
           AS n_chunks
  FROM toks
),
chunks AS (
  SELECT doc_id, source, CAST(g.i AS BIGINT) AS chunk_idx,
         CAST(len(list_slice(toks, g.i * {S} + 1, g.i * {S} + {W}))
              AS BIGINT) AS n_chunk_tokens,
         md5(array_to_string(
               list_slice(toks, g.i * {S} + 1, g.i * {S} + {W}), ' '))
           AS chunk_hash
  FROM spec, UNNEST(generate_series(0, n_chunks - 1)) AS g(i)
),
ranked AS (
  SELECT chunks.*,
         ROW_NUMBER() OVER (PARTITION BY chunk_hash
                            ORDER BY doc_id, chunk_idx) AS occ
  FROM chunks
),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_chunks,
         CAST(SUM(CASE WHEN occ = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS kept_chunks,
         CAST(SUM(n_chunk_tokens) AS BIGINT) AS tokens_total,
         CAST(SUM(CASE WHEN occ = 1 THEN n_chunk_tokens ELSE 0 END)
              AS BIGINT) AS tokens_kept
  FROM ranked GROUP BY source
)
SELECT source, n_chunks, kept_chunks, tokens_total, tokens_kept,
       (tokens_total + {C} - 1) // {C} AS windows_raw,
       (tokens_kept + {C} - 1) // {C} AS windows_deduped,
       (tokens_total + {C} - 1) // {C} - (tokens_kept + {C} - 1) // {C}
         AS windows_saved,
       CAST((tokens_total + {C} - 1) // {C}
            - (tokens_kept + {C} - 1) // {C} AS DOUBLE)
         / ((tokens_total + {C} - 1) // {C}) AS save_rate
FROM agg
"""


@register(
    "p16_dedup_packing_savings",
    oracle=_p16_oracle(),
    tags=("pipeline", "packing", "dedup", "chunking"),
)
def p16_dedup_packing_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHAT CHUNK DEDUP BUYS AT TRAINING TIME — the composition d22 and
    p2 exist for, in one table: the corpus is chunked on t20's
    schedule, the global first-occurrence rule keeps one copy per chunk
    md5 (d22's selection), and both the raw and the deduplicated chunk
    streams are priced in {C}-token packed context windows (p2's
    layout) per source: windows_raw vs windows_deduped is the number of
    training batches the dedup removes from every epoch, save_rate is
    the fraction of compute it returns. The table that justifies (or
    kills) running p15 on a given source mix — d22 prices droppable
    tokens, this prices droppable TRAINING WINDOWS, the unit the
    cluster bill is denominated in.

    Determinism: exact BIGINT counts and ceiling divisions
    ((a + C - 1) // C on both engines over nonnegative ints);
    save_rate is one double division of identical exact integers.

    Scale shape: ONE corpus scan (map-only chunking, hash + token
    count + source only — bodies never materialize, d22's discipline)
    -> ONE 16 B/row shuffle keyed by chunk_hash for the global
    first-occurrence window (linear at any duplication depth: hash
    groups deepen, nothing pair-expands) -> a source-keyed partial
    aggregation carrying four BIGINT buffers. Output is
    source-count-sized; at 100 TB this is d22's exact plan plus four
    integer columns."""
    from pyspark.sql.window import Window

    from kinesis_spark.queries.textstats import chunk_relation

    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    chunks = chunk_relation(
        d.select("doc_id", "source", "text"), carry=("source",), text=False
    )
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    ranked = chunks.withColumn("occ", F.row_number().over(w))
    kept = F.when(F.col("occ") == 1, F.lit(1)).otherwise(F.lit(0))
    kept_toks = F.when(F.col("occ") == 1, F.col("n_chunk_tokens")).otherwise(
        F.lit(0)
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum(kept).cast("bigint").alias("kept_chunks"),
        F.sum("n_chunk_tokens").cast("bigint").alias("tokens_total"),
        F.sum(kept_toks).cast("bigint").alias("tokens_kept"),
    )
    C = _CTX_TOKENS
    wraw = F.expr(f"(tokens_total + {C} - 1) div {C}")
    wded = F.expr(f"(tokens_kept + {C} - 1) div {C}")
    return agg.select(
        "source",
        "n_chunks",
        "kept_chunks",
        "tokens_total",
        "tokens_kept",
        wraw.alias("windows_raw"),
        wded.alias("windows_deduped"),
        (wraw - wded).alias("windows_saved"),
        ((wraw - wded).cast("double") / wraw).alias("save_rate"),
    )


if p16_dedup_packing_savings.__doc__:  # absent under python -OO
    p16_dedup_packing_savings.__doc__ = (
        p16_dedup_packing_savings.__doc__.format(C=_CTX_TOKENS)
    )
