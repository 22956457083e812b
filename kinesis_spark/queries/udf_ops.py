"""User-defined function surface: Python UDTF (table function) and
``applyInPandas`` grouped-map — the §2B UDF/UDAF/UDTF rows that aren't
already covered by mapInPandas (sim4) and applyInPandasWithState
(streaming).

Both are deliberately deterministic pure functions of their inputs so
the DuckDB oracle can replay them exactly — proving the Arrow/pickle
round-trips are lossless, not just that the plumbing runs.

Scale notes: UDTFs run row-at-a-time Python even with Arrow transfer —
at 100 TB prefer explode over built-in expressions (i1/t4 style); the
UDTF exists for the API surface and for logic that genuinely needs
imperative Python. applyInPandas shuffles each group to one task:
groups must fit in executor memory (here: documents per (lang, source),
bounded); for unbounded groups use window functions instead.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_spark.io import load_table
from kinesis_spark.queries import register


CHUNK_WORDS = 8


@register(
    "u1_word_chunk_udtf",
    oracle=f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(text, '[ \\t\\n\\f\\r\\x0B]+') AS toks FROM documents
),
i AS (
  SELECT doc_id, toks,
         unnest(range(1, CAST(ceil(len(toks) / {CHUNK_WORDS}.0) AS BIGINT) + 1)) AS ci
  FROM t
)
SELECT doc_id,
       CAST(ci AS BIGINT) AS chunk_idx,
       array_to_string(
         list_slice(toks, (ci - 1) * {CHUNK_WORDS} + 1,
                    least(ci * {CHUNK_WORDS}, len(toks))), ' ') AS chunk_text,
       CAST(least(ci * {CHUNK_WORDS}, len(toks)) - (ci - 1) * {CHUNK_WORDS} AS BIGINT)
         AS n_words
FROM i
""",
    tags=("udtf", "text"),
)
def u1_word_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one document row → N fixed-width word chunks via a
    LATERAL table function (the text analogue of the ingest byte
    chunker). The chunk rule (8 words, 1-based index, short tail) is
    replayed exactly by the oracle."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx: bigint, chunk_text: string, n_words: bigint")
    class ChunkWords:
        def eval(self, text: str):
            import re

            if text is None:
                # mirror the oracle: regexp_split_to_array(NULL) -> NULL
                # -> unnest emits no rows (re.split(None) would raise,
                # killing the whole job on one NULL document)
                return
            toks = re.split(r"[ \t\n\f\r\x0B]+", text)
            for i in range(0, len(toks), CHUNK_WORDS):
                chunk = toks[i : i + CHUNK_WORDS]
                yield i // CHUNK_WORDS + 1, " ".join(chunk), len(chunk)

    spark.udtf.register("chunk_words", ChunkWords)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("_docs_udtf")
    return spark.sql(
        "SELECT d.doc_id, s.chunk_idx, s.chunk_text, s.n_words "
        "FROM _docs_udtf d, LATERAL chunk_words(d.text) s"
    )


_RANK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("rank_in_group", T.LongType()),
        T.StructField("group_size", T.LongType()),
        T.StructField("chars_vs_min", T.LongType()),
    ]
)


@register(
    "u2_grouped_rank_pandas",
    oracle="""
SELECT doc_id, lang, source, n_chars,
       CAST(ROW_NUMBER() OVER (PARTITION BY lang, source
                               ORDER BY n_chars, doc_id) AS BIGINT) AS rank_in_group,
       CAST(COUNT(*) OVER (PARTITION BY lang, source) AS BIGINT) AS group_size,
       CAST(n_chars - MIN(n_chars) OVER (PARTITION BY lang, source) AS BIGINT)
         AS chars_vs_min
FROM documents
""",
    tags=("udf", "applyInPandas", "window"),
)
def u2_grouped_rank_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``applyInPandas`` grouped map computing per-(lang, source) ranks —
    integer-only math so the window-function oracle matches bitwise.
    (The same result is expressible with Window functions — see the
    oracle; the point is exercising the grouped-map Arrow path against
    a known-exact answer.)"""
    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # nested + self-contained → cloudpickle ships it by value, so it
        # unpickles on workers without this package on PYTHONPATH
        out = pdf.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        out["rank_in_group"] = range(1, len(out) + 1)
        out["group_size"] = len(out)
        out["chars_vs_min"] = out["n_chars"] - out["n_chars"].min()
        return out[
            ["doc_id", "lang", "source", "n_chars", "rank_in_group",
             "group_size", "chars_vs_min"]
        ]

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    return d.groupBy("lang", "source").applyInPandas(rank_group, schema=_RANK_SCHEMA)


@register(
    "u3_grouped_agg_pandas",
    oracle="""
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_sum,
       CAST(SUM(n_chars * n_chars) AS BIGINT) AS chars_sumsq
FROM documents
GROUP BY source
""",
    tags=("udf", "pandas-agg"),
)
def u3_grouped_agg_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-AGGREGATE pandas UDF (the third Arrow UDF shape next to
    u1's UDTF and u2's grouped map): per-source moment sums computed in
    numpy/Python ints. Integer-only accumulation so the result is exact
    and order-insensitive — a float sum would vary with Arrow batch
    order; the squared sum runs in arbitrary-precision Python ints
    because numpy int64 would WRAP silently past 2^63 (the oracle's
    HUGEINT stays exact and its BIGINT cast fails loudly instead).

    Scale shape: Spark evaluates grouped-agg pandas UDFs with partial
    Arrow batches per partition ONLY for window frames; in groupBy().agg
    the group's values stream to one executor — fine while groups
    (sources) are numerous and individually small relative to a task,
    which is the shard layout by construction."""
    from pyspark.sql import functions as SF

    # Spark disallows mixing grouped-agg pandas UDFs with JVM aggregates
    # in one agg() — so all three moments go through Arrow (nested defs →
    # ship by value; int64 math → exact).
    @SF.pandas_udf("bigint")
    def n_docs(v: pd.Series) -> int:
        return int(len(v))

    @SF.pandas_udf("bigint")
    def total(v: pd.Series) -> int:
        return int(v.to_numpy(dtype="int64").sum())

    @SF.pandas_udf("bigint")
    def sumsq(v: pd.Series) -> int:
        # Python ints, not numpy: (a*a).sum() in int64 wraps silently
        # once sum(n_chars^2) passes 2^63 — plausible at corpus scale
        return sum(int(x) * int(x) for x in v.to_list())

    d = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    return d.groupBy("source").agg(
        n_docs("n_chars").alias("n_docs"),
        total("n_chars").alias("chars_sum"),
        sumsq("n_chars").alias("chars_sumsq"),
    )
