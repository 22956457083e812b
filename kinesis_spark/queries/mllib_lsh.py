"""MLlib LSH variants of near-dup and ANN — the built-in Spark scale
path next to the engine-portable implementations in dedup.py /
similarity.py.

These are registered WITHOUT oracles: MLlib's hash families are
JVM-specific (seeded random projections / universal hashing), so no
other engine can replay them bit-for-bit. The driver records a
rows-only check; the semantic guarantees (recall vs the exact
operators) are pinned in tests/test_mllib_lsh.py instead.

Scale notes: ``approxSimilarityJoin`` explodes each row to its hash
buckets and equi-joins on (band, bucket) — the same no-all-pairs shape
as d3/d7/sim2, but with MLlib's tuned hash families and native vector
ops instead of expression-level md5 folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_spark.io import ensure_min_partitions, load_table
from kinesis_spark.pins import pin_shared
from kinesis_spark.queries import register

SEED = 42

# Deterministic corpus bound for the REGISTERED d8 face (VERDICT r10
# finding 2): approxSimilarityJoin exposes no bucket cap, so candidate
# volume grows with duplicate-group width — the one registered face
# whose pair expansion could not be capped through the public API. The
# registered query therefore runs on a fixed doc_id < D8_BOUND slice
# (covers the whole sf0.001/sf0.01 fixture corpora, a 2000-doc slice at
# sf0.1+), exactly how d8c was input-bounded in r10 (40.3x -> 0.9x at
# the 30x duplicate-heavy corpus). Corpus-wide MLlib detection remains
# available as an explicit diagnostic: max_doc_id=None.
D8_BOUND = 2000


def _shingle_vectors(
    spark: SparkSession, sf_dir: str, max_doc_id: int | None = None
) -> DataFrame:
    """documents → sparse HashingTF vectors over word 3-shingles (binary,
    because MinHash is a set sketch).

    3-shingles, not 2: MLlib's hash tables are 1-row bands
    (OR-amplification only), so every pair sharing ANY min-shingle
    becomes a candidate. In a shared-vocabulary corpus 2-shingle
    collisions are common enough to go quadratic (~54 s at sf0.1);
    3-shingle collision probability tracks true Jaccard similarity
    (~2 s). Same shingle width as the portable d3 operator."""
    from pyspark.ml.feature import HashingTF

    d = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    if max_doc_id is not None:
        d = d.filter(F.col("doc_id") < max_doc_id)
    toks = d.select(
        "doc_id", F.explode(F.array(F.split("text", r"[ \t\n\f\r\x0B]+"))).alias("toks")
    ).filter(F.size("toks") >= 3)
    sh = toks.select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at("toks", i),
                F.element_at("toks", i + 1),
                F.element_at("toks", i + 2),
            ),
        ).alias("shingles"),
    )
    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=1 << 18, binary=True)
    # persist: fit() (dimension probe), and BOTH sides of the self
    # approxSimilarityJoin would otherwise each re-run the tokenize/
    # shingle/TF map stage — three evaluations of the most expensive
    # stage per query run. Vector rows are small (sparse binary TF).
    return pin_shared(tf.transform(sh).select("doc_id", "features"))


@register(
    "d8_minhash_lsh_mllib",
    oracle=None,  # MLlib hash family is engine-specific; recall pinned in pytest
    tags=("dedup", "minhash", "mllib"),
    # oracle-exempt: d8c re-verifies these candidate pairs by EXACT
    # Jaccard with a hash-green DuckDB oracle (queries/companions.py)
    companion="d8c_mllib_pairs_exact_jaccard",
)
def d8_minhash_lsh_mllib(
    spark: SparkSession, sf_dir: str, max_doc_id: int | None = D8_BOUND
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH.approxSimilarityJoin at
    Jaccard distance < 0.6 over word-3-shingle sets (MLlib's join is
    STRICT: a pair at exactly 0.6 is excluded).

    INPUT-BOUNDED since r11 (VERDICT r10 finding 2): MLlib's hash
    tables are 1-row bands with NO bucket-size cap, so on an unbounded
    corpus candidate volume grows quadratically in duplicate-group
    width (7.1x at the 10x replica corpus, the old scale table's top
    entry) and the public API exposes no cap. The registered face runs
    on the deterministic ``doc_id < {B}`` slice — fixed work at any
    corpus scale, same bounding d8c adopted in r10 — keeping the
    MLlib-vs-portable comparison purpose; the production near-dup path
    is the capped portable pipeline (d14/d3). ``max_doc_id=None`` is
    the corpus-wide diagnostic escape hatch; d8c passes its own
    tighter instrument bound."""
    from pyspark.ml.feature import MinHashLSH

    vecs = _shingle_vectors(spark, sf_dir, max_doc_id=max_doc_id)
    # 4 tables: at this corpus's similarity profile, 8 tables finds the
    # identical pair set at ~3x the join cost (measured at sf0.1)
    mh = MinHashLSH(inputCol="features", outputCol="hashes",
                    numHashTables=4, seed=SEED)
    model = mh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.6, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )


@register(
    "sim5_brp_ann_mllib",
    oracle=None,  # seeded random projections; recall pinned in pytest
    tags=("similarity", "ann", "mllib"),
    # oracle-exempt: sim5c measures this ANN's recall against the exact
    # top-k with a hash-green DuckDB oracle (queries/companions.py)
    companion="sim5c_brp_recall_vs_exact",
)
def sim5_brp_ann_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Euclidean ANN via BucketedRandomProjectionLSH: approxSimilarityJoin
    of the 10-query set against the corpus, then per-query top-5 by true
    distance — the IVF-ish two-stage (coarse bucket, exact rerank)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql.window import Window

    e = (
        ensure_min_partitions(load_table(spark, sf_dir, "embeddings"))
        .select(
            "vec_id",
            array_to_vector(
                F.transform("embedding", lambda x: x.cast("double"))
            ).alias("features"),
        )
    )
    # persist: fit() + both approxSimilarityJoin sides re-run the
    # vector transform otherwise (same reuse as _shingle_vectors)
    e = pin_shared(e)
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0,
        numHashTables=4, seed=SEED,
    )
    model = brp.fit(e)
    q = e.filter(F.col("vec_id") < 10)
    joined = model.approxSimilarityJoin(q, e, float("inf"), distCol="dist")
    scored = joined.filter(
        F.col("datasetA.vec_id") != F.col("datasetB.vec_id")
    ).select(
        F.col("datasetA.vec_id").alias("query_id"),
        F.col("datasetB.vec_id").alias("match_id"),
        F.round("dist", 6).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 5)
    )


if d8_minhash_lsh_mllib.__doc__:  # absent under python -OO
    d8_minhash_lsh_mllib.__doc__ = d8_minhash_lsh_mllib.__doc__.format(
        B=D8_BOUND
    )
