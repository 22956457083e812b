"""Persisted IVF ANN index: build once, probe many — the serving shape
of `sim6_ivf_ann` (queries/similarity.py), which recomputes its index
per query run.

Layout on disk (all parquet):

    <index>/codebook/   (cell, cv double[])           — broadcast-sized
    <index>/cells/      (match_id, v double[]) partitioned by cell

Because ``cells/`` is PARTITIONED BY cell, a probe reads only the
``nprobe`` matching directories — partition pruning does the cell
selection at the file-listing level (asserted in
tests/test_ann_index.py), which is exactly how an IVF probe should
touch ~nprobe/n_cells of a 100 TB corpus instead of scanning it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_spark.queries.similarity import ivf_assign, ivf_codebook


def build_ivf_index(embeddings: DataFrame, index_dir: str) -> None:
    """Build and persist the index from (vec_id, label, embedding
    float[]) rows. One assignment pass; the codebook is written
    alongside so queries never touch the raw corpus table."""
    e = embeddings.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = ivf_codebook(e)
    cent.write.mode("overwrite").parquet(f"{index_dir}/codebook")
    assign = ivf_assign(e, cent)
    (
        assign.filter(F.col("crk") == 1)
        .select(F.col("vec_id").alias("match_id"), "v", "cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{index_dir}/cells")
    )


def append_to_ivf_index(
    spark: SparkSession, new_embeddings: DataFrame, index_dir: str
) -> int:
    """Incremental index maintenance: assign NEW vectors against the
    EXISTING codebook and append them to their cell partitions. At
    100 TB you never rebuild the index for a daily batch — the append
    cost is proportional to the batch, existing cell files stay
    byte-identical, and probes see the union immediately (partition
    pruning is unaffected: the new files land inside the same
    ``cell=<k>`` directories).

    Centroids deliberately do NOT move (standard serving practice —
    IVF lists drift slowly; rebuild on a cadence, not per batch).
    Returns the number of vectors appended."""
    e = new_embeddings.select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    cent = spark.read.parquet(f"{index_dir}/codebook")
    assign = ivf_assign(e, cent)
    batch = (
        assign.filter(F.col("crk") == 1)
        .select(F.col("vec_id").alias("match_id"), "v", "cell")
        # materialize once: count + write would otherwise each run the
        # full assignment join
        .localCheckpoint(eager=True)
    )
    n = batch.count()
    batch.write.mode("append").partitionBy("cell").parquet(f"{index_dir}/cells")
    return n


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    top_k: int = 5,
    n_probe: int = 2,
) -> DataFrame:
    """ANN top-k for (query_id, qv double[]) rows against a persisted
    index: rank cells per query against the broadcast codebook, read
    ONLY the probed cell partitions, rerank candidates by exact cosine.
    Result: (query_id, match_id, cos_sim, rank<=top_k), identical to
    sim6's contract."""
    cent = spark.read.parquet(f"{index_dir}/codebook")
    # ROUNDED squared distance, matching ivf_assign's build-side argmin
    # (the file-wide 6-dp fp bridge): probe ranking and cell ownership
    # must agree on near-tie centroids or a query can probe a cell its
    # true neighbors were not assigned to
    dist2 = F.round(
        F.aggregate(
            F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("cell"))
    probes = (
        queries.crossJoin(F.broadcast(cent))
        .select("query_id", "qv", "cell", dist2.alias("d2"))
        .withColumn("crk", F.row_number().over(w_probe))
        .filter(F.col("crk") <= n_probe)
        .select("query_id", "qv", "cell")
        # materialize once: the probes plan (queries x codebook crossJoin
        # + window) feeds BOTH the probe-cell collect and the candidate
        # join below — query-set-scale, cheap to pin
        .localCheckpoint(eager=True)
    )
    # the probed-cell filter must be a literal IN list so it prunes
    # partitions at file listing; a join would read every cell directory
    probe_cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    cells = spark.read.parquet(f"{index_dir}/cells").filter(
        F.col("cell").isin(probe_cells)
    )
    dot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("v"), lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    nq = F.sqrt(
        F.aggregate(F.transform("qv", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    nc = F.sqrt(
        F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x)
    )
    scored = (
        probes.join(cells, "cell")
        .filter(F.col("match_id") != F.col("query_id"))
        .select("query_id", "match_id", F.round(dot / (nq * nc), 6).alias("cos_sim"))
    )
    w_rank = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rank") <= top_k)
    )
