"""Property tests for the SimHash operator: order invariance (tf-weighted
bag semantics) and locality (small edits move few bits)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

def _sigs_of(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # _simhash_df loads from parquet; inline its signature logic on df
    toks = df.select(
        "doc_id", F.explode(F.split("text", r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    from kinesis_spark.queries.dedup import SIM_BITS

    votes = toks.select("doc_id", h.alias("h")).groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{j}")
            for j in range(SIM_BITS)
        ]
    )
    sig = None
    for j in range(SIM_BITS):
        bit = F.when(F.col(f"s{j}") > 0, F.lit(1).cast("bigint") * (1 << j)).otherwise(
            F.lit(0).cast("bigint")
        )
        sig = bit if sig is None else sig + bit
    return {
        r["doc_id"]: r["sig"]
        for r in votes.select("doc_id", sig.alias("sig")).collect()
    }


def test_simhash_is_token_order_invariant(spark):
    rng = random.Random(7)
    base = [f"w{rng.randrange(40)}" for _ in range(60)]
    shuffled = base[:]
    rng.shuffle(shuffled)
    sigs = _sigs_of(
        spark,
        [(1, " ".join(base)), (2, " ".join(shuffled))],
    )
    assert sigs[1] == sigs[2]


def test_simhash_locality(spark):
    rng = random.Random(11)
    base = [f"w{rng.randrange(500)}" for _ in range(80)]
    edited = base[:]
    edited[3] = "changed-token"
    unrelated = [f"u{rng.randrange(500)}" for _ in range(80)]
    sigs = _sigs_of(
        spark,
        [(1, " ".join(base)), (2, " ".join(edited)), (3, " ".join(unrelated))],
    )
    ham_edit = bin(sigs[1] ^ sigs[2]).count("1")
    ham_unrel = bin(sigs[1] ^ sigs[3]).count("1")
    assert ham_edit < ham_unrel, (ham_edit, ham_unrel)
    assert ham_edit <= 12  # one token of 80 flips few majority votes


def test_d20_cap_drops_planted_hot_bucket(spark, tmp_path):
    """Plant a dup group wider than SIM_MAX_BUCKET: d7 (uncapped) pays
    its quadratic pair expansion; d20 drops the hot buckets wholesale —
    and keeps every pair from small buckets (the informative ones)."""
    from pyspark.sql import functions as F

    from kinesis_spark.queries.dedup import (
        SIM_MAX_BUCKET,
        d7_simhash_pairs,
        d20_capped_simhash_pairs,
    )

    n_hot = SIM_MAX_BUCKET + 8
    hot = [(i, "the same boilerplate template page body here") for i in range(n_hot)]
    # a small near-dup pair that must SURVIVE the cap
    pair = [
        (1000, "a genuinely unique document about spark engines"),
        (1001, "a genuinely unique document about spark engines!"),
    ]
    rows = [
        (i, t, "en", "web", len(t)) for i, t in hot + pair
    ]
    d = str(tmp_path / "fixture")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")

    uncapped = {
        (r.doc_a, r.doc_b)
        for r in d7_simhash_pairs(spark, d, uncapped=True).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in d20_capped_simhash_pairs(spark, d).collect()
    }
    assert capped <= uncapped
    # the planted hot group's pairs are gone...
    assert not any(a < n_hot and b < n_hot for a, b in capped)
    assert any(a < n_hot and b < n_hot for a, b in uncapped)
    # ...but the small informative bucket survives
    assert (1000, 1001) in capped


def test_packed_vote_spread_algebra():
    """The multiply-spread trick behind SIM_PACK_C/SIM_PACK_M: for every
    3-bit group value, (v * C) & M puts exactly bit j of v at field
    offset 21*j and nothing else — so summing the spread terms counts
    each bit independently (no cross-field carries below 2^21 counts)."""
    from kinesis_spark.queries.dedup import (
        SIM_PACK_C,
        SIM_PACK_FIELD,
        SIM_PACK_M,
    )

    for v in range(8):
        spread = (v * SIM_PACK_C) & SIM_PACK_M
        for j in range(3):
            assert (spread >> (SIM_PACK_FIELD * j)) & ((1 << SIM_PACK_FIELD) - 1) == (
                (v >> j) & 1
            )
