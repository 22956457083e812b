#!/usr/bin/env python
"""Render SCALE_FULL.md from a registry-wide scale_stress run
(VERDICT r9 task 4).

Usage:
    python scripts/scale_stress.py --all > SCALE_FULL.json
    python scripts/gen_scale_full.py SCALE_FULL.json [SCALE_D30.json] > SCALE_FULL.md

Every ratio > 2x gets a structural explanation. The default explanation
tier is mechanical: at fixed local[32] resources, 10x rows cost up to
~10x wall once the cores saturate — DATA-LINEAR growth, the honest
baseline for scan-bound plans (the r*-round "flat 1.1-1.3x" numbers are
operators whose x1 run leaves most of the 32 cores idle). What the
table exists to catch is the SUPERLINEAR tier: ratio clearly above the
replica factor means per-row cost grew with corpus size — a pair
expansion, a broadcast that scales with data, or a lost pushdown.
Those entries carry individual notes (NOTES below) or are bugs.
"""

from __future__ import annotations

import json
import sys

# Structural notes for entries whose ratio is expected to exceed the
# plain data-linear tier (or which need context even below it). Keyed
# by query name; families share notes via prefix fallback.
NOTES: dict[str, str] = {
    "d3_minhash_lsh_pairs": (
        "capped since r10: hot buckets drop before pair expansion; "
        "growth is candidate-volume-bounded (cap^2 per bucket)"
    ),
    "d7_simhash_pairs": (
        "capped since r10 (SIM_MAX_BUCKET=32): the 10x replica corpus "
        "makes every band bucket 10-deep, still under the cap, so pair "
        "output legitimately grows ~x10 on top of the data growth — "
        "bounded at any duplication by the cap (the uncapped diagnostic "
        "form measured 22.5x + driver OOM at 30x, SCALE_r09_x30)"
    ),
    "d20_capped_simhash_pairs": (
        "same relation as d7's registered face; see d7"
    ),
    "d5_embedding_near_dup": (
        "BOUNDED since r10 — this table's first catch: the bare-label "
        "blocking measured 32.3x at 10x (quadratic in block size); the "
        "registered face now sub-buckets adaptively (sim9's nbits rule, "
        "block ~64) and re-measured 2.0x; unbounded=True is the "
        "exact-within-label diagnostic"
    ),
    "d4_jaccard_verify": (
        "doc_id<50 bounded subset — growth comes only from the pushed-"
        "down scan, output fixed"
    ),
    "d21_lsh_calibration": (
        "all-pairs on a fixed 200-doc sample; only the pushed-down scan "
        "grows"
    ),
    "d8_minhash_lsh_mllib": (
        "INPUT-BOUNDED since r11 (doc_id < 2000 — fixed work at any "
        "corpus scale, 7.1x -> 0.8x at x10): MLlib's "
        "approxSimilarityJoin exposes no bucket cap, so the fixed "
        "deterministic slice is the only bound available through the "
        "public API; max_doc_id=None is the corpus-wide diagnostic "
        "hatch, production face is d14"
    ),
    "sim21_chunk_retrieval": (
        "probe candidate volume = nprobe/n_cells of the CHUNK corpus: "
        "cell DEPTH grows with data at the fixed label-cell count, so "
        "rerank work is data-linear; at 100 TB the cell count grows "
        "with the corpus (rebalance_ivf_cells bisects hot cells) "
        "holding per-probe volume flat"
    ),
    "d9_dedup_components": (
        "iterative: per-round shuffle carries 16 B/node; rides CAPPED "
        "candidates (d14)"
    ),
    "d10_edit_distance_verify": (
        "broadcasts the melted CAPPED pair list — broadcast bounded by "
        "small-bucket count, not corpus"
    ),
    "sim18_ann_recall_eval": (
        "ANN candidate volume grows with bucket occupancy (replica "
        "corpus packs every bucket 10-deep): superlinear CANDIDATES "
        "with linear per-candidate work; production knob is the bucket "
        "width"
    ),
    "sim19_nprobe_recall_sweep": (
        "probe candidate volume grows with cell occupancy (see sim18); "
        "one pinned widest-probe relation feeds all widths"
    ),
    "sim2_lsh_bucketed_ann": (
        "sign-LSH bucket occupancy grows 10x on the replica corpus — "
        "candidate volume (not per-pair cost) grows; rerank is "
        "candidate-bounded"
    ),
    "t13_boilerplate_ngrams": (
        "the replica corpus makes every original document's grams "
        "boilerplate by construction, so the rewrite pays the full 10x "
        "hit volume — adversarial-by-design input for this operator"
    ),
    "mm10_shared_segment_pairs": (
        "in-bucket pair expansion on capped fingerprint keys; replica "
        "corpus packs buckets to the cap"
    ),
    "g3_neardup_triangles": (
        "wedge+closure joins on d3's capped candidate graph; replica "
        "corpus makes each near-dup clique 10-wide"
    ),
}

# x30 duplicate-heavy table notes (VERDICT r10 task 8): every >2x row
# carries the structural reason; x30 DATA means <=30x is sublinear per
# row, so these annotate WHY the growth lands where it does, not a bug.
D30_NOTES: dict[str, str] = {
    "d5_embedding_near_dup": (
        "bounded sub-buckets hold pair work linear; 30x rows -> ~7x "
        "wall = ~4x cheaper per row than x1"
    ),
    "d16_fingerprint_overlap": (
        "linear in HIT volume: the corpus is 30-member fingerprint "
        "groups by construction, so true-overlap output grows ~30x "
        "while wall grows 4.6x"
    ),
    "d18_dup_span_excision": (
        "linear in planted-span hit volume (all-corpus face; p9 is the "
        "incremental production path) — every window repeats 30x here"
    ),
    "d17_containment_overlap": (
        "containment hit volume grows with duplication (30-deep "
        "groups); capped candidate relation bounds the pair stage; "
        "r12 single-shingle-pass verify cut x30 from 3.8x to ~2.5x — "
        "the residual growth is the per-pair intersect work (size A + size B), "
        "which IS the query's output (further caps change results)"
    ),
    "d3_minhash_lsh_pairs": (
        "capped (MAX_BUCKET=4): hot buckets drop wholesale; was 19.6x "
        "uncapped"
    ),
    "d19_signature_jaccard_estimate": (
        "rides d3's capped candidates; estimate stage linear in "
        "candidate volume"
    ),
    "d14_capped_lsh_pairs": (
        "the cap is the operator: pair output bounded per bucket at "
        "any duplication"
    ),
    "d9_dedup_components": (
        "frontier-bounded iteration over capped candidate edges"
    ),
    "d10_edit_distance_verify": (
        "verify stage linear in capped candidate pairs"
    ),
    "d13_canonical_selection": (
        "component-partitioned windows over capped components"
    ),
}

LINEAR_NOTE = (
    "data-linear: 10x rows => up to ~10x wall at fixed local[32] once "
    "cores saturate; per-row cost flat — at 100 TB the answer is more "
    "executors, not a different plan"
)


def _xn(r: dict) -> float:
    """High-replica timing of one entry. New artifacts emit the
    replica-agnostic "xN" key; pre-r11 artifacts used a hardcoded "x10"
    even for 30-replica runs (ADVICE r10) — accept both so old and
    merged artifacts keep rendering."""
    return r["xN"] if "xN" in r else r["x10"]


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    with open(sys.argv[1]) as f:
        data = json.load(f)
    replicas = data.get("replicas", 10)
    rows = data["queries"]
    d30 = {}
    d30_replicas = 30
    if len(sys.argv) > 2:
        with open(sys.argv[2]) as f:
            d30_data = json.load(f)
        d30 = d30_data.get("queries", {})
        d30_replicas = d30_data.get("replicas", 30)

    flagged = {n: r for n, r in rows.items() if r["ratio"] > 2.0}
    superlinear = {
        n: r for n, r in rows.items() if r["ratio"] > replicas * 1.5
    }
    out = []
    out.append("# SCALE_FULL — registry-wide growth table "
               f"(x1 vs x{replicas}, local[32])")
    out.append("")
    out.append(
        f"Source: `scripts/scale_stress.py --all` over the full registry "
        f"({len(rows)} queries) on the replica corpora under `.scale/` "
        f"(documents/embeddings near-dup replication + full star-schema "
        f"key-offset replication; see the script docstring). "
        f"`ratio` = warm best-of-2 wall at x{replicas} / x1."
    )
    out.append("")
    out.append(
        f"**Reading the ratios**: x1 rarely saturates 32 cores, so a "
        f"data-linear operator lands anywhere in 1x-{replicas}x "
        f"depending on how much idle capacity its x1 run left. The "
        f"failure tier this table exists to catch is ratios clearly "
        f"ABOVE ~{replicas}x — per-row cost growing with corpus size. "
        f"Current superlinear entries: "
        f"{', '.join(sorted(superlinear)) or 'NONE'}."
    )
    out.append("")
    out.append(f"Flagged (>2x): {len(flagged)} of {len(rows)}; every one "
               "carries a structural note below (shared legend `L` = "
               "data-linear).")
    out.append("")
    out.append(f"| query | x1 s | x{replicas} s | ratio | note |")
    out.append("|---|---|---|---|---|")
    for name in sorted(rows, key=lambda n: -rows[n]["ratio"]):
        r = rows[name]
        if r["ratio"] > 2.0:
            note = NOTES.get(name, LINEAR_NOTE if r["ratio"] <= replicas * 1.5
                             else "**UNEXPLAINED — fix me**")
            if note == LINEAR_NOTE:
                note = "L"
        else:
            note = ""
        out.append(
            f"| {name} | {r['x1']} | {_xn(r)} | {r['ratio']} | {note} |"
        )
    out.append("")
    out.append("`L` = " + LINEAR_NOTE + ".")
    if d30:
        out.append("")
        out.append("## d-family at x30 (VERDICT r9 task 1 close-out)")
        out.append("")
        out.append(
            "The duplicate-heavy 30x corpus (every document a 30-member "
            "near-dup group) — the input that OOM'd the uncapped d7. "
            "All registered d-family faces now ride the caps/bounds; "
            "this run completed at the default 8 GiB driver heap with "
            "zero failures. Ratios are wall-clock for 30x DATA, so "
            "anything <=30x is sublinear per row; the worst row (d5 at "
            "7.4x) is ~4x CHEAPER per row than at x1. Contrast the "
            "uncapped baselines these replaced: d3 19.6x, d7 22.5x + "
            "driver OOM, d8c 40.3x. r11 additions: the input-bounded "
            "registered d8 (was the x10 table's 7.1x top entry, now "
            "0.9x here) and the p15 chunk-dedup rewrite face (1.2x — "
            "hash groups deepen 30x, nothing pair-expands)."
        )
        out.append("")
        out.append(f"| query | x1 s | x{d30_replicas} s | ratio | note |")
        out.append("|---|---|---|---|---|")
        for name in sorted(d30):
            r = d30[name]
            note = D30_NOTES.get(name, "") if r["ratio"] > 2.0 else ""
            if r["ratio"] > 2.0 and not note:
                note = "**UNEXPLAINED — fix me**"
            out.append(
                f"| {name} | {r['x1']} | {_xn(r)} | {r['ratio']} | {note} |"
            )
    print("\n".join(out))


if __name__ == "__main__":
    main()
