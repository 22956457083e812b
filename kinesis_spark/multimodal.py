"""Multimodal column support: image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
Pandas UDFs (``mapInPandas``).

The reference (remind101/kinesis) treats every payload as an opaque
``[]byte`` (kinesis/kinesis.go:199,213) — this module is the analytics
extension of that byte-oriented model: payloads stay binary end-to-end;
Spark never deserializes them JVM-side, and per-payload compute runs in
vectorized Arrow batches, never row-at-a-time Python.

Scale design:
- Payloads are never collected to the driver; ``mapInPandas`` streams
  Arrow batches partition-parallel.
- Metadata (modality, codec, declared dims) travels in narrow typed
  columns so filters on it are Catalyst-pushable without touching bytes.
- Real codecs (PIL / ffmpeg / soundfile) are NOT in this container:
  ``decode_media`` raises ``NotImplementedError`` unless
  ``fake=True``, which substitutes a deterministic header-parse fake so
  the Spark-side plumbing (schema, batching, partitioning) is fully
  testable. The fake derives every output field from payload bytes
  alone, so a SQL oracle can replay it bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MODALITIES = ("image", "audio", "video")

#: Schema of a multimodal media table: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

#: Output schema of decode_media / the decode mapInPandas stage.
DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("checksum", T.StringType()),
    ]
)


def media_table(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from ``documents``: the UTF-8
    bytes of ``text`` become the opaque payload; modality round-robins
    on doc_id. (The driver fixtures carry no real media blobs; at
    production scale this is ``spark.read.format('binaryFile')`` or a
    parquet table with a true binary column — same schema either way.)
    """
    return documents.select(
        F.col("doc_id").alias("media_id"),
        # pmod, not %: a negative doc_id under sign-preserving % would
        # index 0/negative (ANSI element_at throws / silently wraps);
        # len(MODALITIES), not a literal, so adding a modality cannot
        # silently skip it (the oracle constant is generated in lockstep)
        F.element_at(
            F.array(*[F.lit(m) for m in MODALITIES]),
            (F.pmod(F.col("doc_id"), F.lit(len(MODALITIES))) + 1).cast("int"),
        ).alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
    )


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads to typed features via ``mapInPandas``.

    Real decoding needs codec libraries not present in this container;
    pass ``fake=True`` for the deterministic header-parse fake (dims
    from the first payload bytes, frame count from length, md5 checksum
    — a pure function of the payload, so DuckDB replays it exactly).
    The Arrow plumbing — batch iteration, output schema, partition
    parallelism — is identical in both paths.

    Both UDFs are nested, self-contained closures: cloudpickle ships
    them by value, so they unpickle on workers that don't have this
    package on PYTHONPATH (the driver harness's session, not ours).
    """
    if not fake:
        def _real(_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "real media decode requires PIL/ffmpeg/soundfile, which are "
                "not installed; use decode_media(media, fake=True)"
            )
        return media.mapInPandas(_real, schema=DECODED_SCHEMA)

    def _fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            # null payload -> null features (MEDIA_SCHEMA allows null
            # payloads; len(None)/md5(None) would kill the whole job
            # with an opaque executor TypeError)
            payloads = pdf["payload"]
            first = payloads.map(
                lambda b: b[0] if b is not None and len(b) > 0 else 0
            ).astype("int64")
            second = payloads.map(
                lambda b: b[1] if b is not None and len(b) > 1 else 0
            ).astype("int64")
            n_bytes = payloads.map(
                lambda b: len(b) if b is not None else 0
            ).astype("int64")
            null_mask = payloads.isna()
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    # nullable Int64 (not .where on int64, which would
                    # yield float64 NaN that Arrow refuses to cast back)
                    "n_bytes": n_bytes.astype("Int64").where(~null_mask),
                    "width": (first + 1).astype("Int64").where(~null_mask),
                    "height": (second + 1).astype("Int64").where(~null_mask),
                    "n_frames": (n_bytes // 64 + 1).astype("Int64").where(~null_mask),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest()
                        if b is not None
                        else None
                    ),
                }
            )

    return media.mapInPandas(_fake, schema=DECODED_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = 256, every_k: int = 4) -> DataFrame:
    """Frame-sample: treat each payload as fixed-size frames and keep
    every k-th frame, JVM-side (substring on binary — no Python). At
    scale this is the cheap pre-filter before a real decoder sees data:
    bytes shrink by ~1/k before any UDF runs."""
    n_frames = F.ceil(F.col("n_bytes") / F.lit(frame_bytes)).cast("int")
    # guard the empty payload: sequence(0, -1) steps DOWNWARD to [0, -1]
    # rather than yielding an empty array, which would fabricate a
    # phantom frame_idx=0 row for zero-byte media
    idx_array = F.when(
        n_frames > 0, F.sequence(F.lit(0), n_frames - 1)
    ).otherwise(F.array().cast("array<int>"))
    frame_idx = F.explode(idx_array).alias("frame_idx")
    frames = media.select("media_id", "modality", "payload", frame_idx)
    return (
        frames.filter(F.col("frame_idx") % every_k == 0)
        .select(
            "media_id",
            "modality",
            F.col("frame_idx").cast("bigint").alias("frame_idx"),
            F.substring(
                "payload", F.col("frame_idx") * frame_bytes + 1, F.lit(frame_bytes)
            ).alias("frame"),
        )
    )


def nibble_histogram(media: DataFrame) -> DataFrame:
    """Byte-content features without Python: 16-bin histogram over the
    hex-nibble distribution of each payload, computed entirely JVM-side
    (hex + length arithmetic stays inside whole-stage codegen)."""
    hexed = media.select(
        "media_id", "modality", "n_bytes", F.hex("payload").alias("hx")
    )
    bins = [
        (
            (
                F.length("hx")
                - F.length(F.replace(F.col("hx"), F.lit(format(i, "X")), F.lit("")))
            ).cast("bigint")
        ).alias(f"nib_{format(i, 'x')}")
        for i in range(16)
    ]
    return hexed.select("media_id", "modality", "n_bytes", *bins)


#: Output schema of resize_images / the resize mapInPandas stage.
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("out_w", T.LongType()),
        T.StructField("out_h", T.LongType()),
        T.StructField("pixels", T.BinaryType()),
    ]
)


def resize_images(
    media: DataFrame, out_w: int = 8, out_h: int = 8, fake: bool = False
) -> DataFrame:
    """Resize image payloads to ``out_w × out_h`` via ``mapInPandas`` —
    the normalize-before-embed step of a multimodal training pipeline.

    Real resizing needs PIL (not in this container); ``fake=True`` runs
    a deterministic stand-in with the SAME Spark plumbing: treat the
    payload as a row-major byte image of the fake-decoded (width,
    height) and nearest-neighbor-sample it onto the target grid — a
    pure function of the payload, byte-for-byte reproducible anywhere.

    Scale shape: non-image modalities are filtered JVM-side before any
    Python runs; output rows are fixed ``out_w*out_h`` bytes, so the
    stage's output size is #images × grid — independent of input
    payload sizes (the classic shrink-early move before a shuffle).
    """
    imgs = media.filter(F.col("modality") == "image")
    if not fake:
        def _real(_: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "real image resize requires PIL, which is not installed; "
                "use resize_images(media, fake=True)"
            )
        return imgs.mapInPandas(_real, schema=RESIZED_SCHEMA)

    def _fake(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        def nn_sample(b: bytes) -> bytes:
            if b is None:
                return None  # null payload -> null pixels (decode parity)
            w = (b[0] if len(b) > 0 else 0) + 1   # fake-decode dims
            h = (b[1] if len(b) > 1 else 0) + 1   # (decode_media parity)
            out = bytearray(out_w * out_h)
            for y in range(out_h):
                sy = y * h // out_h
                for x in range(out_w):
                    sx = x * w // out_w
                    idx = sy * w + sx
                    out[y * out_w + x] = b[idx] if idx < len(b) else 0
            return bytes(out)

        for pdf in batches:
            if not len(pdf):
                continue
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "pixels": pdf["payload"].map(nn_sample),
                }
            )

    return imgs.mapInPandas(_fake, schema=RESIZED_SCHEMA)


#: dHash layout: an 8-row × 9-column sampled grayscale grid yields
#: 8×8 = 64 row-wise difference bits, packed as 4 × 16-bit band ints
#: (the LSH band key width used by the mm7 near-dup join).
DHASH_GRID_W = 9
DHASH_GRID_H = 8
DHASH_BAND_BITS = 16
DHASH_BANDS = (DHASH_GRID_W - 1) * DHASH_GRID_H // DHASH_BAND_BITS

#: Deterministic payload transforms for the pHash evaluation protocol
#: (every perceptual-hash paper validates this way: inject a known
#: order-preserving transform — it MUST match its original — and a
#: destructive one — it must NOT). Each entry is
#: (n_expr, cell_tx) applied to the sampling-grid SQL: ``bright`` adds
#: a constant to every grayscale cell, clamped at 255 — order-preserving
#: (hence dHash-invariant) whenever no cell clamps, i.e. all cells
#: < 240; the ASCII corpus (max 126) never clamps, while two clamped
#: cells collapse to equal, exactly like real overexposure;
#: ``crop`` keeps the first half of the payload (content lands at
#: different grid fractions, so the grid decorrelates).
#: The third field is the variant's MINIMUM RAW payload bytes: the grid
#: samples positions up to n_eff - 1, so n_eff must be >= 2 AFTER the
#: length transform (substring position 0/negative is where Spark and
#: DuckDB semantics diverge). Stored explicitly — inferring it from the
#: n_expr string would silently mis-gate any future length transform.
DHASH_VARIANTS: dict[str, tuple[str, str, int]] = {
    "orig": ("n_bytes", "{x}", 2),
    "bright": ("n_bytes", "least({x} + 16, 255)", 2),
    "crop": ("(n_bytes div 2)", "{x}", 4),
}


def _dhash_cell_sql(variants: tuple[str, ...]) -> tuple[str, str]:
    """(n_eff, cell) SQL for the variant-dispatched sampling grid: the
    effective payload length and the transformed grayscale cell as ONE
    expression pair CASE-dispatched on the exploded ``variant`` column —
    so every variant's grid derives from a single payload read (one
    documents scan total, not one per variant)."""
    n_eff = (
        "CASE variant "
        + " ".join(
            f"WHEN '{v}' THEN ({DHASH_VARIANTS[v][0]})" for v in variants
        )
        + " END"
    )
    x = (
        f"ascii(cast(substring(payload, "
        f"cast((k * ({n_eff} - 1)) div {DHASH_GRID_W * DHASH_GRID_H - 1} as int)"
        f" + 1, 1) as string))"
    )
    cell = (
        "CASE variant "
        + " ".join(
            f"WHEN '{v}' THEN ({DHASH_VARIANTS[v][1].format(x=x)})"
            for v in variants
        )
        + " END"
    )
    return n_eff, cell


def dhash_min_bytes(variant: str) -> int:
    """Smallest RAW payload a variant can hash (crop halves the payload,
    so it needs 2 surviving bytes = 4 raw) — read from the variant's
    declared min_bytes field, never inferred from its SQL text."""
    return DHASH_VARIANTS[variant][2]


def dhash_images(media: DataFrame, variants: tuple[str, ...] = ("orig",)) -> DataFrame:
    """Perceptual difference-hash (dHash) per image payload, entirely
    JVM-side: sample a ``DHASH_GRID_H × DHASH_GRID_W`` byte grid at
    evenly-spaced payload offsets (the no-codec stand-in for
    grayscale-resize), then emit one bit per horizontally adjacent cell
    pair (right > left), packed into ``DHASH_BANDS`` 16-bit band
    integers ``h0..h3``. One output row per (image, variant) —
    ``variants`` selects which :data:`DHASH_VARIANTS` transforms run.

    With a real codec the grid would come from a decoded luma plane
    (swap the sampling expression for a decode ``mapInPandas`` stage);
    everything downstream — banding, bucketing, Hamming verify — is
    byte-source-agnostic. Too-short payloads (< 2 bytes effective; see
    :func:`dhash_min_bytes`) are filtered per variant.

    Scale shape: ONE scan, map-only, whole-stage codegen — the variant
    fan-out is a row-local explode of the variant name BEFORE the grid
    is computed, so all variants' grids derive from a single payload
    read (72 one-byte substrings + 64 integer compares per row per
    variant); output is 4 ints per row, so the downstream LSH shuffle
    carries ~28 B/image no matter how large the payloads are. Reference
    parity: payloads stay opaque bytes end-to-end
    (kinesis/kinesis.go:199,213).
    """
    cells = DHASH_GRID_W * DHASH_GRID_H
    _, cell = _dhash_cell_sql(variants)
    rows = media.select(
        "media_id",
        "n_bytes",
        "payload",
        F.explode(F.array(*[F.lit(v) for v in variants])).alias("variant"),
    ).filter(
        F.col("n_bytes")
        >= F.expr(
            "CASE variant "
            + " ".join(
                f"WHEN '{v}' THEN {dhash_min_bytes(v)}" for v in variants
            )
            + " END"
        )
    )
    grid = F.expr(f"transform(sequence(0, {cells - 1}), k -> {cell})")
    sig = rows.select("media_id", "variant", grid.alias("g"))
    bands = []
    for b in range(DHASH_BANDS):
        band = None
        for j in range(DHASH_BAND_BITS):
            i = b * DHASH_BAND_BITS + j          # bit index = row*8 + col
            r, c = divmod(i, DHASH_GRID_W - 1)
            cur = F.element_at(F.col("g"), r * DHASH_GRID_W + c + 1)
            nxt = F.element_at(F.col("g"), r * DHASH_GRID_W + c + 2)
            term = F.when(nxt > cur, F.lit(1 << j)).otherwise(F.lit(0))
            band = term if band is None else band + term
        bands.append(band.cast("int").alias(f"h{b}"))
    return sig.select("media_id", "variant", *bands)
