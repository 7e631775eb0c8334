"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine's model for image/audio/video at 100 TB: a ``binary`` column
(inline for small blobs, or a path pointer + ``spark.read.format
("binaryFile")`` for large ones) plus a metadata struct carried alongside.
Decode / resize / frame-sample run as Arrow-batched ``mapInPandas``
operators so each task streams batches without materializing a partition.

The actual media codecs are not present in this environment, so the decode
kernel is a clearly marked deterministic stub (`_fake_decode`); everything
Spark-side — schema, batching, partition flow, UDF signatures — is real
and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyconnect_spark.operators._util import t
from pyconnect_spark.query import QueryRegistry

REGISTRY = QueryRegistry()

# mm01_binary_columns merged into mm02_decode_pipeline (round 3): the
# decode pipeline now carries the binary payload AND the typed metadata
# struct through the Arrow batches, which is how a real media pipeline
# flows — blob + sidecar metadata in one row.
DECODED_SCHEMA = (
    "doc_id long, n_bytes long, media_lang string, meta_chars long, "
    "width long, height long, checksum long"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """STUB decode kernel. A real deployment plugs an image/audio codec in
    here (PIL/ffmpeg are not in this container). Deterministic fake:
    derives (width, height, checksum) from the bytes so tests are stable.

    Raises NotImplementedError for payloads that declare a real codec.
    """
    if payload[:4] in (b"\x89PNG", b"RIFF", b"\xff\xd8\xff\xe0"):
        raise NotImplementedError("real media decode requires codec libs not in this image")
    checksum = sum(payload[:64]) + len(payload)
    width = 16 + (checksum % 64)
    height = 16 + ((checksum // 64) % 64)
    return width, height, checksum


def decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: streams Arrow batches; never materializes a
    partition. Shape/signature is exactly what a real decoder would use —
    the metadata struct fields ride along untouched."""
    for pdf in it:
        decoded = [_fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [len(p) for p in pdf["payload"]],
                "media_lang": pdf["media_lang"].values,
                "meta_chars": pdf["meta_chars"].values,
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "checksum": [d[2] for d in decoded],
            }
        )


def decode_media(df: DataFrame) -> DataFrame:
    """df(doc_id, payload: binary, media_lang, meta_chars) → decoded
    metadata via mapInPandas."""
    return df.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


# Frame-sampling parameters: fixed-size char blocks stand in for video
# frames; every STRIDE-th frame is kept (uniform temporal sampling).
_FRAME_CHARS = 128
_FRAME_STRIDE = 4


def sample_frames(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: one input row (a 'video') fans out to its sampled
    frames. Streams Arrow batches; the fan-out happens inside the batch so
    a 2-hour video never materializes as one Python object per frame list.

    The decode step is a deterministic fake (md5 of the frame's byte slice
    — hashlib.md5 matches SQL md5 exactly, so the whole pipeline is
    oracle-checkable); a real deployment swaps in an ffmpeg keyframe read
    with the same (doc_id, frame_idx, fingerprint) output contract."""
    import hashlib

    for pdf in it:
        ids, idxs, totals, fps = [], [], [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            n_frames = max((len(text) + _FRAME_CHARS - 1) // _FRAME_CHARS, 1)
            for fi in range(0, n_frames, _FRAME_STRIDE):
                block = text[fi * _FRAME_CHARS : (fi + 1) * _FRAME_CHARS]
                ids.append(doc_id)
                idxs.append(fi)
                totals.append(n_frames)
                fps.append(hashlib.md5(block.encode("utf-8")).hexdigest())
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "n_frames": totals, "frame_md5": fps}
        )


@REGISTRY.register(
    "mm03_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             greatest(CAST(ceil(length(text) / {_FRAME_CHARS}.0) AS BIGINT), 1)
                 AS n_frames,
             text
      FROM documents
    )
    SELECT doc_id,
           CAST(unnest(range(0, n_frames, {_FRAME_STRIDE})) AS BIGINT) AS frame_idx,
           n_frames,
           md5(substr(text,
                      CAST(unnest(range(0, n_frames, {_FRAME_STRIDE})) AS INT)
                          * {_FRAME_CHARS} + 1,
                      {_FRAME_CHARS})) AS frame_md5
    FROM f
    """,
    doc="Video frame-sampling plumbing: each document row acts as a video "
    "whose fixed-size char blocks are frames; every 4th frame is decoded "
    "(deterministic md5 fake) through an Arrow-batched mapInPandas fan-out "
    "— the row-to-many-frames shape, schema, and batching a real ffmpeg "
    "sampler would use. Fully oracle-checked because the fake decode is "
    "md5, which DuckDB computes identically. At 100 TB the input column "
    "is a binaryFile pointer and frames inherit the scan's partitioning — "
    "no shuffle anywhere in the pipeline.",
    tags=("multimodal", "mapInPandas", "video"),
)
def mm03(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx long, n_frames long, frame_md5 string",
    )


@REGISTRY.register(
    "mm02_decode_pipeline",
    # The fake decode is checksum = sum(first 64 payload bytes) + byte length;
    # fixture text is pure ASCII (asserted below via octet_length==length),
    # so DuckDB replicates it char-wise with unicode(substr(...)).
    oracle=f"""
    WITH chk AS (
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             lang AS media_lang,
             CAST(n_chars AS BIGINT) AS meta_chars,
             CAST(octet_length(encode(text))
                  + list_aggregate(list_transform(
                        range(1, least(length(text), 64) + 1),
                        i -> unicode(substr(text, CAST(i AS INT), 1))), 'sum')
                  AS BIGINT) AS checksum
      FROM documents
    )
    SELECT doc_id, n_bytes, media_lang, meta_chars,
           CAST(16 + checksum % 64 AS BIGINT) AS width,
           CAST(16 + (checksum // 64) % 64 AS BIGINT) AS height,
           checksum
    FROM chk
    """,
    doc="mapInPandas decode pipeline over binary payloads (stubbed codec) "
    "with the typed metadata struct carried through the Arrow batches "
    "(round-3 merge of mm01_binary_columns into this pipeline): real "
    "batch flow, schema, and partitioning; byte lengths computed on the "
    "binary type. The deterministic stub kernel is replicated in SQL so "
    "the full pipeline is oracle-checked end to end.",
    tags=("multimodal", "binary", "mapInPandas"),
)
def mm02(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    meta = F.struct(F.col("lang").alias("lang"), F.col("n_chars").alias("chars"))
    staged = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"), meta.alias("meta")
    )
    return decode_media(
        staged.select(
            "doc_id",
            "payload",
            F.col("meta.lang").alias("media_lang"),
            F.col("meta.chars").cast("long").alias("meta_chars"),
        )
    )


@REGISTRY.register(
    "mm04_media_manifest",
    oracle=f"""
    SELECT source, lang AS media_lang,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
           CAST(COUNT(DISTINCT sha256(text)) AS BIGINT)
               AS n_distinct_payloads,
           CAST(SUM(greatest(CAST(ceil(length(text) / {_FRAME_CHARS}.0)
                                  AS BIGINT), 1)) AS BIGINT) AS n_frames_total
    FROM documents
    GROUP BY 1, 2
    """,
    doc="Media-manifest audit per (source, language): asset counts, total/"
    "max payload bytes, distinct-content payload count (content-hash "
    "dedup across the binary column), and total decodable frames (mm03's "
    "frame model) — the numbers that size a media shard layout "
    "(sources/layout.py) and catch duplicate-blob bloat before a "
    "training run ships redundant bytes. Byte stats and sha256 compute "
    "on the BINARY payload column (the real media path — here the "
    "deterministic text-encoded stand-in), all map-side: one "
    "combiner-shrunk aggregation on a (source, lang) key, fixed-width "
    "hashes in the distinct — at 100 TB this is manifest-tier metadata "
    "work riding the media scan.",
    tags=("multimodal", "binary", "audit", "manifest"),
)
def mm04(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    n_frames = F.greatest(
        F.ceil(F.length("text") / F.lit(float(_FRAME_CHARS))).cast("long"), F.lit(1)
    )
    staged = docs.select(
        "source",
        F.col("lang").alias("media_lang"),
        payload.alias("payload"),
        n_frames.alias("n_frames"),
    )
    return staged.groupBy("source", "media_lang").agg(
        F.count("*").cast("long").alias("n_assets"),
        F.sum(F.octet_length("payload")).cast("long").alias("total_bytes"),
        F.max(F.octet_length("payload")).cast("long").alias("max_bytes"),
        F.count_distinct(F.sha2("payload", 256)).cast("long").alias(
            "n_distinct_payloads"
        ),
        F.sum("n_frames").cast("long").alias("n_frames_total"),
    )


@REGISTRY.register(
    "mm05_pairing_audit",
    oracle="""
    WITH d AS (SELECT doc_id FROM documents),
    e AS (SELECT vec_id, len(embedding) AS dim FROM embeddings),
    paired AS (SELECT COUNT(*) AS n FROM d JOIN e ON e.vec_id = d.doc_id),
    d_un AS (SELECT COUNT(*) AS n FROM d
             WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.vec_id = d.doc_id)),
    e_un AS (SELECT COUNT(*) AS n FROM e
             WHERE NOT EXISTS (SELECT 1 FROM d WHERE d.doc_id = e.vec_id)),
    dims AS (SELECT COUNT(DISTINCT dim) AS n_dims,
                    CAST(MIN(dim) AS BIGINT) AS min_dim,
                    CAST(MAX(dim) AS BIGINT) AS max_dim FROM e)
    SELECT CAST((SELECT COUNT(*) FROM d) AS BIGINT) AS n_docs,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_vecs,
           CAST(paired.n AS BIGINT) AS n_paired,
           CAST(d_un.n AS BIGINT) AS docs_unpaired,
           CAST(e_un.n AS BIGINT) AS vecs_unpaired,
           CAST(dims.n_dims AS BIGINT) AS n_distinct_dims,
           dims.min_dim, dims.max_dim
    FROM paired, d_un, e_un, dims
    """,
    doc="Cross-modality pairing audit — the first gate of any paired "
    "(text, embedding) / (image, caption) training set: every example "
    "must have BOTH halves, and the vector side must be "
    "dimension-uniform, or batch collation breaks mid-epoch. Emits "
    "paired/orphan counts from the two anti-join directions plus the "
    "embedding-dimension span (n_distinct_dims > 1 = a mixed-encoder "
    "ingestion bug caught before the GPU does). Both sides reduce to "
    "their id columns before any join, so the audit shuffles 8-byte "
    "keys; the dim stats are one map-side-combinable aggregation over "
    "len(embedding) — no vector data moves. Run per ingestion batch at "
    "100 TB: cost tracks the id columns, not the payload bytes.",
    tags=("multimodal", "audit", "pairing", "llm"),
)
def mm05(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id")
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.size("embedding").alias("dim")
    )
    n_docs = d.agg(F.count("*").cast("long").alias("n_docs"))
    n_vecs = e.agg(F.count("*").cast("long").alias("n_vecs"))
    paired = d.join(e, d["doc_id"] == e["vec_id"]).agg(
        F.count("*").cast("long").alias("n_paired")
    )
    d_un = d.join(e, d["doc_id"] == e["vec_id"], "left_anti").agg(
        F.count("*").cast("long").alias("docs_unpaired")
    )
    e_un = e.join(d, e["vec_id"] == d["doc_id"], "left_anti").agg(
        F.count("*").cast("long").alias("vecs_unpaired")
    )
    dims = e.agg(
        F.count_distinct("dim").cast("long").alias("n_distinct_dims"),
        F.min("dim").cast("long").alias("min_dim"),
        F.max("dim").cast("long").alias("max_dim"),
    )
    return (
        n_docs.crossJoin(n_vecs)
        .crossJoin(paired)
        .crossJoin(d_un)
        .crossJoin(e_un)
        .crossJoin(dims)
    )


@REGISTRY.register(
    "mm06_frame_dedup",
    oracle=f"""
    WITH f AS (
      SELECT doc_id,
             greatest(CAST(ceil(length(text) / {_FRAME_CHARS}.0) AS BIGINT), 1)
                 AS n_frames,
             text
      FROM documents
    ),
    frames AS (
      SELECT doc_id,
             md5(substr(text,
                        CAST(unnest(range(0, n_frames, {_FRAME_STRIDE})) AS INT)
                            * {_FRAME_CHARS} + 1,
                        {_FRAME_CHARS})) AS frame_md5
      FROM f
    ),
    freq AS (
      SELECT frame_md5, COUNT(DISTINCT doc_id) AS df FROM frames GROUP BY 1
    )
    SELECT fr.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(CASE WHEN q.df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           round(SUM(CASE WHEN q.df >= 2 THEN 1.0 ELSE 0 END) / COUNT(*), 6)
               AS shared_frame_frac
    FROM frames fr JOIN freq q USING (frame_md5)
    GROUP BY 1
    """,
    doc="Cross-asset frame-level dedup — tx16's chunk detector applied to "
    "MEDIA: frames sampled by mm03's Arrow-batched decoder key on their "
    "content fingerprint, and every asset is scored by the fraction of "
    "its frames appearing in at least one OTHER asset — the re-upload / "
    "shared-intro / watermark-template detector video corpora need "
    "(whole-file hashes miss re-encodes that share most frames). The "
    "decode kernel is mm03's deterministic stub, so the ENTIRE media "
    "pipeline — fan-out, fingerprinting, cross-asset frequency, "
    "per-asset scoring — is oracle-checked; a real deployment swaps the "
    "kernel (ffmpeg keyframes, perceptual pHash instead of md5) and "
    "keeps the same frequency/scoring plan. The exchange carries "
    "16-byte fingerprints, never frames.",
    tags=("multimodal", "dedup", "frames", "llm"),
)
def mm06(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    frames = docs.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx long, n_frames long, frame_md5 string",
    ).select("doc_id", "frame_md5")
    freq = frames.groupBy("frame_md5").agg(
        F.count_distinct("doc_id").alias("df")
    )
    shared = F.when(F.col("df") >= 2, 1).otherwise(0)
    return (
        frames.join(freq, "frame_md5")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_sampled"),
            F.sum(shared).cast("long").alias("n_shared"),
            F.round(F.sum(shared.cast("double")) / F.count("*"), 6).alias(
                "shared_frame_frac"
            ),
        )
    )


_PHASH_BITS = 60
_PHASH_BANDS = 4
_PHASH_BAND_WIDTH = 15  # 4 x 15 = 60
_PHASH_MAX_HAMMING = 3  # pigeonhole: <=3 differing bits must leave >=1 band exact

_MM07_ORACLE = f"""
    WITH f AS (
      SELECT doc_id,
             greatest(CAST(ceil(length(text) / {_FRAME_CHARS}.0) AS BIGINT), 1)
                 AS n_frames,
             text
      FROM documents
    ),
    frames AS (
      SELECT doc_id,
             md5(substr(text,
                        CAST(unnest(range(0, n_frames, {_FRAME_STRIDE})) AS INT)
                            * {_FRAME_CHARS} + 1,
                        {_FRAME_CHARS})) AS fmd5
      FROM f
    ),
    h AS (
      SELECT doc_id, CAST(('0x' || substr(fmd5, 1, 15)) AS BIGINT) AS h
      FROM frames
    ),
    v AS (
      SELECT doc_id,
             {", ".join(f"SUM(((h >> {i}) & 1) * 2 - 1) AS v{i}" for i in range(_PHASH_BITS))}
      FROM h GROUP BY doc_id
    ),
    ph AS (
      SELECT doc_id,
             CAST({" + ".join(f"(CASE WHEN v{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(_PHASH_BITS))}
                 AS BIGINT) AS phash
      FROM v
    ),
    bands AS (
      SELECT doc_id, phash, b.band,
             (phash >> ({_PHASH_BAND_WIDTH} * b.band))
                 & {(1 << _PHASH_BAND_WIDTH) - 1} AS bv
      FROM ph, LATERAL (SELECT unnest(range(0, {_PHASH_BANDS})) AS band) b
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
             bit_count(xor(l.phash, r.phash)) AS hamming
      FROM bands l
      JOIN bands r ON l.band = r.band AND l.bv = r.bv AND l.doc_id < r.doc_id
    )
    SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
    FROM cand WHERE hamming <= {_PHASH_MAX_HAMMING}
"""


@REGISTRY.register(
    "mm07_phash_neardup",
    oracle=_MM07_ORACLE,
    doc="Asset-level perceptual-hash near-dup pairs — the re-encode "
    "detector mm06's frame scoring feeds in a real media pipeline. Each "
    "asset gets a 60-bit pHash by MAJORITY VOTE across its sampled "
    "frames' fingerprint bits (assets sharing most frames agree on most "
    "majority bits, so frame-overlapping re-uploads land at small "
    "Hamming distance — the perceptual property, reproduced exactly by "
    "the md5 stub kernel and therefore oracle-checkable). Candidate "
    "pairs come from multi-index Hamming search (Norouzi et al. 2012): "
    "4 bands x 15 bits, a pair within Hamming<=3 must match >=1 band "
    "exactly (pigeonhole), so the join touches band buckets, NEVER "
    "all asset pairs; bit_count(xor) verifies candidates exactly. The "
    "exchange carries (band, 15-bit key, 8-byte phash) — frames and "
    "payloads never shuffle. A real deployment swaps the frame kernel "
    "for DCT pHash and keeps the identical vote/band/verify plan.",
    tags=("multimodal", "dedup", "phash", "lsh", "hamming"),
)
def mm07(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NO spread() here, deliberately: it would repartition (doc_id, text)
    # — i.e. ship the payload through an exchange — breaking the mm-family
    # "payload bytes never shuffle" invariant that
    # test_mm07_exchanges_carry_hashes_not_payloads pins. The Python
    # sampling stage stays scan-partitioned; every exchange below it
    # carries only 8-byte hashes.
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    frames = docs.mapInPandas(
        sample_frames,
        schema="doc_id long, frame_idx long, n_frames long, frame_md5 string",
    )
    h = frames.select(
        "doc_id",
        F.conv(F.substring("frame_md5", 1, 15), 16, 10).cast("long").alias("h"),
    )
    votes = [
        F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) * 2 - 1).alias(
            f"v{i}"
        )
        for i in range(_PHASH_BITS)
    ]
    agg = h.groupBy("doc_id").agg(*votes)
    bits = [
        F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        * F.lit(1 << i).cast("long")
        for i in range(_PHASH_BITS)
    ]
    total = bits[0]
    for piece in bits[1:]:
        total = total + piece
    ph = agg.select("doc_id", total.alias("phash"))
    bands = ph.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("phash", _PHASH_BAND_WIDTH * b)
                        .bitwiseAND(F.lit((1 << _PHASH_BAND_WIDTH) - 1))
                        .alias("bv"),
                    )
                    for b in range(_PHASH_BANDS)
                ]
            )
        ).alias("s"),
    ).select("doc_id", "phash", "s.band", "s.bv")
    left, right = bands.alias("l"), bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.bit_count(F.col("l.phash").bitwiseXOR(F.col("r.phash")))
            .cast("long")
            .alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= _PHASH_MAX_HAMMING)
    )


# Standard aspect buckets (SDXL-style bucketing): name, w:h ratio.
_ASPECT_BUCKETS = [
    ("1:1", 1.0),
    ("4:3", 4.0 / 3.0),
    ("3:4", 3.0 / 4.0),
    ("16:9", 16.0 / 9.0),
    ("9:16", 9.0 / 16.0),
]

_MM08_ORACLE = f"""
    WITH chk AS (
      SELECT doc_id,
             CAST(octet_length(encode(text))
                  + list_aggregate(list_transform(
                        range(1, least(length(text), 64) + 1),
                        i -> unicode(substr(text, CAST(i AS INT), 1))), 'sum')
                  AS BIGINT) AS checksum
      FROM documents
    ),
    dims AS (
      SELECT doc_id,
             CAST(16 + checksum % 64 AS BIGINT) AS w,
             CAST(16 + (checksum // 64) % 64 AS BIGINT) AS h
      FROM chk
    ),
    scored AS (
      SELECT doc_id, w, h, b.name, b.ratio,
             abs(ln(CAST(w AS DOUBLE) / h) - ln(b.ratio)) AS dist,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY
                 abs(ln(CAST(w AS DOUBLE) / h) - ln(b.ratio)), b.ord) AS rn
      FROM dims, LATERAL (
        SELECT * FROM (VALUES
          {", ".join(f"('{n}', CAST({r!r} AS DOUBLE), {i})" for i, (n, r) in enumerate(_ASPECT_BUCKETS))}
        ) v(name, ratio, ord)
      ) b
    )
    SELECT name AS aspect_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           round(AVG(w), 6) AS avg_width,
           round(AVG(h), 6) AS avg_height,
           CAST(SUM(w * h) AS BIGINT) AS total_pixels,
           round(COUNT(*) * 1.0 / (SELECT COUNT(*) FROM dims), 6) AS share
    FROM scored WHERE rn = 1
    GROUP BY 1
"""


@REGISTRY.register(
    "mm08_aspect_buckets",
    oracle=_MM08_ORACLE,
    doc="Aspect-ratio bucket audit — the batch-shape planning step of "
    "resolution-bucketed diffusion training (SDXL-style): every decoded "
    "asset is assigned to the nearest standard aspect bucket by "
    "|log(w/h) - log(bucket)| (log space so 4:3 and 3:4 are "
    "symmetric; deterministic bucket-order tie-break), and the audit "
    "reports per-bucket counts, mean dims, pixel mass, and share — "
    "exactly what decides per-bucket batch sizes and padding waste. "
    "Dims come from mm02's Arrow-batched decode stub (checksum-derived, "
    "replicated in SQL, so the full decode -> bucket -> audit pipeline "
    "hash-checks). The bucket table is a 5-row broadcast; the exchange "
    "carries one (bucket) key per asset — payloads never shuffle. A "
    "real deployment swaps the stub for the image header read and keeps "
    "the identical bucketing plan.",
    tags=("multimodal", "buckets", "aspect", "diffusion", "audit"),
)
def mm08(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("lang").alias("media_lang"),
        F.col("n_chars").cast("long").alias("meta_chars"),
    )
    dims = decode_media(staged).select(
        "doc_id",
        F.col("width").alias("w"),
        F.col("height").alias("h"),
    )
    buckets = F.array(
        *[
            F.struct(
                F.lit(n).alias("name"),
                F.lit(r).alias("ratio"),
                F.lit(i).alias("ord"),
            )
            for i, (n, r) in enumerate(_ASPECT_BUCKETS)
        ]
    )
    scored = dims.select(
        "doc_id", "w", "h", F.explode(buckets).alias("b")
    ).select(
        "doc_id",
        "w",
        "h",
        F.col("b.name").alias("name"),
        F.col("b.ord").alias("ord"),
        F.abs(
            F.log(F.col("w").cast("double") / F.col("h"))
            - F.log(F.col("b.ratio"))
        ).alias("dist"),
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("dist", "ord")
    )
    best = scored.withColumn("rn", rn).filter(F.col("rn") == 1)
    agg = best.groupBy(F.col("name").alias("aspect_bucket")).agg(
        F.count("*").cast("long").alias("n_assets"),
        F.round(F.avg("w"), 6).alias("avg_width"),
        F.round(F.avg("h"), 6).alias("avg_height"),
        F.sum(F.col("w") * F.col("h")).cast("long").alias("total_pixels"),
    )
    # share from the |buckets|-row aggregate itself — a total-count side
    # pass would re-run the decode; the grand total is a broadcast scalar,
    # not a SUM() OVER () window. The lazy localCheckpoint pins the 5-row
    # aggregate so BOTH branches read one materialization — without it,
    # column pruning shrinks the total branch's partial agg (count only vs
    # count+avg+sum), the exchanges stop canonically matching, AQE can't
    # reuse the stage, and the decode pass runs twice.
    agg = agg.localCheckpoint(eager=False)
    tot = agg.agg(F.sum("n_assets").alias("_tot"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "aspect_bucket",
        "n_assets",
        "avg_width",
        "avg_height",
        "total_pixels",
        F.round(F.col("n_assets") / F.col("_tot"), 6).alias("share"),
    )


_SHARD_BYTES = 512


@REGISTRY.register(
    "mm09_shard_packing",
    oracle=f"""
    WITH sz AS (
      SELECT doc_id, source,
             CAST(octet_length(encode(text)) AS BIGINT) AS n
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(n) AS BIGINT) AS total_bytes,
           greatest(list_reduce(
             list_transform(list(n ORDER BY doc_id),
                            x -> struct_pack(s := CAST(1 AS BIGINT),
                                             f := CAST(x AS BIGINT))),
             (a, x) -> CASE WHEN a.f + x.f <= {_SHARD_BYTES}
                            THEN struct_pack(s := a.s, f := a.f + x.f)
                            ELSE struct_pack(
                                s := a.s + CAST(1 AS BIGINT),
                                f := x.f) END).s,
                    CAST(1 AS BIGINT)) AS n_shards,
           CAST(SUM(CASE WHEN n > {_SHARD_BYTES} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_oversize,
           round(SUM(n) * 1.0 /
                 (greatest(list_reduce(
                    list_transform(list(n ORDER BY doc_id),
                                   x -> struct_pack(
                                       s := CAST(1 AS BIGINT),
                                       f := CAST(x AS BIGINT))),
                    (a, x) -> CASE WHEN a.f + x.f <= {_SHARD_BYTES}
                                   THEN struct_pack(s := a.s,
                                                    f := a.f + x.f)
                                   ELSE struct_pack(
                                       s := a.s + CAST(1 AS BIGINT),
                                       f := x.f) END).s,
                           CAST(1 AS BIGINT))
                  * {_SHARD_BYTES}), 6) AS fill_frac
    FROM sz GROUP BY source
    """,
    doc="WebDataset-style shard-packing manifest per source: assets pack "
    "next-fit in doc_id order into fixed-byte shards (target "
    f"{_SHARD_BYTES} B at fixture scale; hundreds of MB in "
    "production), reporting shard count, oversize assets (bigger than "
    "a whole shard — they ship alone, the tar-per-asset degenerate "
    "case), and achieved fill fraction — the layout study behind "
    "sources/layout.py's write_training_shards, answering 'how many "
    "output files and how much slack' BEFORE the expensive write. "
    "Same per-group sequential-fold shape as tx34 (packing is "
    "order-dependent by construction): byte sizes collect per source "
    "in doc_id order and fold in ONE JVM aggregate — the payload "
    "bytes themselves never move, only their sizes do, so at 100 TB "
    "the fold input is |assets| longs per source and sources fold in "
    "parallel; a source with pathologically many assets splits into "
    "md5 sub-streams exactly like tx34's 16-shard scheme. The oracle "
    "replays the identical left fold via DuckDB list_reduce.",
    tags=("multimodal", "layout", "packing", "shards", "webdataset"),
)
def mm09(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    sz = docs.select(
        "doc_id",
        "source",
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("long")
        .alias("n"),
    )
    per_src = sz.groupBy("source").agg(
        F.count("*").cast("long").alias("n_assets"),
        F.sum("n").cast("long").alias("total_bytes"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("doc_id", "n"))),
            lambda s: s["n"],
        ).alias("sizes"),
        F.sum((F.col("n") > _SHARD_BYTES).cast("int"))
        .cast("long")
        .alias("n_oversize"),
    )
    st = F.aggregate(
        F.col("sizes"),
        F.struct(
            F.lit(0).cast("long").alias("s"),
            F.lit(_SHARD_BYTES).cast("long").alias("f"),
        ),
        lambda a, n: F.when(
            a["f"] + n <= _SHARD_BYTES,
            F.struct(a["s"].alias("s"), (a["f"] + n).alias("f")),
        ).otherwise(F.struct((a["s"] + 1).alias("s"), n.alias("f"))),
    )
    # greatest(s, 1): the Spark fold seeds (s=0, f=SHARD) so a source
    # whose assets are ALL zero-byte would report 0 shards, while the
    # oracle's list_reduce seeds from the first element (s=1). One shard
    # is the right answer for a non-empty source; guard both engines.
    n_shards = F.greatest(st["s"], F.lit(1).cast("long"))
    return per_src.select(
        "source",
        "n_assets",
        "total_bytes",
        n_shards.alias("n_shards"),
        "n_oversize",
        F.round(
            F.col("total_bytes") * 1.0 / (n_shards * _SHARD_BYTES), 6
        ).alias("fill_frac"),
    )


_MM10_K = 40

_MM10_ORACLE = f"""
    WITH chk AS (
      SELECT doc_id,
             CAST(octet_length(encode(text))
                  + list_aggregate(list_transform(
                        range(1, least(length(text), 64) + 1),
                        i -> unicode(substr(text, CAST(i AS INT), 1))), 'sum')
                  AS BIGINT) AS checksum
      FROM documents
    ),
    dims AS (
      SELECT doc_id,
             CAST(16 + checksum % 64 AS BIGINT) AS w,
             CAST(16 + (checksum // 64) % 64 AS BIGINT) AS h
      FROM chk
    ),
    assigned AS (
      SELECT doc_id, b.name,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY
                 abs(ln(CAST(w AS DOUBLE) / h) - ln(b.ratio)), b.ord) AS rn
      FROM dims, LATERAL (
        SELECT * FROM (VALUES
          {", ".join(f"('{n}', CAST({r!r} AS DOUBLE), {i})" for i, (n, r) in enumerate(_ASPECT_BUCKETS))}
        ) v(name, ratio, ord)
      ) b
    ),
    best AS (SELECT doc_id, name FROM assigned WHERE rn = 1),
    ranked AS (
      SELECT doc_id, name,
             row_number() OVER (
               PARTITION BY name
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qr
      FROM best
    )
    SELECT name AS aspect_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN qr <= {_MM10_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           md5(string_agg(CASE WHEN qr <= {_MM10_K}
                               THEN CAST(doc_id AS VARCHAR) END,
                          ',' ORDER BY doc_id)) AS kept_digest
    FROM ranked
    GROUP BY 1
    ORDER BY 1
"""


@REGISTRY.register(
    "mm10_aspect_quota_sample",
    oracle=_MM10_ORACLE,
    doc="Per-aspect-bucket quota sampling — the bucket-balancing step of "
    "resolution-bucketed diffusion training (a dominant 1:1 bucket "
    "starves wide/tall batch shapes; capping it is the mm08 audit's "
    "actionable follow-up, and exactly dd26's md5-rank hard cap "
    "applied per aspect bucket instead of per source): every decoded "
    "asset lands in its mm08 bucket, each bucket keeps at most "
    f"{_MM10_K} assets by md5(doc_id) rank (deterministic, "
    "oracle-replayable 'random'), and the kept set is PINNED by an "
    "md5 digest of the sorted kept ids (the dd29 idiom) so the sweep "
    "hash-checks membership, not just counts. Plan: decode stub -> "
    "5-row bucket broadcast -> per-asset argmin window (doc-keyed) -> "
    "per-bucket rank window (bucket == shuffle key, 5 partitions of "
    "(bucket, doc_id) pairs — payloads never shuffle) -> 5-row agg. "
    "A real deployment swaps the decode stub; every downstream step "
    "is unchanged at 100 TB.",
    tags=("multimodal", "buckets", "sampling", "quota", "diffusion"),
)
def mm10(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("lang").alias("media_lang"),
        F.col("n_chars").cast("long").alias("meta_chars"),
    )
    dims = decode_media(staged).select(
        "doc_id",
        F.col("width").alias("w"),
        F.col("height").alias("h"),
    )
    buckets = F.array(
        *[
            F.struct(
                F.lit(n).alias("name"),
                F.lit(r).alias("ratio"),
                F.lit(i).alias("ord"),
            )
            for i, (n, r) in enumerate(_ASPECT_BUCKETS)
        ]
    )
    scored = dims.select("doc_id", "w", "h", F.explode(buckets).alias("b")).select(
        "doc_id",
        F.col("b.name").alias("name"),
        F.col("b.ord").alias("ord"),
        F.abs(
            F.log(F.col("w").cast("double") / F.col("h"))
            - F.log(F.col("b.ratio"))
        ).alias("dist"),
    )
    rn = F.row_number().over(Window.partitionBy("doc_id").orderBy("dist", "ord"))
    best = scored.withColumn("rn", rn).filter(F.col("rn") == 1)
    qr = F.row_number().over(
        Window.partitionBy("name").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    ranked = best.select("doc_id", "name").withColumn("qr", qr)
    kept_ids = F.sort_array(
        F.collect_list(
            F.when(F.col("qr") <= _MM10_K, F.col("doc_id"))
        )
    )
    return (
        ranked.groupBy(F.col("name").alias("aspect_bucket"))
        .agg(
            F.count("*").cast("long").alias("n_before"),
            F.sum(F.when(F.col("qr") <= _MM10_K, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(kept_ids, lambda x: x.cast("string")),
                )
            ).alias("kept_digest"),
        )
        .orderBy("aspect_bucket")
    )


_MM11_T = 224  # letterbox target edge (ViT/CLIP-era default)


@REGISTRY.register(
    "mm11_resize_plan",
    oracle=f"""
    WITH chk AS (
      SELECT doc_id, source,
             CAST(octet_length(encode(text))
                  + list_aggregate(list_transform(
                        range(1, least(length(text), 64) + 1),
                        i -> unicode(substr(text, CAST(i AS INT), 1))), 'sum')
                  AS BIGINT) AS checksum
      FROM documents
    ),
    dims AS (
      SELECT doc_id, source,
             CAST(16 + checksum % 64 AS BIGINT) AS w,
             CAST(16 + (checksum // 64) % 64 AS BIGINT) AS h
      FROM chk
    ),
    plan AS (
      SELECT source,
             greatest(w, h) AS mx,
             (w * {_MM11_T}) // greatest(w, h) AS out_w,
             (h * {_MM11_T}) // greatest(w, h) AS out_h,
             CASE WHEN greatest(w, h) < {_MM11_T} THEN 1 ELSE 0 END AS up
      FROM dims
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(up) AS BIGINT) AS n_upscaled,
           round(SUM(up) * 1.0 / COUNT(*), 6) AS upscaled_share,
           round(CAST(SUM(CAST(round({_MM11_T}.0 / mx, 9)
                               AS DECIMAL(20,9))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_scale,
           CAST(SUM({_MM11_T} * {_MM11_T} - out_w * out_h) AS BIGINT)
               AS total_pad_px,
           round(CAST(SUM(CAST(round(out_w * out_h / {_MM11_T * _MM11_T}.0, 9)
                               AS DECIMAL(20,9))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_keep_frac
    FROM plan GROUP BY 1 ORDER BY 1
    """,
    doc="Aspect-preserving letterbox resize plan per source (target "
    f"{_MM11_T}x{_MM11_T}, the ViT/CLIP preprocessing default) — the "
    "cost-and-quality study a multimodal pipeline runs BEFORE the "
    "expensive resize job: per source, how many assets must UPSCALE "
    "(interpolation artifacts — the quality flag), the mean scale "
    "factor, total padded pixels the letterbox wastes, and the mean "
    "kept-pixel fraction of each target square. Output dims are exact "
    "integer arithmetic ((edge * T) DIV max-edge — no FP in the plan "
    "decisions); the two FP means cross the repo's round-9/DECIMAL-sum "
    "barrier so they are order-free under any repartitioning. Plan: "
    "decode stub (mapInPandas, mm02's Arrow batch shape — a real "
    "deployment plugs PIL/ffmpeg into _fake_decode and every "
    "downstream step is unchanged) -> map-only per-asset arithmetic -> "
    "one per-source combiner agg; payload bytes never shuffle, and at "
    "100 TB the actual resize runs as the same mapInPandas over the "
    "binary column with THIS table as its pre-flight budget.",
    tags=("multimodal", "resize", "letterbox", "preprocessing", "plan"),
)
def mm11(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("lang").alias("media_lang"),
        F.col("n_chars").cast("long").alias("meta_chars"),
    )
    dims = decode_media(staged).select("doc_id", "width", "height")
    src = docs.select("doc_id", "source")
    T = _MM11_T
    mx = F.greatest("width", "height")
    plan = (
        dims.join(src, "doc_id")
        .select(
            "source",
            mx.alias("mx"),
            F.expr(f"CAST(width * {T} DIV greatest(width, height) AS BIGINT)").alias("out_w"),
            F.expr(f"CAST(height * {T} DIV greatest(width, height) AS BIGINT)").alias("out_h"),
            F.when(mx < T, 1).otherwise(0).alias("up"),
        )
    )
    dec = "decimal(20,9)"
    return (
        plan.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_assets"),
            F.sum("up").cast("long").alias("n_upscaled"),
            F.round(F.sum("up") * 1.0 / F.count("*"), 6).alias("upscaled_share"),
            F.round(
                F.sum(F.round(F.lit(float(T)) / F.col("mx"), 9).cast(dec))
                .cast("double")
                / F.count("*"),
                6,
            ).alias("mean_scale"),
            F.sum(T * T - F.col("out_w") * F.col("out_h"))
            .cast("long")
            .alias("total_pad_px"),
            F.round(
                F.sum(
                    F.round(
                        F.col("out_w") * F.col("out_h") / F.lit(float(T * T)), 9
                    ).cast(dec)
                )
                .cast("double")
                / F.count("*"),
                6,
            ).alias("mean_keep_frac"),
        )
        .orderBy("source")
    )


_MM12_INLINE_CAP = 4096  # bytes: payloads beyond this route to binaryFile pointers
_MM12_TINY_FLOOR = 64    # bytes: below this, payloads are suspect (truncated/empty)


@REGISTRY.register(
    "mm12_payload_routing_plan",
    oracle=f"""
    WITH p AS (
      SELECT source,
             CAST(octet_length(encode(text)) AS BIGINT) AS nb,
             doc_id
      FROM documents
    ),
    ranked AS (
      SELECT source, nb,
             row_number() OVER (PARTITION BY source ORDER BY nb, doc_id)
                 AS rn,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM p
    ),
    pct AS (
      SELECT source, MAX(n) AS n,
             MAX(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT)
                      THEN nb END) AS p50,
             MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                      THEN nb END) AS p95,
             MAX(nb) AS mx
      FROM ranked GROUP BY source
    ),
    agg AS (
      SELECT source,
             CAST(SUM(CASE WHEN nb < {_MM12_TINY_FLOOR} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_tiny,
             CAST(SUM(CASE WHEN nb > {_MM12_INLINE_CAP} THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pointer,
             CAST(SUM(CASE WHEN nb > {_MM12_INLINE_CAP}
                           THEN nb ELSE 0 END) AS BIGINT) AS pointer_bytes,
             CAST(SUM(nb) AS BIGINT) AS total_bytes
      FROM p GROUP BY source
    )
    SELECT p.source, CAST(p.n AS BIGINT) AS n_assets,
           p.p50 AS p50_bytes, p.p95 AS p95_bytes, p.mx AS max_bytes,
           a.n_tiny, a.n_pointer,
           CAST(p.n - a.n_pointer AS BIGINT) AS n_inline,
           round(a.pointer_bytes * 1.0 / a.total_bytes, 6)
               AS pointer_byte_frac
    FROM pct p JOIN agg a USING (source)
    ORDER BY p.source
    """,
    doc="Inline-vs-pointer payload routing plan per source: exact "
    "nearest-rank p50/p95/max payload bytes, the tiny-payload count "
    "(< 64 B — truncated/empty blobs a decode stage should quarantine) "
    "and the routing split at the 4 KiB inline cap — rows above it "
    "carry a PATH + spark.read.format('binaryFile') pointer instead of "
    "inline bytes (the docs/SCALE.md multimodal layout rule: inline "
    "blobs ride the row and shuffle with it; pointer blobs never "
    "shuffle at all). pointer_byte_frac = share of total bytes that "
    "leaves the table under the plan — the actual shuffle-savings "
    "number. All quantities are exact integers until the one division; "
    "percentiles are value-at-ceil(q*n) under the total order (bytes, "
    "doc_id). Plan: one metadata scan (octet_length, no decode), a "
    "source-partitioned rank window, |sources| output rows.",
    tags=("multimodal", "layout", "routing", "ops"),
)
def mm12(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    p = docs.select(
        "source",
        F.octet_length(F.encode(F.col("text"), "UTF-8"))
        .cast("long")
        .alias("nb"),
        "doc_id",
    )
    w = Window.partitionBy("source").orderBy("nb", "doc_id")
    wc = Window.partitionBy("source")
    ranked = p.select(
        "source",
        "nb",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    pct = ranked.groupBy("source").agg(
        F.max("n").cast("long").alias("n_assets"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.5 * F.col("n")).cast("long"),
                F.col("nb"),
            )
        ).alias("p50_bytes"),
        F.max(
            F.when(
                F.col("rn") == F.ceil(0.95 * F.col("n")).cast("long"),
                F.col("nb"),
            )
        ).alias("p95_bytes"),
        F.max("nb").alias("max_bytes"),
    )
    agg = p.groupBy("source").agg(
        F.sum((F.col("nb") < _MM12_TINY_FLOOR).cast("int"))
        .cast("long")
        .alias("n_tiny"),
        F.sum((F.col("nb") > _MM12_INLINE_CAP).cast("int"))
        .cast("long")
        .alias("n_pointer"),
        F.sum(
            F.when(F.col("nb") > _MM12_INLINE_CAP, F.col("nb")).otherwise(0)
        )
        .cast("long")
        .alias("pointer_bytes"),
        F.sum("nb").cast("long").alias("total_bytes"),
    )
    return (
        pct.join(agg, "source")
        .select(
            "source",
            "n_assets",
            "p50_bytes",
            "p95_bytes",
            "max_bytes",
            "n_tiny",
            "n_pointer",
            (F.col("n_assets") - F.col("n_pointer")).cast("long").alias("n_inline"),
            F.round(
                F.col("pointer_bytes") * 1.0 / F.col("total_bytes"), 6
            ).alias("pointer_byte_frac"),
        )
        .orderBy("source")
    )


# mm13 audio framing constants: 25 ms frames / 10 ms hop (the standard
# STFT front-end), rates chosen so both are integer sample counts.
_MM13_RATES = (8000, 16000, 32000)  # checksum % 3 picks one
_MM13_BATCH_FRAMES = 3000           # frames per training batch window


@REGISTRY.register(
    "mm13_audio_frame_plan",
    oracle=f"""
    WITH chk AS (
      SELECT doc_id, source,
             CAST(octet_length(encode(text))
                  + list_aggregate(list_transform(
                        range(1, least(length(text), 64) + 1),
                        i -> unicode(substr(text, CAST(i AS INT), 1))),
                        'sum') AS BIGINT) AS checksum
      FROM documents
    ),
    meta AS (
      SELECT source,
             CASE checksum % 3 WHEN 0 THEN {_MM13_RATES[0]}
                  WHEN 1 THEN {_MM13_RATES[1]}
                  ELSE {_MM13_RATES[2]} END AS rate,
             500 + checksum % 60000 AS dur_ms
      FROM chk
    ),
    frames AS (
      SELECT source, rate, dur_ms,
             dur_ms * rate // 1000 AS n_samples,
             rate * 25 // 1000 AS frame,
             rate * 10 // 1000 AS hop
      FROM meta
    ),
    plan AS (
      SELECT source, dur_ms, n_samples,
             CASE WHEN n_samples >= frame
                  THEN (n_samples - frame) // hop + 1 ELSE 0 END AS n_frames,
             CASE WHEN n_samples >= frame
                  THEN n_samples - (((n_samples - frame) // hop) * hop
                                    + frame)
                  ELSE n_samples END AS tail_samples
      FROM frames
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(n_frames) AS BIGINT) AS total_frames,
           round(CAST(SUM(dur_ms) AS DOUBLE) / COUNT(*) / 1000, 6)
               AS mean_duration_s,
           round(CAST(SUM(tail_samples) AS DOUBLE) / SUM(n_samples), 6)
               AS tail_drop_share,
           CAST((SUM(n_frames) + {_MM13_BATCH_FRAMES} - 1)
                // {_MM13_BATCH_FRAMES} AS BIGINT) AS n_batches
    FROM plan GROUP BY 1 ORDER BY 1
    """,
    doc="Audio STFT framing plan per source (25 ms window / 10 ms hop — "
    "the universal speech front-end; mm11 is the image twin): each "
    "payload's decode-stub checksum deterministically fakes a sample "
    "rate (8/16/32 kHz — rates chosen so frame and hop are EXACT "
    "integer sample counts) and duration, then the plan reports total "
    "frames, the tail-sample share the frame grid drops (the "
    "pad-vs-drop budget decision), and the training-batch count at "
    f"{_MM13_BATCH_FRAMES} frames/batch. Every plan decision is "
    "integer arithmetic (// throughout — no FP in frame counts); the "
    "two FP shares cross the usual DECIMAL/9-dp barrier. Plan: decode "
    "stub (mapInPandas Arrow batches, mm02's kernel — a real "
    "deployment plugs libsndfile/ffprobe into _fake_decode and the "
    "framing arithmetic is unchanged) -> map-only per-asset plan -> "
    "one |sources|-row combiner agg; payload bytes never shuffle. At "
    "100 TB the actual STFT runs as mapInPandas over the binary "
    "column with THIS table as its shuffle-free budget.",
    tags=("multimodal", "audio", "stft", "framing", "plan"),
)
def mm13(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("lang").alias("media_lang"),
        F.col("n_chars").cast("long").alias("meta_chars"),
    )
    meta = decode_media(staged).select("doc_id", "checksum")
    src = docs.select("doc_id", "source")
    r0, r1, r2 = _MM13_RATES
    rate = (
        F.when(F.col("checksum") % 3 == 0, r0)
        .when(F.col("checksum") % 3 == 1, r1)
        .otherwise(r2)
    )
    frames = (
        meta.join(src, "doc_id")
        .select(
            "source",
            rate.alias("rate"),
            (500 + F.col("checksum") % 60000).alias("dur_ms"),
        )
        .select(
            "source",
            "dur_ms",
            F.expr("CAST(dur_ms * rate DIV 1000 AS BIGINT)").alias(
                "n_samples"
            ),
            F.expr("CAST(rate * 25 DIV 1000 AS BIGINT)").alias("frame"),
            F.expr("CAST(rate * 10 DIV 1000 AS BIGINT)").alias("hop"),
        )
    )
    nf = F.expr("CAST((n_samples - frame) DIV hop + 1 AS BIGINT)")
    plan = frames.select(
        "source",
        "dur_ms",
        "n_samples",
        F.when(F.col("n_samples") >= F.col("frame"), nf)
        .otherwise(F.lit(0))
        .alias("n_frames"),
        F.when(
            F.col("n_samples") >= F.col("frame"),
            F.col("n_samples")
            - (
                F.expr("CAST((n_samples - frame) DIV hop AS BIGINT)")
                * F.col("hop")
                + F.col("frame")
            ),
        )
        .otherwise(F.col("n_samples"))
        .alias("tail_samples"),
    )
    bf = _MM13_BATCH_FRAMES
    return (
        plan.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_assets"),
            F.sum("n_frames").cast("long").alias("total_frames"),
            F.round(
                F.sum("dur_ms").cast("double") / F.count("*") / 1000, 6
            ).alias("mean_duration_s"),
            F.round(
                F.sum("tail_samples").cast("double") / F.sum("n_samples"), 6
            ).alias("tail_drop_share"),
            F.expr(
                f"CAST((sum(n_frames) + {bf} - 1) DIV {bf} AS BIGINT)"
            ).alias("n_batches"),
        )
        .orderBy("source")
    )


# mm14 token-equivalence rates: text bytes/token, image base patches +
# extra per 4 KiB tile, audio ms/token (12.5 tok/s speech-codec rate).
_MM14_TEXT_BPT = 4
_MM14_IMG_BASE = 256
_MM14_IMG_TILE = 4096
_MM14_AUDIO_MS = 80
_MM14_BATCH_TOKENS = 8192


@REGISTRY.register(
    "mm14_modality_token_budget",
    oracle=f"""
    WITH chk AS (
      SELECT doc_id, source,
             CAST(octet_length(encode(text)) AS BIGINT) AS nb,
             CAST(octet_length(encode(text))
                  + list_aggregate(list_transform(
                        range(1, least(length(text), 64) + 1),
                        i -> unicode(substr(text, CAST(i AS INT), 1))),
                        'sum') AS BIGINT) AS checksum
      FROM documents
    ),
    tok AS (
      SELECT source, checksum % 3 AS modality,
             CASE checksum % 3
               WHEN 0 THEN (nb + {_MM14_TEXT_BPT} - 1) // {_MM14_TEXT_BPT}
               WHEN 1 THEN {_MM14_IMG_BASE} + nb // {_MM14_IMG_TILE}
               ELSE (500 + checksum % 60000) // {_MM14_AUDIO_MS}
             END AS tokens
      FROM chk
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_assets,
           CAST(SUM(CASE WHEN modality = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_text,
           CAST(SUM(CASE WHEN modality = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_image,
           CAST(SUM(CASE WHEN modality = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_audio,
           CAST(SUM(tokens) AS BIGINT) AS tokens_total,
           round(SUM(CASE WHEN modality = 0 THEN tokens ELSE 0 END)
                 * 1.0 / SUM(tokens), 6) AS share_text_tokens,
           round(SUM(CASE WHEN modality = 1 THEN tokens ELSE 0 END)
                 * 1.0 / SUM(tokens), 6) AS share_image_tokens,
           round(SUM(CASE WHEN modality = 2 THEN tokens ELSE 0 END)
                 * 1.0 / SUM(tokens), 6) AS share_audio_tokens,
           CAST((SUM(tokens) + {_MM14_BATCH_TOKENS} - 1)
                // {_MM14_BATCH_TOKENS} AS BIGINT) AS n_batches
    FROM tok GROUP BY 1 ORDER BY 1
    """,
    doc="Cross-modality token-budget accounting per source: the decode "
    "stub's checksum deterministically fakes each payload's modality "
    "(text/image/audio), each asset converts to training-token "
    f"equivalents at published rates (text {_MM14_TEXT_BPT} B/token; "
    f"image {_MM14_IMG_BASE} base patches + 1/{_MM14_IMG_TILE} B tile "
    f"extra; audio 1 token/{_MM14_AUDIO_MS} ms — mm13's duration "
    "fake), and the plan reports per-source modality mix IN TOKENS "
    "plus the 8k-token batch count — the number a multimodal mixture "
    "sampler (dd23/tx37's budget machinery) actually allocates on, "
    "because asset counts lie when one modality's assets are 100x "
    "another's token cost. All token arithmetic is integer (// "
    "throughout); the three shares are single divisions rounded at 6 "
    "dp. Plan: decode stub (mapInPandas Arrow batches, mm02's "
    "kernel) -> map-only token plan -> one |sources|-row combiner "
    "agg; payload bytes never shuffle. At 100 TB a real tokenizer/"
    "patcher plugs into _fake_decode and THIS table stays the "
    "shuffle-free budget ledger.",
    tags=("multimodal", "llm", "budget", "tokens", "plan"),
)
def mm14(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("lang").alias("media_lang"),
        F.col("n_chars").cast("long").alias("meta_chars"),
    )
    meta = decode_media(staged).select("doc_id", "n_bytes", "checksum")
    src = docs.select("doc_id", "source")
    modality = F.col("checksum") % 3
    tokens = (
        F.when(
            modality == 0,
            F.expr(
                f"CAST((n_bytes + {_MM14_TEXT_BPT} - 1) "
                f"DIV {_MM14_TEXT_BPT} AS BIGINT)"
            ),
        )
        .when(
            modality == 1,
            F.lit(_MM14_IMG_BASE)
            + F.expr(f"CAST(n_bytes DIV {_MM14_IMG_TILE} AS BIGINT)"),
        )
        .otherwise(
            F.expr(
                f"CAST((500 + checksum % 60000) "
                f"DIV {_MM14_AUDIO_MS} AS BIGINT)"
            )
        )
    )
    tok = meta.join(src, "doc_id").select(
        "source", modality.alias("modality"), tokens.alias("tokens")
    )
    bt = _MM14_BATCH_TOKENS
    share = lambda m: F.round(
        F.sum(F.when(F.col("modality") == m, F.col("tokens")).otherwise(0))
        * 1.0
        / F.sum("tokens"),
        6,
    )
    cnt = lambda m: (
        F.sum(F.when(F.col("modality") == m, 1).otherwise(0))
        .cast("long")
    )
    return (
        tok.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_assets"),
            cnt(0).alias("n_text"),
            cnt(1).alias("n_image"),
            cnt(2).alias("n_audio"),
            F.sum("tokens").cast("long").alias("tokens_total"),
            share(0).alias("share_text_tokens"),
            share(1).alias("share_image_tokens"),
            share(2).alias("share_audio_tokens"),
            F.expr(
                f"CAST((sum(tokens) + {bt} - 1) DIV {bt} AS BIGINT)"
            ).alias("n_batches"),
        )
        .orderBy("source")
    )


# mm15 video sampling constants: container fps families, 2 fps target
# sample rate, a 32-frame-per-clip budget cap, and two fake decode
# resolutions — all arithmetic stays in exact integers.
_MM15_FPS = (24, 25, 30)      # checksum % 3 picks one
_MM15_TARGET_FPS = 2
_MM15_FRAME_CAP = 32
_MM15_DIMS = ((640, 360), (1280, 720))  # checksum % 2 picks one


@REGISTRY.register(
    "mm15_video_frame_plan",
    oracle=f"""
    WITH chk AS (
      SELECT doc_id, source,
             CAST(octet_length(encode(text))
                  + list_aggregate(list_transform(
                        range(1, least(length(text), 64) + 1),
                        i -> unicode(substr(text, CAST(i AS INT), 1))),
                        'sum') AS BIGINT) AS checksum
      FROM documents
    ),
    meta AS (
      SELECT source,
             CASE checksum % 3 WHEN 0 THEN {_MM15_FPS[0]}
                  WHEN 1 THEN {_MM15_FPS[1]}
                  ELSE {_MM15_FPS[2]} END AS fps,
             1000 + checksum % 120000 AS dur_ms,
             CASE checksum % 2
                  WHEN 0 THEN {_MM15_DIMS[0][0] * _MM15_DIMS[0][1]}
                  ELSE {_MM15_DIMS[1][0] * _MM15_DIMS[1][1]} END AS px
      FROM chk
    ),
    plan AS (
      SELECT source, dur_ms, px,
             dur_ms * fps // 1000 AS n_total,
             greatest(fps // {_MM15_TARGET_FPS}, 1) AS stride
      FROM meta
    ),
    sampled AS (
      SELECT source, dur_ms, px, n_total,
             (n_total + stride - 1) // stride AS n_raw
      FROM plan
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_clips,
           CAST(SUM(least(n_raw, {_MM15_FRAME_CAP})) AS BIGINT)
               AS total_sampled_frames,
           round(SUM(CASE WHEN n_raw > {_MM15_FRAME_CAP} THEN 1 ELSE 0 END)
                 * 1.0 / COUNT(*), 6) AS cap_hit_share,
           round(CAST(SUM(dur_ms) AS DOUBLE) / COUNT(*) / 1000, 6)
               AS mean_duration_s,
           round(CAST(SUM(least(n_raw, {_MM15_FRAME_CAP}) * px * 3)
                      AS DOUBLE) / 1073741824, 6) AS decode_gib
    FROM sampled GROUP BY 1 ORDER BY 1
    """,
    doc="Video frame-sampling plan per source (mm13 is the audio twin): "
    "each payload's decode-stub checksum deterministically fakes a "
    "container fps (24/25/30), duration and resolution; the plan "
    "uniform-samples at "
    f"{_MM15_TARGET_FPS} fps via integer stride fps//target, ceil-"
    "counts sampled frames per clip, applies the "
    f"{_MM15_FRAME_CAP}-frame training cap, and budgets decoded RGB "
    "bytes — the numbers that decide shard sizes and decode-worker "
    "count BEFORE anyone touches a GPU (mm03 is the row-to-frames mapInPandas fan-out this table budgets), plus the cap-hit share that "
    "says whether long clips are being truncated into bias. Every "
    "sampling decision is integer arithmetic (// and least "
    "throughout); the two FP shares are identically-written IEEE "
    "divisions rounded 6 dp. Plan: decode stub (mapInPandas Arrow "
    "batches, mm02's kernel — a real deployment plugs ffprobe into "
    "_fake_decode and the stride arithmetic is unchanged) -> "
    "map-only per-clip plan -> one |sources|-row combiner agg; "
    "payload bytes never shuffle, and at 100 TB the real frame "
    "extraction runs as mapInPandas over the binary column with THIS "
    "table as its shuffle-free budget.",
    tags=("multimodal", "video", "sampling", "plan"),
)
def mm15(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.col("lang").alias("media_lang"),
        F.col("n_chars").cast("long").alias("meta_chars"),
    )
    meta = decode_media(staged).select("doc_id", "checksum")
    src = docs.select("doc_id", "source")
    f0, f1, f2 = _MM15_FPS
    fps = (
        F.when(F.col("checksum") % 3 == 0, f0)
        .when(F.col("checksum") % 3 == 1, f1)
        .otherwise(f2)
    )
    px = F.when(
        F.col("checksum") % 2 == 0, _MM15_DIMS[0][0] * _MM15_DIMS[0][1]
    ).otherwise(_MM15_DIMS[1][0] * _MM15_DIMS[1][1])
    plan = (
        meta.join(src, "doc_id")
        .select(
            "source",
            fps.alias("fps"),
            (1000 + F.col("checksum") % 120000).alias("dur_ms"),
            px.alias("px"),
        )
        .select(
            "source",
            "dur_ms",
            "px",
            F.expr("CAST(dur_ms * fps DIV 1000 AS BIGINT)").alias("n_total"),
            F.greatest(
                F.expr(f"CAST(fps DIV {_MM15_TARGET_FPS} AS BIGINT)"),
                F.lit(1).cast("long"),
            ).alias("stride"),
        )
        .select(
            "source",
            "dur_ms",
            "px",
            "n_total",
            F.expr(
                "CAST((n_total + stride - 1) DIV stride AS BIGINT)"
            ).alias("n_raw"),
        )
    )
    cap = _MM15_FRAME_CAP
    kept = F.least(F.col("n_raw"), F.lit(cap).cast("long"))
    return (
        plan.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_clips"),
            F.sum(kept).cast("long").alias("total_sampled_frames"),
            F.round(
                F.sum(
                    F.when(F.col("n_raw") > cap, 1).otherwise(0)
                )
                * 1.0
                / F.count("*"),
                6,
            ).alias("cap_hit_share"),
            F.round(
                F.sum("dur_ms").cast("double") / F.count("*") / 1000, 6
            ).alias("mean_duration_s"),
            F.round(
                F.sum(kept * F.col("px") * 3).cast("double") / 1073741824,
                6,
            ).alias("decode_gib"),
        )
        .orderBy("source")
    )
