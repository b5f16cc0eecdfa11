"""Multimodal column plumbing (north-star, BASELINE.json): image/audio/
video as opaque ``binary`` columns with typed metadata, processed by
Arrow-batched Pandas UDFs over ``mapInPandas``.

Decode disposition (r9): formats that are pure byte parsing — binary
PPM (P6) and uncompressed 24-bit BMP — decode for REAL in
``decode_image`` (numpy + struct, no external codec libs), round-trip
pixel-exact tested driver- and executor-side. Compressed codecs
(PNG/JPEG/MP4) stay behind the documented NotImplementedError seam
because this container ships no PIL/cv2/ffmpeg; the oracled feature
path keeps the deterministic fake featurizer so the operator remains
hash-checkable. Everything Spark-side is real and tested: schema,
binary column handling, batch iteration shape, partitioning, and the
metadata join pattern.

Scale design: binary payloads never pass through a shuffle — derive
features first (narrow mapInPandas), shuffle only the small feature rows.
Partition count governs decode parallelism; Arrow batches amortize the
Python crossing (spark.sql.execution.arrow.maxRecordsPerBatch bounds
per-batch memory for fat blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..sources.tables import load_table

MEDIA_SCHEMA = (
    "doc_id long, media_type string, width int, height int, payload binary"
)


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: each document's text bytes stand in
    for an encoded image payload, with typed metadata. In production this
    is `spark.read.format('binaryFile')` or a parquet table with a binary
    column."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, "image/png")
        .when(F.col("doc_id") % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("media_type"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def _decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6): 'P6' <w> <h> <maxval> then raw RGB. Pure byte
    parsing — the netpbm header is whitespace-separated ASCII tokens with
    '#' comments running to end-of-line."""
    tokens: list[int] = []
    i = 2  # past the 'P6' magic
    while len(tokens) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        tokens.append(int(payload[i:j]))
        i = j
    w, h, maxval = tokens
    if maxval != 255:
        raise NotImplementedError("only 8-bit PPM (maxval 255) supported")
    i += 1  # exactly one whitespace byte separates header from raster
    raster = payload[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): 14-byte file header
    gives the pixel-array offset; rows are BGR, padded to 4 bytes,
    bottom-up when height > 0. Returns RGB."""
    import struct

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", payload, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP not supported")
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    raster = payload[data_off : data_off + stride * h]
    if len(raster) != stride * h:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if bottom_up:
        img = img[::-1]
    return np.ascontiguousarray(img)


def decode_image(payload: bytes) -> np.ndarray:
    """Real decode for the dependency-free formats (r9 disposition of the
    long-standing stub): binary PPM (P6) and uncompressed 24-bit BMP are
    pure byte-format parsing, so they decode here with numpy + struct
    only — no PIL/cv2/ffmpeg. Returns an (H, W, 3) uint8 RGB array.

    Compressed codecs (PNG/JPEG/MP4/WAV-compressed) still raise
    NotImplementedError: they need codec libraries this container does
    not ship, and the deployment seam is unchanged — swap this function
    (or extend the magic-byte dispatch) when those libs exist. The
    oracled feature path (q_media_features) keeps the deterministic
    byte-histogram featurizer; the real-decode path is exercised
    executor-side by tests/test_northstar.py::test_decode_real_formats
    via the same mapInPandas plumbing.

    Error taxonomy: a payload too short to carry a magic number is
    malformed DATA (ValueError), not an unsupported codec — conflating
    the two would route corrupt inputs into the documented
    NotImplementedError deployment seam."""
    if len(payload) < 2:
        raise ValueError(
            f"payload too short to carry an image magic number "
            f"({len(payload)} bytes)"
        )
    if payload[:2] == b"P6":
        return _decode_ppm(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "compressed codec decode (PNG/JPEG/...) requires codec libraries "
        "not present in this environment; PPM(P6)/BMP(24-bit) decode "
        "natively, and extract_features() uses a deterministic fake "
        "featurizer for the oracled path"
    )


def extract_features(media: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: the real
    Arrow-batched plumbing with a deterministic fake featurizer (byte
    histogram + length) standing in for the codec + model forward pass."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # Vectorized across the whole Arrow batch: concatenate payloads
            # into one uint8 buffer, bucket every byte (>> 6 -> 4 bins), and
            # histogram per row with a single bincount over
            # row_index * 4 + bin. No per-row Python loop — this is the
            # pattern a real decode -> embed forward pass must follow
            # (batched tensor in, batched features out).
            # Real path: decode_image(payload) -> resize -> embed.
            payloads = pdf["payload"]
            lengths = payloads.str.len().to_numpy(dtype=np.int64)
            if lengths.sum() == 0:
                counts = np.zeros((len(pdf), 4), dtype=np.int64)
            else:
                buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
                row_idx = np.repeat(np.arange(len(pdf), dtype=np.int64), lengths)
                counts = np.bincount(
                    row_idx * 4 + (buf >> 6), minlength=len(pdf) * 4
                ).reshape(len(pdf), 4)
            denom = np.maximum(lengths, 1).astype(np.float64)[:, None]
            hist = counts / denom
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "media_type": pdf["media_type"].to_numpy(),
                    "n_bytes": lengths,
                    "h0": hist[:, 0],
                    "h1": hist[:, 1],
                    "h2": hist[:, 2],
                    "h3": hist[:, 3],
                }
            )

    return media.mapInPandas(
        featurize,
        schema=(
            "doc_id long, media_type string, n_bytes long, "
            "h0 double, h1 double, h2 double, h3 double"
        ),
    )


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' shape for video payloads: explode each payload into
    fixed-stride chunk offsets (the real op samples frames; the plumbing —
    one row in, many typed rows out — is identical)."""
    video = media.filter(F.col("media_type") == "video/mp4")
    n_frames = F.greatest(
        (F.length("payload") / every_n_bytes).cast("int"), F.lit(1)
    )
    return video.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "offset_idx"),
    ).select(
        "doc_id", "frame_no", (F.col("offset_idx") * every_n_bytes).alias("byte_offset")
    )


@query(
    "q_media_features",
    oracle="""
WITH codes AS (
    SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image/png'
             WHEN doc_id % 3 = 1 THEN 'audio/wav'
             ELSE 'video/mp4' END AS media_type,
        CAST(strlen(text) AS BIGINT) AS n_bytes,
        list_transform(split(text, ''), c -> ascii(c) >> 6) AS bins
    FROM documents
)
SELECT doc_id, media_type, n_bytes,
    -- the n_bytes = 0 guard matters: DuckDB's split('', '') is [''] and
    -- ascii('') = 0, so an EMPTY doc would otherwise score h0 = 1.0
    -- while the numpy featurizer emits an all-zero histogram
    CASE WHEN n_bytes = 0 THEN 0.0
         ELSE len(list_filter(bins, b -> b = 0)) / CAST(n_bytes AS DOUBLE)
    END AS h0,
    CASE WHEN n_bytes = 0 THEN 0.0
         ELSE len(list_filter(bins, b -> b = 1)) / CAST(n_bytes AS DOUBLE)
    END AS h1,
    CASE WHEN n_bytes = 0 THEN 0.0
         ELSE len(list_filter(bins, b -> b = 2)) / CAST(n_bytes AS DOUBLE)
    END AS h2,
    CASE WHEN n_bytes = 0 THEN 0.0
         ELSE len(list_filter(bins, b -> b = 3)) / CAST(n_bytes AS DOUBLE)
    END AS h3
FROM codes""",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media feature extraction end-to-end (binary column -> mapInPandas ->
    typed features). HASH-ORACLED since r8 (was rows-only): the
    deterministic fake featurizer is a byte histogram (byte >> 6 -> 4
    bins) over the synthetic payload, and that payload IS the document's
    UTF-8 text (all-ASCII fixture, byte == char), so DuckDB reproduces
    every count per character; each h_i is ONE IEEE division of exact
    integers (count / max(len, 1)) — correctly rounded identically in
    numpy float64 and DuckDB DOUBLE, no rounding needed. Invariants
    (histogram sums to 1, n_bytes == n_chars, every media type flows)
    stay asserted in tests/test_northstar.py."""
    return extract_features(synthetic_media(spark, sf_dir))


@query(
    "q_media_metadata",
    oracle="""
SELECT
    CASE WHEN doc_id % 3 = 0 THEN 'image/png'
         WHEN doc_id % 3 = 1 THEN 'audio/wav'
         ELSE 'video/mp4' END AS media_type,
    COUNT(*) AS n_items,
    CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
    CAST(MIN(doc_id % 640 + 32) AS INTEGER) AS min_width,
    CAST(MAX(doc_id % 640 + 32) AS INTEGER) AS max_width
FROM documents GROUP BY 1""",
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata profile of the media table (the catalog query a
    multimodal pipeline runs before scheduling decode work). Payload bytes
    == text chars in the synthetic table, so the oracle is exact."""
    media = synthetic_media(spark, sf_dir)
    return media.groupBy("media_type").agg(
        F.count("*").alias("n_items"),
        F.sum(F.length("payload")).alias("total_bytes"),
        F.min("width").alias("min_width"),
        F.max("width").alias("max_width"),
    )


FRAME_STRIDE = 64  # bytes between sampled "frames" in the synthetic payload
FRAME_PREVIEW = 16  # bytes of each frame surfaced for inspection


@query(
    "q_frame_sample",
    oracle=f"""
WITH video AS (
    SELECT doc_id, text, LENGTH(text) AS n_bytes
    FROM documents WHERE doc_id % 3 = 2
),
frames AS (
    SELECT doc_id, text,
        unnest(generate_series(0,
            GREATEST(n_bytes // {FRAME_STRIDE}, 1) - 1)) AS frame_no
    FROM video
)
SELECT doc_id,
    CAST(frame_no AS INTEGER) AS frame_no,
    CAST(frame_no * {FRAME_STRIDE} AS BIGINT) AS byte_offset,
    substring(text, CAST(frame_no * {FRAME_STRIDE} + 1 AS INTEGER),
              {FRAME_PREVIEW}) AS frame_preview
FROM frames""",
)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling, the Spark-side plumbing: one binary payload
    row explodes into fixed-stride frame rows (offset + a byte-slice
    preview), all in codegen (sequence + posexplode + binary substring) —
    no UDF, no shuffle; partitioning inherits the scan. The decode of each
    frame slice into pixels is the disclosed codec seam (decode_image);
    here the slice itself is surfaced, which the oracle can check exactly
    because the synthetic payload is the UTF-8 text (byte == char for
    this all-ASCII fixture). At 100 TB: frames fan out ~n_bytes/stride
    rows per video but carry only offsets + small previews — the payload
    itself never crosses a shuffle (SCALE.md multimodal posture)."""
    video = synthetic_media(spark, sf_dir).filter(
        F.col("media_type") == "video/mp4"
    )
    n_frames = F.greatest(F.expr(f"length(payload) div {FRAME_STRIDE}"), F.lit(1))
    frames = video.select(
        "doc_id",
        "payload",
        F.explode(F.sequence(F.lit(0), (n_frames - 1).cast("int"))).alias(
            "frame_no"
        ),
    )
    offset = F.col("frame_no").cast("bigint") * FRAME_STRIDE
    return frames.select(
        "doc_id",
        F.col("frame_no").cast("int").alias("frame_no"),
        offset.alias("byte_offset"),
        F.decode(
            F.expr(
                f"substring(payload, frame_no * {FRAME_STRIDE} + 1, {FRAME_PREVIEW})"
            ),
            "UTF-8",
        ).alias("frame_preview"),
    )


@query(
    "q_media_dedup",
    oracle="""
WITH media AS (
    SELECT doc_id,
        CASE WHEN doc_id % 3 = 0 THEN 'image/png'
             WHEN doc_id % 3 = 1 THEN 'audio/wav'
             ELSE 'video/mp4' END AS media_type,
        md5(text) AS fp,
        CAST(strlen(text) AS BIGINT) AS n_bytes
    FROM documents
), groups AS (
    SELECT fp, MIN(doc_id) AS canonical_id,
        CAST(COUNT(*) AS BIGINT) AS group_size
    FROM media GROUP BY fp
)
SELECT m.doc_id, m.media_type, m.fp, m.n_bytes,
    g.canonical_id, g.group_size,
    m.doc_id <> g.canonical_id AS is_dup
FROM media m JOIN groups g ON m.fp = g.fp""",
)
def q_media_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup by content hash — the FIRST pass every
    multimodal pipeline runs before any decode: byte-identical payloads
    (re-crawled or mirrored assets) collapse to one canonical id
    (min doc_id), so the expensive decode/featurize stage downstream
    (q_media_features) runs once per distinct asset. Spark hashes the
    BINARY payload directly; the oracle hashes the same UTF-8 bytes via
    md5(text) — identical digests because the synthetic payload IS the
    encoded text (synthetic_media).

    Scale: one groupBy on the 16-byte digest (payload bytes never
    shuffle — the md5 and length are derived in the scan projection,
    exactly the module's design rule), then a digest-keyed join back.
    The canonical choice (min doc_id) is deterministic, mirroring
    q_dedup_exact's keep-rule."""
    media = synthetic_media(spark, sf_dir).select(
        "doc_id",
        "media_type",
        F.md5("payload").alias("fp"),
        F.length("payload").cast("bigint").alias("n_bytes"),
    )
    groups = media.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").cast("bigint").alias("group_size"),
    )
    return media.join(groups, "fp").select(
        "doc_id",
        "media_type",
        "fp",
        "n_bytes",
        "canonical_id",
        "group_size",
        (F.col("doc_id") != F.col("canonical_id")).alias("is_dup"),
    )


# --- resize: the remaining member of the decode/featurize/resize/
# frame-sample plumbing set -------------------------------------------------

RESIZE_OUT_W = 8
RESIZE_OUT_H = 6


def nn_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Exact nearest-neighbor resize (both directions): output pixel
    (i, j) reads source pixel ((i*H_in)//H_out, (j*W_in)//W_out) — pure
    integer index math, so the result is bit-deterministic and a SQL
    oracle can reproduce it in closed form."""
    h, w = arr.shape[0], arr.shape[1]
    rows = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cols = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return arr[rows][:, cols]


def _pattern_ppm(doc_id: int, w: int, h: int) -> bytes:
    """Deterministic formula image encoded as REAL binary PPM (P6):
    pixel (y, x, c) = (doc_id*7 + y*5 + x*3 + c) % 256. The formula is
    the contract the oracle recomputes after the round trip."""
    y = np.arange(h, dtype=np.int64)[:, None, None]
    x = np.arange(w, dtype=np.int64)[None, :, None]
    c = np.arange(3, dtype=np.int64)[None, None, :]
    arr = ((doc_id * 7 + y * 5 + x * 3 + c) % 256).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Decode -> nearest-neighbor resize -> summary stats over binary
    image payloads via mapInPandas (Arrow-batched; the decode/resize
    pair is a per-row codec call exactly as a real thumbnailer would
    be). Payloads never leave their partition; only the small stat rows
    flow downstream."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(payload))
                small = nn_resize(img, out_w, out_h)
                rows.append(
                    (
                        int(doc_id),
                        int(img.shape[1]),
                        int(img.shape[0]),
                        out_w,
                        out_h,
                        int(small.astype(np.int64).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "in_w", "in_h", "out_w", "out_h", "px_sum",
                ],
            )

    return media.mapInPandas(
        work,
        schema=(
            "doc_id long, in_w int, in_h int, out_w int, out_h int, "
            "px_sum long"
        ),
    )


@query(
    "q_media_resize",
    oracle=f"""
WITH d AS (
    SELECT doc_id,
        CAST(doc_id % 13 + 4 AS INTEGER) AS in_w,
        CAST(doc_id % 11 + 4 AS INTEGER) AS in_h
    FROM documents
),
px AS (
    SELECT d.doc_id, d.in_w, d.in_h,
        (d.doc_id * 7
         + ((i.i * d.in_h) // {RESIZE_OUT_H}) * 5
         + ((j.j * d.in_w) // {RESIZE_OUT_W}) * 3
         + c.c) % 256 AS v
    FROM d,
        UNNEST(generate_series(0, {RESIZE_OUT_H - 1})) AS i(i),
        UNNEST(generate_series(0, {RESIZE_OUT_W - 1})) AS j(j),
        UNNEST(generate_series(0, 2)) AS c(c)
)
SELECT doc_id, in_w, in_h,
    CAST({RESIZE_OUT_W} AS INTEGER) AS out_w,
    CAST({RESIZE_OUT_H} AS INTEGER) AS out_h,
    CAST(SUM(v) AS BIGINT) AS px_sum
FROM px
GROUP BY doc_id, in_w, in_h""",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize over binary payloads — the remaining member of the
    brief's decode / feature-extract / resize / frame-sample plumbing
    set, and unlike the featurizer it exercises the REAL decode path
    end-to-end: each document gets a deterministic formula image
    (pixel (y,x,c) = (doc_id*7 + y*5 + x*3 + c) % 256, dims
    (doc_id%13+4) x (doc_id%11+4)) encoded as genuine binary PPM (P6)
    executor-side, decoded back through decode_image, resized to
    {RESIZE_OUT_W}x{RESIZE_OUT_H} with exact integer nearest-neighbor
    indexing (up- AND down-sampling across the fixture), and reduced
    to per-image stats. The oracle recomputes the resized pixel sum in
    closed form from the formula — a full-circle hash check over
    encode -> decode -> resize, all exact integer math.

    Scale: two narrow mapInPandas stages (encode, then decode/resize)
    — payloads never cross a shuffle, per the module's design rule;
    Arrow batches amortize the Python crossing and the per-row codec
    calls are the honest shape of a real thumbnail pass. On a real
    corpus the encode stage is replaced by `spark.read.format(
    'binaryFile')` and the decode dispatch gains compressed codecs
    behind the documented seam (decode_image)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 13 + 4).cast("int").alias("in_w"),
        (F.col("doc_id") % 11 + 4).cast("int").alias("in_h"),
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        _pattern_ppm(int(d), int(w), int(h))
                        for d, w, h in zip(
                            pdf["doc_id"], pdf["in_w"], pdf["in_h"]
                        )
                    ],
                }
            )

    media = docs.mapInPandas(encode, schema="doc_id long, payload binary")
    return resize_images(media, RESIZE_OUT_W, RESIZE_OUT_H)
