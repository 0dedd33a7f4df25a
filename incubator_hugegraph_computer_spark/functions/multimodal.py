"""Multimodal column plumbing — binary payloads + typed metadata.

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas UDFs over ``mapInPandas``. The media codec
libraries are NOT in this container, so the decode kernel is stubbed —
clearly marked — behind a deterministic fake; everything Spark-side
(schema, batching, partitioning, UDF signatures) is real and tested.

At scale: binary payloads ride in their own column so Parquet column
pruning skips them unless the stage needs bytes; per-batch work is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes long"


def synthetic_media(spark, n: int, kind: str = "image", seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes) for
    exercising the plumbing."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng_bytes = [
                np.random.default_rng(seed + int(i)).integers(0, 256, 64, dtype=np.uint8).tobytes()
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kind,
                    "payload": rng_bytes,
                    "meta": [
                        {"width": 64, "height": 64, "sample_rate": None, "n_frames": None}
                        for _ in ids
                    ],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """STUB: the deterministic fake used by the oracled queries —
    interprets the payload bytes as the 'decoded' sample grid so the
    downstream feature math is exercised end-to-end and SQL-replayable.
    Real formats go through :func:`decode_media` (pure-Python BMP/WAV
    codecs below; PIL / torchaudio / pyav are not in this sandbox and
    would slot into the same seam).

    Raises NotImplementedError for kinds with no fake. A NULL payload
    (the schema allows it) decodes to an empty grid, like b''."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for kind={kind!r}")
    if payload is None:
        payload = b""
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float32)


# ------------------------------------------------------------------
# Real codecs (pure Python/NumPy; no external media libraries).
# BMP 24-bit uncompressed and WAV PCM16 cover one real image and one
# real audio format end-to-end through the SAME mapInPandas kernels.
# ------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed bottom-up BMP into a flat float32
    grayscale sample grid (ITU-R BT.601 luma, row-major top-down)."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<IiiHH", payload, 14)[0:3]
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={compression})"
        )
    flipped = height > 0  # positive height = bottom-up row order
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_stride * height, offset=data_off
    ).reshape(height, row_stride)[:, : width * 3]
    if flipped:
        rows = rows[::-1]
    bgr = rows.reshape(height, width, 3).astype(np.float32)
    # BT.601 luma over the B,G,R byte order BMP stores
    return (
        0.114 * bgr[:, :, 0] + 0.587 * bgr[:, :, 1] + 0.299 * bgr[:, :, 2]
    ).ravel()


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit bottom-up BMP."""
    import struct

    h, w, _ = pixels.shape
    row_stride = (w * 3 + 3) & ~3
    body = bytearray()
    for row in pixels[::-1]:  # bottom-up
        bgr = row[:, ::-1].astype(np.uint8).tobytes()  # RGB -> BGR
        body += bgr + b"\x00" * (row_stride - len(bgr))
    size = 54 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def decode_wav(payload: bytes) -> np.ndarray:
    """Decode a RIFF/WAVE PCM16 payload into float32 samples in [-1, 1]
    (channels interleaved, as stored)."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt_code, bits = 12, None, None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + csize]
        if cid == b"fmt ":
            fmt_code, _ch, _rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
        elif cid == b"data":
            if fmt_code != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 WAV supported (fmt={fmt_code}, bits={bits})"
                )
            n = len(body) // 2
            return (
                np.frombuffer(body, dtype="<i2", count=n).astype(np.float32) / 32768.0
            )
        pos += 8 + csize + (csize & 1)  # chunks pad to even offsets
    raise ValueError("WAV payload has no data chunk")


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 samples as a mono RIFF/WAVE PCM16 payload."""
    import struct

    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_media(payload: bytes, kind: str) -> np.ndarray:
    """Codec dispatcher: sniff real containers (BMP, RIFF/WAVE) and
    decode them with the pure-Python codecs; anything else falls back to
    the deterministic stub so oracle-replayable fakes keep working."""
    if payload is not None and len(payload) >= 12:
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return decode_wav(payload)
    return _decode_stub(payload, kind)


def extract_features(
    media: DataFrame,
    feature_dim: int = 8,
    dtype: str = "float32",
    codec: str = "stub",
) -> DataFrame:
    """Decode + pooled feature vector per media row via mapInPandas
    (Arrow batches; NumPy-vectorized inside the batch).

    ``dtype="float32"`` is the production shape (embedding models emit
    fp32); ``dtype="float64"`` accumulates the pooled means in float64 —
    byte inputs make that arithmetic EXACT, so an external SQL oracle
    can replay the chunked means bit-for-bit (chunking follows
    ``np.array_split``: the first ``n % dim`` chunks get one extra
    sample).

    ``codec="stub"`` (default) keeps the deterministic byte-grid fake
    the SQL oracle replays; ``codec="auto"`` sniffs real containers
    (24-bit BMP, PCM16 WAV) and decodes them with the pure-Python
    codecs through the identical kernel."""
    if codec not in ("stub", "auto"):
        raise ValueError(f"codec must be 'stub' or 'auto', got {codec!r}")
    decode = _decode_stub if codec == "stub" else decode_media
    if dtype not in ("float32", "float64"):
        raise ValueError(f"dtype must be 'float32' or 'float64', got {dtype!r}")
    np_dtype = np.float32 if dtype == "float32" else np.float64
    schema = FEATURE_SCHEMA if dtype == "float32" else FEATURE_SCHEMA.replace(
        "array<float>", "array<double>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                arr = decode(payload, kind)
                # mean-pool into feature_dim buckets — stand-in for a
                # real embedding model
                chunks = np.array_split(arr, feature_dim)
                # payloads shorter than feature_dim leave trailing chunks
                # empty — emit 0.0 there, never NaN
                feats.append(
                    np.array(
                        [c.mean(dtype=np.float64) if len(c) else 0.0 for c in chunks],
                        dtype=np_dtype,
                    )
                )
                sizes.append(len(payload) if payload is not None else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": np.array(sizes, dtype=np.int64),
                }
            )

    return media.mapInPandas(kernel, schema=schema)


def frame_sample(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling plumbing: explode video payloads into frame rows
    (media_id, frame_no, frame_bytes) taking every nth frame. The frame
    splitter is part of the stubbed decode: frames are fixed 16-byte
    strides of the payload."""
    if every_nth < 1:
        raise ValueError(f"every_nth must be >= 1, got {every_nth}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_no, out_bytes = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    payload = b""
                n_frames = len(payload) // 16
                for f in range(0, n_frames, every_nth):
                    out_id.append(mid)
                    out_no.append(f)
                    out_bytes.append(payload[f * 16 : (f + 1) * 16])
            yield pd.DataFrame(
                {"media_id": out_id, "frame_no": out_no, "frame": out_bytes}
            )

    return media.mapInPandas(kernel, schema="media_id long, frame_no int, frame binary")


def resize(media: DataFrame, factor: int = 4) -> DataFrame:
    """Resize plumbing: decode, mean-pool every ``factor`` consecutive
    samples, re-encode the pooled grid as the new payload. Pooling uses
    the INTEGER floor mean (sum // count) so the resized bytes are exact
    and an external SQL oracle can verify them bit-for-bit; a real
    deployment swaps the pooling kernel for a codec-backed resample
    (PIL/ffmpeg — not in this container) without touching the Spark
    shape: mapInPandas, media schema in == media schema out, payload
    column pruned from stages that don't touch bytes.

    The reference engine has no media operators (SURVEY.md §2.9); this
    is training-pipeline surface."""
    if factor < 1:
        raise ValueError(f"resize factor must be >= 1, got {factor}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                arr = _decode_stub(payload, kind).astype(np.int64)
                if len(arr) == 0:
                    payloads.append(b"")
                    metas.append(
                        {"width": 0, "height": 1, "sample_rate": None, "n_frames": None}
                    )
                    continue
                idx = np.arange(0, len(arr), factor)
                sums = np.add.reduceat(arr, idx)
                counts = np.diff(np.append(idx, len(arr)))
                pooled = (sums // counts).astype(np.uint8)
                payloads.append(pooled.tobytes())
                metas.append(
                    {
                        "width": int(len(pooled)),
                        "height": 1,
                        "sample_rate": None,
                        "n_frames": None,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def wav_media_from_ids(ids: DataFrame, n_samples: int = 64) -> DataFrame:
    """Encode a REAL PCM16 WAV payload per id row — the deterministic
    corpus for driving :func:`decode_media`'s container sniffing on
    Spark. Sample ``t`` of media ``d`` is ``((d*7919 + t*104729) %
    65536) - 32768`` (full int16 range, SQL-replayable); the payload is
    a complete RIFF/WAVE container from :func:`encode_wav`, so the
    decode side exercises header walking, not just byte passthrough.
    PCM16 decodes to 15-bit dyadic rationals, which float64 pooled
    means sum EXACTLY — an external SQL oracle matches bit-for-bit.

    ``ids``: one-column (media_id-compatible) DataFrame; first column
    is used."""
    col = ids.columns[0]
    rows = ids.select(F.col(col).cast("long").alias("media_id"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        t = np.arange(n_samples, dtype=np.int64)
        for pdf in batches:
            mids = pdf["media_id"].to_numpy()
            payloads = [
                encode_wav((((int(d) * 7919 + t * 104729) % 65536) - 32768))
                for d in mids
            ]
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "kind": "audio",
                    "payload": payloads,
                    "meta": [
                        {
                            "width": None,
                            "height": None,
                            "sample_rate": 16000,
                            "n_frames": None,
                        }
                        for _ in mids
                    ],
                }
            )

    return rows.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Treat each document's UTF-8 bytes as an opaque media payload —
    the plumbing used when the corpus carries real image/audio bytes:
    (media_id, kind, payload binary, meta)."""
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def byte_stats(media: DataFrame) -> DataFrame:
    """(media_id, n_bytes, byte_sum, byte_mean) via the same Arrow
    mapInPandas decode path as ``extract_features`` — the decoded sample
    grid reduced to closed-form statistics so an external SQL oracle can
    verify the binary plumbing bit-for-bit."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_bytes, b_sum, b_mean = [], [], []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                arr = _decode_stub(payload, kind)
                n_bytes.append(len(payload) if payload is not None else 0)
                b_sum.append(int(arr.sum(dtype=np.int64)) if len(arr) else 0)
                # float64 accumulation, emitted RAW: boundary rounding
                # (F.round, HALF_UP like SQL ROUND) is the caller's job —
                # Python round() is half-even and diverges on ties
                b_mean.append(float(arr.mean(dtype=np.float64)) if len(arr) else 0.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": np.array(n_bytes, dtype=np.int64),
                    "byte_sum": np.array(b_sum, dtype=np.int64),
                    "byte_mean": np.array(b_mean, dtype=np.float64),
                }
            )

    return media.mapInPandas(
        kernel, schema="media_id long, n_bytes long, byte_sum long, byte_mean double"
    )


def perceptual_hash(media: DataFrame, bits: int = 63) -> DataFrame:
    """(media_id, n_bytes, phash) — aHash-style perceptual fingerprint
    of the decoded sample grid via the same Arrow ``mapInPandas``
    decode path as ``extract_features``: the grid is split into
    ``bits`` contiguous buckets (bucket of index i = i·bits // n) and
    bit b is set iff bucket b's mean exceeds the global mean. 63 bits
    keeps the hash a non-negative int64.

    The multimodal near-dup primitive: visually-identical media decode
    to (nearly) the same grid → identical phash; grouping by phash is
    the bucket step of image dedup (Hamming-distance verify follows in
    a real deployment). Bucket/global means are exact-integer ratios
    (byte inputs), so the bit pattern is deterministic and the oracle
    replays it bit-for-bit from the same bytes.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, ph = [], [], []
            for mid, payload, kind in zip(
                pdf["media_id"], pdf["payload"], pdf["kind"]
            ):
                arr = _decode_stub(payload, kind)
                n = len(arr)
                ids.append(mid)
                nb.append(n)
                if n == 0:
                    ph.append(0)
                    continue
                gmean = float(arr.sum(dtype=np.int64)) / n
                idx = (np.arange(n, dtype=np.int64) * bits) // n
                sums = np.zeros(bits, dtype=np.int64)
                cnts = np.zeros(bits, dtype=np.int64)
                np.add.at(sums, idx, arr.astype(np.int64))
                np.add.at(cnts, idx, 1)
                h = 0
                for b in range(bits):
                    if cnts[b] > 0 and (float(sums[b]) / float(cnts[b])) > gmean:
                        h |= 1 << b
                ph.append(h)
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": nb, "phash": ph}
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )
    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, out_schema
    )


def phash_near_duplicates(
    media: DataFrame,
    bands: int = 4,
    band_bits: int = 16,
    max_hamming: int = 8,
) -> DataFrame:
    """(media_a, media_b, hamming) — perceptual near-duplicate pairs:
    candidates share at least one exact ``band_bits``-bit band of
    their ``perceptual_hash`` (banded LSH over the fingerprint, the
    same band-then-verify shape as MinHash dedup), then verified by
    full popcount(xor) ≤ ``max_hamming``. a < b, distinct pairs.

    This closes the multimodal dedup loop: phash buckets exact
    matches; the banded pass recalls fingerprints that differ in a few
    bits (small crops / re-encodes under a real codec). Scale: the
    band join touches only co-banded pairs — cap saturated bands
    upstream exactly like hot LSH buckets if payload skew demands it.
    """
    h = perceptual_hash(media)
    bands_arr = F.array(*[F.lit(i).cast("long") for i in range(bands)])
    banded = h.select(
        F.col("media_id"),
        F.col("phash"),
        F.explode(bands_arr).alias("band"),
    ).select(
        "media_id",
        "phash",
        "band",
        F.expr(f"(phash >> (band * {band_bits})) & {(1 << band_bits) - 1}").alias(
            "bval"
        ),
    )
    a = banded.select(
        F.col("media_id").alias("media_a"),
        F.col("phash").alias("ha"),
        "band",
        "bval",
    )
    b = banded.select(
        F.col("media_id").alias("media_b"),
        F.col("phash").alias("hb"),
        "band",
        "bval",
    )
    cand = (
        a.join(b, ["band", "bval"])
        .where(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "ha", "hb")
        .distinct()
    )
    return cand.select(
        "media_a",
        "media_b",
        F.bit_count(F.expr("ha ^ hb")).cast("long").alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


def phash_recall_report(
    media: DataFrame,
    bands: int = 4,
    band_bits: int = 16,
    max_hamming: int = 16,
) -> DataFrame:
    """One row (n_true, n_candidates, n_hits, recall) — measured recall
    of the banded phash candidate generator against the exact
    all-pairs Hamming ≤ ``max_hamming`` truth set: the pre-flight
    tuning report for the multimodal near-dup pass (the phash sibling
    of ``dedup.lsh_recall_report`` / ``similarity.ivf_recall_report``).

    By pigeonhole, Hamming < ``bands`` is ALWAYS recalled (some band
    must match exactly); this report measures what the band layout
    catches in the gray zone above it on YOUR corpus. The truth side
    is an all-pairs self-join of the (small) fingerprint table — at
    fleet scale, sample media rows first; fingerprints are 8 bytes, so
    even 10⁸ sampled rows fit one shuffle.
    """
    from pyspark.sql import functions as F

    h = perceptual_hash(media).select("media_id", "phash").localCheckpoint(
        eager=True
    )
    a = h.select(F.col("media_id").alias("media_a"), F.col("phash").alias("ha"))
    b = h.select(F.col("media_id").alias("media_b"), F.col("phash").alias("hb"))
    truth = (
        a.crossJoin(b)
        .where(F.col("media_a") < F.col("media_b"))
        .where(F.bit_count(F.expr("ha ^ hb")) <= max_hamming)
        .select("media_a", "media_b")
        .localCheckpoint(eager=True)
    )
    cand = phash_near_duplicates(
        media, bands=bands, band_bits=band_bits, max_hamming=max_hamming
    ).select("media_a", "media_b")
    hits = truth.join(cand, ["media_a", "media_b"], "left_semi")
    return (
        truth.agg(F.count(F.lit(1)).cast("long").alias("n_true"))
        .crossJoin(cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates")))
        .crossJoin(hits.agg(F.count(F.lit(1)).cast("long").alias("n_hits")))
        .select(
            "n_true",
            "n_candidates",
            "n_hits",
            F.when(
                F.col("n_true") > 0,
                F.round(F.col("n_hits") / F.col("n_true"), 6),
            ).alias("recall"),
        )
    )
