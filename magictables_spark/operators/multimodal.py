"""Multimodal columns — image/audio/video as opaque binary + typed
metadata (mandated extension, SURVEY §2.C).

Design: media rides in a ``binary`` column with a sibling metadata
struct (mime, width/height/duration, source uri). Ingest uses Spark's
``binaryFile`` reader (path/length/modificationTime/content). Decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages — the ONLY sane shape for Python media libs on
a cluster: one Python worker per partition, binary batches cross via
Arrow, no per-row pickling.

Decode is REAL for PNG, BMP, WAV and baseline JPEG via pure-stdlib
codecs (``media_codecs.py``: struct/zlib PNG unfiltering, ``wave``
PCM parsing, T.81 Huffman+IDCT JPEG — no external media library
needed); formats that genuinely require a codec library (MP3/MP4 full
decode, where ffmpeg would plug into the kernel) yield ``ok=False``.
``decode_stub=True`` switches to a deterministic md5-seeded fake
embedding for plumbing-only tests.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "path string, length bigint, content binary, mime string"
)
FEATURE_SCHEMA = (
    "path string, mime string, n_bytes bigint, feature array<float>, "
    "ok boolean, decoded boolean"
)

_EXT_MIME = {
    ".png": "image/png",
    ".bmp": "image/bmp",
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
    ".wav": "audio/wav",
    ".mp3": "audio/mpeg",
    ".mp2": "audio/mpeg",
    ".mpa": "audio/mpeg",
    ".mp4": "video/mp4",
    ".bin": "application/octet-stream",
}


def read_media(spark: SparkSession, path_glob: str) -> DataFrame:
    """Ingest media files as binary rows via the binaryFile source.
    Partition sizing: binaryFile splits by file, so
    spark.sql.files.maxPartitionBytes governs batch memory — at 100 TB
    set it so a partition of images fits the Python worker (e.g. 64 MB)."""
    from pyspark.sql import functions as F

    df = spark.read.format("binaryFile").load(path_glob)
    ext = F.lower(F.regexp_extract("path", r"(\.[A-Za-z0-9]+)$", 1))
    mime_map = F.create_map(*[F.lit(x) for kv in _EXT_MIME.items() for x in kv])
    return df.select(
        "path",
        "length",
        "content",
        F.coalesce(mime_map[ext], F.lit("application/octet-stream")).alias("mime"),
    )


def _feature_kernel(decode_stub: bool, dim: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from magictables_spark.operators.media_codecs import (
            UnsupportedMediaError,
            media_features_ex,
        )

        for pdf in batches:
            feats, oks, decs = [], [], []
            for content, mime in zip(pdf["content"], pdf["mime"]):
                if content is None:
                    feats.append(None)
                    oks.append(False)
                    decs.append(False)
                    continue
                if decode_stub:
                    # deterministic fake embedding: md5-seeded floats from
                    # the bytes — exercises the exact schema/batch path a
                    # real model would use, without decoding
                    h = hashlib.md5(bytes(content)).digest()
                    feats.append([((h[i % 16] / 255.0) - 0.5) for i in range(dim)])
                    oks.append(True)
                    decs.append(False)
                    continue
                # real decode: pure-stdlib PNG/BMP/WAV/JPEG codecs plus
                # MPEG-1 Layer I/II PCM (media_codecs.py); corrupt
                # bytes or formats needing a codec library (MP3 Layer
                # III / H.264 -> ffmpeg plugs in HERE) must yield
                # ok=False, never a task failure — at 100 TB a bad
                # file cannot kill the job
                try:
                    vec, dec = media_features_ex(bytes(content), mime, dim)
                    feats.append(vec)
                    oks.append(True)
                    # per-FILE provenance: Layer I/II audio really
                    # decodes (PCM stats); Layer III / MP4 rows are
                    # container metadata
                    decs.append(dec)
                except UnsupportedMediaError:
                    feats.append(None)
                    oks.append(False)
                    decs.append(False)
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["content"].map(lambda c: 0 if c is None else len(c)),
                    "feature": feats,
                    "ok": oks,
                    "decoded": decs,
                }
            )

    return run


def extract_features(media: DataFrame, dim: int = 8, decode_stub: bool = False) -> DataFrame:
    """Binary -> feature vectors through Arrow-batched mapInPandas.
    Real PNG/WAV decode by default; ``decode_stub=True`` for
    plumbing-only deterministic fake features."""
    return media.mapInPandas(_feature_kernel(decode_stub, dim), schema=FEATURE_SCHEMA)


PHASH_SCHEMA = "path string, mime string, phash long, ok boolean"


def image_phash(media: DataFrame) -> DataFrame:
    """Binary image column -> 63-bit perceptual hash (pHash: 32x32
    DCT low-frequency signs, media_codecs.phash64) through
    Arrow-batched mapInPandas. Non-images and broken bytes yield
    ok=False rows, never task failures."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from magictables_spark.operators.media_codecs import (
            UnsupportedMediaError,
            decode_image_gray,
            phash64,
        )

        for pdf in batches:
            hashes, oks = [], []
            for content, mime in zip(pdf["content"], pdf["mime"]):
                try:
                    if content is None:
                        raise UnsupportedMediaError("null content")
                    hashes.append(phash64(decode_image_gray(bytes(content), mime)))
                    oks.append(True)
                except UnsupportedMediaError:
                    hashes.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "mime": pdf["mime"],
                    "phash": pd.array(hashes, dtype="Int64"),
                    "ok": oks,
                }
            )

    return media.mapInPandas(kernel, schema=PHASH_SCHEMA)


def phash_neardup(
    hashes: DataFrame, max_hamming: int = 6, n_bands: int = 9, band_bits: int = 7
) -> DataFrame:
    """EXACT near-duplicate image pairs by pHash Hamming distance:
    band the 63-bit hash into n_bands bit-slices, exchange on (band,
    key) -- by pigeonhole two hashes within Hamming max_hamming <
    n_bands share at least one identical band, so the banded join has
    ZERO false negatives -- then verify candidates with a JVM-side
    bit_count(a XOR b). At 100 TB: one hash-partition exchange on the
    band keys (each row emits n_bands small rows), candidate volume
    bounded by real near-dup density plus 2^-band_bits random band
    collisions; no all-pairs anywhere. Returns (path_a, path_b,
    hamming), path_a < path_b."""
    from pyspark.sql import functions as F

    if max_hamming >= n_bands:
        raise ValueError(
            f"banding is only exact for max_hamming < n_bands "
            f"({max_hamming} >= {n_bands})"
        )
    h = hashes.filter(F.col("ok")).select("path", "phash")
    mask = (1 << band_bits) - 1
    bands = h.select(
        "path",
        "phash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {n_bands - 1}), "
                f"i -> struct(i AS band, shiftright(phash, i * {band_bits}) & {mask} AS key))"
            )
        ).alias("b"),
    ).select("path", "phash", "b.band", "b.key")
    left = bands.select(
        "band", "key", F.col("path").alias("path_a"), F.col("phash").alias("ha")
    )
    right = bands.select(
        "band", "key", F.col("path").alias("path_b"), F.col("phash").alias("hb")
    )
    return (
        left.join(right, ["band", "key"])
        .filter(F.col("path_a") < F.col("path_b"))
        .select("path_a", "path_b", F.expr("bit_count(ha ^ hb)").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Binary audio column -> 56-bit spectral fingerprint
    (media_codecs.afp56: log-band -20 dB occupancy over the whole-clip
    spectrum -- shift / gain / rate invariant) through Arrow-batched
    mapInPandas. Same output schema as image_phash so phash_neardup's
    banded Hamming join serves both modalities."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from magictables_spark.operators.media_codecs import (
            UnsupportedMediaError,
            afp56,
            decode_audio_pcm,
        )

        for pdf in batches:
            hashes, oks = [], []
            for content, mime in zip(pdf["content"], pdf["mime"]):
                try:
                    if content is None:
                        raise UnsupportedMediaError("null content")
                    samples, rate = decode_audio_pcm(bytes(content), mime)
                    hashes.append(afp56(samples, rate))
                    oks.append(True)
                except UnsupportedMediaError:
                    hashes.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "mime": pdf["mime"],
                    "phash": pd.array(hashes, dtype="Int64"),
                    "ok": oks,
                }
            )

    return media.mapInPandas(kernel, schema=PHASH_SCHEMA)
