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
