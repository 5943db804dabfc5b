"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The contract for image/audio/video at 100 TB: payloads travel as ``binary``
columns with a typed metadata struct alongside; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas functions over
``mapInPandas`` (the only place Python touches data in this package), sized
by ``spark.sql.execution.arrow.maxRecordsPerBatch``.

This container has no image/audio libraries, so the decode step is STUBBED:
``decode_media_meta`` tries a real decoder (PIL) and otherwise falls back to
a deterministic fake derived from the bytes.  The Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and tested; swap
``_decode_batch``'s fake branch for a real decoder on a cluster with the
libraries installed.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media column group: payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_bytes", BinaryType()),
        StructField(
            "media_meta",
            StructType(
                [
                    StructField("format", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_samples", LongType()),
                ]
            ),
        ),
    ]
)


def attach_fake_media(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministically synthesize a media payload column from text.

    Stand-in for a real binary ingest (the container has no media files):
    payload = UTF-8 bytes of the text; metadata derived from the byte length.
    Everything is reproducible in SQL, which is what lets the decode stub be
    oracle-checked end-to-end.
    """
    nbytes = F.octet_length(F.col(text_col))
    return df.withColumns(
        {
            "media_bytes": F.encode(F.col(text_col), "UTF-8"),
            "media_meta": F.struct(
                F.lit("fake/raw").alias("format"),
                (F.lit(16) + nbytes % 64).cast("int").alias("width"),
                (F.lit(16) + (nbytes / 7).cast("int") % 64).cast("int").alias("height"),
                (F.lit(1) + nbytes % 16).cast("int").alias("n_frames"),
                F.lit(16000).cast("int").alias("sample_rate"),
                (nbytes * 1000).cast("long").alias("n_samples"),
            ),
        }
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("size_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("decoder", StringType()),
    ]
)


def _decode_batch(batches: Iterator, id_name: str):  # pragma: no cover - executor side
    import pandas as pd

    try:
        from PIL import Image  # noqa: F401

        decoder = "pil"
    except ImportError:
        decoder = "fake"

    for pdf in batches:
        payload = pdf["media_bytes"]
        sizes = payload.map(len)
        if decoder == "pil":
            # Real path (unused in this container): open bytes, read size.
            import io

            dims = payload.map(lambda b: Image.open(io.BytesIO(b)).size)
            width = dims.map(lambda s: s[0])
            height = dims.map(lambda s: s[1])
        else:
            # Deterministic fake decode from the byte stream itself.
            width = 16 + sizes % 64
            height = 16 + (sizes // 7) % 64
        yield pd.DataFrame(
            {
                "doc_id": pdf[id_name],
                "size_bytes": sizes.astype("int64"),
                "width": width.astype("int32"),
                "height": height.astype("int32"),
                "decoder": decoder,
            }
        )


def decode_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode media payloads to (size, width, height) via ``mapInPandas``.

    Arrow-batched; each batch is a pandas DataFrame with the binary column,
    so a real decoder processes thousands of payloads per Python call.
    The fake branch derives dimensions from byte length (SQL-reproducible for
    the oracle); the PIL branch is the real-cluster path.
    """
    cols = df.select(F.col(id_col), "media_bytes")
    return cols.mapInPandas(
        lambda it: _decode_batch(it, id_col), schema=_DECODE_SCHEMA
    )


_RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("out_bytes", BinaryType()),
        StructField("resizer", StringType()),
    ]
)


def _resize_batch(batches: Iterator, id_name: str, w: int, h: int):  # pragma: no cover
    import pandas as pd

    try:
        from PIL import Image

        resizer = "pil"
    except ImportError:
        resizer = "fake"

    for pdf in batches:
        if resizer == "pil":
            import io

            def _do(b):
                img = Image.open(io.BytesIO(b)).resize((w, h))
                out = io.BytesIO()
                img.save(out, format="PNG")
                return out.getvalue()

            out_bytes = pdf["media_bytes"].map(_do)
        else:
            # Deterministic fake: w*h 'pixels', each the byte at the
            # proportional source offset (nearest-neighbor over the stream).
            def _do(b):
                n = len(b)
                if n == 0:
                    return b""
                return bytes(b[(i * n) // (w * h)] for i in range(w * h))

            out_bytes = pdf["media_bytes"].map(_do)
        yield pd.DataFrame(
            {
                "doc_id": pdf[id_name],
                "out_width": w,
                "out_height": h,
                "out_bytes": out_bytes,
                "resizer": resizer,
            }
        )


def resize_images(
    df: DataFrame, id_col: str = "doc_id", *, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize image payloads to ``width×height`` via ``mapInPandas``.

    Arrow-batched like :func:`decode_media_meta`; the PIL branch is the real
    path, the fake branch emits a deterministic nearest-neighbor byte
    sample (same output size/shape as a real 1-byte-per-pixel resize, so
    downstream schema and batch-size behavior are exercised for real).
    """
    cols = df.select(F.col(id_col), "media_bytes")
    return cols.mapInPandas(
        lambda it: _resize_batch(it, id_col, width, height), schema=_RESIZE_SCHEMA
    )


def audio_chunks(
    df: DataFrame, *, chunk_ms: int = 1000, id_col: str = "doc_id"
) -> DataFrame:
    """Chunking plan for audio payloads: one row per fixed-length window.

    Pure JVM-side plumbing from the metadata (``sample_rate``,
    ``n_samples``): explodes chunk indices and emits sample offsets — the
    downstream chunk *decode/feature* step would be a ``mapInPandas`` over
    (payload, start, end) rows.  The last partial chunk is kept (its ``end``
    clips to ``n_samples``).
    """
    spc = (F.col("media_meta.sample_rate") * chunk_ms / 1000).cast("long")
    n_chunks = F.ceil(F.col("media_meta.n_samples") / spc).cast("int")
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index"),
        spc.alias("_spc"),
        F.col("media_meta.n_samples").alias("_ns"),
    ).select(
        id_col,
        "chunk_index",
        (F.col("chunk_index") * F.col("_spc")).alias("start_sample"),
        F.least((F.col("chunk_index") + 1) * F.col("_spc"), F.col("_ns")).alias(
            "end_sample"
        ),
    )


def sample_frames(df: DataFrame, every: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling plan for video payloads: one row per sampled frame.

    Pure JVM-side plumbing (no decode): explodes ``sequence(0, n_frames-1,
    every)`` from the metadata struct.  The downstream frame *decode* would
    be another ``mapInPandas`` over (payload, frame_index) rows.
    """
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col("media_meta.n_frames") - 1, F.lit(every))
        ).alias("frame_index"),
    )


_AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ahash", LongType()),
        StructField("hasher", StringType()),
    ]
)


def _ahash_batch(batches: Iterator, id_name: str):  # pragma: no cover - executor side
    import hashlib

    import pandas as pd

    try:
        from PIL import Image  # noqa: F401

        hasher = "pil"
    except ImportError:
        hasher = "fake"

    def pixels64(b: bytes):
        if hasher == "pil":
            import io

            img = Image.open(io.BytesIO(b)).convert("L").resize((8, 8))
            return list(img.getdata())
        # Deterministic fake "decode": 64 pseudo-pixels from the payload
        # digest — identical payloads hash identically (planted duplicate
        # media collide), and near-duplicate payloads do NOT (the fake
        # cannot model visual similarity; the PLUMBING — schema, batching,
        # banding join — is what this path exercises for real).
        d = hashlib.sha256(b).digest() + hashlib.sha256(b[::-1]).digest()
        return list(d[:64])

    def ahash(b: bytes) -> int:
        px = pixels64(b)
        mean = sum(px) / 64.0
        bits = 0
        for i, p in enumerate(px):
            if p > mean:
                bits |= 1 << i
        return bits - (1 << 64) if bits >= (1 << 63) else bits

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf[id_name],
                "ahash": pdf["media_bytes"].map(ahash).astype("int64"),
                "hasher": hasher,
            }
        )


def media_ahash(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit average perceptual hash per media payload (``mapInPandas``).

    The standard aHash recipe on the real path (PIL: grayscale 8×8
    downsample, bit per pixel above the mean — robust to rescaling and
    mild recompression); the fake path hashes payload digests so exact
    duplicate payloads still collide.  Arrow-batched like the other media
    stubs — the one sanctioned Python touchpoint.
    """
    cols = df.select(F.col(id_col), "media_bytes")
    return cols.mapInPandas(
        lambda it: _ahash_batch(it, id_col), schema=_AHASH_SCHEMA
    )


def media_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Near-duplicate media pairs: perceptual hash + the shared pigeonhole
    chunk join (``ops/dedup.py hamming_pairs`` — the same banding machinery
    text SimHash uses).  Returns ``(id_l, id_r, hamming)``; hashing is the
    only Python touchpoint, the candidate join is pure JVM."""
    from .dedup import hamming_pairs

    fp = media_ahash(df, id_col)
    return hamming_pairs(
        fp, id_col="doc_id", fp_col="ahash",
        max_hamming=max_hamming, max_bucket_size=max_bucket_size,
    )
