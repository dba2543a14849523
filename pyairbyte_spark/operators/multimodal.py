"""Multimodal column plumbing: binary payloads + typed metadata.

Treats image/audio/video as opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, partition-preserving
``mapInPandas`` with Arrow batches, UDF signatures, batch shapes — is
real and tested; the actual media decode is STUBBED (image/audio libs
are not in this environment): ``decode_stub=True`` produces a
deterministic fake feature vector derived from the payload hash, and
``decode_stub=False`` raises ``NotImplementedError`` at the seam where
a real decoder (PIL/ffmpeg) plugs in.

At 100 TB: payloads stay in parquet binary columns (or external object
storage with path columns); ``mapInPandas`` streams Arrow batches so
one task never materializes more than
``spark.sql.execution.arrow.maxRecordsPerBatch`` payloads at a time.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Literal

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "media_meta",
            T.StructType(
                [
                    T.StructField("mime_type", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source_uri", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 8


def attach_media_meta(
    df: DataFrame, payload_col: str, *, mime_type: str, id_col: str
) -> DataFrame:
    """Wrap a binary column with the typed metadata struct."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(mime_type).alias("mime_type"),
            F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.concat(F.lit("inline://"), F.col(id_col).cast("string")).alias("source_uri"),
        ).alias("media_meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder's feature vector:
    FEATURE_DIM floats derived from the payload's sha256."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    media_df: DataFrame,
    *,
    kind: Literal["image", "audio", "video"] = "image",
    decode_stub: bool = True,
    decoder: "Callable[[bytes], list[float]] | None" = None,
) -> DataFrame:
    """payload → feature vector via Arrow-batched ``mapInPandas``.

    Output: (media_id, n_bytes, content_sha256, features array<double>).

    ``decoder`` is the real-decode seam: any picklable
    ``bytes → list[float]`` callable (e.g. PIL decode + embed for
    images, torchaudio for audio) runs inside the same Arrow-batched
    executor loop the stub uses — identical partitioning, batch shape
    and memory bounds. With ``decode_stub=False`` and no decoder the
    call fails fast instead of silently faking features.
    """
    if decoder is None:
        if not decode_stub:
            raise NotImplementedError(
                f"real {kind} decoding requires media libraries not present "
                "in this environment; pass decoder= (any bytes -> list[float] "
                "callable, e.g. PIL/torchaudio/ffmpeg based) to run a real "
                "decode with the same batch-iterator plumbing"
            )
        decoder = _fake_features

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_bytes", T.LongType(), True),
            T.StructField("content_sha256", T.StringType(), True),
            T.StructField("features", T.ArrayType(T.DoubleType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:  # one Arrow batch at a time — bounded memory
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "content_sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "features": payloads.map(
                        lambda b: list(decoder(b)) if b is not None else None
                    ),
                }
            )

    return media_df.mapInPandas(batches, out_schema)


def frame_sample_plan(
    media_df: DataFrame, *, every_n: int = 10
) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx) rows
    for a downstream decoder — pure plan, no decode. Demonstrates the
    explode pattern that fans one payload into N decode tasks."""
    n_frames = (F.col("media_meta.n_bytes") / 1000).cast("int") + 1  # stub: 1 frame/KB
    return media_df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def audio_chunk_plan(
    media_df: DataFrame, *, chunk_seconds: int = 30, bytes_per_second: int = 32_000
) -> DataFrame:
    """Audio chunking plumbing: (media_id, chunk_idx, start_s, end_s)
    rows for a downstream decoder. Duration is stubbed from the payload
    size at 16 kHz / 16-bit mono; a real prober plugs in at the same
    column. Like frame sampling, this is the fan-out explode — a 3-hour
    podcast and a 5-second clip parallelize identically downstream."""
    dur = (F.col("media_meta.n_bytes") / bytes_per_second).cast("int") + 1
    chunk = F.explode(
        F.sequence(F.lit(0), dur - 1, F.lit(chunk_seconds))
    ).alias("start_s")
    return media_df.select("media_id", dur.alias("duration_s"), chunk).select(
        "media_id",
        (F.col("start_s") / chunk_seconds).cast("long").alias("chunk_idx"),
        F.col("start_s").cast("long").alias("start_s"),
        F.least(F.col("start_s") + chunk_seconds, F.col("duration_s"))
        .cast("long")
        .alias("end_s"),
    )


def resize_plan(
    media_df: DataFrame,
    *,
    width: int,
    height: int,
    decode_stub: bool = True,
    resizer: "Callable[[bytes, int, int], bytes] | None" = None,
) -> DataFrame:
    """Image resize plumbing via Arrow-batched ``mapInPandas``.

    Output: (media_id, width, height, resized_sha256, resized_bytes).
    The stub emits a deterministic pseudo-payload (sha256 of the
    original payload + target dims, sized w·h·3). ``resizer`` is the
    real-decode seam: a picklable ``(payload, width, height) → bytes``
    callable (PIL's ``Image.open(...).resize(...)`` wrapped) runs in
    the same Arrow batch loop; output columns are then the sha256 and
    length of the REAL resized bytes.
    """
    if resizer is None and not decode_stub:
        raise NotImplementedError(
            "real image resize requires PIL/pillow, not present in this "
            "environment; pass resizer= ((bytes, w, h) -> bytes) to run a "
            "real resize with the same batch plumbing"
        )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("resized_sha256", T.StringType(), True),
            T.StructField("resized_bytes", T.LongType(), True),
        ]
    )

    def _stub_resize(payload: bytes) -> tuple[str, int]:
        seed = hashlib.sha256(payload + f"|{width}x{height}".encode()).hexdigest()
        return seed, width * height * 3

    def _real_resize(payload: bytes) -> tuple[str, int]:
        out = resizer(payload, width, height)
        return hashlib.sha256(out).hexdigest(), len(out)

    do_resize = _stub_resize if resizer is None else _real_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = pdf["payload"].map(
                lambda b: do_resize(b) if b is not None else (None, None)
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "resized_sha256": resized.map(lambda t: t[0]),
                    "resized_bytes": resized.map(lambda t: t[1]),
                }
            )

    return media_df.mapInPandas(batches, out_schema)
