"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payloads plus a typed metadata struct —
the storage model a 100 TB multimodal corpus uses (payload bytes in
parquet, metadata columns for pruning). The Spark-side plumbing —
schema, Arrow-batched ``mapInPandas`` UDFs, batch shapes, partition
behavior — is real and tested; the codec step itself is stubbed
(image/audio libraries are not in this container) behind
``_decode_payload``: a clearly-marked deterministic fake, with the
real-library hook raising ``NotImplementedError``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("digest", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def synth_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents table
    (payload = utf-8 text bytes; metadata derived from doc_id) — lets
    the multimodal path run on the driver's fixtures."""
    mt = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("synthetic").alias("format"),
            (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
            (F.col("n_chars") * 10).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_payload(media_type: str, payload: bytes, use_real_codecs: bool = False) -> list[float]:
    """STUB: real decode requires PIL/librosa/av which are absent here.

    The deterministic fake derives an 8-dim feature from the payload
    digest, so the distributed plumbing is fully exercised and results
    are reproducible.
    """
    if use_real_codecs:
        raise NotImplementedError(
            "real image/audio/video codecs are not available in this environment; "
            "plug PIL/librosa/av into _decode_payload here"
        )
    d = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in d[:8]]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas keeps the binary payloads off the driver and processes
    them partition-local in Arrow batches — the correct shape for
    payloads that are MBs each at 100 TB total.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(mt, pl)
                for mt, pl in zip(pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "payload_bytes": [len(p or b"") for p in pdf["payload"]],
                    "digest": [hashlib.md5(p or b"").hexdigest() for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled timestamp
    (decode stubbed; timestamps computed JVM-side from metadata)."""
    video = media.where(F.col("media_type") == "video")
    return video.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
    )


def _resize_payload(payload: bytes, w: int, h: int, use_real_codecs: bool = False) -> bytes:
    """STUB: real resize needs PIL, absent here. The deterministic
    fake is content-addressed (digest + target dims) so tests verify
    the distribution plumbing end-to-end."""
    if use_real_codecs:
        raise NotImplementedError(
            "real image codecs are not available in this environment; "
            "plug PIL.Image.resize into _resize_payload here"
        )
    return b"RESIZED:%dx%d:" % (w, h) + hashlib.md5(payload or b"").digest()


def resize_images(media: DataFrame, width: int, height: int, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched image resize: image rows get a new payload and
    updated meta dims; non-image rows pass through untouched.

    Same scale shape as extract_features — payloads never leave the
    executors, Arrow batches bound memory, output schema is identical
    to the input (so resize composes with any downstream media op).
    """

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_payload, out_meta = [], []
            for mt, pl, meta in zip(pdf["media_type"], pdf["payload"], pdf["meta"]):
                m = dict(meta) if meta is not None else {}
                if mt == "image":
                    out_payload.append(_resize_payload(pl, width, height))
                    m["width"], m["height"] = width, height
                else:
                    out_payload.append(pl)
                out_meta.append(m)
            pdf = pdf.assign(payload=out_payload, meta=out_meta)
            yield pdf

    return media.mapInPandas(do_resize, MEDIA_SCHEMA)
