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


# ---------------------------------------------------------------------------
# real image codecs (pure Python/numpy — no PIL needed): 24-bit
# uncompressed BMP (BI_RGB, bottom-up) and binary PPM (P6). These are
# the two classic header-plus-raw-pixels formats, decodable from their
# public specs; JPEG/PNG/audio/video still route to the documented
# NotImplementedError hook below.
# ---------------------------------------------------------------------------

import struct as _struct


def encode_bmp(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB array as a 24-bit BI_RGB BMP
    (bottom-up rows, BGR byte order, rows padded to 4 bytes)."""
    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    img_size = (row + pad) * h
    header = _struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = _struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        body += px[y, :, ::-1].tobytes()  # RGB -> BGR
        body += b"\x00" * pad
    return header + info + bytes(body)


def decode_image(payload: bytes):
    """Decode a BMP (24-bit BI_RGB) or PPM (P6) payload to an
    (H, W, 3) uint8 RGB numpy array. Raises ValueError on anything
    else (callers fall back to the stub feature)."""
    import numpy as np

    if payload[:2] == b"BM":
        off, = _struct.unpack_from("<I", payload, 10)
        hdr_size, w, h, planes, bpp, comp = _struct.unpack_from("<IiiHHI", payload, 14)
        if bpp != 24 or comp != 0:
            raise ValueError(f"unsupported BMP: bpp={bpp} compression={comp}")
        bottom_up = h > 0
        h = abs(h)
        row = w * 3
        stride = row + ((-row) % 4)
        out = np.empty((h, w, 3), dtype=np.uint8)
        for i in range(h):
            y = (h - 1 - i) if bottom_up else i
            line = np.frombuffer(payload, dtype=np.uint8, count=row, offset=off + i * stride)
            out[y] = line.reshape(w, 3)[:, ::-1]  # BGR -> RGB
        return out
    if payload[:2] == b"P6":
        # header: "P6" <ws> width <ws> height <ws> maxval <single ws> raster
        pos, fields = 2, []
        while len(fields) < 3:
            while payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":  # comment to end of line
                pos = payload.index(b"\n", pos) + 1
                continue
            start = pos
            while not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # the single whitespace after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        return np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3).copy()
    raise ValueError("not a BMP/PPM payload")


def _image_feature(px) -> list[float]:
    """8-dim feature of a decoded image: per-channel means (RGB,
    normalized), dims, pixel count — every term has a closed form the
    DuckDB oracle recomputes analytically for generated fixtures."""
    h, w = px.shape[0], px.shape[1]
    means = px.reshape(-1, 3).mean(axis=0)
    return [
        float(means[0]) / 255.0,
        float(means[1]) / 255.0,
        float(means[2]) / 255.0,
        w / 256.0,
        h / 256.0,
        (w * h) / 65536.0,
        0.0,
        0.0,
    ]


def _decode_payload(media_type: str, payload: bytes, use_real_codecs: bool = False) -> list[float]:
    """Feature extraction: REAL decode for BMP/PPM image payloads
    (pure-Python codecs above); other formats are stubbed — the
    deterministic fake derives an 8-dim feature from the payload
    digest, so the distributed plumbing is fully exercised and results
    are reproducible. ``use_real_codecs=True`` makes non-BMP/PPM
    payloads raise instead of falling back (the PIL/librosa/av hook)."""
    if media_type == "image" and payload and payload[:2] in (b"BM", b"P6"):
        try:
            return _image_feature(decode_image(payload))
        except ValueError:
            pass  # magic-bytes false positive (e.g. text starting "BM") -> stub feature
    if use_real_codecs:
        raise NotImplementedError(
            "only BMP/PPM decode natively; plug PIL/librosa/av into "
            "_decode_payload here for JPEG/PNG/audio/video"
        )
    d = hashlib.md5(payload or b"").digest()
    return [b / 255.0 for b in d[:8]]


def synth_bmp_media(documents: DataFrame) -> DataFrame:
    """Deterministic REAL-BMP media derived from doc_id: pixel(x, y)
    channels are modular ramps — R=(id+x+y)%256, G=(id+y)%256,
    B=(id+x)%256, dims w=id%16+8, h=id%12+8 — so every statistic of
    the DECODED image has a closed form a SQL oracle can recompute
    analytically. The payloads are genuine 24-bit BMPs; the feature
    path exercises the real codec, not the digest stub."""
    import numpy as np

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                w, h = did % 16 + 8, did % 12 + 8
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                px = np.stack(
                    [
                        (did + x + y) % 256,  # R
                        np.broadcast_to((did + y) % 256, (h, w)),  # G
                        np.broadcast_to((did + x) % 256, (h, w)),  # B
                    ],
                    axis=-1,
                ).astype(np.uint8)
                rows.append(
                    {
                        "media_id": did,
                        "media_type": "image",
                        "payload": encode_bmp(px),
                        "meta": {"format": "bmp", "width": w, "height": h, "duration_ms": 0},
                    }
                )
            yield pd.DataFrame(rows)

    return documents.select("doc_id").mapInPandas(build, MEDIA_SCHEMA)


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


def resize_pixels(px, w: int, h: int):
    """Nearest-neighbor resize of an (H, W, 3) array to (h, w, 3) —
    numpy fancy-indexing, no PIL (the same pixel-center sampling PIL's
    NEAREST uses: src = floor((dst + 0.5) * scale))."""
    import numpy as np

    sh, sw = px.shape[0], px.shape[1]
    ys = np.minimum(((np.arange(h) + 0.5) * sh / h).astype(int), sh - 1)
    xs = np.minimum(((np.arange(w) + 0.5) * sw / w).astype(int), sw - 1)
    return px[ys][:, xs]


def _resize_payload(payload: bytes, w: int, h: int, use_real_codecs: bool = False) -> bytes:
    """REAL nearest-neighbor resize for BMP/PPM payloads (decode ->
    numpy index -> re-encode BMP). Other formats: deterministic
    content-addressed fake so the distribution plumbing stays
    testable; ``use_real_codecs=True`` raises instead (the PIL hook)."""
    if payload and payload[:2] in (b"BM", b"P6"):
        return encode_bmp(resize_pixels(decode_image(payload), w, h))
    if use_real_codecs:
        raise NotImplementedError(
            "only BMP/PPM resize natively; plug PIL.Image.resize into "
            "_resize_payload here for JPEG/PNG"
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
