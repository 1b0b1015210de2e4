"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

Decode is REAL for the uncompressed formats — binary PPM (P6) images and
16-bit PCM WAV audio are parsed byte-for-byte with no codec library
(``decode_media``), and ``resize_images`` does true nearest-neighbor
resampling of PPM payloads.  Formats that genuinely require codecs absent
from this container (JPEG/PNG/MP3/video containers) still raise
``NotImplementedError`` — the honest stub — and ``fake_feature_extract``
remains the deterministic embedding stand-in so the Spark-side plumbing —
schema, batch shape, partitioning, UDF signature — is real and TESTED end
to end either way.

Scale notes: media blobs ride a ``binary`` column; the metadata/feature
pass is ``mapInPandas`` so each Arrow batch holds only
``spark.sql.execution.arrow.maxRecordsPerBatch`` rows (tune down for
multi-MB blobs to bound executor memory), and columns are pruned before
the UDF so only (id, media, kind) cross the Arrow boundary, never the
whole row.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("media", T.BinaryType(), True),  # opaque payload
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),  # typed metadata
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.FloatType()), False),
    ]
)


def pack_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from the documents corpus: the text
    bytes stand in for an encoded payload.  Kind/mime/dims derive from the
    id so tests are reproducible at any scale."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("media"),
        F.concat(F.lit("x-synthetic/"), kind).alias("mime"),
        F.when(kind == "image", (F.col(id_col) % 640 + 16).cast("int")).alias("width"),
        F.when(kind == "image", (F.col(id_col) % 480 + 16).cast("int")).alias("height"),
        F.when(kind != "image", (F.col(id_col) % 90000 + 1000).cast("int")).alias(
            "duration_ms"
        ),
    )


def encode_ppm(width: int, height: int, value: int) -> bytes:
    """Binary PPM (P6) with every RGB byte = value — a real, uncompressed
    image encoding that needs no codec library."""
    return b"P6\n%d %d\n255\n" % (width, height) + bytes([value % 256]) * (
        width * height * 3
    )


def encode_wav_pcm16(n_samples: int, rate: int, amplitude: int) -> bytes:
    """Canonical RIFF/WAVE, 16-bit PCM mono, constant-amplitude samples."""
    import struct

    data = struct.pack("<%dh" % n_samples, *([amplitude] * n_samples))
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_media(payload: bytes, kind: str) -> dict:
    """REAL decode for the uncompressed formats — binary PPM (P6) images
    and 16-bit PCM RIFF/WAVE audio — by direct byte parsing, no codec
    library.  Compressed/encoded formats (JPEG, PNG, MP3, video
    containers) raise NotImplementedError: those genuinely require codec
    libraries absent from this container."""
    import re
    import struct

    b = bytes(payload or b"")
    if b.startswith(b"P6"):
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
        if not m:
            raise ValueError("corrupt PPM header")
        w, h, _maxval = (int(x) for x in m.groups())
        raster = b[m.end() : m.end() + w * h * 3]
        if len(raster) != w * h * 3:
            raise ValueError("truncated PPM raster")
        return {
            "kind": "image",
            "width": w,
            "height": h,
            "mean_val": sum(raster) // len(raster) if raster else 0,
        }
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        pos, rate, bits, channels, data = 12, None, 16, 1, b""
        while pos + 8 <= len(b):
            cid = b[pos : pos + 4]
            sz = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
            body = b[pos + 8 : pos + 8 + sz]
            if cid == b"fmt ":
                fmt, channels, rate = struct.unpack("<HHI", body[:8])
                bits = struct.unpack("<H", body[14:16])[0]
                if fmt != 1:
                    raise NotImplementedError("compressed WAV needs a codec")
            elif cid == b"data":
                data = body
            pos += 8 + sz + (sz & 1)
        if rate is None or bits != 16:
            raise ValueError("unsupported WAV layout")
        n = len(data) // (channels * 2)
        samples = struct.unpack("<%dh" % (len(data) // 2), data)
        return {
            "kind": "audio",
            "rate": rate,
            "duration_ms": n * 1000 // rate,
            "mean_val": int(sum(samples) / len(samples)) if samples else 0,
        }
    raise NotImplementedError(
        f"decode of kind={kind!r} payload requires a codec library not "
        "present in this environment (only uncompressed PPM/PCM-WAV are "
        "natively parsed); use fake_feature_extract for plumbing tests"
    )


PACKED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("media", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), False),
    ]
)


def pack_media_encoded(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Media table whose image/audio payloads are REAL encoded bytes
    (binary PPM / PCM16 WAV) built from closed-form per-id parameters —
    so a decoder's output is independently checkable by id arithmetic:

    * image (id % 3 == 0): PPM (8 + id%9) × (6 + id%5), every byte id%251
    * audio (id % 3 == 1): WAV 8 kHz mono, 80·(1 + id%20) samples of
      constant amplitude id%1000 − 500 → duration 10·(1 + id%20) ms
    * video (id % 3 == 2): opaque synthetic bytes (codec genuinely absent)

    Column-pruned to the id before the Arrow boundary."""
    pruned = docs.select(F.col(id_col).cast("long").alias("media_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict = {"media_id": [], "kind": [], "media": [], "mime": []}
            for mid in pdf["media_id"]:
                mid = int(mid)
                k = ("image", "audio", "video")[mid % 3]
                if k == "image":
                    blob = encode_ppm(8 + mid % 9, 6 + mid % 5, mid % 251)
                    mime = "image/x-portable-pixmap"
                elif k == "audio":
                    blob = encode_wav_pcm16(80 * (1 + mid % 20), 8000, mid % 1000 - 500)
                    mime = "audio/wav"
                else:
                    blob = (b"\x00VID" + str(mid).encode()) * 4
                    mime = "video/x-synthetic"
                rows["media_id"].append(mid)
                rows["kind"].append(k)
                rows["media"].append(blob)
                rows["mime"].append(mime)
            yield pd.DataFrame(rows)

    return pruned.mapInPandas(run, PACKED_SCHEMA)


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("decoded", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("mean_val", T.LongType(), True),
    ]
)


def decode_stats(media: DataFrame) -> DataFrame:
    """mapInPandas decode pass over real payload bytes: parse PPM/WAV
    headers+rasters, emit typed stats; undecodable kinds get decoded=0
    instead of poisoning the batch."""
    pruned = media.select("media_id", "kind", "media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict = {k.name: [] for k in DECODE_SCHEMA.fields}
            for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["media"]):
                try:
                    d = decode_media(bytes(blob or b""), kind)
                except (NotImplementedError, ValueError, struct.error):
                    # unsupported codec OR corrupt/truncated payload (bad
                    # PPM header, short WAV fmt chunk, …) — either way this
                    # row gets decoded=0 instead of failing the Spark task
                    d = None
                rows["media_id"].append(int(mid))
                rows["kind"].append(kind)
                rows["decoded"].append(0 if d is None else 1)
                rows["width"].append(None if d is None else d.get("width"))
                rows["height"].append(None if d is None else d.get("height"))
                rows["duration_ms"].append(None if d is None else d.get("duration_ms"))
                rows["mean_val"].append(None if d is None else d.get("mean_val"))
            yield pd.DataFrame(rows).astype(
                {
                    "width": "Int32",
                    "height": "Int32",
                    "duration_ms": "Int32",
                    "mean_val": "Int64",
                }
            )

    return pruned.mapInPandas(run, DECODE_SCHEMA)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic pseudo-features: md5(payload) bytes → dim floats in
    [0, 1).  Stands in for an image/audio embedding model."""
    dg = hashlib.md5(payload or b"").digest()
    return [dg[i % 16] / 256.0 for i in range(dim)]


def extract_features(media: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """mapInPandas feature pass: (media_id, kind, media) → features.
    Column-prunes before the Arrow boundary; one output row per input row."""
    pruned = media.select("media_id", "kind", "media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real_decoder:
                pdf["media"].combine(pdf["kind"], decode_media)  # raises
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["media"].map(lambda b: len(b or b"")).astype("int64"),
                    "features": pdf["media"].map(_fake_features),
                }
            )

    return pruned.mapInPandas(run, FEATURE_SCHEMA)


def media_metadata(media: DataFrame) -> DataFrame:
    """JVM-side metadata projection (no UDF): byte length, md5-derived
    checksum, first payload byte — the columns a catalog/dedup pass needs."""
    return media.select(
        "media_id",
        "kind",
        F.octet_length("media").cast("long").alias("n_bytes"),
        F.md5("media").alias("checksum"),
        F.coalesce(
            F.conv(F.substring(F.hex("media"), 1, 2), 16, 10).cast("int"), F.lit(0)
        ).alias("first_byte"),
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame.

    The real decoder (av/ffmpeg) is absent, so the per-frame payload is a
    deterministic byte slice of the source blob — the Spark-side plumbing
    (duration-driven fan-out ratio, mapInPandas batch shape, one-to-many
    output) is exactly what the real decoder path uses."""
    pruned = media.where(F.col("kind") == "video").select(
        "media_id", "media", "duration_ms"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, blob, dur in zip(
                pdf["media_id"], pdf["media"], pdf["duration_ms"]
            ):
                blob = bytes(blob or b"")
                n_frames = max(1, int(dur or 0) // every_ms)
                for i in range(n_frames):
                    lo = (i * 16) % max(len(blob), 1)
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["frame"].append(blob[lo : lo + 16] or b"\x00")
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, FRAME_SCHEMA)


def resize_ppm(blob: bytes, width: int, height: int) -> bytes:
    """True nearest-neighbor resample of a binary PPM payload (numpy
    fancy-indexing, no codec library); re-encodes as PPM."""
    import re

    import numpy as np

    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", blob)
    if not m:
        raise NotImplementedError("resize of non-PPM images needs a codec")
    w, h, _ = (int(x) for x in m.groups())
    arr = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=m.end())
    arr = arr.reshape(h, w, 3)
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    out = arr[rows][:, cols]
    return b"P6\n%d %d\n255\n" % (width, height) + out.tobytes()


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize pass: REAL nearest-neighbor resampling for PPM
    payloads (resize_ppm); non-PPM formats raise through the honest codec
    stub.  Column-pruned mapInPandas, one output row per image."""
    pruned = media.where(F.col("kind") == "image").select("media_id", "media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media": pdf["media"].map(
                        lambda b: resize_ppm(bytes(b or b""), width, height)
                    ),
                }
            )

    return pruned.mapInPandas(run, pruned.schema)
