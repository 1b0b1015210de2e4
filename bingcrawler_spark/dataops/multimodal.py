"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

The decode libraries (PIL/ffmpeg/torchaudio) are not in this container, so
the decode step is STUBBED two ways (SURVEY-mandated pattern):

* ``decode_media`` raises ``NotImplementedError`` — the honest stub;
* ``fake_feature_extract`` is a deterministic stand-in (md5-seeded
  pseudo-features) so the Spark-side plumbing — schema, batch shape,
  partitioning, UDF signature — is real and TESTED end to end.

Scale notes: media blobs ride a ``binary`` column; the metadata/feature
pass is ``mapInPandas`` so each Arrow batch holds only
``spark.sql.execution.arrow.maxRecordsPerBatch`` rows (tune down for
multi-MB blobs to bound executor memory), and columns are pruned before
the UDF so only (id, media, kind) cross the Arrow boundary, never the
whole row.
"""

from __future__ import annotations

import hashlib
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


def decode_media(payload: bytes, kind: str):
    """Real decode (PIL.Image.open / av.open / soundfile.read) — the codec
    libraries are not installed in this container."""
    raise NotImplementedError(
        f"decode of kind={kind!r} requires a codec library not present in "
        "this environment; use fake_feature_extract for plumbing tests"
    )


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


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize pass — decode step honestly stubbed (no codec libs in
    this container): raises through decode_media when invoked on a real
    image; the plumbing (schema, pruning, batch shape) is in place."""
    pruned = media.where(F.col("kind") == "image").select("media_id", "media")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["media"]:
                decode_media(bytes(blob or b""), "image")  # raises
            yield pdf

    return pruned.mapInPandas(run, pruned.schema)
