"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, processed by Arrow-batched pandas UDFs over ``mapInPandas``.

Decode is REAL for the formats stdlib can carry: binary PPM (P6) images,
16-bit PCM WAV audio, and 8-bit gray/truecolor non-interlaced PNG —
parsed byte-for-byte with no codec library (``decode_media``; the PNG
path does the chunk walk with CRC checks, zlib inflate, and all five
scanline unfilters), and ``resize_images`` does true nearest-neighbor
resampling of PPM payloads.  Formats that genuinely require codecs absent
from this container (JPEG/MP3/video containers, interlaced or >8-bit
PNG) still raise ``NotImplementedError`` — the honest stub — and
``fake_feature_extract`` remains the deterministic embedding stand-in so
the Spark-side plumbing — schema, batch shape, partitioning, UDF
signature — is real and TESTED end to end either way.

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    raster: bytes | None = None,
    value: int = 0,
    filter_type: int = 0,
) -> bytes:
    """REAL PNG writer — 8-bit truecolor (RGB), non-interlaced — using
    only stdlib zlib/struct (PNG's DEFLATE is the same inflate the WARC
    and PDF paths already use).  `filter_type` picks the scanline filter
    (0 none / 1 sub / 2 up / 3 average / 4 paeth) so the decoder's five
    unfilter paths are all exercisable; raster defaults to constant
    `value` bytes."""
    import struct
    import zlib

    stride = width * 3
    raster = (
        bytes(raster)
        if raster is not None
        else bytes([value % 256]) * (stride * height)
    )
    if len(raster) != stride * height:
        raise ValueError("raster size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = raster[y * stride : (y + 1) * stride]
        out.append(filter_type)
        if filter_type == 0:
            out += row
        elif filter_type == 1:  # sub
            out += bytes(
                (row[i] - (row[i - 3] if i >= 3 else 0)) & 255 for i in range(stride)
            )
        elif filter_type == 2:  # up
            out += bytes((row[i] - prev[i]) & 255 for i in range(stride))
        elif filter_type == 3:  # average
            out += bytes(
                (row[i] - (((row[i - 3] if i >= 3 else 0) + prev[i]) >> 1)) & 255
                for i in range(stride)
            )
        elif filter_type == 4:  # paeth
            out += bytes(
                (row[i] - _paeth(row[i - 3] if i >= 3 else 0, prev[i],
                                 prev[i - 3] if i >= 3 else 0)) & 255
                for i in range(stride)
            )
        else:
            raise ValueError("bad filter type")
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_raster(b: bytes) -> tuple[int, int, int, bytearray]:
    """8-bit gray/RGB non-interlaced PNG reader: chunk walk with CRC
    verification, zlib inflate, full five-filter scanline reconstruction
    (none/sub/up/average/paeth per the PNG spec §9).  Returns
    (width, height, bytes-per-pixel, reconstructed raster)."""
    import struct
    import zlib

    pos, w, h, ctype, idat = 8, None, None, None, []
    while pos + 12 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", b[pos + 8 + ln : pos + 12 + ln])
        if crc != zlib.crc32(typ + data) & 0xFFFFFFFF:
            raise ValueError("png chunk crc mismatch")
        if typ == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype not in (0, 2) or interlace:
                raise NotImplementedError(
                    "only 8-bit gray/truecolor non-interlaced PNG is parsed natively"
                )
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if w is None or not idat:
        raise ValueError("corrupt PNG: missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    bpp = 3 if ctype == 2 else 1
    stride = w * bpp
    if len(raw) != (stride + 1) * h:
        raise ValueError("truncated PNG raster")
    prev = bytearray(stride)
    out = bytearray()
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        if ft == 0:  # fast path: unfiltered scanline is a straight copy
            out += line
            prev = bytearray(line)
            continue
        cur = bytearray(stride)
        for i in range(stride):
            x = line[i]
            a = cur[i - bpp] if i >= bpp else 0
            u = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = x
            elif ft == 1:
                v = x + a
            elif ft == 2:
                v = x + u
            elif ft == 3:
                v = x + ((a + u) >> 1)
            elif ft == 4:
                v = x + _paeth(a, u, c)
            else:
                raise ValueError("bad PNG filter byte")
            cur[i] = v & 255
        out += cur
        prev = cur
    return w, h, bpp, out


def _decode_png(b: bytes) -> dict:
    w, h, _bpp, raster = _png_raster(b)
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "mean_val": sum(raster) // len(raster) if raster else 0,
    }


def decode_media(payload: bytes, kind: str) -> dict:
    """REAL decode with no codec library: binary PPM (P6) images, 16-bit
    PCM RIFF/WAVE audio, and 8-bit gray/RGB non-interlaced PNG (stdlib
    zlib inflate + full five-filter scanline reconstruction).  Formats
    that need codecs absent from this container (JPEG, MP3, video
    containers, exotic PNG layouts) raise NotImplementedError."""
    import re
    import struct

    b = bytes(payload or b"")
    if b.startswith(_PNG_SIG):
        return _decode_png(b)
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
    (binary PPM / PNG / PCM16 WAV) built from closed-form per-id
    parameters — so a decoder's output is independently checkable by id
    arithmetic, regardless of which container carried the pixels:

    * image (id % 3 == 0): (8 + id%9) × (6 + id%5), every RGB byte
      id%251 — alternating PPM and PNG containers (PNG arm cycles all
      five scanline filters), same arithmetic either way
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
                    # alternate PPM / PNG on the same closed-form params —
                    # the arithmetic oracle is format-blind; the PNG arm
                    # cycles all five scanline filters by id
                    if (mid // 3) % 2 == 0:
                        blob = encode_ppm(8 + mid % 9, 6 + mid % 5, mid % 251)
                        mime = "image/x-portable-pixmap"
                    else:
                        blob = encode_png(
                            8 + mid % 9,
                            6 + mid % 5,
                            value=mid % 251,
                            filter_type=(mid // 6) % 5,
                        )
                        mime = "image/png"
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
    """True nearest-neighbor resample of a binary PPM or truecolor PNG
    payload (numpy fancy-indexing, no codec library); re-encodes in the
    source container."""
    import re

    import numpy as np

    if blob.startswith(_PNG_SIG):
        w, h, bpp, raster = _png_raster(blob)
        if bpp != 3:
            raise NotImplementedError("resize of grayscale PNG not wired")
        arr = np.frombuffer(bytes(raster), dtype=np.uint8).reshape(h, w, 3)
        rows = (np.arange(height) * h) // height
        cols = (np.arange(width) * w) // width
        return encode_png(width, height, raster=arr[rows][:, cols].tobytes())
    m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", blob)
    if not m:
        raise NotImplementedError("resize of non-PPM/PNG images needs a codec")
    w, h, _ = (int(x) for x in m.groups())
    arr = np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=m.end())
    arr = arr.reshape(h, w, 3)
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    out = arr[rows][:, cols]
    return b"P6\n%d %d\n255\n" % (width, height) + out.tobytes()


def resize_images(media: DataFrame, width: int = 64, height: int = 64) -> DataFrame:
    """Image resize pass: REAL nearest-neighbor resampling for PPM and
    truecolor-PNG payloads (resize_ppm); other formats raise through the
    honest codec stub.  Column-pruned mapInPandas, one row per image."""
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


# ------------------------------------------------------- perceptual hashing


def encode_ppm_raster(width: int, height: int, raster: bytes) -> bytes:
    """Binary PPM (P6) from an explicit RGB raster."""
    if len(raster) != width * height * 3:
        raise ValueError("raster size mismatch")
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(raster)


def block_value(img_id: int, k: int) -> int:
    """Brightness of block k for image img_id: first md5 byte of
    '{img_id}-{k}' — full per-block entropy, so distinct images share a
    dHash only by a 2^-56 accident (an affine-in-position formula would
    give CONSTANT neighbor differences and collide en masse)."""
    import hashlib

    return hashlib.md5(f"{img_id}-{k}".encode()).digest()[0]


def block_raster(img_id: int, width: int, height: int, grid: int = 8) -> bytes:
    """Deterministic gray RGB raster that is piecewise-constant on a
    grid×grid block layout with md5-derived block brightness.  Because
    the pattern is exact on blocks, ANY resolution rendering of the
    same img_id downsamples to the identical 8×8 grid — which makes
    the perceptual hash of the whole decode path predictable in closed
    form (the DuckDB oracle recomputes every hash from the same md5
    arithmetic)."""
    bw, bh = width // grid, height // grid
    vals = [block_value(img_id, k) for k in range(grid * grid)]
    out = bytearray()
    for r in range(grid):
        row = b"".join(
            bytes((vals[r * grid + c],)) * (3 * bw) for c in range(grid)
        )
        out += row * bh
    return bytes(out)


def _image_raster(payload: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, bytes_per_pixel, raster) for PPM-P6 or native PNG."""
    import re

    b = bytes(payload or b"")
    if b.startswith(_PNG_SIG):
        return _png_raster(b)
    if b.startswith(b"P6"):
        m = re.match(rb"P6\s+(\d+)\s+(\d+)\s+(\d+)\s", b)
        if not m:
            raise ValueError("corrupt PPM header")
        w, h, _maxval = (int(x) for x in m.groups())
        raster = b[m.end() : m.end() + w * h * 3]
        if len(raster) != w * h * 3:
            raise ValueError("truncated PPM raster")
        return w, h, 3, raster
    raise NotImplementedError("dhash needs a PPM or native-PNG payload")


def dhash56(payload: bytes) -> int:
    """Difference hash (dHash, the standard perceptual image fingerprint):
    decode → nearest-neighbor 8×8 grayscale downsample (sample pixel
    ((r·h) div 8, (c·w) div 8), first channel — rasters here are gray) →
    56 bits, bit (r·7+c) set iff g[r][c] > g[r][c+1].  Scale/format
    invariant for block-aligned images: a 32×32 and a 64×64 rendering of
    the same scene hash identically."""
    w, h, bpp, raster = _image_raster(payload)
    g = [
        [raster[(((r * h) // 8) * w + (c * w) // 8) * bpp] for c in range(8)]
        for r in range(8)
    ]
    bits = 0
    for r in range(8):
        for c in range(7):
            if g[r][c] > g[r][c + 1]:
                bits |= 1 << (r * 7 + c)
    return bits


def dhash_media(media: DataFrame) -> DataFrame:
    """(media_id, media) → (media_id, dhash) via Arrow-batched
    mapInPandas — per-row, shuffle-free; only the 8-byte hash leaves
    the partition, never image bytes."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("dhash", T.LongType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "dhash": [dhash56(m) for m in b["media"]],
                }
            )

    return media.select("media_id", "media").mapInPandas(run, schema)


def image_neardup_pairs(
    hashes: DataFrame, max_hamming: int = 4, n_bands: int = 4
) -> DataFrame:
    """Perceptual near-dup pairs over (media_id, dhash): 56-bit dHash
    banded into n_bands 14-bit slices (pigeonhole over the hamming
    budget), candidates verified by bit_count(xor) — the image twin of
    dd_simhash_neardup, and the image-dedup pass a multimodal training
    pipeline runs after decode."""
    width = 56 // n_bands
    # both sides of the band self-join read this — persist, or the whole
    # upstream decode/hash pipeline recomputes per side
    hashes = hashes.persist()
    banded = hashes.select(
        F.col("media_id").alias("doc"),
        F.col("dhash").alias("fp"),
        F.posexplode(
            F.array(
                *[
                    (F.shiftright("dhash", b * width) % F.lit(1 << width)).cast(
                        "long"
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp")))
            .cast("int")
            .alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .where(F.col("hamming") <= max_hamming)
        .localCheckpoint(eager=True)  # materialize, then release the cache
    )
    hashes.unpersist()
    return out


def dhash_formula_sql(pid_expr: str) -> str:
    """Closed-form dHash of block_raster(pid): the arithmetic twin of
    encode→decode→downsample→dhash56, enabling an exact SQL oracle for
    the whole image path."""
    def g(k: int) -> str:
        return (
            f"('0x' || substr(md5(({pid_expr})::VARCHAR || '-{k}'), 1, 2))"
            f"::BIGINT"
        )

    terms = []
    for r in range(8):
        for c in range(7):
            terms.append(
                f"(CASE WHEN {g(r * 8 + c)} > {g(r * 8 + c + 1)}"
                f" THEN {1 << (r * 7 + c)} ELSE 0 END)"
            )
    return "(" + " + ".join(terms) + ")"


def image_neardup_sql(
    ids_sql: str, max_hamming: int = 4, n_bands: int = 4
) -> str:
    """DuckDB twin over an (media_id, pid) relation: recompute each
    image's dHash from the block formula, then the same band join."""
    width = 56 // n_bands
    return f"""
    WITH fp AS MATERIALIZED (
      SELECT media_id AS doc, {dhash_formula_sql('pid')}::BIGINT AS fp
      FROM ({ids_sql})
    ), banded AS (
      SELECT doc, fp, bi.band_idx,
             (fp >> (bi.band_idx * {width})) & {(1 << width) - 1} AS band_val
      FROM fp, (SELECT unnest(generate_series(0, {n_bands - 1})) AS band_idx) bi
    )
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
           bit_count(xor(a.fp, b.fp))::INT AS hamming
    FROM banded a JOIN banded b
      ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc < b.doc
    WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    """


# ------------------------------------------------------------ frame sample


def frame_sample(
    media: DataFrame,
    every: int = 24,
    header_bytes: int = 64,
    frame_bytes: int = 1024,
    fps: int = 24,
) -> DataFrame:
    """Video frame-sampling plumbing: expand each media row into the
    (frame_idx, byte_offset, ts_ms) rows a decoder would seek to when
    sampling every ``every``-th frame — the Spark-side half of a
    frame-extraction pipeline (the codec half is honestly stubbed in
    decode_media; offsets assume the fixed-size synthetic frame layout
    pack_media documents).  One JVM sequence-explode per row: the
    fan-out is n_frames/every, media bytes are never touched, so the
    shuffle carries only (media_id, idx) pairs if a downstream group
    needs them."""
    # n_frames = 0 (empty/corrupt video) must yield zero rows like the
    # DuckDB twin's range(0, 0, every) — unguarded, sequence(0, -1, every)
    # raises at runtime and kills the query on the first such row.
    idx_seq = F.when(
        F.col("n_frames") > 0,
        F.sequence(
            F.lit(0).cast("long"),
            F.col("n_frames").cast("long") - 1,
            F.lit(every).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return media.select(
        "media_id",
        F.explode(idx_seq).alias("frame_idx"),
    ).select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.lit(header_bytes) + F.col("frame_idx") * frame_bytes)
        .cast("long")
        .alias("byte_offset"),
        F.expr(f"div(frame_idx * 1000, {fps})").cast("long").alias("ts_ms"),
    )


def frame_sample_sql(
    media_sql: str,
    every: int = 24,
    header_bytes: int = 64,
    frame_bytes: int = 1024,
    fps: int = 24,
) -> str:
    return f"""
    WITH ex AS (
      SELECT media_id,
             unnest(range(0, n_frames, {every})) AS frame_idx
      FROM ({media_sql}))
    SELECT media_id, frame_idx::INT AS frame_idx,
           ({header_bytes} + frame_idx * {frame_bytes})::BIGINT AS byte_offset,
           (frame_idx * 1000 // {fps})::BIGINT AS ts_ms
    FROM ex
    """


# ---------------------------------------------------------- audio features

AUDIO_FEAT_SCHEMA = (
    "doc_id bigint, frame int, peak bigint, zcr bigint, rms_e4 bigint"
)


def encode_wav_samples(samples, rate: int = 8000) -> bytes:
    """RIFF/WAVE 16-bit PCM mono from an explicit sample sequence (the
    varying-waveform sibling of encode_wav_pcm16)."""
    data = struct.pack("<%dh" % len(samples), *samples)
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def pack_audio_frames(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic pseudo-waveform WAV corpus: doc d gets
    160·(1 + d%4) samples s_i = ((d+i)·37) mod 1024 − 512 — a closed
    form both engines can re-derive sample-exactly, with real sign
    structure so zero-crossing and RMS features are non-trivial."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            blobs = []
            for d in pdf[id_col]:
                d = int(d)
                i = np.arange(160 * (1 + d % 4), dtype=np.int64)
                s = (d + i) * 37 % 1024 - 512
                blobs.append(encode_wav_samples(s.tolist()))
            yield pd.DataFrame({"doc_id": pdf[id_col], "wav": blobs})

    return docs.select(id_col).mapInPandas(run, "doc_id bigint, wav binary")


def audio_features(media: DataFrame, frame_len: int = 160) -> DataFrame:
    """Per-frame audio features over real PCM-WAV bytes: peak amplitude,
    zero-crossing count (strict sign flips, frame-local), and RMS as e4
    fixed-point — the feature-extraction stage of an audio training-data
    pipeline (language/music/noise gates key off exactly these).

    Arrow-batched mapInPandas, numpy per batch, ZERO shuffle: frames are
    derived inside each task and only (doc, frame, 3 ints) leave — at
    100 TB of audio the payload bytes die with the scan task, the same
    contract as the WARC/WET readers."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            out = []
            for did, blob in zip(pdf["doc_id"], pdf["wav"]):
                b = bytes(blob)
                # minimal RIFF walk: find the data chunk
                pos, data = 12, b""
                while pos + 8 <= len(b):
                    cid = b[pos : pos + 4]
                    sz = struct.unpack("<I", b[pos + 4 : pos + 8])[0]
                    if cid == b"data":
                        data = b[pos + 8 : pos + 8 + sz]
                    pos += 8 + sz + (sz & 1)
                s = np.frombuffer(data, dtype="<i2").astype(np.int64)
                for f in range(len(s) // frame_len):
                    fr = s[f * frame_len : (f + 1) * frame_len]
                    rms = math.sqrt(float(np.mean(fr.astype(np.float64) ** 2)))
                    out.append(
                        (
                            int(did),
                            f,
                            int(np.max(np.abs(fr))),
                            int(np.sum(fr[:-1] * fr[1:] < 0)),
                            # half-away-from-zero to match SQL round()
                            int(math.floor(rms * 10_000 + 0.5)),
                        )
                    )
            yield pd.DataFrame(
                out, columns=["doc_id", "frame", "peak", "zcr", "rms_e4"]
            )

    return media.select("doc_id", "wav").mapInPandas(run, AUDIO_FEAT_SCHEMA)


def audio_features_sql(docs_sql: str, frame_len: int = 160) -> str:
    """DuckDB twin: re-derive every sample from the closed form and
    aggregate the same frame features.  The waveform LENGTH is the
    pack_audio_frames generator constant 160·(1+d%4) regardless of
    frame_len, and partial tail frames are dropped — mirroring the
    Python side's ``range(len(s) // frame_len)``."""
    return f"""
    WITH s AS (
      SELECT doc_id,
             unnest(range(0, 160 * (1 + doc_id % 4))) AS i
      FROM ({docs_sql})
    ), w AS (
      SELECT doc_id, (i // {frame_len})::INT AS frame, i,
             ((doc_id + i) * 37 % 1024 - 512)::BIGINT AS smp
      FROM s
      WHERE i < (160 * (1 + doc_id % 4) // {frame_len}) * {frame_len}
    ), lagged AS (
      SELECT doc_id, frame, smp,
             lag(smp) OVER (PARTITION BY doc_id, frame ORDER BY i) AS prev
      FROM w
    )
    SELECT doc_id, frame,
           max(abs(smp))::BIGINT AS peak,
           sum(CASE WHEN prev IS NOT NULL AND prev * smp < 0
                    THEN 1 ELSE 0 END)::BIGINT AS zcr,
           round(sqrt(avg((smp * smp)::DOUBLE)) * 10000)::BIGINT AS rms_e4
    FROM lagged GROUP BY doc_id, frame
    """
