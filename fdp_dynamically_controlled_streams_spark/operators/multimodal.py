"""Multimodal columns: image/audio/video as opaque ``binary`` columns with a
typed metadata struct, processed via Arrow-batched ``mapInPandas``.

Scale design: media bytes ride the same partitions as their metadata (no
driver round-trips); decode/resize/feature-extract are per-partition
streaming transforms (``mapInPandas`` yields batch-by-batch, so a partition
never materializes fully in Python memory). At 100 TB the binary column is
typically a pointer (uri + byte-range) into object storage with the payload
fetched inside the UDF — the plumbing below is identical either way.

Codec reality in this container: no image/audio libraries are installed, so
real decoding is STUBBED — ``decode_image`` tries Pillow and raises
``NotImplementedError`` for real formats, while a deterministic in-repo fake
format ("DCSM": magic + width + height + channels + payload) exercises every
seam (schema, batching, partitioning, null handling) with real bytes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"DCSM"

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("content_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_intensity", T.DoubleType()),
        T.StructField("ok", T.BooleanType()),
    ]
)


def encode_fake_image(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    """Deterministic fake image: header + LCG-generated pixel payload."""
    n = width * height * channels
    payload = bytearray(n)
    x = (seed * 2654435761 + 12345) & 0xFFFFFFFF
    for i in range(n):
        x = (x * 1103515245 + 12345) & 0xFFFFFFFF
        payload[i] = (x >> 16) & 0xFF
    return _MAGIC + struct.pack("<HHB", width, height, channels) + bytes(payload)


def _decode_fake(buf: bytes) -> tuple[int, int, int, bytes] | None:
    if buf is None or len(buf) < 9 or buf[:4] != _MAGIC:
        return None
    w, h, c = struct.unpack_from("<HHB", buf, 4)
    payload = buf[9 : 9 + w * h * c]
    if len(payload) != w * h * c:
        return None
    return w, h, c, payload


def decode_image(buf: bytes) -> tuple[int, int, int, bytes]:
    """Decode one image payload. Fake DCSM format decodes in-repo; real
    formats require Pillow, which is intentionally not vendored here."""
    fake = _decode_fake(buf)
    if fake is not None:
        return fake
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real image decoding needs Pillow; only the DCSM fake format is "
            "available in this environment"
        ) from exc
    raise NotImplementedError("real-format decode path not wired yet")


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Test/demo helper: derive a deterministic media column per row — binary
    payload + metadata struct (the storage schema for multimodal tables)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            blobs = [
                encode_fake_image(8 + int(i) % 5, 6 + int(i) % 3, 3, seed=int(i))
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "content": blobs,
                    "content_type": ["application/x-dcsm"] * len(ids),
                    "n_bytes": [len(b) for b in blobs],
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
            T.StructField("content_type", T.StringType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )
    return docs.select(id_col).mapInPandas(gen, out_schema)


def decode_media(media: DataFrame) -> DataFrame:
    """Decode + feature-extract over (media_id, content) — the canonical
    mapInPandas shape: batch in, batch out, corrupt rows flagged not fatal."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                d = _decode_fake(bytes(buf)) if buf is not None else None
                if d is None:
                    rows.append((int(mid), None, None, None, None, None, False))
                else:
                    w, h, c, payload = d
                    # Exact integer truncation at 1e-6 instead of float round:
                    # bit-reproducible across engines (the DuckDB oracle twin
                    # computes the identical BIGINT quotient), no half-even vs
                    # half-away tie ambiguity.
                    n = len(payload)
                    mean = (sum(payload) * 1_000_000 // n) / 1e6 if n else 0.0
                    rows.append(
                        (int(mid), "application/x-dcsm", w, h, c, mean, True)
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.select("media_id", "content").mapInPandas(run, DECODED_SCHEMA)


_VMAGIC = b"DCSV"


def encode_fake_video(
    n_frames: int, width: int, height: int, channels: int = 3, seed: int = 0
) -> bytes:
    """Deterministic fake video: header + n_frames DCSM-payload frames."""
    frames = b"".join(
        encode_fake_image(width, height, channels, seed=seed * 1000 + f)[9:]
        for f in range(n_frames)
    )
    return _VMAGIC + struct.pack("<HHHB", n_frames, width, height, channels) + frames


def _decode_fake_video(buf: bytes):
    if buf is None or len(buf) < 11 or buf[:4] != _VMAGIC:
        return None
    n, w, h, c = struct.unpack_from("<HHHB", buf, 4)
    frame_len = w * h * c
    body = buf[11:]
    if len(body) != n * frame_len:
        return None
    return n, w, h, c, [body[i * frame_len : (i + 1) * frame_len] for i in range(n)]


def frame_sample(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """Sample every ``every_nth`` frame of a video column into image rows —
    the fan-out transform of a video pipeline (one input row -> k frame
    rows), as ``mapInPandas`` so frame extraction is per-partition streaming
    (a partition of videos never materializes all frames at once in Python).

    Output: (media_id, frame_no, content) where content is a standalone DCSM
    image — downstream decode/resize/feature ops compose unchanged.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frame_nos, blobs = [], [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                v = _decode_fake_video(bytes(buf)) if buf is not None else None
                if v is None:
                    continue
                _n, w, h, c, frames = v
                for fno in range(0, len(frames), every_nth):
                    ids.append(int(mid))
                    frame_nos.append(fno)
                    blobs.append(
                        _MAGIC + struct.pack("<HHB", w, h, c) + frames[fno]
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frame_nos, "content": blobs}
            )

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return media.select("media_id", "content").mapInPandas(run, schema)


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """'Resize' = nearest-neighbor re-sample of the fake payload — exercises
    binary-out transforms (new payload, updated metadata)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_blobs = [], []
            for mid, buf in zip(pdf["media_id"], pdf["content"]):
                d = _decode_fake(bytes(buf)) if buf is not None else None
                if d is None:
                    continue
                w, h, c, payload = d
                resized = bytearray()
                for y in range(height):
                    sy = min(int(y * h / height), h - 1)
                    for x in range(width):
                        sx = min(int(x * w / width), w - 1)
                        for ch in range(c):
                            resized.append(payload[(sy * w + sx) * c + ch])
                out_ids.append(int(mid))
                out_blobs.append(
                    _MAGIC + struct.pack("<HHB", width, height, c) + bytes(resized)
                )
            yield pd.DataFrame({"media_id": out_ids, "content": out_blobs})

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    return media.select("media_id", "content").mapInPandas(run, schema)
