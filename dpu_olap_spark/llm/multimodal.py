"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extract as Arrow-batched `mapInPandas` stages.

The container has no image/video codec libraries, so those decodes
are stubbed (deterministic fake derived from payload bytes; the real
library call raises NotImplementedError at the clearly marked seam).
AUDIO is real end-to-end since r17: an encode stage writes genuine
RIFF/WAVE 16-bit PCM containers with the stdlib ``wave`` module and
the decode stage parses them back with the ``wave`` reader — no
external package needed, byte-exact roundtrip pinned in
tests/test_llm_ops.py. Everything Spark-side is real and tested:
schema, binary columns, batch iteration, partitioning.

Scale notes: binary payloads ride in parquet as column chunks;
`mapInPandas` streams Arrow batches through Python with bounded memory
(spark.sql.execution.arrow.maxRecordsPerBatch). Metadata-only queries
never touch payload bytes thanks to column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dpu_olap_spark.registry import query
from dpu_olap_spark.sources.tables import load_table


def _with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a multimodal asset table from documents: utf-8 payload
    bytes + modality tag. Stands in for (path, bytes) image/audio rows."""
    docs = load_table(spark, sf_dir, "documents")
    modality = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        "doc_id",
        modality.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        (F.col("doc_id") % 16).cast("int").alias("shard"),
    )


@query(
    "mm_metadata",
    oracle="""
    SELECT
      doc_id,
      CASE
        WHEN doc_id % 3 = 0 THEN 'image'
        WHEN doc_id % 3 = 1 THEN 'audio'
        ELSE 'video'
      END AS modality,
      CAST(doc_id % 16 AS INT) AS shard,
      octet_length(encode(text)) AS n_bytes,
      md5(text) AS payload_fp
    FROM documents
    """,
)
def q_mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads (size, fingerprint, shard).
    The payload column itself is pruned out of the scan."""
    assets = _with_payload(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("payload_fp"))
    return (
        assets.select(
            "doc_id", "modality", "shard", F.octet_length("payload").alias("n_bytes")
        )
        .join(docs, "doc_id")
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("mean_byte", T.DoubleType(), True),
    ]
)

def _codecs_available() -> bool:
    """Capability probe, evaluated on the WORKER inside the decode
    stage (the executor environment is what matters, not the driver).
    Real image decode needs PIL; set SPARK_GRAFT_FORCE_FAKE_CODECS=1
    to pin the deterministic fake even where codecs exist (e.g. to
    keep byte-stable test fixtures)."""
    import importlib.util
    import os

    if os.environ.get("SPARK_GRAFT_FORCE_FAKE_CODECS"):
        return False
    return importlib.util.find_spec("PIL") is not None


def _real_decode(payload: bytes, modality: str) -> tuple[int, int, int, float]:
    """Rich-codec integration: PIL for images; video still needs
    pyav and keeps the explicit seam (audio decodes via the always-on
    stdlib ``wave`` path, not this probe). Selected automatically by
    the _codecs_available probe — no code change when the container
    gains the libraries."""
    if modality == "image":
        import io

        from PIL import Image

        with Image.open(io.BytesIO(payload)) as im:
            w, h = im.size
            px = list(im.convert("L").resize((8, 8)).getdata())
            return w, h, 1, round(sum(px) / max(1, len(px)), 4)
    raise NotImplementedError(
        "video decode needs pyav; not installed in this environment "
        "(images decode via PIL when present; audio decodes via the "
        "stdlib wave path unconditionally)"
    )


# --- real audio path: stdlib RIFF/WAVE, no external packages ---------------

_WAV_RATE = 8000  # Hz; fixed for the deterministic PCM synthesis


def _wav_payload(data: bytes) -> bytes:
    """A GENUINE WAV container (RIFF/WAVE header, mono, 16-bit PCM,
    8 kHz) written with the stdlib ``wave`` module: each source byte b
    becomes the PCM sample (b - 128) * 256, an exactly invertible
    mapping covering the full int16-aligned range."""
    import io
    import struct
    import wave as _wave

    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(_WAV_RATE)
        w.writeframes(
            struct.pack(f"<{len(data)}h", *((b - 128) * 256 for b in data))
        )
    return buf.getvalue()


def _decode_wav(payload: bytes) -> tuple[int, int, int, float]:
    """REAL audio decode via the stdlib ``wave`` reader: parses the
    RIFF/WAVE header (sample rate, channel count, sample width, frame
    count) and the PCM frames. Returns (sample_rate, bits_per_sample,
    n_frames, mean recovered byte) — the audio filling of the shared
    _DECODE_SCHEMA, where width carries the rate and height the bit
    depth."""
    import io
    import struct
    import wave as _wave

    with _wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        bits = w.getsampwidth() * 8
        n_frames = w.getnframes()
        raw = w.readframes(n_frames)
    samples = struct.unpack(f"<{n_frames * nch}h", raw)
    # exact inverse of _wav_payload's (b - 128) * 256 (floor division
    # is exact: every sample is a multiple of 256)
    recovered = [s // 256 + 128 for s in samples]
    mean = round(sum(recovered) / max(1, len(recovered)), 4)
    return rate, bits, n_frames, mean


def _fake_decode(payload: bytes, modality: str) -> tuple[int, int, int, float]:
    """Deterministic fake: dimensions derived from payload bytes — keeps
    the full Arrow/mapInPandas path testable without codecs."""
    w = 16 + payload[0] % 64 if payload else 0
    h = 16 + payload[1] % 64 if len(payload) > 1 else 0
    frames = 1 if modality == "image" else 1 + len(payload) % 32
    mean = float(sum(payload[:256])) / max(1, min(len(payload), 256))
    return w, h, frames, round(mean, 4)


_ASSET_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _encode_wav_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Container-encode stage: audio payloads become genuine WAV files
    (real ``wave`` writer); other modalities pass through unchanged.
    Chained ahead of the decode stage so the decode receives a real
    container to parse, not synthesized bytes."""
    for pdf in batches:
        pdf = pdf.copy()
        pdf["payload"] = [
            _wav_payload(bytes(p)) if m == "audio" else bytes(p)
            for m, p in zip(pdf["modality"], pdf["payload"])
        ]
        yield pdf


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    decode = _real_decode if _codecs_available() else _fake_decode
    for pdf in batches:
        out = {"doc_id": [], "modality": [], "width": [], "height": [], "n_frames": [], "mean_byte": []}
        for doc_id, modality, payload in zip(pdf["doc_id"], pdf["modality"], pdf["payload"]):
            if modality == "audio":
                w, h, fr, mean = _decode_wav(bytes(payload))
            else:
                w, h, fr, mean = decode(bytes(payload), modality)
            out["doc_id"].append(doc_id)
            out["modality"].append(modality)
            out["width"].append(w)
            out["height"].append(h)
            out["n_frames"].append(fr)
            out["mean_byte"].append(mean)
        yield pd.DataFrame(out)


@query("mm_decode")  # python decode stage -> rows-only check
def q_mm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract stage: two chained Arrow-batched
    mapInPandas stages over (doc_id, modality, payload).  AUDIO is a
    real codec path end-to-end: the first stage writes genuine
    RIFF/WAVE 16-bit PCM containers (stdlib ``wave`` writer), the
    second parses them back (``wave`` reader) — rate/bits/frames/mean
    from the actual container, byte-exact roundtrip pinned in
    tests/test_llm_ops.py.  Image/video keep the deterministic fake
    behind the _real_decode env-gate (no PIL/pyav in this container).
    Both stages fuse into one Spark stage (no shuffle between
    mapInPandas nodes)."""
    assets = _with_payload(spark, sf_dir)
    return (
        assets.select("doc_id", "modality", "payload")
        .mapInPandas(_encode_wav_batches, schema=_ASSET_SCHEMA)
        .mapInPandas(_decode_batches, schema=_DECODE_SCHEMA)
    )


@query(
    "mm_agg",
    oracle="""
    WITH assets AS (
      SELECT
        CASE
          WHEN doc_id % 3 = 0 THEN 'image'
          WHEN doc_id % 3 = 1 THEN 'audio'
          ELSE 'video'
        END AS modality,
        octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT modality,
           COUNT(*) AS n_assets,
           CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
           CAST(MAX(n_bytes) AS BIGINT) AS max_bytes
    FROM assets GROUP BY modality
    """,
)
def q_mm_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage accounting per modality — metadata-only aggregate."""
    assets = _with_payload(spark, sf_dir)
    return (
        assets.select("modality", F.octet_length("payload").alias("n_bytes"))
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").cast("bigint").alias("total_bytes"),
            F.max("n_bytes").cast("bigint").alias("max_bytes"),
        )
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_fp", T.StringType(), False),
    ]
)


def _sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """1:N expansion — every 'video' asset yields ceil(n_bytes/256)
    sampled frames, each fingerprinted from its byte slice. The
    deterministic stand-in for ffmpeg frame extraction."""
    import hashlib

    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_fp": []}
        for doc_id, modality, payload in zip(
            pdf["doc_id"], pdf["modality"], pdf["payload"]
        ):
            if modality != "video":
                continue
            data = bytes(payload)
            n_frames = max(1, (len(data) + 255) // 256)  # ceil: tail chunk included
            for i in range(n_frames):
                chunk = data[i * 256 : (i + 1) * 256]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_fp"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(out)


@query("mm_frame_sample")  # python 1:N stage -> rows-only check
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: mapInPandas emitting multiple rows per input
    asset (the shape of video frame extraction / audio chunking).
    Output cardinality is data-dependent — the iterator contract
    handles 1:N naturally; no exploding arrays through the driver."""
    assets = _with_payload(spark, sf_dir)
    return (
        assets.select("doc_id", "modality", "payload")
        .mapInPandas(_sample_frames, schema=_FRAME_SCHEMA)
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("resized_w", T.IntegerType(), False),
        T.StructField("resized_h", T.IntegerType(), False),
        T.StructField("thumb_fp", T.StringType(), False),
    ]
)

_TARGET = 32  # thumbnail long side


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake resize: dims from _fake_decode, aspect-
    preserving scale to a 32px long side, 'thumbnail' = md5 of a
    stride-sampled byte subset (stands in for PIL.Image.resize)."""
    import hashlib

    for pdf in batches:
        out = {k.name: [] for k in _RESIZE_SCHEMA.fields}
        for doc_id, modality, payload in zip(
            pdf["doc_id"], pdf["modality"], pdf["payload"]
        ):
            if modality != "image":
                continue
            data = bytes(payload)
            w, h, _fr, _mean = _fake_decode(data, modality)
            # clamp only the denominator: report decoded dims truthfully
            # (0x0 for empty payloads) but never divide by zero
            scale = _TARGET / max(w, h, 1)
            rw, rh = max(1, round(w * scale)), max(1, round(h * scale))
            stride = max(1, len(data) // (rw * rh))
            thumb = data[::stride][: rw * rh]
            out["doc_id"].append(doc_id)
            out["width"].append(w)
            out["height"].append(h)
            out["resized_w"].append(rw)
            out["resized_h"].append(rh)
            out["thumb_fp"].append(hashlib.md5(thumb).hexdigest())
        yield pd.DataFrame(out)


@query("mm_resize")  # python stage -> rows-only check
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image resize stage (aspect-preserving thumbnail): the remaining
    member of the decode / feature-extract / resize / frame-sample
    multimodal quartet. Same Arrow mapInPandas shape as mm_decode;
    swap _resize_batches' body for PIL when codecs are available."""
    assets = _with_payload(spark, sf_dir)
    return assets.select("doc_id", "modality", "payload").mapInPandas(
        _resize_batches, schema=_RESIZE_SCHEMA
    )
