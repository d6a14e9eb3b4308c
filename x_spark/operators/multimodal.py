"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Extensions beyond the reference (SURVEY §7 Phase E). Image/audio/video
payloads are carried as ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partitioning, Arrow-batched
``mapInPandas`` decode pipeline — is real and tested; the actual
codec call is stubbed (no image/audio libraries in this container)
behind ``DECODERS``, which maps modality -> callable(bytes) -> dict.
The default "fake" decoder is deterministic (derived from the payload
bytes) so the pipeline is testable end-to-end.

Scale notes: decode runs inside ``mapInPandas`` — Arrow batches, one
Python worker per core, no driver involvement; repartition upstream by
payload-size buckets when payloads are skewed (a few huge videos
otherwise stall a task). Metadata-only queries never touch the binary
column thanks to parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def _fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a real codec: shape fields derived
    from the payload bytes. Replace via DECODERS for real codecs."""
    n = len(payload)
    return {
        "width": (n % 640) + 1,
        "height": ((n * 7) % 480) + 1,
        "duration_ms": (n * 13) % 60_000,
    }


def _real_decode(payload: bytes) -> dict[str, Any]:  # pragma: no cover
    raise NotImplementedError(
        "real image/audio decoding requires codec libraries not present "
        "in this environment; register one in DECODERS"
    )


DECODERS: dict[str, Callable[[bytes], dict[str, Any]]] = {
    "image": _fake_decode,
    "audio": _fake_decode,
    "video": _fake_decode,
}


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media schema (payload =
    utf-8 bytes) — the test stand-in for a real binary ingest."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode("text", "UTF-8")).cast("bigint").alias("n_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction via mapInPandas.

    Each batch stays columnar until the per-payload decoder call; the
    output drops the payload column (pruned early at 100 TB scale).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for media_id, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                decoded = DECODERS[modality](payload)
                rows.append(
                    {
                        "media_id": int(media_id),
                        "modality": modality,
                        "n_bytes": len(payload),
                        "checksum": hashlib.md5(payload).hexdigest(),
                        "width": decoded["width"],
                        "height": decoded["height"],
                        "duration_ms": decoded["duration_ms"],
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media.mapInPandas(batches, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.LongType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("frame_sig", T.StringType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    timestamp (0, every_ms, ... < duration) — a row-EXPANDING
    mapInPandas stage, the shape a real video pipeline needs (decode
    once per input, emit many frames). The frame signature is the
    deterministic stub for a decoded-frame tensor; a real codec slots
    into the same loop. Batch size stays bounded because expansion is
    per-payload duration, not per-batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            rows = []
            for media_id, modality, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                if modality != "video":
                    continue
                payload = bytes(payload) if payload is not None else b""
                duration_ms = DECODERS[modality](payload)["duration_ms"]
                for i, ts in enumerate(range(0, duration_ms, every_ms)):
                    sig = hashlib.md5(payload + b"#" + str(i).encode()).hexdigest()
                    rows.append(
                        {
                            "media_id": int(media_id),
                            "frame_idx": i,
                            "ts_ms": ts,
                            "frame_sig": sig,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(batches, FRAME_SCHEMA)
