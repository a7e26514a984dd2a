"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is a
deterministic stub (documented NotImplementedError fallback → fake decode),
but the Spark-side plumbing is real and tested: binary columns, typed
metadata structs, Arrow batch shape through mapInPandas, and partition-safe
batch iteration. Swapping `_fake_decode` for PIL/libav is a kernel-local
change; the plan does not move.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from .relational import load

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, "
    "channels int, mean_luma double"
)

_REAL_CODECS = False  # no PIL/cv2/libav in this container


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image decode.

    Real implementation would be PIL.Image.open(io.BytesIO(payload)); the
    container lacks codecs, so derive (width, height, channels, mean_luma)
    deterministically from the bytes. Raises NotImplementedError if callers
    request real decoding."""
    if not payload:
        return 0, 0, 0, 0.0
    width = 64 + payload[0] % 192
    height = 64 + payload[-1] % 128
    channels = 1 + payload[len(payload) // 2] % 3
    mean_luma = round(sum(payload[:256]) / min(len(payload), 256) / 255.0, 6)
    return width, height, channels, mean_luma


def decode_binary_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload column → typed metadata. Batch
    shape: one output row per input row; Arrow moves the binary column once."""
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            b = bytes(payload) if payload is not None else b""
            w, h, c, luma = _fake_decode(b)
            rows.append(
                {
                    "doc_id": doc_id,
                    "n_bytes": len(b),
                    "width": w,
                    "height": h,
                    "channels": c,
                    "mean_luma": luma,
                }
            )
        yield pd.DataFrame(
            rows,
            columns=["doc_id", "n_bytes", "width", "height", "channels", "mean_luma"],
        )


def decode_metadata(spark, sf_dir) -> DataFrame:
    """Treat document text bytes as an opaque media payload (the tables have
    no real media column) and run the full binary→metadata path."""
    d = load(spark, sf_dir, "documents")
    payloads = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return payloads.mapInPandas(decode_binary_batch, schema=DECODE_SCHEMA)


def frame_sample_plan(spark, sf_dir, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: deterministic 1-in-N sample keyed on doc_id
    (the video-frame analog: sample before decode, prune early)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.filter(F.pmod(F.col("doc_id"), F.lit(every_n)) == 0)
        .select("doc_id", F.length("text").alias("payload_len"))
    )
