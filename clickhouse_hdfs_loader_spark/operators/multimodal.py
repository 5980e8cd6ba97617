"""Multimodal column plumbing ([EXT] — SURVEY §2.C / build brief).

Images/audio/video ride through the engine as opaque ``binary`` columns
plus typed metadata. The Spark-side machinery here is real and tested —
schema, Arrow batch shape, ``mapInPandas`` partitioned decode — while the
actual media decode is STUBBED (no image/audio libs in this container):
``decode_image_batch`` raises ``NotImplementedError`` unless
``fake=True``, in which case it derives deterministic metadata from the
bytes so the pipeline is end-to-end testable.

At scale: decode runs per-partition with Arrow transfer, so executor-side
libraries (Pillow/ffmpeg) would slot into ``_decode_one`` unchanged; the
binary column never passes through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = ("doc_id long, n_bytes int, width int, height int, "
                  "channels int, format string")


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach an opaque binary column (here: utf-8 bytes of the text —
    stand-in for image bytes) plus a content-type tag."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8")) \
               .withColumn("content_type", F.lit("image/fake"))


def _decode_one(payload: bytes, fake: bool) -> tuple[int, int, int, int, str]:
    if not fake:
        raise NotImplementedError(
            "real image decode requires Pillow/libvips — not available in "
            "this container; pass fake=True for deterministic stub decode")
    n = len(payload)
    # deterministic fake geometry derived from the byte length
    return n, 64 + n % 577, 64 + (n * 31) % 353, 3, "fake"


def decode_image_batch(docs: DataFrame, fake: bool = True,
                       id_col: str = "doc_id") -> DataFrame:
    """Per-partition Arrow-batched decode: binary payload → metadata rows."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_decode_one(p, fake) for p in pdf["payload"]]
            out = pd.DataFrame(meta, columns=["n_bytes", "width", "height",
                                              "channels", "format"])
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return (docs.select(id_col, "payload")
            .mapInPandas(_decode, schema=DECODED_SCHEMA))


def frame_sample(docs: DataFrame, every_n_bytes: int = 64,
                 id_col: str = "doc_id") -> DataFrame:
    """'Frame sampling' over the opaque payload: emit one row per sampled
    offset (stand-in for video frame extraction; shows the explode shape
    a real sampler would produce)."""
    return (docs
            .withColumn("n_bytes", F.length("payload"))
            .withColumn("frame_off", F.explode(
                F.sequence(F.lit(0), F.greatest(F.col("n_bytes") - 1, F.lit(0)),
                           F.lit(every_n_bytes))))
            .select(id_col, "frame_off",
                    F.substring(F.col("payload"), F.col("frame_off") + 1, 8)
                    .alias("frame_bytes")))
