"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` payload columns with typed metadata; all the
Spark-side machinery — schema, partition-friendly layout, Arrow-batched
mapInPandas UDFs with explicit output schemas, frame-sampling — is real
and tested. The actual codec step is STUBBED: this container has no
image/audio libraries, so `decode_media(..., real=True)` raises
NotImplementedError and the default path computes deterministic fake
features (byte length, md5 digest, metadata-derived dimensions) that an
ANSI-SQL oracle can reproduce. Swapping in PIL/torchaudio later only
replaces the inner pandas function — the distributed plan is unchanged.

Scale notes: payloads travel Arrow-batched through mapInPandas (one
python worker per partition, vectorized batches — never row-at-a-time);
at 100 TB the media table would be written partitioned by (kind,
bucket(media_id)) so decode jobs prune by modality and parallelize by
bucket without shuffling payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def synth_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from the documents table: the
    payload is the utf-8 bytes of the text (a stand-in blob), kind and
    dimensions come from hashes of the id. Lets every downstream test
    and oracle recompute expected features from the source text."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in KINDS]),
        (F.pmod(F.col(id_col), F.lit(3)) + 1).cast("int"),
    )
    width = (F.pmod(F.col(id_col) * 7, F.lit(1024)) + 16).cast("int")
    height = (F.pmod(F.col(id_col) * 13, F.lit(768)) + 16).cast("int")
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.create_map(
            F.lit("width"), width.cast("string"),
            F.lit("height"), height.cast("string"),
        ).alias("meta"),
    )


def _fake_decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for the codec: md5 + byte length + meta
    passthrough. Vectorized over the Arrow batch."""
    import hashlib

    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
            "digest": payloads.map(
                lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
            ),
            "width": pdf["meta"].map(
                lambda m: int(m["width"]) if m and "width" in m else None
            ),
            "height": pdf["meta"].map(
                lambda m: int(m["height"]) if m and "height" in m else None
            ),
        }
    )


def decode_media(media: DataFrame, real: bool = False) -> DataFrame:
    """Feature extraction over the media table via mapInPandas.

    real=True is the seam for an actual codec (PIL / torchaudio /
    pyav) — not available in this container, so it raises."""
    if real:
        raise NotImplementedError(
            "real media decoding requires image/audio codecs not present "
            "in this environment; plug a decoder into _fake_decode_batch's "
            "slot (same signature, same FEATURE_SCHEMA)"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_decode_batch(pdf)

    return media.mapInPandas(gen, FEATURE_SCHEMA)


def resize_plan(features: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (pure column math — the decode stub does not
    produce pixels, but the scale factors a resize job would apply are
    computable and testable): clamp the longest side to max_side,
    preserve aspect ratio."""
    scale = F.when(
        F.greatest("width", "height") <= max_side, F.lit(1.0)
    ).otherwise(F.lit(max_side) / F.greatest("width", "height").cast("double"))
    return features.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.round(scale, 6).alias("scale"),
        F.floor(F.col("width") * scale).cast("int").alias("out_width"),
        F.floor(F.col("height") * scale).cast("int").alias("out_height"),
    )


def sample_frames(
    media: DataFrame, every_n: int = 30, fps: int = 30, max_frames: Optional[int] = 16
) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per sampled
    frame index (explode of a sequence — no Python). Frame count is
    derived from payload size as a deterministic stand-in for container
    metadata."""
    n_frames = (F.length("payload") / F.lit(8)).cast("int") + 1
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    if max_frames is not None:
        idx = F.slice(idx, 1, max_frames)
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(idx).alias("frame_idx"),
        )
        .withColumn("ts_sec", F.round(F.col("frame_idx") / F.lit(float(fps)), 6))
    )
