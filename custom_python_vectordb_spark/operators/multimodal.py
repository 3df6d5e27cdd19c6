"""Multimodal (image/audio/video) columns for training-data pipelines.

Media are opaque BINARY columns with typed metadata. The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signatures, partitioning —
is real and tested; the actual codec step is STUBBED (this environment has
no image/audio libraries): `decode_media` uses a deterministic fake decoder
(pure arithmetic on the byte payload) and raises NotImplementedError if a
real codec is requested. Swapping in PIL/ffmpeg later changes only the
inner function, not the plan.

Scale notes: binary payloads ride the same Parquet scans as everything else
(column pruning skips them unless referenced); decode is mapInPandas so
bytes move driver-free, one Arrow batch at a time, and the output schema is
fixed so Catalyst can plan downstream joins/aggregations normally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def media_from_text(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary 'media' corpus from the documents table
    (payload = utf-8 bytes; media_type round-robins image/audio/video)."""
    return docs.select(
        F.col(id_col),
        F.col(text_col).cast("binary").alias("media"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("media_type"),
    )


def media_metadata(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, media_type, n_bytes, digest): cheap metadata extraction that
    never leaves the JVM."""
    return media.select(
        F.col(id_col),
        "media_type",
        F.octet_length("media").alias("n_bytes"),
        F.md5("media").alias("digest"),
    )


def fake_decode_dims(n_bytes: int) -> tuple[int, int, int]:
    """Deterministic fake decode: dims derived from payload length. The
    stand-in for a real `PIL.Image.open` — same signature, fake content."""
    return (n_bytes % 640 + 1, (n_bytes * 7) % 480 + 1, 3)


def decode_media(media: DataFrame, id_col: str = "doc_id", codec: str = "fake") -> DataFrame:
    """Arrow-batched decode → (id, width, height, channels).

    codec='fake' uses the deterministic stub; any real codec raises until
    the codec libraries exist in the runtime.
    """
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: no image/audio libraries in this environment; "
            "plug the real decoder into the mapInPandas body below"
        )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            lengths = pdf["media"].map(lambda b: len(b) if b is not None else 0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "width": lengths % 640 + 1,
                    "height": (lengths * 7) % 480 + 1,
                    "channels": 3,
                }
            )

    return media.select(id_col, "media").mapInPandas(
        decode, schema=f"{id_col} long, width int, height int, channels int"
    )


def resize_media(decoded: DataFrame, max_side: int = 256) -> DataFrame:
    """Proportional resize of decoded dims (metadata transform; the pixel
    op would live in the same mapInPandas as decode)."""
    scale = F.when(
        F.greatest("width", "height") > max_side,
        max_side / F.greatest("width", "height").cast("double"),
    ).otherwise(F.lit(1.0))
    return decoded.select(
        *[c for c in decoded.columns if c not in ("width", "height")],
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("width"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("height"),
    )


def frame_sample(media: DataFrame, n_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """'Video' frame sampling: n_frames evenly-spaced byte offsets per
    payload — the real op swaps byte offsets for frame timestamps."""
    return (
        media.filter(F.col("media_type") == "video")
        .select(
            F.col(id_col),
            F.octet_length("media").alias("n_bytes"),
            F.explode(F.sequence(F.lit(0), F.lit(n_frames - 1))).alias("frame_idx"),
        )
        .select(
            id_col,
            "frame_idx",
            (F.col("frame_idx") * F.col("n_bytes") / n_frames).cast("long").alias("byte_offset"),
        )
    )


def media_features(media: DataFrame, dimensions: int = 64, id_col: str = "doc_id") -> DataFrame:
    """Feature extraction stub: deterministic mock embedding of the payload
    digest (the real extractor replaces the digest→vector step)."""
    from custom_python_vectordb_spark.functions.embeddings import mock_embedder_udf

    return media.select(
        F.col(id_col), mock_embedder_udf(dimensions)(F.md5("media")).alias("features")
    )
