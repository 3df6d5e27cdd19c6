"""Container-invariant video dedup end to end: build small MJPEG clips,
box the SAME frames as AVI and as MP4 (a re-mux duplicate), add a
progressive-JPEG still and a distinct clip, then find the duplicate
pairs with sampled-frame dHashes + the banded Hamming join — and probe
the streaming-maintained index with a new clip before "ingesting" it.

    python examples/video_dedup_demo.py
"""

from __future__ import annotations

import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.multimodal import (
    decode_jpeg,
    encode_avi_mjpeg,
    encode_jpeg,
    encode_jpeg_progressive,
    encode_mp4_mjpeg,
    video_frame_hashes,
)
from custom_python_vectordb_spark.session import get_spark
from custom_python_vectordb_spark.streaming.media_maintenance import (
    load_video_pairs,
    process_video_batch,
)


def make_frames(seed: int, n: int = 3, h: int = 16, w: int = 24) -> list[bytes]:
    yy, xx = np.mgrid[0:h, 0:w]
    out = []
    for f in range(n):
        m = ((seed * 3 + f) * 73856093 + yy * 19349663 + xx * 83492791) % 2147483648
        v = (((m * m) // 65536) % 256).astype(np.uint8)
        out.append(encode_jpeg(np.repeat(v[:, :, None], 3, axis=2), 80))
    return out


def main() -> None:
    spark = get_spark("video-dedup-demo")
    spark.sparkContext.setLogLevel("ERROR")

    a_frames = make_frames(7)
    b_frames = make_frames(8)
    rows = [
        (1, bytearray(encode_avi_mjpeg(a_frames, 24, 16, fps=12))),  # original AVI
        (2, bytearray(encode_mp4_mjpeg(a_frames, 24, 16, fps=12))),  # re-muxed MP4 twin
        (3, bytearray(encode_avi_mjpeg(b_frames, 24, 16, fps=12))),  # distinct clip
    ]
    media = spark.createDataFrame(rows, "doc_id long, media binary")

    sigs = video_frame_hashes(media, 2).persist()
    print("per-frame dHash signatures:")
    for r in sigs.orderBy("doc_id", "frame_idx").collect():
        print("  ", r["doc_id"], "frame", r["frame_idx"],
              [r[f"dh{i}"] for i in range(4)])

    # banded candidates + every-slot verify (the media_video_phash_pairs plan)
    b = sigs.select(
        "doc_id", "frame_idx",
        F.posexplode(F.array("dh0", "dh1", "dh2", "dh3")).alias("band", "val"),
    )
    cands = (
        b.select(F.col("doc_id").alias("a"), "frame_idx", "band", "val")
        .join(b.select(F.col("doc_id").alias("b"), "frame_idx", "band", "val"),
              ["frame_idx", "band", "val"])
        .filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    ham = sum(
        F.bit_count(F.col(f"l.dh{i}").bitwiseXOR(F.col(f"r.dh{i}"))) for i in range(4)
    ).cast("long")
    pairs = (
        cands.join(sigs.alias("l"), cands["a"] == F.col("l.doc_id"))
        .join(sigs.alias("r"), (cands["b"] == F.col("r.doc_id"))
              & (F.col("l.frame_idx") == F.col("r.frame_idx")))
        .select("a", "b", ham.alias("h"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"), F.max("h").alias("max_ham"))
        .filter((F.col("n") == 2) & (F.col("max_ham") <= 3))
    )
    print("\nre-mux duplicate pairs (AVI <-> MP4, same frames):")
    for r in pairs.collect():
        print("  ", r["a"], "<->", r["b"], "max hamming", r["max_ham"])

    # progressive JPEG sanity: the still decodes identically either way
    still = np.repeat((np.arange(16 * 24, dtype=np.uint8).reshape(16, 24))[..., None], 3, 2)
    same = np.array_equal(
        decode_jpeg(encode_jpeg(still, 85))[3],
        decode_jpeg(encode_jpeg_progressive(still, 85))[3],
    )
    print("\nprogressive JPEG decodes pixel-identical to baseline:", same)

    # streaming index: ingest batch 0, then ask "is this new clip a dup?"
    with tempfile.TemporaryDirectory() as root:
        process_video_batch(media, 0, root)
        newcomer = spark.createDataFrame(
            [(9, bytearray(encode_mp4_mjpeg(b_frames, 24, 16, fps=12)))],
            "doc_id long, media binary",
        )
        process_video_batch(newcomer, 1, root)
        print("\nindex pairs after the MP4 re-mux of clip 3 arrives:")
        for r in load_video_pairs(spark, root).orderBy("a").collect():
            print("  ", r["a"], "<->", r["b"])

    sigs.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
