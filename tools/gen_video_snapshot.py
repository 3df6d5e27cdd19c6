"""Regenerate queries/_video_snapshot.py: run media_video_frames's Spark
plan at sf0.01 and freeze the rows as the snapshot oracle (the
media_gif_frames / media_jpeg_luma pattern)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from custom_python_vectordb_spark import registry
from custom_python_vectordb_spark.session import get_spark


def main() -> None:
    registry.load_all()
    spark = get_spark("gen-video-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    fn = getattr(registry.QUERIES["media_video_frames"], "__wrapped__")
    rows = sorted(
        (int(r["doc_id"]), int(r["frame_idx"]), int(r["n_total_frames"]),
         int(r["width"]), int(r["height"]), float(r["fps"]),
         float(r["mean_luma"]))
        for r in fn(spark, "/root/testdata/sf0.01").collect()
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "custom_python_vectordb_spark", "queries", "_video_snapshot.py",
    )
    with open(out, "w") as fh:
        fh.write('"""Frozen media_video_frames snapshot at sf0.01 (round 9).\n\n'
                 "The MJPEG-in-AVI pipeline is deterministic end-to-end (fixed pixel\n"
                 "field -> baseline JPEG frames at q80 -> RIFF container -> container\n"
                 "walk -> JPEG decode -> frame luma), so the sf0.01 rows freeze as an\n"
                 "oracle literal; the lumas carry each frame's DCT quantization error.\n"
                 "tests/test_multimodal_codecs.py recomputes and asserts equality.\n"
                 "Regenerate with tools/gen_video_snapshot.py.\n"
                 '"""\n\n')
        fh.write("VIDEO_FRAMES_ROWS_SF001 = %r\n\n\n" % (rows,))
        fh.write(
            "def video_frames_oracle_sql() -> str:\n"
            "    values = \", \".join(\n"
            "        \"(%d, %d, %d, %d, %d, %s, %s)\" % (i, fi, n, w, h, repr(f), repr(l))\n"
            "        for i, fi, n, w, h, f, l in VIDEO_FRAMES_ROWS_SF001\n"
            "    )\n"
            "    return (\n"
            "        \"SELECT doc_id, frame_idx, n_total_frames, width, height, \"\n"
            "        \"ROUND(CAST(fps AS DOUBLE), 4) + 0.0 AS fps, \"\n"
            "        \"ROUND(CAST(mean_luma AS DOUBLE), 6) + 0.0 AS mean_luma FROM (VALUES \"\n"
            "        + values\n"
            "        + \") AS t(doc_id, frame_idx, n_total_frames, width, height, fps, mean_luma)\"\n"
            "    )\n"
        )
    print("wrote", out, len(rows), "rows")


if __name__ == "__main__":
    main()
