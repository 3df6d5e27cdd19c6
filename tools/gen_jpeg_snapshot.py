"""Regenerate queries/_jpeg_snapshot.py: run media_jpeg_luma's Spark plan
at sf0.01 and freeze the rows as the snapshot oracle (the
media_gif_frames pattern — see tools/gen_semdedup_snapshot.py)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from custom_python_vectordb_spark import registry
from custom_python_vectordb_spark.session import get_spark


def main() -> None:
    registry.load_all()
    spark = get_spark("gen-jpeg-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    fn = getattr(registry.QUERIES["media_jpeg_luma"], "__wrapped__")
    rows = sorted(
        (int(r["doc_id"]), r["codec"], int(r["width"]), int(r["height"]),
         int(r["channels"]), float(r["mean_luma"]))
        for r in fn(spark, "/root/testdata/sf0.01").collect()
    )
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "custom_python_vectordb_spark", "queries", "_jpeg_snapshot.py",
    )
    with open(out, "w") as fh:
        fh.write('"""Frozen media_jpeg_luma snapshot at sf0.01 (round 9).\n\n'
                 "The JPEG pipeline is deterministic end-to-end (fixed pixel field ->\n"
                 "pure-NumPy baseline encode at quality 75 -> pure-NumPy decode), so the\n"
                 "sf0.01 rows freeze as an oracle literal; the decoded lumas carry the\n"
                 "DCT quantization error, which nothing but a correct encoder+decoder\n"
                 "pair reproduces. tests/test_multimodal_codecs.py recomputes and\n"
                 "asserts equality. Regenerate with tools/gen_jpeg_snapshot.py.\n"
                 '"""\n\n')
        fh.write("JPEG_LUMA_ROWS_SF001 = %r\n\n\n" % (rows,))
        fh.write(
            "def jpeg_luma_oracle_sql() -> str:\n"
            "    values = \", \".join(\n"
            "        \"(%d, %s, %d, %d, %d, %s)\" % (i, repr(c), w, h, ch, repr(l))\n"
            "        for i, c, w, h, ch, l in JPEG_LUMA_ROWS_SF001\n"
            "    )\n"
            "    return (\n"
            "        \"SELECT doc_id, codec, width, height, channels, \"\n"
            "        \"ROUND(CAST(mean_luma AS DOUBLE), 6) + 0.0 AS mean_luma FROM (VALUES \"\n"
            "        + values\n"
            "        + \") AS t(doc_id, codec, width, height, channels, mean_luma)\"\n"
            "    )\n"
        )
    print("wrote", out, len(rows), "rows")


if __name__ == "__main__":
    main()
