"""Perceptual image dedup end to end: encode a small corpus with the
pure-Python PPM/BMP/PNG/JPEG codecs (including a re-encoded + resized
twin and a JPEG re-compression), hash every payload (dHash + aHash),
find near-dup pairs with the banded Hamming join, and extract the real
8x8 luma-grid visual descriptor.

    python examples/image_dedup_demo.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from custom_python_vectordb_spark.operators.dedup import perceptual_hash_pairs
from custom_python_vectordb_spark.operators.multimodal import (
    encode_bmp,
    encode_jpeg,
    encode_png,
    encode_ppm,
    image_features,
    image_perceptual_hashes,
)
from custom_python_vectordb_spark.session import get_spark


def make_image(seed: int, h: int = 16, w: int = 72) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    m = (seed * 73856093 + yy * 19349663 + xx * 83492791) % 2147483648
    v = (((m * m) // 65536) % 256).astype(np.uint8)
    return np.repeat(v[:, :, None], 3, axis=2)


def main() -> None:
    spark = get_spark("image-dedup-demo")
    spark.sparkContext.setLogLevel("ERROR")

    base = make_image(7)
    rows = [
        (1, bytearray(encode_ppm(base))),                     # original
        (2, bytearray(encode_bmp(base))),                     # codec swap
        (3, bytearray(encode_png(np.repeat(np.repeat(base, 2, 0), 2, 1)))),  # 2x resize
        (4, bytearray(encode_jpeg(base, quality=95))),        # lossy re-compress
        (5, bytearray(encode_ppm(make_image(8)))),            # distinct image
        (6, bytearray(encode_ppm(make_image(9)))),            # distinct image
    ]
    media = spark.createDataFrame(rows, "doc_id long, media binary")

    hashes = image_perceptual_hashes(media)
    print("signatures (dHash bands):")
    hashes.select("doc_id", "dh0", "dh1", "dh2", "dh3").orderBy("doc_id").show()

    pairs = perceptual_hash_pairs(hashes, max_hamming=3, extra_prefixes=("ah",))
    print("near-dup pairs (1-2 codec swap, 1-3 resize, 1-4 JPEG, and their closure):")
    pairs.orderBy("a", "b").show()

    feats = image_features(media)
    print("visual descriptor (first 6 of 64 grid lumas):")
    for r in feats.orderBy("doc_id").collect():
        print(r["doc_id"], [round(v, 1) for v in r["features"][:6]])

    spark.stop()


if __name__ == "__main__":
    main()
