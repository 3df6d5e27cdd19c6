"""Z-order clustering: the interleave math matches a Python reference, and
the layout measurably prunes on BOTH interleaved dimensions where a
single-column sort prunes on one."""

from __future__ import annotations

from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.zorder import (
    file_minmax,
    write_zordered,
    zvalue,
)


def _py_z(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zvalue_matches_python_reference(spark):
    df = spark.range(0, 64).select(
        (F.col("id") % 8).alias("a"), F.floor(F.col("id") / 8).cast("long").alias("b")
    )
    rows = df.select(
        "a", "b", zvalue([F.col("a"), F.col("b")], bits=3).alias("z")
    ).collect()
    assert len(rows) == 64
    for r in rows:
        assert r["z"] == _py_z(r["a"], r["b"], 3), (r["a"], r["b"])
    # the curve is a bijection on the 8×8 grid
    assert sorted(r["z"] for r in rows) == list(range(64))


def _avg_coverage(minmax_rows, col: str, width: int) -> float:
    spans = [(r[f"max_{col}"] - r[f"min_{col}"] + 1) / width for r in minmax_rows]
    return sum(spans) / len(spans)


def test_layout_prunes_both_dimensions(spark, sf_small, tmp_path):
    ev = spark.read.parquet(f"{sf_small}/events.parquet").select(
        F.col("user_id").bitwiseAND(F.lit(63)).alias("ub"),
        F.floor("value").cast("long").bitwiseAND(F.lit(63)).alias("vb"),
    )
    z_path = str(tmp_path / "zorder")
    u_path = str(tmp_path / "by_user")
    write_zordered(ev, z_path, zvalue([F.col("ub"), F.col("vb")], bits=6), 16)
    ev.repartitionByRange(16, "ub").sortWithinPartitions("ub").write.parquet(u_path)

    z_mm = file_minmax(spark, z_path, ["ub", "vb"]).collect()
    u_mm = file_minmax(spark, u_path, ["ub", "vb"]).collect()
    assert len(z_mm) > 4 and len(u_mm) > 4

    # single-column sort: tight on ub, full-width on vb
    assert _avg_coverage(u_mm, "ub", 64) < 0.35
    assert _avg_coverage(u_mm, "vb", 64) > 0.8
    # z-order: narrow on BOTH → predicates on either dimension skip files
    assert _avg_coverage(z_mm, "ub", 64) < 0.6
    assert _avg_coverage(z_mm, "vb", 64) < 0.6

    # layout change never changes data
    assert (
        spark.read.parquet(z_path).groupBy().sum("ub", "vb").collect()
        == ev.groupBy().sum("ub", "vb").collect()
    )
