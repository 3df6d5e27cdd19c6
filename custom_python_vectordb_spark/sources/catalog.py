"""Parquet catalog over the test-data star schema.

The reference keeps a directory per collection with hand-rolled binary
formats (``vectordb_optimized.py:282-331``, ``binary_persistence.py:39-193``);
here a collection IS a Parquet table — schema, stats and compression come
from the format, partition pruning and predicate pushdown from the reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# (session id, sf_dir, table) -> DataFrame. The catalog tables are immutable
# test fixtures, and `spark.read.parquet` costs a JVM schema-inference round
# trip (~90 ms) — with query builders calling load_table 2-3× per plan, the
# memo removes the dominant share of per-invocation plan-build latency.
# DataFrames are immutable, so sharing one instance across plans is safe.
_TABLE_MEMO: dict = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table (memoized per session+path). Column pruning + filter
    pushdown happen at this scan.

    `events.ts` has shipped as both Parquet TIMESTAMP(NANOS) (which the
    vectorized reader rejects → read nanos as long, downcast) and plain
    TIMESTAMP(MICROS) no-tz (which loads as TIMESTAMP_NTZ). Normalize both
    to the canonical microsecond TimestampType: event-time streaming
    (watermarks) requires TIMESTAMP, and the session tz is pinned UTC so
    the NTZ cast changes type, not instant.
    """
    from pyspark.sql import functions as F

    # applicationId (one cheap py4j call), not id(spark): CPython can reuse
    # a freed object's id for a NEW session, which would serve stale plans
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_MEMO.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            # integer `div`, not `/1000` — int64 nanos overflow a double's
            # 53-bit mantissa and would round every timestamp by ±1µs
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dict(df.dtypes).get("ts") == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    _TABLE_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
