"""Beyond-parity relational operators the platform gives for free (SURVEY.md
§2.5 note): as-of join, rollup grouping, distinct aggregation, range join.
All additive over the same tables, all oracle-checked (DuckDB has native
ASOF JOIN and ROLLUP)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from custom_python_vectordb_spark.operators.asof import asof_join_backward
from custom_python_vectordb_spark.queries.spine import _t
from custom_python_vectordb_spark.registry import query
from custom_python_vectordb_spark.functions.local_relation import local_df


@query("asof_join_purchase_view", """
WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
p AS (SELECT event_id, ts, user_id FROM ev WHERE event_type = 'purchase'),
v AS (SELECT event_id AS view_id, ts, user_id FROM ev WHERE event_type = 'view')
SELECT p.event_id, p.user_id, v.view_id AS asof_view_id,
       CASE WHEN v.ts IS NOT NULL THEN epoch_us(p.ts) - epoch_us(v.ts) END AS gap_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
""")
def asof_join_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of: each purchase ← the user's most recent prior view.
    Union-sort-window composition vs DuckDB's native ASOF JOIN."""
    ev = _t(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts", "user_id")
    right = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    out = asof_join_backward(left, right, key="user_id", right_cols=["view_id"])
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_view_id"),
        F.when(
            # parquet `timestamp[us]` (no tz) loads as TIMESTAMP_NTZ, which
            # unix_micros rejects; session tz is pinned UTC so the cast is a
            # pure type change (same instant, same micros as the oracle's
            # epoch_us on naive timestamps)
            F.col("asof_ts").isNotNull(),
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("asof_ts").cast("timestamp")),
        ).alias("gap_us"),
    )


@query("rollup_orders", """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderstatus,
       COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY ROLLUP(CAST(year(o_orderdate) AS INTEGER), o_orderstatus)
""")
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (year → status → grand total)."""
    return (
        _t(spark, sf_dir, "orders")
        .rollup(F.year("o_orderdate").alias("o_year"), F.col("o_orderstatus"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query("distinct_users_per_type", """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
""")
def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (at 100 TB prefer approx_count_distinct —
    mergeable HLL sketch, no second shuffle)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@query("shipping_priority", """
SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(year(o_orderdate) AS INTEGER) AS o_year
FROM customer JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, year(o_orderdate)
ORDER BY revenue DESC, l_orderkey LIMIT 10
""")
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: segment filter → 3-way join → revenue top-k.
    customer scales with SF, so its join carries no broadcast hint — AQE
    broadcasts the segment-filtered side while it fits and shuffles
    beyond; lineitem never shuffles before the partial agg either way."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_year")
    )


@query("regional_volume", """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""")
def regional_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: 6-way join with a local-supplier equality. The
    fixed-size dimensions (nation 25 rows, region 5 — TPC-H constants at
    every SF) are broadcast-hinted; customer/supplier SCALE with SF, so
    their joins are left to AQE (broadcast while small, shuffle beyond);
    lineitem⋈orders is the only unavoidably big join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query("json_props_avg", """
SELECT event_type,
       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k,
       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events WHERE json_extract_string(props, '$.k') IS NOT NULL
GROUP BY event_type
""")
def json_props_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: JSON path extraction + numeric aggregation
    (the reference keeps metadata as open dicts; ours rides JSON columns)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .filter(F.col("k").isNotNull())
        .groupBy("event_type")
        .agg(F.round(F.avg("k"), 6).alias("avg_k"), F.max("k").alias("max_k"))
    )


@query("cube_orders", """
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, o_orderpriority,
       COUNT(*) AS n
FROM orders
GROUP BY CUBE(CAST(year(o_orderdate) AS INTEGER), o_orderpriority)
""")
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping — all subtotal combinations across two dimensions."""
    return (
        _t(spark, sf_dir, "orders")
        .cube(F.year("o_orderdate").alias("o_year"), F.col("o_orderpriority"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("events_moving_avg", """
WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, value FROM events)
SELECT event_id, user_id,
       ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mavg
FROM ev WHERE user_id < 5
""")
def events_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-row window analytics: per-user 3-event moving average."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id", "user_id", F.round(F.avg("value").over(w), 6).alias("mavg")
    )


@query("pivot_event_counts", """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
FROM events WHERE user_id < 20 GROUP BY user_id
""")
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event-type columns per user (groupBy().pivot() — map-side
    combined, one shuffle)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .fillna(0)
    )


@query("range_join_value_buckets", """
WITH buckets(lbl, lo, hi) AS (VALUES ('low', 0.0, 25.0), ('mid', 25.0, 75.0), ('high', 75.0, 1e12))
SELECT b.lbl, COUNT(*) AS n, ROUND(AVG(e.value), 6) AS avg_value
FROM events e JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.lbl
""")
def range_join_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (interval) join against a tiny bucket dimension —
    BroadcastNestedLoopJoin with the bucket side broadcast."""
    buckets = local_df(
        spark,
        [("low", 0.0, 25.0), ("mid", 25.0, 75.0), ("high", 75.0, 1e12)],
        "lbl string, lo double, hi double",
    )
    ev = _t(spark, sf_dir, "events")
    joined = ev.join(
        F.broadcast(buckets), (ev.value >= buckets.lo) & (ev.value < buckets.hi)
    )
    return joined.groupBy("lbl").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("value"), 6).alias("avg_value")
    )


# ------------------------------------------------- partition-local ANN index

def _partitioned_snapshot_oracle():
    from custom_python_vectordb_spark.queries._partitioned_snapshot import (
        knn_partitioned_oracle_sql,
    )

    return knn_partitioned_oracle_sql()


def _recall_snapshot_oracle():
    from custom_python_vectordb_spark.queries._partitioned_snapshot import (
        recall_oracle_sql,
    )

    return recall_oracle_sql()


@query("knn_partitioned", _partitioned_snapshot_oracle, oracle_sf="sf0.01")
def knn_partitioned_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW-analog accelerator (operators/partitioned.py): per-partition
    NumPy IVF built inside mapInPandas, deterministic via modulo sharding
    + lowest-id-seeded k-means. An approximate partition-shaped result has
    no engine-independent SQL statement, but it IS bit-deterministic
    (asserted across runs and session configs in tests), so the r5
    snapshot oracle freezes the sf0.01 result rows as literals
    (queries/_partitioned_snapshot.py — the pq_kmeans_recall trick):
    hash-checked by the driver instead of rows-only; a pytest recomputes
    and asserts snapshot equality so drift fails locally first."""
    from custom_python_vectordb_spark.operators.partitioned import knn_partitioned
    from custom_python_vectordb_spark.queries.spine import _query_vectors

    emb = _t(spark, sf_dir, "embeddings")
    qpd = _query_vectors(spark, sf_dir, 5).toPandas()
    out = knn_partitioned(emb, qpd, k=10, n_cells=16, nprobe=6)
    return out.withColumn("dist", F.round("dist", 6) + F.lit(0.0))


@query("recall_partitioned_vs_exact", _recall_snapshot_oracle, oracle_sf="sf0.01")
def recall_partitioned_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the partition-local index vs exact kNN ground truth —
    the reference's quality-gate methodology for its accelerators
    (benchmark_quantization.py:874-928). tests/test_partitioned.py asserts
    >= 0.9."""
    from custom_python_vectordb_spark.operators.knn import knn
    from custom_python_vectordb_spark.operators.partitioned import knn_partitioned
    from custom_python_vectordb_spark.queries.spine import _query_vectors

    emb = _t(spark, sf_dir, "embeddings")
    queries = _query_vectors(spark, sf_dir, 5)
    approx = knn_partitioned(emb, queries.toPandas(), k=10, n_cells=16, nprobe=6).select(
        "qid", "vec_id"
    )
    truth = knn(emb, queries, k=10).select("qid", "vec_id")
    hits = truth.join(approx, ["qid", "vec_id"]).groupBy("qid").agg(
        F.count(F.lit(1)).alias("n")
    )
    return hits.agg(F.round(F.avg("n") / 10.0, 6).alias("avg_recall"))


@query("salted_join_type_stats", """
WITH dim AS (SELECT event_type, AVG(value) AS type_avg FROM events GROUP BY event_type)
SELECT e.event_id, e.event_type, ROUND(e.value - d.type_avg, 6) + 0.0 AS deviation
FROM events e JOIN dim d ON e.event_type = d.event_type
""")
def salted_join_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe enrichment join (operators/skew.py): `event_type` is the
    canonical hot key (5 values over the whole fact table), so a plain
    shuffle join puts ~1/5 of the table on one reducer. The salted join
    spreads each type over 16 reducers; the oracle proves the result is
    row-identical to the plain join. (At this dim size broadcast would win;
    the salt path is the template for dims too big to broadcast.)"""
    from custom_python_vectordb_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(F.avg("value").alias("type_avg"))
    out = salted_join(ev, dim, "event_type", salts=16, salt_source="event_id")
    return out.select(
        "event_id", "event_type",
        (F.round(F.col("value") - F.col("type_avg"), 6) + F.lit(0.0)).alias("deviation"),
    )


@query("salted_distinct_users", """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users FROM events GROUP BY event_type
""")
def salted_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count under skew via two-phase salted aggregation
    (operators/skew.py): phase 1 collects per-(type, salt-of-user) partial
    sets — each reducer sees 1/16 of the hot type — phase 2 merges by type.
    Salting BY the distinct target keeps each user in exactly one bucket,
    so the merge is exact (same answer as `distinct_users_per_type`,
    skew-proof plan)."""
    from custom_python_vectordb_spark.operators.skew import salted_agg

    return salted_agg(
        _t(spark, sf_dir, "events"),
        "event_type",
        partial_aggs={"part_users": F.collect_set("user_id")},
        final_aggs={
            "n_users": F.size(F.array_distinct(F.flatten(F.collect_list("part_users")))).cast("long")
        },
        salts=16,
        salt_source="user_id",
    )


@query("copurchase_top_pairs", """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT la.l_partkey AS a, lb.l_partkey AS b, COUNT(*) AS cnt
FROM op la JOIN op lb ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey
GROUP BY la.l_partkey, lb.l_partkey
ORDER BY cnt DESC, a, b LIMIT 20
""")
def copurchase_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item co-occurrence (the "customers also bought" primitive):
    self-join baskets on order key, count part pairs, top 20. Scale note:
    per-order pair count is quadratic in basket size, but baskets are
    bounded (≤7 lineitems/order in this schema; real carts are similarly
    capped) so the explode is linear in orders; the pair aggregation
    combines map-side before the one shuffle. A pathological hot item pair
    is exactly what operators/skew.py's salted_agg handles."""
    op = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    la = op.select("l_orderkey", F.col("l_partkey").alias("a"))
    lb = op.select("l_orderkey", F.col("l_partkey").alias("b"))
    return (
        la.join(lb, "l_orderkey")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(20)
    )


@query("event_transitions", """
WITH seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
)
SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""")
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral funnel: Markov transition counts between
    consecutive event types (lead() over a per-user time order with a
    unique event_id tie-break). One shuffle keyed by user_id for the
    window, one for the 5×5 transition aggregate — both skew-tolerant
    (user activity is the partition key, type pairs combine map-side)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    )
    return (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query("purchases_with_recent_views", """
WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type FROM events),
p AS (SELECT event_id, ts, user_id FROM ev WHERE event_type = 'purchase'),
v AS (SELECT ts, user_id FROM ev WHERE event_type = 'view')
SELECT p.event_id, p.user_id, COUNT(v.ts) AS n_recent_views
FROM p LEFT JOIN v
  ON p.user_id = v.user_id AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
GROUP BY p.event_id, p.user_id
""")
def purchases_with_recent_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal interval join: every view in the hour before each purchase
    (the as-of join's sibling — ALL matches in the window, not the latest).
    Batch form of the stream-stream interval join
    (tests/test_streaming.py::test_stream_stream_interval_join); the join
    shuffles once on user_id and the time predicate prunes within each key
    group."""
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("ts").alias("pts"), "user_id"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("ts").alias("vts"), F.col("user_id").alias("vuser")
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("vuser"))
        & (F.col("vts") >= F.col("pts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("vts") < F.col("pts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("vts").alias("n_recent_views")
    )


@query("bloom_filtered_join", """
WITH hi AS (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 489000)
SELECT hi.o_orderpriority, COUNT(*) AS n_items,
       ROUND(SUM(l.l_extendedprice), 2) + 0.0 AS revenue
FROM lineitem l JOIN hi ON l.l_orderkey = hi.o_orderkey
GROUP BY hi.o_orderpriority
""")
def bloom_filtered_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom pruning (operators/bloom.py): the top-price orders are
    ~2 % of the dim, so ~98 % of lineitem rows can be dropped map-side —
    BEFORE any exchange — by probing a broadcast-literal bitmask built from
    the small side's keys. Result is row-identical to the plain join (no
    false negatives), which is exactly what the oracle states. At 100 TB
    this is the difference between shuffling the whole fact table and
    shuffling the ~2 % that can match."""
    from custom_python_vectordb_spark.operators.bloom import bloom_filtered_join

    orders = _t(spark, sf_dir, "orders")
    hi = orders.filter(F.col("o_totalprice") > 489000).select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    joined = bloom_filtered_join(li, hi, "l_orderkey", m_bits=1 << 17, k=5)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        (F.round(F.sum("l_extendedprice"), 2) + F.lit(0.0)).alias("revenue"),
    )


@query("approx_distinct_users", """
SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, TRUE AS within_5pct
FROM events GROUP BY event_type
""")
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch cardinality vs exact. approx_count_distinct is
    the 100 TB path (fixed-size sketch, map-side combinable, one shuffle of
    sketches instead of a distinct-shuffle of values); the exact count here
    certifies the estimate: `within_5pct` must be literally TRUE for every
    group or the value hash fails. The oracle states exact counts + TRUE,
    so the sketch's error bound is itself hash-checked."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
    )
    return agg.select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_5pct"),
    )


@query("zorder_values", """
WITH b AS (SELECT event_id, (user_id & 63) AS ub,
                  (CAST(FLOOR(value) AS BIGINT) & 63) AS vb FROM events)
SELECT event_id, ub, vb,
       (((ub >> 0) & 1) << 0) | (((vb >> 0) & 1) << 1)
     | (((ub >> 1) & 1) << 2) | (((vb >> 1) & 1) << 3)
     | (((ub >> 2) & 1) << 4) | (((vb >> 2) & 1) << 5)
     | (((ub >> 3) & 1) << 6) | (((vb >> 3) & 1) << 7)
     | (((ub >> 4) & 1) << 8) | (((vb >> 4) & 1) << 9)
     | (((ub >> 5) & 1) << 10) | (((vb >> 5) & 1) << 11) AS zval
FROM b
""")
def zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values (operators/zorder.py) over (user bucket, value
    bucket): the multi-column clustering key behind OPTIMIZE ZORDER BY.
    The interleave is pure integer bit arithmetic, so DuckDB recomputes it
    independently and the hash check is bit-exact. The layout win it buys
    (per-file [min,max] tight on BOTH dimensions) is measured in
    tests/test_zorder.py via file_minmax."""
    from custom_python_vectordb_spark.operators.zorder import zvalue

    ev = _t(spark, sf_dir, "events")
    ub = F.col("user_id").bitwiseAND(F.lit(63))
    vb = F.floor("value").cast("long").bitwiseAND(F.lit(63))
    return ev.select(
        "event_id",
        ub.alias("ub"),
        vb.alias("vb"),
        zvalue([ub, vb], bits=6).alias("zval"),
    )


@query("copurchase_triangles", """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT la.l_partkey AS a, lb.l_partkey AS b
      FROM op la JOIN op lb
      ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey)
SELECT (SELECT COUNT(*) FROM e) AS n_edges,
       (SELECT COUNT(*) FROM e e1
        JOIN e e2 ON e1.b = e2.a
        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles
""")
def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the co-purchase graph (operators/triangles.py):
    parts are adjacent when some order contains both; triangles measure
    basket-community cohesion. The Spark plan is the degree-ordered
    node-iterator++ algorithm (orient edges low-rank→high-rank, wedge join
    on the O(√m)-bounded out-neighborhoods, closing-edge join) — same
    count as the oracle's naive a<b<c three-way self-join, but no hub node
    can ever contribute a quadratic wedge set, which is what makes the
    plan survive a power-law degree distribution at 100 TB. The edge set
    comes from the shared materialized co-purchase view (graph_view.py) —
    built once per session, reused by the whole basket-analytics family."""
    from custom_python_vectordb_spark.operators.triangles import triangle_count
    from custom_python_vectordb_spark.sources.graph_view import copurchase_pairs

    return triangle_count(copurchase_pairs(spark, sf_dir))


@query("copurchase_clustering", """
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT DISTINCT la.l_partkey AS a, lb.l_partkey AS b
      FROM op la JOIN op lb
      ON la.l_orderkey = lb.l_orderkey AND la.l_partkey < lb.l_partkey),
deg AS (SELECT v, COUNT(*) AS d FROM
        (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v),
w AS (SELECT CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS n_wedges FROM deg),
t AS (SELECT COUNT(*) AS n_triangles FROM e e1
      JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
SELECT t.n_triangles, w.n_wedges,
       (3000000 * t.n_triangles) // w.n_wedges AS clustering_ppm
FROM t, w
""")
def copurchase_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient of the co-purchase graph:
    3·triangles / wedges, where wedges = Σ_v d(v)(d(v)−1)/2 — how often
    two parts bought with a common third are also bought together. The
    triangle term reuses the degree-ordered hub-safe counter
    (operators/triangles.py); the wedge term is one degree aggregate —
    both map-side-combinable, so the whole metric is two bounded shuffles
    beyond the edge derivation.

    Oracle note (r5, closes the r4 driver-hash-red): DuckDB SUM(BIGINT)
    returns HUGEINT whose client conversion is fetch-path/version-dependent
    (fetchall → int, .df() → float64), so n_wedges is CAST to BIGINT; the
    coefficient is emitted as integer parts-per-million via BIGINT floor
    division (both engines: exact) instead of a ROUND(...) DOUBLE —
    integers-only emission, zero float-canonicalization surface.

    Round 6: edges come from the shared materialized co-purchase view and
    the DEGREE table is computed once and shared between the orientation
    (triangle term) and the wedge sum — previously each consumer re-derived
    the lineitem self-join under recompute (measured 6.5 s → ~1 s sf0.1)."""
    from custom_python_vectordb_spark.operators.triangles import (
        adjacency_from_oriented,
        degree_table,
        oriented_edges,
        triangles_from_adjacency,
    )
    from custom_python_vectordb_spark.sources.graph_view import copurchase_pairs

    edges = copurchase_pairs(spark, sf_dir)
    deg = degree_table(edges).localCheckpoint(eager=True)
    # r11: materialize the |V|-row adjacency instead of the |E|-row
    # oriented set — the triangle pass re-derives its edge stream from
    # the adjacency map-side (see triangles_from_adjacency)
    adj = adjacency_from_oriented(oriented_edges(edges, deg=deg, materialize=False))
    tri = triangles_from_adjacency(adj)
    wed = deg.select(F.col("n").alias("v"), F.col("deg").alias("d")).agg(
        F.expr("sum(d * (d - 1)) div 2").cast("long").alias("n_wedges")
    )
    return tri.crossJoin(wed).select(
        "n_triangles",
        "n_wedges",
        F.expr("(3000000 * n_triangles) div n_wedges").alias("clustering_ppm"),
    )


@query("trending_decayed", """
WITH m AS (SELECT MAX(CAST(ts AS TIMESTAMP)) AS tm FROM events),
t AS (SELECT user_id,
             (epoch_us(m.tm) - epoch_us(CAST(ts AS TIMESTAMP))) // 86400000000 AS k
      FROM events, m)
SELECT user_id, ROUND(SUM(POWER(0.5, k)), 6) + 0.0 AS score
FROM t GROUP BY user_id ORDER BY score DESC, user_id LIMIT 20
""")
def trending_decayed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity ranking (the reference's
    'trending entities', K7, upgraded with recency weighting): each event
    contributes 0.5^(whole days before the corpus max ts), so yesterday
    counts half of today. Day buckets are computed in exact integer
    microsecond arithmetic and 0.5^k is dyadic, so every addend is
    bit-identical in Spark and DuckDB — the decay math itself is
    hash-verified, not just the ranking. Plan: one 1-row max-ts broadcast,
    one map-side-combined aggregation, TakeOrdered 20; the streaming twin
    (streaming/stateful.trending_decayed_stream) carries (score, last day)
    per key in the state store."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    tm = ev.agg(F.max("ts").alias("tm"))
    day_us = F.lit(86_400_000_000)
    delta = F.unix_micros(F.col("tm").cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    k = ((delta - F.pmod(delta, day_us)) / day_us).cast("long")
    return (
        ev.crossJoin(F.broadcast(tm))
        .select("user_id", F.pow(F.lit(0.5), k).alias("term"))
        .groupBy("user_id")
        .agg((F.round(F.sum("term"), 6) + F.lit(0.0)).alias("score"))
        .orderBy(F.col("score").desc(), "user_id")
        .limit(20)
    )


@query("fuzzy_name_matches", """
WITH t AS (SELECT p_partkey AS id, lower(p_name) AS name FROM part),
b AS (SELECT id, name, string_split(name, ' ')[1] AS tok0, length(name) // 4 AS lb FROM t),
ok AS (SELECT tok0, lb FROM (SELECT tok0, lb, COUNT(*) AS n FROM b GROUP BY 1, 2) WHERE n <= 1000),
bb AS (SELECT b.* FROM b JOIN ok USING (tok0, lb)),
p AS (SELECT x.id AS a, y.id AS b2, levenshtein(x.name, y.name) AS d
      FROM bb x JOIN bb y ON x.tok0 = y.tok0 AND x.lb = y.lb AND x.id < y.id)
SELECT d, COUNT(*) AS n_pairs FROM p WHERE d BETWEEN 1 AND 4 GROUP BY d
""")
def fuzzy_name_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage over part names (operators/linkage.py): blocked
    Levenshtein matching — pairs compared only inside (first-token,
    length-band) blocks of bounded size, verified with JVM levenshtein
    (whole-stage codegen, no UDF), emitted as a per-distance pair
    histogram for NEAR misses (1 ≤ d ≤ 4; d=0 name duplicates are exact
    dedup's job). The blocking+cap+verify architecture is the
    never-all-pairs discipline every linkage system needs at 100 TB; the
    oracle states the SAME blocking, so the approximation itself is
    hash-verified."""
    from custom_python_vectordb_spark.operators.linkage import fuzzy_pairs

    pairs = fuzzy_pairs(
        _t(spark, sf_dir, "part"), "p_partkey", "p_name",
        max_distance=4, max_block=1000,
    )
    return (
        pairs.filter(F.col("d") >= 1)
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query("returned_item_report", """
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
""")
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-shaped: customers who returned the most revenue in a
    half-year window — the classic churn-risk report. Date + returnflag
    predicates push to the scans (halving both big inputs before the
    join); nation broadcasts; the per-customer aggregate combines
    map-side; TakeOrdered 20 ends the plan."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@query("nation_trade_volume", """
SELECT supp_nation, cust_nation, l_year,
       ROUND(SUM(volume), 2) AS revenue
FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           EXTRACT(year FROM l_shipdate) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE n1.n_name IN ('NATION_01', 'NATION_02')
      AND n2.n_name IN ('NATION_01', 'NATION_02')
      AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""")
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped: bilateral shipping volume between two nations by
    year. The two 1-row nation filters broadcast below the big joins, so
    supplier/customer shrink to ~1/25 before lineitem touches them — the
    selective-dimension-first shape AQE preserves at any SF."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    nn = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_01", "NATION_02")
    )
    n1 = nn.select(F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation"))
    n2 = nn.select(F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("sk"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("ck"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )
