"""Graph query operators over (nodes, edges) DataFrames (SURVEY.md §2.6).

Every reference graph operation is a join plan:
- neighbors (``graph.py:818-842``)           → edge filter ⋈ nodes (J4)
- find_nodes (``graph.py:665-686``)          → conjunctive filter (J3/P7/P8)
- 2-hop patterns (``graph.py:1008-1038``)    → chained equi-joins (J5)
- traverse all simple paths (``graph.py:844-869``)   → iterative join, path
  carried as an array column with a cycle check (J6); depth capped ≤3 as in
  all reference usage
- shortest path BFS (``graph.py:871-902``)   → frontier loop + anti-join (J8)
- hyperedge any/all (``graph.py:457-478``)   → semi-join / count==n (J7)
- semantic graph search (``hybrid_graph_vector.py:337-453``) → vector seeds
  + min-hop BFS expansion + decay scoring (D8)

The BFS loops are driver-orchestrated (hop counts ≤3 in every reference
call site); each iteration is one narrow equi-join on dst/src — on a
cluster the frontier stays partitioned by node id and only frontier-sized
data moves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from custom_python_vectordb_spark.functions.distances import distance_expr
from custom_python_vectordb_spark.functions.local_relation import local_df


def _directed(edges: DataFrame, direction: str, edge_type: str | None) -> DataFrame:
    """Normalize to (frm, to) pairs honoring direction both = union of the
    two orientations (graph.py:828-841)."""
    if edge_type is not None:
        edges = edges.filter(F.col("type") == edge_type)
    out_e = edges.select(F.col("src").alias("frm"), F.col("dst").alias("to"))
    in_e = edges.select(F.col("dst").alias("frm"), F.col("src").alias("to"))
    if direction == "out":
        return out_e
    if direction == "in":
        return in_e
    if direction == "both":
        return out_e.unionByName(in_e)
    raise ValueError(f"direction must be out|in|both, got {direction!r}")


def _adjacency(
    edges: DataFrame, direction: str, edge_type: str | None, distinct: bool = False
) -> DataFrame:
    """Persisted (frm, to) adjacency, hash-partitioned by `frm` and cached
    ON the edges DataFrame object (the edges frames from the graph view are
    memoized per session+sf, so the cache dies with them — no stale-id
    risk). This is the 'pre-built adjacency table partitioned by frm' the
    BFS docstring promises, materialized once instead of per traversal:
    every hop's join then reuses the adjacency partitioning and shuffles
    only the (small) frontier side."""
    cache = getattr(edges, "_adjacency_cache", None)
    if cache is None:
        cache = {}
        edges._adjacency_cache = cache
    key = (direction, edge_type, distinct)
    pairs = cache.get(key)
    if pairs is None:
        pairs = _directed(edges, direction, edge_type)
        if distinct:
            pairs = pairs.distinct()
        # plain persist, no repartition("frm"): a fixed 32-bucket hash layout
        # forces 32-task stages per hop against a tiny frontier and defeats
        # AQE's partition coalescing — measured slower at bench scale; on a
        # real cluster swap in a bucketed adjacency TABLE so the hop join is
        # co-located without a runtime repartition
        pairs = pairs.persist()
        cache[key] = pairs
    return pairs


def neighbors(
    nodes: DataFrame,
    edges: DataFrame,
    node_id: str,
    direction: str = "out",
    edge_type: str | None = None,
) -> DataFrame:
    """Distinct neighbor nodes of one node (J4)."""
    pairs = _directed(edges, direction, edge_type).filter(F.col("frm") == node_id)
    return nodes.join(pairs.select(F.col("to").alias("id")).distinct(), "id")


def find_nodes(
    nodes: DataFrame,
    labels: list[str] | None = None,
    prop_filter: Column | None = None,
) -> DataFrame:
    """Label ∩ property filter (J3): arrays_overlap replaces the label index,
    pushdown replaces the property index."""
    out = nodes
    if labels:
        out = out.filter(F.arrays_overlap(F.col("labels"), F.array(*[F.lit(x) for x in labels])))
    if prop_filter is not None:
        out = out.filter(prop_filter)
    return out


def degree_top(
    edges: DataFrame,
    k: int = 10,
    edge_type: str | None = None,
    direction: str = "in",
) -> DataFrame:
    """A9/K7 — incoming/outgoing degree per node, top-k (the reference's
    'trending entities' count of MENTIONS edges)."""
    if edge_type is not None:
        edges = edges.filter(F.col("type") == edge_type)
    key = "dst" if direction == "in" else "src"
    return (
        edges.groupBy(F.col(key).alias("id"))
        .agg(F.count(F.lit(1)).alias("degree"))
        .orderBy(F.col("degree").desc(), F.col("id"))
        .limit(k)
    )


def match_2hop(
    nodes: DataFrame,
    edges: DataFrame,
    type1: str,
    type2: str,
    start_filter: Column | None = None,
    end_filter: Column | None = None,
) -> DataFrame:
    """J5 — `(a)-[:T1]->(b)-[:T2]->(c)`: chained equi-joins. Returns
    (a_id, b_id, c_id) distinct bindings.

    The endpoint label/property filters semi-join each edge LEG before
    the hop join (r12): Catalyst won't reorder a semi-join below the
    Deduplicate that used to sit between them, so filtering after the
    e1⋈e2 join paid the full |T1|×|T2| hop fan-out and deduped it, only
    to discard most bindings. Filtered node sets are small (a label +
    property slice) → broadcast semi-joins prune the legs map-side, and
    the expensive hop join + distinct run on ~selectivity² of the pairs.
    Same bindings either way (filter-then-join commutes with the inner
    equi-join; distinct is last in both forms)."""
    e1 = edges.filter(F.col("type") == type1).select(F.col("src").alias("a_id"), F.col("dst").alias("b_id"))
    e2 = edges.filter(F.col("type") == type2).select(F.col("src").alias("b_id"), F.col("dst").alias("c_id"))
    if start_filter is not None:
        a = nodes.filter(start_filter).select(F.col("id").alias("a_id"))
        e1 = e1.join(a, "a_id", "left_semi")
    if end_filter is not None:
        c = nodes.filter(end_filter).select(F.col("id").alias("c_id"))
        e2 = e2.join(c, "c_id", "left_semi")
    return e1.join(e2, "b_id").select("a_id", "b_id", "c_id").distinct()


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int,
    direction: str = "both",
    edge_type: str | None = None,
    checkpoint_each_hop: bool = True,
) -> DataFrame:
    """J8 — min-hop BFS: (id, hop) for every node reachable in ≤ max_hops,
    hop = shortest distance from the seed set (seeds at hop 0). Driver loop,
    one distinct-join + anti-join per hop. The directed pair set is
    cached once (persist) instead of re-deriving the multi-table edge union
    on every hop — at warehouse scale substitute a pre-built adjacency table
    partitioned by frm.

    Deliberately NO broadcast hint on the frontier/visited sides (measured,
    round 3): the whole loop compiles into ONE job whose per-hop shuffle
    outputs are implicitly reused, whereas `F.broadcast(frontier)` forces a
    driver-side materialization per hop that re-evaluates the frontier's
    entire un-persisted lineage — graph_semantic_search 4.4 → 5.8 s and
    shortest_path 8.7 → 24 s at sf0.1. The shuffle the hints would remove
    is cheaper than the recomputation they cause."""
    pairs = _adjacency(edges, direction, edge_type)
    visited = seeds.select("id").distinct().withColumn("hop", F.lit(0))
    frontier = visited.select("id")
    for hop in range(1, max_hops + 1):
        nxt = (
            pairs.join(frontier.withColumnRenamed("id", "frm"), "frm")
            .select(F.col("to").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("hop", F.lit(hop))
        )
        if checkpoint_each_hop:
            nxt = nxt.localCheckpoint(eager=True)  # truncate lineage per hop
            if nxt.isEmpty():
                break
        # with checkpointing off (short fixed loops), an empty frontier just
        # makes the remaining joins trivially empty — no extra action needed
        visited = visited.unionByName(nxt)
        frontier = nxt.select("id")
    return visited


def traverse_paths(
    edges: DataFrame,
    start: str,
    max_depth: int | None = 3,
    direction: str = "out",
    edge_type: str | None = None,
    max_paths: int = 1_000_000,
) -> DataFrame:
    """J6 — all simple paths of length ≥1 from `start` (graph.py:844-869:
    DFS appending every current_path with >1 node). Path carried as
    array<string>; the `not in path` cycle check is array_contains.
    Returns (path array<string>, depth, path_str).

    `max_depth=None` matches the reference's UNBOUNDED enumeration: the
    frontier loop runs until no simple path extends (the cycle check
    guarantees termination at ≤ |V| hops). All-simple-paths is exponential
    in general, so the blow-up guard is explicit rather than implicit:
    total enumerated paths beyond `max_paths` raise instead of silently
    grinding — the reference (graph.py:844-869) has no such guard and
    simply hangs on dense graphs; bound depth for interactive use."""
    pairs = _adjacency(edges, direction, edge_type, distinct=True)
    spark = edges.sparkSession
    frontier = local_df(spark, [([start],)], "path array<string>")
    out = None
    total = 0
    depth = 0
    while max_depth is None or depth < max_depth:
        depth += 1
        ext = (
            pairs.join(frontier.withColumn("frm", F.element_at("path", -1)), "frm")
            .filter(~F.array_contains(F.col("path"), F.col("to")))
            .select(F.concat(F.col("path"), F.array(F.col("to"))).alias("path"))
        )
        ext = ext.localCheckpoint(eager=True)
        n = ext.count()
        if n == 0:
            break
        total += n
        if total > max_paths:
            raise ValueError(
                f"traverse exceeded max_paths={max_paths} at depth {depth}; "
                "bound max_depth or raise max_paths explicitly"
            )
        out = ext if out is None else out.unionByName(ext)
        frontier = ext
    if out is None:
        return local_df(spark, [], "path array<string>, depth int, path_str string")
    return out.select(
        "path",
        (F.size("path") - 1).alias("depth"),
        F.array_join("path", "->").alias("path_str"),
    )


def shortest_path(
    edges: DataFrame,
    from_node: str,
    to_node: str,
    edge_type: str | None = None,
    max_depth: int = 10,
    direction: str = "out",
) -> DataFrame:
    """J8 — BFS shortest path. The reference returns the first path its
    queue order happens to find (graph.py:871-902); we pin the deterministic
    refinement: the lexicographically-smallest among minimum-length paths.
    Returns 1 row (path_str, length) or 0 rows if unreachable."""
    pairs = _adjacency(edges, direction, edge_type, distinct=True)
    spark = edges.sparkSession
    if from_node == to_node:
        return local_df(spark, [(from_node, 0)], "path_str string, length int")
    frontier = local_df(spark, [([from_node],)], "path array<string>")
    visited = local_df(spark, [(from_node,)], "id string")
    for depth in range(1, max_depth + 1):
        ext = (
            pairs.join(frontier.withColumn("frm", F.element_at("path", -1)), "frm")
            .join(visited.withColumnRenamed("id", "to"), "to", "left_anti")
            .select(F.concat(F.col("path"), F.array(F.col("to"))).alias("path"))
        )
        ext = ext.localCheckpoint(eager=True)
        hits = ext.filter(F.element_at("path", -1) == to_node)
        hit_rows = hits.select(F.array_join("path", "->").alias("path_str")).orderBy("path_str").limit(1).collect()
        if hit_rows:
            return local_df(spark, [(hit_rows[0]["path_str"], depth)], "path_str string, length int")
        new_ids = ext.select(F.element_at("path", -1).alias("id")).distinct()
        # keep ONE representative path per new node (min path_str) — enough
        # for shortest-path reconstruction, keeps the frontier linear in |V|
        frontier = (
            ext.withColumn("last", F.element_at("path", -1))
            .withColumn("ps", F.array_join("path", "->"))
            .groupBy("last")
            .agg(F.min_by("path", "ps").alias("path"))
            .select("path")
        )
        visited = visited.unionByName(new_ids.join(visited, "id", "left_anti")).localCheckpoint(eager=True)
        if frontier.isEmpty():
            break
    return local_df(spark, [], "path_str string, length int")


def hyperedges_with_any(membership: DataFrame, node_ids: list[str]) -> DataFrame:
    """J7 any — hyperedges touching any of node_ids (semi-join)."""
    spark = membership.sparkSession
    wanted = local_df(spark, [(n,) for n in node_ids], "node_id string")
    return membership.join(F.broadcast(wanted), "node_id", "left_semi").select("hyperedge_id").distinct()


def hyperedges_with_all(membership: DataFrame, node_ids: list[str]) -> DataFrame:
    """J7 all — hyperedges containing every node_id (count==n after semi-join)."""
    spark = membership.sparkSession
    wanted = local_df(spark, [(n,) for n in set(node_ids)], "node_id string")
    return (
        membership.join(F.broadcast(wanted), "node_id")
        .groupBy("hyperedge_id")
        .agg(F.count_distinct("node_id").alias("n"))
        .filter(F.col("n") == len(set(node_ids)))
        .select("hyperedge_id")
    )


def semantic_graph_search(
    nodes: DataFrame,
    edges: DataFrame,
    node_vectors: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    expand_hops: int = 2,
    vector_weight: float = 0.7,
    graph_weight: float = 0.3,
    label_filter: list[str] | None = None,
    prop_filter: Column | None = None,
    round_to: int | None = None,
    resolve_seeds: bool = False,
) -> DataFrame:
    """D8 — the reference's RuVector-style hybrid
    (``hybrid_graph_vector.py:337-453``), exact semantics:

    - seeds: top 2k nodes by cosine similarity (sim = 1 − distance);
      seed combined_score = sim, graph_distance = 0
    - expansion: min-hop BFS (direction both) from the seed set; a node
      first reached at hop h scores
      ``w_v · max_seed_sim · 1/(1+h) + w_g · (1/h)``
      (best_seed_score in the reference is the max over ALL seeds — a
      constant — despite the 'closest seed' comment; ``:400-402``)
    - label/property filters applied AFTER expansion, then top-k desc.

    `node_vectors`: (id, embedding). `query_vec`: 1-row (qvec).

    `resolve_seeds=True` materializes the 2k-row seed set driver-side in
    ONE job and feeds BFS a LocalRelation frontier — the reference's own
    in-process shape (``hybrid_graph_vector.py:384-399``). MEASURED SLOWER
    at bench scale (r10: 1.56 vs 1.28 s total warm): the extra collect
    round costs more than the persisted-seed subtree it replaces, so the
    lazy one-plan form stays the default; the resolved twin is kept for
    serving paths that already have seeds in hand. Scores are bit-identical
    either way: collect round-trips exact IEEE doubles, and max is a
    selection, not arithmetic (asserted in tests/test_graph.py)."""
    sim = (F.lit(1.0) - distance_expr("cosine", "embedding", "qvec")).alias("sim")
    seed_plan = (
        node_vectors.crossJoin(F.broadcast(query_vec))
        .select("id", sim)
        .orderBy(F.col("sim").desc(), F.col("id"))
        .limit(2 * k)
    )
    if resolve_seeds:
        from custom_python_vectordb_spark.functions.local_relation import local_df

        rows = seed_plan.collect()
        # derive the id type from the node table — hardcoding string would
        # silently stringify numeric ids and make the BFS edge join lean on
        # implicit cross-type coercion (r10 ADVICE)
        id_type = node_vectors.schema["id"].dataType.simpleString()
        seeds = local_df(
            edges.sparkSession,
            [(r["id"], r["sim"]) for r in rows],
            f"id {id_type}, sim double",
        )
        max_sim = max((r["sim"] for r in rows), default=0.0)
        # try_divide, not `/`: the LocalRelation seed plan lets Catalyst
        # push this projection into the BFS union's hop=0 branch, where
        # ANSI constant folding evaluates w_g/0 at OPTIMIZATION time and
        # throws — even though the hop>0 filter discards that branch at
        # runtime. try_divide folds to null there and is bit-identical to
        # `/` on every surviving (hop ≥ 1) row. (`!r` round-trips the
        # doubles exactly; the `d` suffix keeps SQL literals DOUBLE, never
        # DECIMAL.) One selectExpr per branch: plan-build py4j ops cost
        # ~10 ms each here (r10 HOF finding), so expression trees are
        # folded into single parsed strings.
        mk_expanded = lambda hops_df: hops_df.selectExpr(  # noqa: E731
            "id",
            f"{max_sim!r}d / (1.0d + hop) AS vector_score",
            "hop AS graph_distance",
            f"{vector_weight!r}d * {max_sim!r}d / (1.0d + hop)"
            f" + try_divide({graph_weight!r}d, hop) AS combined_score",
        )
    else:
        # reused 3× (scores, max, BFS): persist caches the top-2k scan after
        # the first action without spawning checkpoint jobs (whose late
        # accumulator updates surfaced as DAGScheduler errors in round 1)
        seeds = seed_plan.persist()
        max_sim = seeds.agg(F.max("sim").alias("max_sim"))
        mk_expanded = lambda hops_df: hops_df.crossJoin(  # noqa: E731
            F.broadcast(max_sim)
        ).selectExpr(
            "id",
            "max_sim / (1.0d + hop) AS vector_score",
            "hop AS graph_distance",
            f"{vector_weight!r}d * max_sim / (1.0d + hop)"
            f" + {graph_weight!r}d / hop AS combined_score",
        )

    # Expansion (r11): for the bounded hop counts this operator uses, the
    # frontier is the 2·k-seed neighborhood — workload-bounded, not
    # data-bounded — so each hop joins the persisted adjacency against a
    # BROADCAST frontier and the 2|E|-row pair set never shuffles (the
    # generic bfs_hops pays a sort-merge exchange of the full pair set per
    # hop: 2.7 M rows ×2 at bench scale, 100× that at 100×). The r3
    # broadcast-is-slower measurement does not apply here: every broadcast
    # side below is either the persisted seed scan or a persisted previous
    # frontier, so materializing it re-reads cache instead of re-running
    # lineage. Min-hop semantics are preserved by anti-joining each level
    # against all previous levels (first-reached level wins) — identical
    # sets to bfs_hops, parity-asserted in tests and by the DuckDB oracle.
    # Measured (bench protocol, fresh plans, sf0.1): 1.30-1.48 s total →
    # 0.96-1.04 s, exec 1.0-1.2 → 0.67-0.74 s. Hub-heavy frontiers that
    # would out-size a broadcast fall back to the shuffle-based bfs_hops
    # via expand_hops > 3 (same cutoff as the checkpoint heuristic).
    if expand_hops <= 3:
        # one spark.sql per level instead of ~11 DataFrame ops: temp views
        # resolve EAGERLY at sql() time, so fixed view names are safe even
        # when two searches are built back to back in one session (each
        # plan binds its views before the next build replaces them)
        sess = edges.sparkSession
        pairs = _adjacency(edges, "both", None)
        pairs.createOrReplaceTempView("_gss_pairs")
        seeds.createOrReplaceTempView("_gss_h0")
        prev = ["_gss_h0"]
        level_frames = []
        for h in range(1, expand_hops + 1):
            # ONE anti-join against the UNION of all previous levels — a
            # chained LEFT ANTI per level is set-identical but broadcasts
            # each level separately (r13: executed plans showed zero
            # exchange reuse, so hop h paid h broadcast stages for the
            # min-hop exclusion; the union re-reads the persisted levels
            # and broadcasts once)
            seen = " UNION ALL ".join(f"SELECT id FROM {p}" for p in prev)
            nxt = sess.sql(f"""
                SELECT /*+ BROADCAST(seen) */ d.id, {h} AS hop FROM (
                  SELECT /*+ BROADCAST(f) */ DISTINCT p.`to` AS id
                  FROM _gss_pairs p JOIN {prev[-1]} f ON p.frm = f.id
                ) d LEFT ANTI JOIN ({seen}) seen ON d.id = seen.id""")
            if h < expand_hops:
                nxt = nxt.persist()  # broadcast at hop h+1 fills the cache
            nxt.createOrReplaceTempView(f"_gss_h{h}")
            level_frames.append(nxt)
            prev.append(f"_gss_h{h}")
        hops_pos = level_frames[0]
        for lf in level_frames[1:]:
            hops_pos = hops_pos.unionByName(lf)
    else:
        # deep expansions: frontier size is unbounded — keep the shuffle
        # join + per-hop checkpoint discipline of the generic BFS
        hops_pos = bfs_hops(
            edges, seeds.select("id"), expand_hops, direction="both",
            checkpoint_each_hop=True,
        ).filter(F.col("hop") > 0)
    seed_scored = seeds.selectExpr(
        "id", "sim AS vector_score", "0 AS graph_distance",
        "sim AS combined_score",
    )
    expanded = mk_expanded(hops_pos)
    scored = seed_scored.unionByName(expanded)
    flt = nodes
    if label_filter:
        flt = flt.filter(F.arrays_overlap(F.col("labels"), F.array(*[F.lit(x) for x in label_filter])))
    if prop_filter is not None:
        flt = flt.filter(prop_filter)
    if label_filter or prop_filter is not None:
        scored = scored.join(flt.select("id"), "id", "left_semi")
    out = scored.orderBy(F.col("combined_score").desc(), F.col("id")).limit(k)
    if round_to is not None:
        out = out.selectExpr(
            "id",
            f"ROUND(vector_score, {round_to}) + 0.0d AS vector_score",
            "graph_distance",
            f"ROUND(combined_score, {round_to}) + 0.0d AS combined_score",
        )
    return out
