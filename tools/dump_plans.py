"""Write PLANS.md: formatted physical plans for the headline queries, with
the scale-critical markers (PushedFilters / WindowGroupLimit / Broadcast /
TakeOrderedAndProject) called out. Evidence artifact for plan review.

Usage: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SHOW = [
    ("knn_cosine", "corpus never shuffles; WindowGroupLimit below the exchange"),
    ("knn_filtered", "predicate pushed to the Parquet scan, then rank"),
    ("knn_batch_1k", "Arrow GEMM scan + partial top-k + merge"),
    ("bm25_topk", "postings build + broadcast query terms, one doc shuffle"),
    ("top_customers", "broadcast dim join + partial agg + TakeOrdered"),
    ("projection_prune", "ReadSchema pruning + PushedFilters"),
    ("asof_join_purchase_view", "single key shuffle + sorted window"),
    ("knn_ivfpq", "IVF cell pruning + broadcast PQ lookup table"),
    ("cypher_chain", "multi-edge Cypher chain = plain equi-join chain, labels pushed"),
    ("cypher_optional", "OPTIONAL MATCH = left join on the bound var's id"),
    ("salted_join_type_stats", "hot key spread over 16 salt buckets, dim replicated"),
    ("copurchase_top_pairs", "basket self-join + map-side-combined pair counts + TakeOrdered"),
    ("event_transitions", "per-user window (lead) + 5x5 transition aggregate"),
    ("graph_pagerank", "one unrolled iteration visible: edges⋈rank⋈outdeg + dst aggregate"),
    ("graph_pattern_2hop", "r12 edge layout: both hop legs PartitionFilters-pruned to their edge type, endpoint label/property filters pushed into the node parquet scans and broadcast-semi-joined onto the legs BEFORE the hop join; one shuffle total (the final distinct)"),
    ("graph_neighbors_typed", "typed adjacency probe: PartitionFilters [type=CONTAINS] + PushedFilters [src='o:5'] on the persisted edge layout — the reference's edge-type index as planning-time dir pruning"),
    ("dedup_lsh_pairs", "wide minhash: 16 min-aggregates in ONE shingle pass (no 16x explode), banding a projection, bucket join + Jaccard verify on candidates only"),
    ("neardup_embedding", "multi-table LSH bucket self-join + exact cosine verify — no all-pairs cross join anywhere"),
    ("cypher_optional_chain", "OPTIONAL MATCH then MATCH: left join then inner join on the anchor var, NULLs survive"),
    ("mmr_rerank", "top-fetch_k candidates distributed, greedy argmax on <=10k collected rows (VALUES local relation for the query vector)"),
    ("corpus_final_cut", "dedup keeper + quality + langid in ONE plan: single corpus scan feeds hash agg and map-side scoring, doc_id-keyed joins only"),
    ("boilerplate_ngrams", "distinct (doc, trigram) explode -> one partial-combining gram count -> global top-30"),
    ("dedup_accounting", "one hash-keyed aggregate over the injected-duplicates corpus"),
    ("bloom_filtered_join", "getbit probe Filter on the fact scan BELOW the join — the big side is Bloom-pruned before its exchange"),
    ("copurchase_triangles", "edge-iterator triangles: shared materialized pair view, O(sqrt m) out-neighbor arrays joined onto both endpoints, array_intersect summed — the wedge set never materializes"),
    ("zorder_values", "Morton interleave as one codegen'd shift/or projection — no shuffle, no UDF"),
    ("dedup_span_pairs", "positional 5-gram hashes from the SHARED materialized gram view (r7: built once per session, both plan branches read it), df-capped self-join on the 64-bit key, diagonal-run window over the join's own partitioning"),
    ("event_funnel", "view→click→purchase stages all keyed on user_id — one hash partitioning reused end-to-end"),
    ("retention_cohorts", "distinct(user,day) shuffle reused co-partitioned by the first-day self-join"),
    ("top_docs_per_lang", "grouped top-k: WindowGroupLimit forwards <=3 rows per lang per partition"),
    ("knn_ivf_filtered", "metadata predicate below the probe join — filter-then-rank inside the probed cells"),
    ("late_interaction_maxsim", "multi-vector MaxSim: map-only Arrow-batch partial-max GEMM (per-batch map-side combine, shuffle O(docs x tokens)), then global max + sum aggregates"),
    ("quality_model_score", "model-based quality filter: trained coefficients folded into one literal sigmoid projection — a pure map-side scoring scan, no shuffle"),
    ("domain_weights_temperature", "alpha-smoothed domain weights: one source-keyed count shuffle + 1-row broadcast normalizers"),
    ("token_budget_sample", "per-source running-sum window: one shuffle on source, partition-local cumulative pass"),
    ("events_range_pruned", "manifest-pruned scan: only the dir(s) whose [min,max] can contain the range are planned"),
    ("order_priority_check", "correlated EXISTS as left-semi hash join with a non-equi late-shipment condition"),
    ("fuzzy_name_matches", "blocked linkage: capped (tok0, length-band) blocks, self-join inside blocks only, codegen levenshtein verify"),
    ("leakage_safe_split", "cluster-representative hash split: hash agg for reps + id-keyed join, both combine map-side"),
    ("dsir_importance_sample", "DSIR cut: two vocab aggregates, AQE-sized LM joins, doc-keyed score avg, hash-threshold filter"),
    ("unigram_logprob", "LM join carries no broadcast hint: AQE broadcasts the vocab table while small, shuffles beyond"),
    ("phrase_search", "positional explode + broadcast phrase-term join + ONE map-side-combined (doc,start) aggregate — no m-way self-join"),
    ("graph_kcore", "bounded peel: degree aggregate + two endpoint semi-joins per round, checkpoint-truncated"),
    ("change_feed_documents", "CDF shape: two key anti-joins + changed-row semi-join between derived snapshots"),
    ("weighted_sample_es", "Efraimidis-Spirakis: one map pass (hash -> ln(u)/w key) + TakeOrderedAndProject"),
    ("global_chars_rank", "scalable global row_number: range-partitioned sort, per-partition counts prefix-summed into a broadcast offset table, partition-local windows — no single-partition window over data rows"),
    ("rollup_sketch_certified", "mergeable sketch partials (HLL binary + histogram arrays) per pseudo-batch, associative union at read, certified against exact"),
    ("returned_item_report", "date+returnflag predicates pushed to both big scans, broadcast nation dim, map-side-combined customer agg, TakeOrdered 20"),
    ("nation_trade_volume", "1-row nation filters broadcast below the big joins — supplier/customer shrink ~25x before lineitem touches them"),
    ("bigram_logprob", "pair explode + two partial-combining LM aggregates, AQE-sized LM joins (no broadcast hint on the unbounded vocab)"),
    ("events_anomaly_days", "daily count agg + per-type 1-row stats join, explicit sum/sumsq arithmetic for bit-stable z-scores"),
    ("semdedup_keep", "cluster-prototype semantic dedup, two-level trained cells: map-only coarse GEMM (O(sqrt(k)*d) shipped) -> coarse-keyed cogroup fine GEMM -> per-fine-cell loser GEMM on the cluster-keyed shuffle, left-anti keep; O(n*sqrt(k)*d) per level, nothing O(n) collected"),
    ("bpe_encode", "trained merges applied as nested all-JVM greedy folds over per-word symbol arrays — a pure map projection, no shuffle, no Python"),
    ("media_phash_pairs", "perceptual image dedup: one map-only decode+hash pass (mapInPandas), band explode a projection, (band, val) bucket self-join + bit_count(xor) verify — Σ|bucket|², never all-pairs"),
    ("media_audio_fp_pairs", "audio fingerprint dedup: map-only PCM decode + window-energy bands, then the SAME banded-Hamming join as images"),
    ("media_jpeg_progressive_luma", "SOF2 progressive JPEG end to end: map-only mapInPandas encode+decode (multi-scan coefficient accumulation), pinned by the baseline stream's frozen snapshot"),
    ("media_mp4_frames", "JPEG-track MP4: ISO BMFF box walk + sample tables slice frames out of mdat without decoding; only sampled indices hit the JPEG decoder — map-only, O(sampled)"),
]

MARKERS = [
    "PushedFilters",
    "ReadSchema",
    "WindowGroupLimit",
    "BroadcastHashJoin",
    "BroadcastNestedLoopJoin",
    "TakeOrderedAndProject",
    "HashAggregate",
    "Exchange",
]


def main() -> None:
    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.plans.explain import plan_of
    from custom_python_vectordb_spark.session import get_spark

    registry.load_all()
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plans")
    spark.sparkContext.setLogLevel("ERROR")

    out = [
        "# PLANS — physical plans of headline queries (generated by tools/dump_plans.py)",
        "",
        f"Scale factor dir: `{sf_dir}`. Markers worth reading: pushdown/pruning at",
        "the scan, WindowGroupLimit (partial per-partition top-k before the",
        "shuffle), broadcast joins (corpus never moves), TakeOrderedAndProject",
        "(distributed O(n) top-k).",
        "",
        "Reading note: every `InMemoryTableScan` prints its `InMemoryRelation`",
        "DEFINITION including that subtree's parquet scan — textual `Scan",
        "parquet` counts overstate runtime reads; a cached subtree's scan",
        "executes once at first materialization, then every other occurrence",
        "reads the cache.",
        "",
        "Small literal tables (query vectors, term lists, id lists, hash",
        "seeds) appear as `LocalTableScan` — VALUES relations from",
        "`functions/local_relation.py`, executed driver-side with zero tasks.",
        "The createDataFrame alternative is a parallelized Python RDD whose",
        "slices re-ship from the driver on EVERY action (~370 ms for 32 rows",
        "on local[32], measured round 3) — a LocalTableScan in these plans is",
        "a deliberate choice, not an accident.",
        "",
    ]
    for name, why in SHOW:
        plan = plan_of(registry.QUERIES[name](spark, sf_dir))
        hits = sorted({m for m in MARKERS if m in plan})
        # keep the operator tree (part 1), drop the verbose node details
        tree = plan.split("\n\n")[0]
        tree = re.sub(r"#\d+L?", "", tree)
        out += [
            f"## {name}",
            "",
            f"*{why}* — markers present: {', '.join(hits)}",
            "",
            "```",
            tree.strip(),
            "```",
            "",
        ]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOW)} plans)")


if __name__ == "__main__":
    main()
