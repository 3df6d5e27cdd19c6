"""Write SCALING.md: measured wall-clock of representative queries at
sf0.001 / sf0.01 / sf0.1 / generated-sf1 (1000x data spread), with the per-query scaling
exponent alpha = log(t_big/t_small) / log(rows_big/rows_small).

Evidence artifact for the design-for-100x review: a query whose cost is
dominated by fixed job overhead shows alpha ~ 0; a linear single-scan
operator shows alpha <= 1; anything super-linear (alpha >> 1) is a
scale-killer candidate and gets called out.

Usage: python tools/scaling.py
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# 4th column (round 6): locally generated sf1-equivalent (tools/gen_sf1.py,
# deterministic seed-42 mimic of the driver tables at 10x sf0.1) extends
# the spread to 1000x so the steep alphas show their true exponent instead
# of being read off an overhead-dominated 100x window (r5 VERDICT #1)
SF1 = os.path.join(_REPO, ".bench", "sf1")
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1", SF1]

# representative spread: scans/aggs, kNN, text/dedup, graph, streaming-batch;
# each query tagged with the table whose growth drives its data term, so the
# scaling exponent uses the REAL row ratio (documents grow 10x over this
# spread, embeddings 4x, lineitem/events 100x)
QUERIES = [
    ("count_rows", "lineitem"),
    ("agg_orders_year_status", "lineitem"),
    ("pricing_summary", "lineitem"),
    ("regional_volume", "lineitem"),
    ("knn_cosine", "embeddings"),
    ("knn_batch_1k", "embeddings"),
    ("knn_ivf", "embeddings"),
    ("bm25_topk", "documents"),
    ("hybrid_fusion", "documents"),
    ("dedup_exact", "documents"),
    ("dedup_lsh_pairs", "documents"),
    ("dedup_span_pairs", "documents"),
    ("text_quality", "documents"),
    ("corpus_final_cut_spans", "documents"),
    ("graph_degree_top", "lineitem"),
    ("graph_pattern_2hop", "lineitem"),
    ("events_session_window", "events"),
    ("retention_cohorts", "events"),
    ("top_docs_per_lang", "documents"),
    ("late_interaction_maxsim", "embeddings"),
    ("maxsim_ivf_pruned", "embeddings"),
    ("order_priority_check", "lineitem"),
    ("graph_weighted_shortest", "lineitem"),
    ("token_budget_sample", "documents"),
    # round 4: the re-oracled trio + the new scoring/mixing queries
    ("pack_sequences", "documents"),
    ("passage_dedup_rebuild", "documents"),
    ("profile_documents", "documents"),
    ("quality_model_score", "documents"),
    ("logprob_histogram", "documents"),
    ("domain_weights_temperature", "documents"),
    # round 5: the graph-metric red + the AQE-sized join queries
    ("copurchase_clustering", "lineitem"),
    # orders grows with the same 100x factor as lineitem over this spread;
    # the sizes table tracks lineitem, so that is the recorded driver
    ("top_customers", "lineitem"),
    ("shipping_priority", "lineitem"),
    ("graph_kcore", "lineitem"),
    ("phrase_search", "documents"),
    ("dsir_importance_sample", "documents"),
    ("leakage_safe_split", "documents"),
    # round 6: distributed global ranking (range-sort + offset join),
    # sketch-partial merge certification, anomaly z-scores
    ("global_chars_rank", "documents"),
    ("rollup_sketch_certified", "events"),
    ("events_anomaly_days", "events"),
    # round 7: BPE training (corpus pass + capped-vocab merge rounds) and
    # cluster-prototype semantic dedup (cell-keyed within-cell join)
    ("bpe_train_merges", "documents"),
    ("semdedup_keep", "embeddings"),
    # round 8: the IVF partition-pruned scan path joins the (now 200x-wide)
    # embeddings axis alongside knn/maxsim/semdedup
    ("knn_ivf_pruned", "embeddings"),
    # round 8: per-cell capped subsampling (two-level assignment +
    # WindowGroupLimit per-cluster cap)
    ("cluster_balanced_sample", "embeddings"),
    # round 9: perceptual image dedup (decode + dHash/aHash per doc image,
    # banded Hamming self-join) and the baseline-JPEG encode→decode scan —
    # both map-heavy codec paths whose data term is the documents axis
    ("media_phash_pairs", "documents"),
    ("media_jpeg_luma", "documents"),
    # round 10: progressive JPEG (multi-scan decode per doc image) and the
    # MP4 sample-table walk + sampled-frame decode — both map-only codec
    # passes on the documents axis
    ("media_jpeg_progressive_luma", "documents"),
    ("media_mp4_frames", "documents"),
]


def main() -> None:
    import duckdb

    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.session import get_spark

    registry.load_all()
    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")

    # corpus size proxy: lineitem rows for relational, documents for text,
    # embeddings for vector, events for streaming — use each sf's TOTAL rows
    # across the tables a query touches; simpler and honest: report the sf
    # ratio (100x data) and per-table row counts once.
    if not os.path.exists(os.path.join(SF1, "_DONE")):
        import subprocess

        subprocess.run([sys.executable, os.path.join(_REPO, "tools", "gen_sf1.py")], check=True)
    con = duckdb.connect()
    sizes = {}
    for sf in SFS:
        sizes[sf] = {
            t: con.sql(f"SELECT COUNT(*) FROM '{sf}/{t}.parquet'").fetchone()[0]
            for t in ("lineitem", "events", "documents", "embeddings")
        }

    results: dict[str, dict[str, float]] = {}
    for name, _tbl in QUERIES:
        # bypass the registry plan memo AND clear module-level query-plan
        # memos (same policy as bench.py's primary series, round-4 VERDICT
        # minor #1): a memoized re-collect skips completed shuffle stages
        # and would measure re-serving, not the query's data-scaling
        # behavior
        fn = getattr(registry.QUERIES[name], "__wrapped__", registry.QUERIES[name])
        results[name] = {}
        for sf in SFS:
            registry.clear_plan_memos()
            fn(spark, sf).collect()  # warm: codegen, file listing
            best = float("inf")
            for _ in range(2):
                registry.clear_plan_memos()
                t0 = time.perf_counter()
                fn(spark, sf).collect()
                best = min(best, time.perf_counter() - t0)
            results[name][sf] = best

    # r12 (VERDICT r11 task 6): co-tenant noise produced phantom
    # super-linear tails in two consecutive rounds (r10/r11:
    # shipping_priority / quality_model_score sf1 cells), each caught by a
    # hand re-run. Automate that recheck: any query whose tail exponent
    # exceeds 1.15 gets BOTH tail cells re-measured 3x in-process right
    # away; the table carries the min (re-measurement can only strip
    # noise — a real super-linear plan stays super-linear under min), and
    # the original number is recorded next to it so the artifact shows
    # what was re-measured and by how much.
    remeasured: dict[str, dict[str, float]] = {}
    for name, tbl in QUERIES:
        r = results[name]
        tail_ratio = sizes[SFS[3]][tbl] / sizes[SFS[2]][tbl]
        if not (r[SFS[2]] > 0 and tail_ratio > 1):
            continue
        if math.log(r[SFS[3]] / r[SFS[2]]) / math.log(tail_ratio) <= 1.15:
            continue
        fn = getattr(registry.QUERIES[name], "__wrapped__", registry.QUERIES[name])
        for sf in (SFS[2], SFS[3]):
            registry.clear_plan_memos()
            fn(spark, sf).collect()
            best = r[sf]
            for _ in range(3):
                registry.clear_plan_memos()
                t0 = time.perf_counter()
                fn(spark, sf).collect()
                best = min(best, time.perf_counter() - t0)
            remeasured.setdefault(name, {})[sf] = r[sf]
            results[name][sf] = best

    lines = [
        "# SCALING — measured wall-clock across a 1000x data spread",
        "(generated by tools/scaling.py; local[32], warm best-of-2 per cell)",
        "",
        "Per-table rows:",
        "",
        "| sf | lineitem | events | documents | embeddings |",
        "|---|---|---|---|---|",
    ]
    for sf in SFS:
        s = sizes[sf]
        label = "1 (generated equiv)" if sf == SF1 else sf.rsplit("sf", 1)[-1]
        lines.append(
            f"| {label} | {s['lineitem']:,} | {s['events']:,} "
            f"| {s['documents']:,} | {s['embeddings']:,} |"
        )
    lines += [
        "",
        "alpha = log(t_sf1 / t_sf0.001) / log(rows_sf1 / rows_sf0.001) over the",
        "full 1000x spread (sf1 = locally generated equivalent, see",
        "tools/gen_sf1.py); alpha_tail = the same exponent over the LAST",
        "decade only (sf0.1 -> sf1), where fixed overhead has amortized —",
        "the honest predictor of cluster-scale growth.",
        "rows taken from each query's driving table: 0 = overhead-bound at",
        "this toy scale (fixed job cost dominates — the cluster-scale cost is",
        "the data term that has not become visible yet), 1 = linear in data,",
        ">1 = super-linear (scale-killer candidate).",
        "",
        "| query | driving table (growth) | sf0.001 s | sf0.01 s | sf0.1 s | sf1 s | alpha | alpha_tail |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name, tbl in QUERIES:
        r = results[name]
        t0, t2, t3 = r[SFS[0]], r[SFS[2]], r[SFS[3]]
        ratio = sizes[SFS[3]][tbl] / sizes[SFS[0]][tbl]
        tail_ratio = sizes[SFS[3]][tbl] / sizes[SFS[2]][tbl]
        alpha = math.log(t3 / t0) / math.log(ratio) if t0 > 0 and ratio > 1 else float("nan")
        atail = (
            math.log(t3 / t2) / math.log(tail_ratio)
            if t2 > 0 and tail_ratio > 1
            else float("nan")
        )
        marks = remeasured.get(name, {})
        c2 = f"{r[SFS[2]]:.3f}" + ("†" if SFS[2] in marks else "")
        c3 = f"{r[SFS[3]]:.3f}" + ("†" if SFS[3] in marks else "")
        lines.append(
            f"| {name} | {tbl} ({ratio:.0f}x) | {r[SFS[0]]:.3f} | {r[SFS[1]]:.3f} "
            f"| {c2} | {c3} | {alpha:.2f} | {atail:.2f} |"
        )
    n_super = sum(
        1
        for name, tbl in QUERIES
        if results[name][SFS[2]] > 0
        and sizes[SFS[3]][tbl] > sizes[SFS[2]][tbl]
        and math.log(results[name][SFS[3]] / results[name][SFS[2]])
        / math.log(sizes[SFS[3]][tbl] / sizes[SFS[2]][tbl])
        > 1.0
    )
    lines += [
        "",
        "Reading: alpha at or below ~1 means the plan's data term grows at",
        "most linearly; values near 0 mean fixed per-job overhead still",
        "dominates at that scale. alpha_tail ~0.9 on whole-corpus scan/score",
        "ops (quality scoring, span-gram derivation, histogramming) is the",
        "data term fully visible — LINEAR, which is the optimum for ops that",
        "must touch every row and exactly the shape that parallelizes flat",
        "across executors at cluster scale. Sub-linear tails on the join/",
        "top-k families show pruning and partial aggregation doing their",
        f"job. Super-linear (alpha_tail > 1) queries this run: {n_super}.",
        "",
    ]
    if remeasured:
        lines += [
            "† cell re-measured in-process (first-pass tail exponent exceeded",
            "1.15 — the automated co-tenant-noise recheck; min of all runs is",
            "what the table carries). First-pass values:",
            "",
        ]
        for name, cells in remeasured.items():
            orig = ", ".join(
                f"{'sf1' if sf == SF1 else sf.rsplit('sf', 1)[-1]}: {v:.3f}s"
                for sf, v in cells.items()
            )
            lines.append(f"- {name}: {orig}")
        lines.append("")
    out = "\n".join(lines)
    # preserve EVERY marker-delimited section another tool owns (the
    # 500K-doc probe, the 1M-vector probe, any future axis probe) across
    # sweep rewrites — r11 nearly lost the VEC1M block to a hardcoded
    # single-marker list
    md = "/root/repo/SCALING.md"
    if os.path.exists(md):
        import re as _re

        prev = open(md).read()
        for begin in _re.findall(r"<!-- [A-Z0-9]+ PROBE BEGIN -->", prev):
            end = begin.replace("BEGIN", "END")
            if end in prev:
                block = prev.split(begin)[1].split(end)[0]
                out = out.rstrip() + "\n\n" + begin + block + end + "\n"
    with open(md, "w") as f:
        f.write(out)
    print(f"wrote SCALING.md ({len(results)} queries x {len(SFS)} scales)")


if __name__ == "__main__":
    main()
