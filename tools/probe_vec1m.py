"""1M-vector embeddings-axis probe (r10 VERDICT missing #4).

The reference's own benchmark presets go to 1M ("stress") and 2M
("extreme") vectors (examples/benchmark.py:44-51) while the repo's
measured knn/serving evidence topped out at the 100K baseline corpus.
This probe extends the knn/IVF family one decade: generate a 1M x 128d
float32 corpus with the SAME clustered recipe as the 100K bench corpus
(256 gaussian centers, sigma 0.7 — rows-per-cluster grows 10x, the way a
real corpus densifies), measure the exact-GEMM and IVF serving paths at
BOTH scales in the same process, and report the per-row decade exponent
    alpha_1M = log10(t_1M / t_100K)
(1.0 = linear; < 1 = sub-linear, expected for the pruned IVF rows).
Recall@10 is measured against exact truth at each scale, never assumed.

Usage: python tools/probe_vec1m.py   (writes ~512 MB on first run)
The results table is appended to SCALING.md between VEC1M PROBE markers.
"""

from __future__ import annotations

import glob
import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

DIM = 128
SHARDS = 32
OUT = os.path.join(_REPO, ".bench", "vec1m_128d_c256")
OUT2M = os.path.join(_REPO, ".bench", "vec2m_128d_c256")
V100K = os.path.join(_REPO, ".bench", "vec100k_128d_c256")

# IVF geometry per scale: cells grow with the corpus so the probed
# fraction (and with it the probed bytes per query) stays bounded;
# nprobe picked by the same recall-first sweep discipline as bench.py
# (recall is MEASURED below — a config that drops recall shows up in the
# published row, not in prose).
CFG = {
    "100K": dict(n_cells=384, nprobe=3, assign_r=1, dtype="float32"),
    "1M": dict(n_cells=1024, nprobe=8, assign_r=1, dtype="float32"),
    # 2M = the reference's "extreme" preset; cells ~ sqrt growth keeps the
    # probed fraction bounded, nprobe swept recall-first in-process
    "2M": dict(n_cells=1448, nprobe=8, assign_r=1, dtype="float32"),
}
# IVF-PQ rerank depth per scale, recall-first like nprobe (residual codes,
# M=16, swept in-process at 1M: fetch_k 300 -> 0.917, 1000 -> 0.9935,
# 2000 -> 1.0; at 2M: 300 -> 0.8775, 1000 -> 0.9835; plain-vector codes
# needed ~4000 for the same recall — the residual-design gap)
IVFPQ_FETCH_K = {"100K": 300, "1M": 1000, "2M": 1000}
# 1M nprobe swept in-process (recall vs exact truth, 200 queries; full-
# matrix trainer): 4 -> 0.9665, 5 -> 0.9870, 6 -> 0.9975, 8 -> 1.0000 —
# recall-first, same discipline as the 100K bench config. With the r11
# sampled trainer the same nprobe 8 measures 0.9990 at 1M and 2M (the
# published rows) — the sample costs 1 hit in 2,000 for a 4x faster,
# linear-alpha build.
NQ_TRUTH = 200  # exact truth + recall basis (1M x 200 scores = 800 MB peak)


def gen_corpus(out_dir: str, n_rows: int, seed: int) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((256, DIM), dtype=np.float32)
    rows_per = n_rows // SHARDS
    for s in range(SHARDS):
        lo, hi = s * rows_per, (s + 1) * rows_per
        assign = rng.integers(0, 256, hi - lo)
        mat = centers[assign] + np.float32(0.7) * rng.standard_normal(
            (hi - lo, DIM), dtype=np.float32
        )
        tbl = pa.table({
            "vec_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), DIM
            ),
        })
        pq.write_table(tbl, os.path.join(out_dir, f"part-{s:05d}.parquet"),
                       row_group_size=100_000)
    with open(done, "w") as fh:
        fh.write("ok\n")


def main() -> int:
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    gen_corpus(OUT, 1_000_000, 1042)
    with_2m = "--no-2m" not in sys.argv
    if with_2m:
        gen_corpus(OUT2M, 2_000_000, 2042)
    if not glob.glob(os.path.join(V100K, "part-*.parquet")):
        print("run bench.py once first (builds the 100K corpus)")
        return 1

    from custom_python_vectordb_spark.operators.knn import knn_replica_serve
    from custom_python_vectordb_spark.operators.partitioned import (
        IvfReplicaHandle,
        ivf_replica_serve,
    )

    from bench import _mem_bw_gbps

    bw0 = _mem_bw_gbps()

    results: dict[str, dict[str, float]] = {}
    scales = [("100K", V100K), ("1M", OUT)] + ([("2M", OUT2M)] if with_2m else [])
    # TWO passes over the scales: pass 1 measures every bandwidth-bound
    # anchor (exact GEMM, IVF) BEFORE pass 2 runs the allocation-heavy
    # IVF-PQ builds — anchors should not share a measurement window with
    # GB-class build churn. NOTE the published rows still move with the
    # BOX: the 2M exact row measured 42-61 ms/q in two early-day runs and
    # 143-179 in three later runs with and without pass reordering, while
    # a same-window stream check read ~3.8 GB/s vs the usual 10-13 — i.e.
    # co-tenant memory traffic, not code (the same lesson as bench's
    # mem_bw_gbps row, which this probe now records alongside its table).
    prep: dict[str, tuple] = {}
    tl2_by_tag: dict[str, dict] = {}
    for tag, root in scales:
        shard_files = sorted(glob.glob(os.path.join(root, "part-*.parquet")))
        t0 = pq.read_table(shard_files[0])
        emb = np.stack(
            t0.column("embedding").to_numpy(zero_copy_only=False)[:NQ_TRUTH]
        ).astype(np.float32)
        qids = t0.column("vec_id").to_numpy()[:NQ_TRUTH]
        qpd = pd.DataFrame({"qid": qids, "qvec": list(emb)})
        prep[tag] = (root, shard_files, emb, qids, qpd)
        row: dict[str, float] = {}

        # exact GEMM replica: serving truth + the brute-force ms/q anchor
        knn_replica_serve(shard_files, qpd, k=10, dtype="float32")  # decode
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            exact = knn_replica_serve(shard_files, qpd, k=10, dtype="float32")
            best = min(best, time.perf_counter() - t)
        row["exact_gemm_ms_per_q"] = best * 1000 / NQ_TRUTH
        truth: dict[int, set] = {}
        for q, v in zip(exact["qid"], exact["vec_id"]):
            truth.setdefault(q, set()).add(v)

        cfg = CFG[tag]
        t = time.perf_counter()
        ivf_replica_serve(shard_files, qpd.iloc[:1], k=10, **cfg)  # build
        row["ivf_build_s"] = time.perf_counter() - t
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            res = ivf_replica_serve(shard_files, qpd, k=10, **cfg)
            best = min(best, time.perf_counter() - t)
        row["ivf_batch_ms_per_q"] = best * 1000 / NQ_TRUTH
        hits = sum(
            1 for q, v in zip(res["qid"], res["vec_id"]) if v in truth.get(q, ())
        )
        row["ivf_recall_at10"] = hits / (NQ_TRUTH * 10)

        handle = IvfReplicaHandle(shard_files, **cfg)
        qvecs = list(emb)
        for v in qvecs:
            handle.search_one(v, 10)
        p50s = []
        for _ in range(3):
            lat = []
            for v in qvecs:
                t = time.perf_counter()
                handle.search_one(v, 10)
                lat.append((time.perf_counter() - t) * 1000)
            lat.sort()
            p50s.append(lat[len(lat) // 2])
        p50s.sort()
        row["ivf_single_p50_ms"] = p50s[len(p50s) // 2]

        # L2 truth for pass 2's IVF-PQ recall (the tier's distance) —
        # computed here while the exact replica is hot and the heap clean
        exact_l2 = knn_replica_serve(
            shard_files, qpd, k=10, dtype="float32", metric="l2"
        )
        tl2: dict[int, set] = {}
        for q, v in zip(exact_l2["qid"], exact_l2["vec_id"]):
            tl2.setdefault(q, set()).add(v)
        tl2_by_tag[tag] = tl2
        results[tag] = row

    # pass 2: IVF-PQ tier (r11) — cell-pruned ADC over resident residual
    # PQ codes + exact rerank from the disk mmap float tier; 32× resident
    # compression at cell-pruned latency, recall measured per scale
    from custom_python_vectordb_spark.operators.partitioned import (
        IvfPqReplicaHandle,
    )

    for tag, root in scales:
        _root, shard_files, emb, qids, qpd = prep[tag]
        cfg = CFG[tag]
        row = results[tag]
        tl2 = tl2_by_tag[tag]
        qvecs = list(emb)
        t = time.perf_counter()
        ipq = IvfPqReplicaHandle(
            shard_files, n_cells=cfg["n_cells"], nprobe=cfg["nprobe"],
            assign_r=cfg["assign_r"],
            rerank_mmap_dir=os.path.join(root, "ivfpq_mmap"),
        )
        row["ivfpq_build_s"] = time.perf_counter() - t
        fk = IVFPQ_FETCH_K[tag]
        hits = 0
        for qid, v in zip(qids, qvecs):
            rids, _d = ipq.search_one(v, 10, fetch_k=fk)
            hits += len(set(int(i) for i in rids) & tl2.get(qid, set()))
        row["ivfpq_rerank_recall_at10"] = hits / (NQ_TRUTH * 10)
        p50s = []
        for _ in range(3):
            lat = []
            for v in qvecs:
                t = time.perf_counter()
                ipq.search_one(v, 10, fetch_k=fk)
                lat.append((time.perf_counter() - t) * 1000)
            lat.sort()
            p50s.append(lat[len(lat) // 2])
        p50s.sort()
        row["ivfpq_single_p50_ms"] = p50s[len(p50s) // 2]

    tags = [t for t, _ in scales]
    if with_2m:
        hdr = ("| metric | 100K | 1M | 2M | alpha_1M | alpha_2M |",
               "|---|---|---|---|---|---|")
    else:
        hdr = ("| metric | 100K | 1M | alpha_1M |", "|---|---|---|---|")
    lines = list(hdr)
    for key in ("exact_gemm_ms_per_q", "ivf_build_s", "ivf_batch_ms_per_q",
                "ivf_single_p50_ms", "ivf_recall_at10",
                "ivfpq_build_s", "ivfpq_single_p50_ms",
                "ivfpq_rerank_recall_at10"):
        vals = [results[t][key] for t in tags]
        cells = "".join(f" {v:.4f} |" for v in vals)
        alphas = ""
        if not key.endswith("recall_at10"):
            # per-step exponent normalized by that step's row ratio:
            # 100K->1M is 10x, 1M->2M is 2x
            a1 = math.log10(vals[1] / vals[0]) if vals[0] > 0 else float("nan")
            alphas = f" {a1:.2f} |"
            if with_2m:
                a2 = (math.log(vals[2] / vals[1]) / math.log(2.0)
                      if vals[1] > 0 else float("nan"))
                alphas += f" {a2:.2f} |"
        elif with_2m:
            alphas = "  |  |"
        else:
            alphas = "  |"
        lines.append(f"| {key} |{cells}{alphas}")
        print(lines[-1], flush=True)

    block = "\n".join(lines)
    begin, end = "<!-- VEC1M PROBE BEGIN -->", "<!-- VEC1M PROBE END -->"
    section = (
        f"{begin}\n\n## Fourth decade, embeddings axis (1M/2M-vector probe)\n\n"
        "tools/probe_vec1m.py: the knn/IVF serving family measured past\n"
        "the 100K baseline corpus to the reference's own 1M ('stress')\n"
        "and 2M ('extreme') bench presets (examples/benchmark.py:44-51;\n"
        "same clustered recipe,\n"
        f"{CFG['1M']['n_cells']} cells / nprobe {CFG['1M']['nprobe']} at 1M, "
        f"{CFG['2M']['n_cells']} / {CFG['2M']['nprobe']} at 2M"
        " — cells grow with the corpus so the probed fraction stays\n"
        "bounded; alpha_1M = log10 time ratio across the 10x step,\n"
        "alpha_2M = log2 ratio across the 2x step; 1.0 =\n"
        "linear, <1 sub-linear; recall@10 measured vs exact truth at each\n"
        "scale in the same run; mem_bw_gbps is the same-run single-thread\n"
        "bandwidth anchor the time rows normalize against — every serving\n"
        f"row here is memory-bound). This run: mem_bw_gbps = {bw0} at\n"
        f"start, {_mem_bw_gbps()} after the sweep.\n\n"
        "Reading: build is LINEAR since r11 (Lloyd trains on a 131k\n"
        "evenly-spaced sample, assignment is one chunked pass — was\n"
        "alpha 1.71 full-matrix); build cells are ONE-SHOT timings of\n"
        "an ingest-time step and swing up to 3x with co-tenant\n"
        "bandwidth (1M build across six r11 runs: 16.6-50.3 s; read\n"
        "them against the anchors above, not as exponents).\n"
        "Single-query p50 tracking ~1.0 is BY\n"
        "DESIGN at constant probed fraction (nprobe/cells held at\n"
        "~0.8%): probed bytes grow with the corpus; holding latency\n"
        "sub-linear instead costs recall or a deeper index (IVF-PQ —\n"
        "measured separately in bench's quantized serving rows). The\n"
        "batch row amortizes the centroid GEMM across queries, hence\n"
        "its sub-linear alpha.\n\n" + block + "\n\n" + end
    )
    md = os.path.join(_REPO, "SCALING.md")
    src = open(md).read()
    if begin in src:
        src = src.split(begin)[0] + section + src.split(end)[1]
    else:
        src = src.rstrip() + "\n\n" + section + "\n"
    with open(md, "w") as fh:
        fh.write(src)
    print("SCALING.md updated")
    return 0


if __name__ == "__main__":
    sys.exit(main())
