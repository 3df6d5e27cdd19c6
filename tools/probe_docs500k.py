"""Third-decade documents-axis probe (r8 VERDICT task #5).

The sweep's documents axis spans only 100x (500 -> 50K docs) while the
embeddings axis got 200x plus a 1M-vector probe. This probe extends the
text/span family's scaling evidence one more decade: generate a 500K-doc
corpus (10x the sf1 documents table, same vocabulary/dup-rate recipe as
tools/gen_sf1.py), run the heaviest documents-driven queries at 50K and
500K, and report the third-decade exponent
    alpha_3rd = log10(t_500K / t_50K)
per query (1.0 = linear, the optimum for must-touch-every-row scans;
>1 = super-linear, a scale-killer candidate).

Usage: python tools/probe_docs500k.py   (writes ~330 MB on first run)
The results table is appended to SCALING.md between PROBE markers.
"""

from __future__ import annotations

import math
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_DOCS = 500_000
OUT = os.path.join(_REPO, ".bench", "docs500k")
SF1 = os.path.join(_REPO, ".bench", "sf1")
LANGS = ["en", "de", "fr", "es", "zz"]
VOCAB = (
    "the line small group spark fast customer batch data column order a "
    "vector part scan slow agg key window table merge join query row stream "
    "sort value hash filter big dup"
).split()

QUERIES = [
    "dedup_lsh_pairs",
    "dedup_span_pairs",
    "corpus_final_cut_spans",
    "text_quality",
    "quality_model_score",
    "logprob_histogram",
    "dsir_importance_sample",
]


def gen_corpus() -> None:
    done = os.path.join(OUT, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(9)
    n_words = rng.integers(8, 101, N_DOCS)
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(N_DOCS):
        r = rng.random()
        if i > 100 and r < 0.005:
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 100 and r < 0.02:
            words = texts[int(rng.integers(0, i))].split()
            for _ in range(int(rng.integers(1, 4))):
                words[int(rng.integers(0, len(words)))] = str(
                    vocab[int(rng.integers(0, len(vocab)))]
                )
            texts.append(" ".join(words))
            continue
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words[i])]))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[i] for i in rng.integers(0, len(LANGS), N_DOCS)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, N_DOCS)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    path = os.path.join(OUT, "documents.parquet")
    os.makedirs(path, exist_ok=True)
    rows_per = N_DOCS // 32  # 32 part files so the scan parallelizes
    for s in range(32):
        lo = s * rows_per
        hi = N_DOCS if s == 31 else (s + 1) * rows_per
        pq.write_table(tbl.slice(lo, hi - lo),
                       os.path.join(path, f"part-{s:05d}.parquet"),
                       row_group_size=100_000)
    with open(done, "w") as fh:
        fh.write("ok\n")


def main() -> None:
    if "--5m" in sys.argv:
        raise SystemExit(probe_5m())
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    gen_corpus()
    if not os.path.exists(os.path.join(SF1, "_DONE")):
        import subprocess

        subprocess.run([sys.executable, os.path.join(_REPO, "tools", "gen_sf1.py")], check=True)

    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.session import get_spark

    registry.load_all()
    spark = get_spark("probe-docs500k")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "| query | 50K docs s | 500K docs s | alpha_3rd |",
        "|---|---|---|---|",
    ]
    for name in QUERIES:
        fn = getattr(registry.QUERIES[name], "__wrapped__")
        ts = {}
        for tag, sf_dir in (("50K", SF1), ("500K", OUT)):
            registry.clear_plan_memos()
            fn(spark, sf_dir).collect()  # warm
            best = float("inf")
            for _ in range(2):
                registry.clear_plan_memos()
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - t0)
            ts[tag] = best
        alpha = math.log10(ts["500K"] / ts["50K"])
        lines.append(f"| {name} | {ts['50K']:.3f} | {ts['500K']:.3f} | {alpha:.2f} |")
        print(lines[-1], flush=True)

    block = "\n".join(lines)
    begin, end = "<!-- DOCS500K PROBE BEGIN -->", "<!-- DOCS500K PROBE END -->"
    section = (
        f"{begin}\n\n## Third decade, documents axis (500K-doc probe)\n\n"
        "tools/probe_docs500k.py: the text/span family measured one decade\n"
        "past the sweep (50K -> 500K docs, same corpus recipe; alpha_3rd =\n"
        "log10 time ratio across the 10x step — 1.0 is linear).\n\n"
        + block + "\n\n" + end
    )
    md = os.path.join(_REPO, "SCALING.md")
    src = open(md).read()
    if begin in src:
        pre = src.split(begin)[0]
        post = src.split(end)[1]
        src = pre + section + post
    else:
        src = src.rstrip() + "\n\n" + section + "\n"
    with open(md, "w") as fh:
        fh.write(src)
    print("SCALING.md updated")




# ---- fourth decade (r13): 5M docs, trimmed to the heaviest family
# representatives (cheapest first so partial evidence lands early), with
# the 500K corpus as the in-process anchor. Protocol: one warm run
# (includes any lazy ingest-index build — charged to ingest, as at 500K)
# + ONE timed run per scale (a best-of-2 at ~10-minute queries would
# double an hour-class probe for ±4% alpha noise). The SCALING block is
# rewritten after EVERY row so an interrupted probe still publishes what
# it measured.
N_DOCS_5M = 5_000_000
OUT5M = os.path.join(_REPO, ".bench", "docs5m")
QUERIES_5M = [
    "dedup_lsh_pairs",
    "text_quality",
    "dedup_span_pairs",
    "corpus_final_cut_spans",
]


def _gen_corpus_at(out_dir: str, n_docs: int, seed: int) -> None:
    """Same vocabulary/dup-rate recipe as gen_corpus, parametrized."""
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_words = rng.integers(8, 101, n_docs)
    texts: list[str] = []
    vocab = np.array(VOCAB)
    for i in range(n_docs):
        r = rng.random()
        if i > 100 and r < 0.005:
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 100 and r < 0.02:
            words = texts[int(rng.integers(0, i))].split()
            for _ in range(int(rng.integers(1, 4))):
                words[int(rng.integers(0, len(words)))] = str(
                    vocab[int(rng.integers(0, len(vocab)))]
                )
            texts.append(" ".join(words))
            continue
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), n_words[i])]))
    tbl = pa.table({
        "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[i] for i in rng.integers(0, len(LANGS), n_docs)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, n_docs)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    })
    path = os.path.join(out_dir, "documents.parquet")
    os.makedirs(path, exist_ok=True)
    rows_per = n_docs // 32
    for s in range(32):
        lo = s * rows_per
        hi = n_docs if s == 31 else (s + 1) * rows_per
        pq.write_table(tbl.slice(lo, hi - lo),
                       os.path.join(path, f"part-{s:05d}.parquet"),
                       row_group_size=100_000)
    with open(done, "w") as fh:
        fh.write("ok\n")


def probe_5m() -> int:
    for var in ("OPENBLAS_NUM_THREADS", "OMP_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(var, "1")
    gen_corpus()  # 500K anchor
    print("500K anchor ready; generating 5M corpus...", flush=True)
    _gen_corpus_at(OUT5M, N_DOCS_5M, 95)
    print("5M corpus ready", flush=True)

    from custom_python_vectordb_spark import registry
    from custom_python_vectordb_spark.session import get_spark

    from bench import _mem_bw_gbps

    registry.load_all()
    spark = get_spark("probe-docs5m")
    spark.sparkContext.setLogLevel("ERROR")
    bw0 = _mem_bw_gbps()

    begin, end = "<!-- DOCS5M PROBE BEGIN -->", "<!-- DOCS5M PROBE END -->"

    def publish(lines, note=""):
        block = "\n".join(lines)
        section = (
            f"{begin}\n\n## Fourth decade, documents axis (5M-doc probe)\n\n"
            "tools/probe_docs500k.py --5m: the text/span family one MORE\n"
            "decade (500K -> 5M docs, same recipe — ~0.5% exact dups, ~1.5%\n"
            "near-dups; 5M docs ~= 3.3 GB of text). alpha_4th = log10 time\n"
            "ratio across the 10x step, 1.0 = linear (the optimum for\n"
            "must-touch-every-row scans). Protocol: one warm run (lazy\n"
            "ingest-index builds charge to ingest, as at 500K) + one timed\n"
            "run per scale; the block republishes after every row so an\n"
            "interrupted probe still reports.\n"
            f"Anchors: mem_bw_gbps {bw0} at start{note}.\n\n"
            + block + "\n\n" + end
        )
        md = os.path.join(_REPO, "SCALING.md")
        src = open(md).read()
        if begin in src:
            src = src.split(begin)[0] + section + src.split(end)[1]
        else:
            src = src.rstrip() + "\n\n" + section + "\n"
        with open(md, "w") as fh:
            fh.write(src)

    lines = [
        "| query | 500K docs s | 5M docs s | alpha_4th |",
        "|---|---|---|---|",
    ]
    for name in QUERIES_5M:
        fn = getattr(registry.QUERIES[name], "__wrapped__")
        ts = {}
        for tag, sf_dir in (("500K", OUT), ("5M", OUT5M)):
            registry.clear_plan_memos()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()  # warm (incl lazy ingest builds)
            warm_s = time.perf_counter() - t0
            registry.clear_plan_memos()
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            ts[tag] = time.perf_counter() - t0
            print(f"{name} @{tag}: warm {warm_s:.1f}s timed {ts[tag]:.1f}s",
                  flush=True)
        alpha = math.log10(ts["5M"] / ts["500K"])
        lines.append(
            f"| {name} | {ts['500K']:.3f} | {ts['5M']:.3f} | {alpha:.2f} |"
        )
        publish(lines)
        print(lines[-1], flush=True)
    publish(lines, note=f", {_mem_bw_gbps()} after")
    print("SCALING.md updated (5M docs block)")
    return 0


if __name__ == "__main__":
    main()
