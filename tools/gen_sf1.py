"""Generate a local sf1-equivalent dataset (10x sf0.1) for the scaling sweep.

/root/testdata is read-only and tops out at sf0.1 (600K lineitem), where
half the measured scaling exponents are still fixed-overhead-dominated
(alpha ~ 0) and the steep ones haven't shown their true exponent (r5
VERDICT next-round #1). This writes a DETERMINISTIC (seeded PCG64,
bit-identical across runs) sf1-equivalent to `<repo>/.bench/sf1/` with the
same schemas, value domains, and distribution SHAPES as the driver's
tables — 6M lineitem, 1.5M orders, 1M events, 50K documents, 8K
embeddings — so tools/scaling.py can extend its spread to 1000x.

It is a TIMING corpus only: per-query results are never oracle-compared at
this scale (the driver's correctness gate stays at sf0.01 on the driver's
own data), so matching the reference generator row-for-row is neither
needed nor attempted; what matters is that plans face the same value
domains (vocab, langs, sources, event types, key ranges) and similar
selectivities so operator timings extrapolate.

Usage: python tools/gen_sf1.py   (writes ~0.5 GB; no-op if _DONE exists)
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".bench", "sf1")

# 10x the sf0.1 row counts (region/nation fixed). Embeddings deliberately
# OVERSHOOT the driver's 4x-per-decade curve (500 -> 2000 -> would-be 8000):
# r7's sweep spanned only 16x on this axis, which let a quadratic assignment
# term hide under the GEMM constant (the semdedup scale-killer) — 100K rows
# give the vector family a 200x spread / two full decades on the tail, so
# super-linear terms in knn/maxsim/semdedup are measurable (r7 VERDICT #2).
N_CUSTOMER = 150_000
N_SUPPLIER = 10_000
N_PART = 200_000
N_ORDERS = 1_500_000
N_LINEITEM = 6_000_000
N_EVENTS = 1_000_000
N_USERS = 1_500  # fixed across sf in the driver data (events/user grows)
N_DOCS = 50_000
N_EMB = 100_000
EMB_DIM = 64

# the sf0.1 documents vocabulary, verbatim (31 words)
VOCAB = (
    "the line small group spark fast customer batch data column order a "
    "vector part scan slow agg key window table merge join query row stream "
    "sort value hash filter big dup"
).split()

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
RETFLAGS = ["A", "N", "R"]
LINESTATUS = ["F", "O"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "red", "green", "small", "dim", "pale"]
PNOUN = ["ring", "bolt", "case", "drum", "pack", "wrap", "disk", "tube"]
LANGS = (["en"] * 8 + ["zh"] * 3 + ["es"] * 3 + ["fr"] * 3 + ["de"] * 3)
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]

US_DAY = 86_400_000_000


def _write(name: str, table: pa.Table, row_group: int | None = None) -> None:
    # ~64 row groups per table (r14): a single 200K row group put the
    # whole 100K-row embeddings table (and the 50K documents) in ONE scan
    # split, so every vector/text query ran single-task at sf1 and the
    # 8-vs-32-core probe read ratio ≈ 1 — an input-layout artifact (guide
    # §2.5 input skew), not engine behavior. Parquet splits at row-group
    # granularity; 64 groups give 32 cores headroom at any table size.
    if row_group is None:
        row_group = max(1024, min(200_000, table.num_rows // 64))
    pq.write_table(
        table, os.path.join(OUT, f"{name}.parquet"),
        row_group_size=row_group, compression="zstd",
    )
    print(f"  {name}: {table.num_rows:,} rows")


def _ts_us(base: str, offset_us: np.ndarray) -> pa.Array:
    base_us = np.datetime64(base, "us").astype(np.int64)
    return pa.array(base_us + offset_us, type=pa.timestamp("us"))


def main() -> None:
    done = os.path.join(OUT, "_DONE")
    if os.path.exists(done):
        print(f"{OUT} already generated")
        return
    os.makedirs(OUT, exist_ok=True)
    rng = np.random.default_rng(42)

    _write("region", pa.table({
        "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
        "r_name": pa.array(REGIONS),
    }))
    _write("nation", pa.table({
        "n_nationkey": pa.array(np.arange(25, dtype=np.int32)),
        "n_name": pa.array([f"NATION_{i:02d}" for i in range(25)]),
        "n_regionkey": pa.array((np.arange(25) % 5).astype(np.int32)),
    }))

    ck = np.arange(N_CUSTOMER, dtype=np.int64)
    _write("customer", pa.table({
        "c_custkey": pa.array(ck),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUSTOMER)]),
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUSTOMER).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, N_CUSTOMER), 2)),
        "c_mktsegment": pa.array([SEGMENTS[i] for i in rng.integers(0, 5, N_CUSTOMER)]),
    }))

    _write("supplier", pa.table({
        "s_suppkey": pa.array(np.arange(N_SUPPLIER, dtype=np.int64)),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPPLIER)]),
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPPLIER).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-999.99, 9999.99, N_SUPPLIER), 2)),
    }))

    adj = rng.integers(0, len(PADJ), N_PART)
    noun = rng.integers(0, len(PNOUN), N_PART)
    _write("part", pa.table({
        "p_partkey": pa.array(np.arange(N_PART, dtype=np.int64)),
        "p_name": pa.array([f"{PADJ[a]} {PNOUN[b]}" for a, b in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{i}" for i in rng.integers(1, 26, N_PART)]),
        "p_type": pa.array([PTYPES[i] for i in rng.integers(0, len(PTYPES), N_PART)]),
        "p_size": pa.array(rng.integers(1, 51, N_PART).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, N_PART), 2)),
    }))

    # orders: dates uniform over 1995-01-01 .. 2001-08-01 (the sf0.1 span)
    okey = np.arange(N_ORDERS, dtype=np.int64)
    span_days = (np.datetime64("2001-08-01") - np.datetime64("1995-01-01")).astype(int)
    odate_day = rng.integers(0, span_days + 1, N_ORDERS)
    _write("orders", pa.table({
        "o_orderkey": pa.array(okey),
        "o_custkey": pa.array(rng.integers(0, N_CUSTOMER, N_ORDERS)),
        "o_orderstatus": pa.array([STATUSES[i] for i in rng.integers(0, 3, N_ORDERS)]),
        "o_totalprice": pa.array(np.round(rng.uniform(850, 560000, N_ORDERS), 2)),
        "o_orderdate": _ts_us("1995-01-01", odate_day * US_DAY),
        "o_orderpriority": pa.array([PRIORITIES[i] for i in rng.integers(0, 5, N_ORDERS)]),
    }))

    # lineitem: ~4 lines/order, shipdate = orderdate + 1..95 days
    li_order = rng.integers(0, N_ORDERS, N_LINEITEM)
    li_order.sort()  # cluster lines by order (matches generator layout)
    qty = rng.integers(1, 51, N_LINEITEM).astype(np.float64)
    price = np.round(rng.uniform(900, 105000, N_LINEITEM), 2)
    _write("lineitem", pa.table({
        "l_orderkey": pa.array(li_order),
        "l_partkey": pa.array(rng.integers(0, N_PART, N_LINEITEM)),
        "l_suppkey": pa.array(rng.integers(0, N_SUPPLIER, N_LINEITEM)),
        "l_linenumber": pa.array((np.arange(N_LINEITEM) % 7 + 1).astype(np.int32)),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, N_LINEITEM), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, N_LINEITEM), 2)),
        "l_returnflag": pa.array([RETFLAGS[i] for i in rng.integers(0, 3, N_LINEITEM)]),
        "l_linestatus": pa.array([LINESTATUS[i] for i in rng.integers(0, 2, N_LINEITEM)]),
        "l_shipdate": _ts_us(
            "1995-01-01", (odate_day[li_order] + rng.integers(1, 96, N_LINEITEM)) * US_DAY
        ),
    }))

    # events: 30 days of Jan 2024, value ~ Exp(50) (sf0.1: avg 49.9, max 560)
    ev_off = rng.integers(0, 30 * US_DAY, N_EVENTS)
    ev_off.sort()
    _write("events", pa.table({
        "event_id": pa.array(np.arange(N_EVENTS, dtype=np.int64)),
        "ts": _ts_us("2024-01-01", ev_off),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVENTS)),
        "event_type": pa.array([EVENT_TYPES[i] for i in rng.integers(0, 5, N_EVENTS)]),
        "value": pa.array(np.round(rng.exponential(50.0, N_EVENTS), 2)),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, N_EVENTS)]),
    }))

    # documents: 8-100 words from the 31-word vocab; ~0.5% exact dups and
    # ~1.5% near-dups (copy an earlier doc, perturb 1-3 words) so the
    # dedup family has real pair structure to find at this scale
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
    _write("documents", pa.table({
        "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
        "text": pa.array(texts),
        "lang": pa.array([LANGS[i] for i in rng.integers(0, len(LANGS), N_DOCS)]),
        "source": pa.array([f"src{i}" for i in rng.integers(0, 20, N_DOCS)]),
        "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
    }))

    # embeddings: 10 labeled gaussian clusters in 64d (the sf shape)
    centers = rng.standard_normal((10, EMB_DIM)).astype(np.float32)
    label = rng.integers(0, 10, N_EMB)
    mat = centers[label] + np.float32(0.5) * rng.standard_normal(
        (N_EMB, EMB_DIM)
    ).astype(np.float32)
    _write("embeddings", pa.table({
        "vec_id": pa.array(np.arange(N_EMB, dtype=np.int64)),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1)), EMB_DIM
        ).cast(pa.list_(pa.float32())),
        "label": pa.array(label.astype(np.int32)),
    }))

    with open(done, "w") as fh:
        fh.write("ok\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
