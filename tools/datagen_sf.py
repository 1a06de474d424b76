"""Deterministic TPC-H-ish data generator for scale probing beyond the
driver-provided fixtures (round-5 verdict item 1: the relational /
TPC-H / stats families have scale evidence only to sf0.1 = 600k
lineitem rows; sf1 is where DECIMAL(38) agg cost, AQE skew splits and
spill first become visible).

Schema- and distribution-compatible with `/root/testdata/sf*` (same
column names/arrow types, same value domains: dates 1995-2001, qty
1-50, discount 0-0.10, five mktsegments/priorities/event types,
word-salad documents with power-law-ish lengths, 64-dim clustered
embeddings with 10 labels). NOT the same rows — the driver's generator
seed is unknown; this data is for PERFORMANCE measurement (exponent
fits vs sf), while correctness stays gated by the sf0.01 oracles.

Usage:
    python tools/datagen_sf.py --sf 1 --out /tmp/mts_sf1

Writes one parquet file per table, multiple row groups so Spark splits
a single file across tasks. Pure numpy+pyarrow — no Spark session, so
it can run while a bench session owns the JVM.
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "en", "en", "en", "de", "fr", "es", "zh"]  # en-heavy like fixtures
VOCAB = (
    "spark table query column row scan filter join group agg sort hash value key "
    "stream batch line order part customer vector fast slow small large index "
    "cache shuffle plan stage task executor driver broadcast skew salt bucket"
).split()

DAY_US = 86_400_000_000


def _dates_us(rng, n, start_day, span_days):
    return (start_day + rng.integers(0, span_days, n)) * DAY_US


def _write(out, name, table, row_group_rows=200_000):
    path = os.path.join(out, f"{name}.parquet")
    pq.write_table(table, path, row_group_size=row_group_rows, compression="snappy")
    print(f"{name}: {table.num_rows} rows -> {path}")


def generate(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_vec = int(20_000 * sf)

    # epoch-day anchors: 1995-01-01 = 9131, 2024-01-01 = 19723
    d1995, span7y = 9131, 2404  # -> 1995-01-01 .. 2001-08

    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": regions,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i:02d}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))

    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))

    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999.99, 9999.99, n_supp), 2),
    }))

    brands = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
    types = [f"{a} {b} {c}" for a in ("STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO")
             for b in ("ANODIZED", "BURNISHED", "PLATED", "POLISHED", "BRUSHED")
             for c in ("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")]
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [f"part {VOCAB[i % len(VOCAB)]} {i}" for i in range(n_part)],
        "p_brand": pa.array(np.array(brands)[rng.integers(0, len(brands), n_part)]),
        "p_type": pa.array(np.array(types)[rng.integers(0, len(types), n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(rng.uniform(900.0, 2000.0, n_part), 2),
    }))

    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(850.0, 450_000.0, n_ord), 2),
        "o_orderdate": pa.array(_dates_us(rng, n_ord, d1995, span7y), pa.timestamp("us")),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]),
    }))

    # lineitem: mild Zipf skew on partkey/suppkey so AQE skew handling
    # and salting actually have something to chew on at sf1
    zipf_part = np.minimum(rng.zipf(1.3, n_li) - 1, n_part - 1)
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
        "l_partkey": pa.array(zipf_part, pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(900.0, 105_000.0, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[rng.integers(0, 2, n_li)]),
        "l_shipdate": pa.array(_dates_us(rng, n_li, d1995 + 1, span7y + 90), pa.timestamp("us")),
    }))

    # events: 30 days of 2024-01, per-user power-lawish activity
    t0 = 19723 * DAY_US
    ts = np.sort(t0 + rng.integers(0, 30 * DAY_US, n_ev))
    n_users = max(1, int(15_000 * sf))
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_ev), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(np.minimum(rng.zipf(1.5, n_ev) - 1, n_users - 1), pa.int64()),
        "event_type": pa.array(np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)]),
        "value": np.round(rng.uniform(0.0, 500.0, n_ev), 2),
        "props": pa.array([f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)]),
    }))

    # documents: word salad with power-law lengths + planted near-dups
    # (every 20th doc repeats the previous doc's words) so dedup ops
    # find real structure
    lens = np.minimum(5 + (rng.pareto(2.0, n_doc) * 30).astype(int), 400)
    vocab = np.array(VOCAB)
    texts = []
    prev_words = None
    for i in range(n_doc):
        if i % 20 == 19 and prev_words is not None:
            words = prev_words.copy()
            words[rng.integers(0, len(words))] = vocab[rng.integers(0, len(vocab))]
        else:
            words = vocab[rng.integers(0, len(vocab), lens[i])]
        prev_words = words
        texts.append(" ".join(words))
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[rng.integers(0, len(LANGS), n_doc)]),
        "source": [f"src{int(s)}" for s in rng.integers(0, 20, n_doc)],
        "n_chars": pa.array(np.array([len(t) for t in texts]), pa.int64()),
    }), row_group_rows=50_000)

    # embeddings: 10 gaussian clusters in 64-dim (so kNN/kmeans/ANN see
    # real neighborhood structure), float32 like the fixtures
    labels = rng.integers(0, 10, n_vec)
    centers = rng.normal(0, 1.0, (10, 64))
    vecs = (centers[labels] + rng.normal(0, 0.35, (n_vec, 64))).astype(np.float32)
    _write(out, "embeddings", pa.table({
        "vec_id": pa.array(np.arange(n_vec), pa.int64()),
        "embedding": pa.FixedSizeListArray.from_arrays(pa.array(vecs.ravel(), pa.float32()), 64).cast(pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), row_group_rows=50_000)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    a = ap.parse_args()
    generate(a.sf, a.out, a.seed)
