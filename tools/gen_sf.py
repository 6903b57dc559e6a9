"""Generate a REAL scale-factor dataset (r15, VERDICT r14 #6).

The container ships driver-generated parquet up to sf0.1 only
(TESTDATA.md — read-only), so previous scale probes replicated sf0.1
10x with remapped keys.  Replicated keys cannot expose skew the way a
real larger generation can: every user/customer keeps its 1x row
count.  This generator emits a FRESH sf with the same schemas and
value domains as the driver tables (measured from sf0.1) but
genuinely larger key spaces and a Zipf-skewed activity distribution
over users/customers — the shape a real crawl/sales corpus has.

Usage: python tools/gen_sf.py [sf] [out_dir]
  sf       scale factor (default 1.0; row counts = sf0.1 counts * 10sf)
  out_dir  default /tmp/sf{sf}

Deterministic (seed 4242 — intentionally NOT the driver's seed 42:
this is new data, not a regeneration).  Writes one parquet per table:
region nation customer supplier part orders lineitem events documents
embeddings.
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
OUT = Path(sys.argv[2] if len(sys.argv) > 2
           else f"/tmp/sf{SF:g}")
#: sf0.1 row counts (measured) — scale linearly from there
BASE = {"customer": 15_000, "supplier": 1_000, "part": 20_000,
        "orders": 150_000, "lineitem": 600_000, "events": 100_000,
        "documents": 5_000, "embeddings": 2_000}
MULT = SF / 0.1

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
NATIONS = ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT",
           "ETHIOPIA", "FRANCE", "GERMANY", "INDIA", "INDONESIA",
           "IRAN", "IRAQ", "JAPAN", "JORDAN", "KENYA", "MOROCCO",
           "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA", "SAUDI ARABIA",
           "VIETNAM", "RUSSIA", "UNITED KINGDOM", "UNITED STATES"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
            "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
              "5-LOW"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
VOCAB = ["batch", "data", "part", "scan", "slow", "agg", "key",
         "window", "table", "merge", "join", "the", "query", "row",
         "stream", "sort", "value", "hash", "filter", "big", "dup",
         "spark", "fast", "customer", "column", "order", "a",
         "vector", "line", "small", "group"]
LANGS = (["en"] * 8 + ["es", "de", "fr", "zh"] * 3)  # ~40% en


def n_of(t: str) -> int:
    return max(1, int(round(BASE[t] * MULT)))


def zipf_keys(rng, n_rows: int, n_keys: int, a: float = 1.3):
    """Zipf-skewed key assignment clipped to the key space — the
    heavy-user/heavy-customer shape replication cannot produce."""
    z = rng.zipf(a, n_rows)
    return ((z - 1) % n_keys).astype(np.int64)


def write(name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), OUT / f"{name}.parquet")
    print(f"  {name}: {len(next(iter(cols.values())))} rows")


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(4242)
    print(f"gen_sf: sf={SF} -> {OUT}")

    write("region", {"r_regionkey": np.arange(5, dtype=np.int32),
                     "r_name": REGIONS})
    write("nation", {"n_nationkey": np.arange(25, dtype=np.int32),
                     "n_name": NATIONS,
                     "n_regionkey": (np.arange(25) % 5)
                     .astype(np.int32)})

    nc = n_of("customer")
    write("customer", {
        "c_custkey": np.arange(nc, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": rng.randint(0, 25, nc).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
        "c_mktsegment": [SEGMENTS[i] for i in
                         rng.randint(0, 5, nc)]})

    ns = n_of("supplier")
    write("supplier", {
        "s_suppkey": np.arange(ns, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": rng.randint(0, 25, ns).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, ns), 2)})

    npart = n_of("part")
    write("part", {
        "p_partkey": np.arange(npart, dtype=np.int64),
        "p_name": [f"part {VOCAB[i % 31]} {i}" for i in range(npart)],
        "p_brand": [f"Brand#{1 + i % 25}" for i in
                    rng.randint(0, 25, npart)],
        "p_type": [PTYPES[i] for i in rng.randint(0, 6, npart)],
        "p_size": rng.randint(1, 51, npart).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 2100, npart), 2)})

    no = n_of("orders")
    day = np.int64(86_400_000_000)  # us
    t0 = np.int64(788_918_400_000_000)  # 1995-01-01 UTC in us
    odate = (t0 + rng.randint(0, 2404, no).astype(np.int64) * day)
    ocust = zipf_keys(rng, no, nc)  # skewed: heavy customers exist
    write("orders", {
        "o_orderkey": pa.array(np.arange(no, dtype=np.int64)),
        "o_custkey": pa.array(ocust),
        "o_orderstatus": [("F", "O", "P")[i] for i in
                          rng.choice(3, no, p=[0.49, 0.49, 0.02])],
        "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": [PRIORITIES[i] for i in
                            rng.randint(0, 5, no)]})

    nl = n_of("lineitem")
    lok = np.sort(zipf_keys(rng, nl, no, a=2.0))  # 1..7 lines/order
    linenum = np.ones(nl, dtype=np.int32)
    same = np.concatenate([[False], lok[1:] == lok[:-1]])
    run = np.ones(nl, dtype=np.int32)
    for i in range(1, nl):           # short loop is fine at gen time
        if same[i]:
            run[i] = run[i - 1] + 1
    linenum = run
    qty = rng.randint(1, 51, nl).astype(np.float64)
    price = np.round(rng.uniform(900, 105000, nl), 2)
    write("lineitem", {
        "l_orderkey": pa.array(lok),
        "l_partkey": pa.array(zipf_keys(rng, nl, npart)),
        "l_suppkey": pa.array(rng.randint(0, ns, nl)
                              .astype(np.int64)),
        "l_linenumber": linenum,
        "l_quantity": qty,
        "l_extendedprice": price,
        "l_discount": np.round(rng.randint(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.randint(0, 9, nl) / 100.0, 2),
        "l_returnflag": [("A", "N", "R")[i] for i in
                         rng.randint(0, 3, nl)],
        "l_linestatus": [("F", "O")[i] for i in rng.randint(0, 2, nl)],
        "l_shipdate": pa.array(
            t0 + rng.randint(1, 2500, nl).astype(np.int64) * day,
            pa.timestamp("us"))})

    ne = n_of("events")
    nusers = max(1, int(round(1_500 * MULT)))
    e_t0 = np.int64(1_704_067_200_000_000)  # 2024-01-01 UTC us
    ets = np.sort(e_t0 + rng.randint(
        0, 30 * 86_400_000_000, ne).astype(np.int64))
    write("events", {
        "event_id": pa.array(np.arange(ne, dtype=np.int64)),
        "ts": pa.array(ets, pa.timestamp("us")),
        "user_id": pa.array(zipf_keys(rng, ne, nusers)),
        "event_type": [EVENT_TYPES[i] for i in rng.randint(0, 5, ne)],
        "value": np.round(rng.exponential(60, ne), 2),
        "props": [f'{{"k": {int(k)}}}' for k in
                  rng.randint(0, 100, ne)]})

    nd = n_of("documents")
    vocab = np.array(VOCAB)
    # Zipf word draw (real corpora are Zipfian; the sf0.1 tables are
    # near-uniform — this is the harder LSH/BM25 shape)
    texts = []
    lens = np.clip(rng.poisson(50, nd), 8, 110)
    for i in range(nd):
        w = vocab[((rng.zipf(1.4, lens[i]) - 1) % 31).astype(int)]
        texts.append(" ".join(w))
    write("documents", {
        "doc_id": pa.array(np.arange(nd, dtype=np.int64)),
        "text": texts,
        "lang": [LANGS[i] for i in rng.randint(0, len(LANGS), nd)],
        "source": [f"src{i}" for i in rng.randint(0, 20, nd)],
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64))})

    nv = n_of("embeddings")
    centers = rng.normal(0, 0.35, (10, 64))
    labels = rng.randint(0, 10, nv)
    emb = (centers[labels]
           + rng.normal(0, 0.12, (nv, 64))).astype(np.float32)
    write("embeddings", {
        "vec_id": pa.array(np.arange(nv, dtype=np.int64)),
        "embedding": pa.array(list(emb),
                              pa.list_(pa.float32())),
        "label": pa.array(labels.astype(np.int32))})
    print("done")


if __name__ == "__main__":
    main()
