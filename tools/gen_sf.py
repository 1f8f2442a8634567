"""Local scale-factor generator for the sf1 scale-validation run
(round-7 verdict item #6).

The driver ships sf0.001/0.01/0.1 only; the "Spark per-query floor
amortizes at scale" argument needs at least one order of magnitude more
data to be tested rather than asserted.  This generates an sf1 directory
(10x sf0.1: 6M lineitem, 1M events, 50k documents, 20k embeddings) with
the SAME schemas and closely matched distributions (vocabulary, lang
mix, key ranges, value bands — probed from the sf0.1 parquet), seeded
and deterministic.  It is NOT the driver's generator: absolute result
values differ from a hypothetical driver sf1, but engine-vs-DuckDB
ratios on the same files — the thing the scale run measures — do not
care.

Usage: python tools/gen_sf.py [out_dir]   (default /root/repo/.localdata/sf1)
Writes one parquet per table; ~200 MB total.  Output dir is gitignored.
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.localdata/sf1"
SCALE = 10  # x sf0.1

N_DOC = 5_000 * SCALE
N_EMB = 2_000 * SCALE
N_EVT = 100_000 * SCALE
N_LI = 600_000 * SCALE
N_ORD = 150_000 * SCALE
N_PART = 20_000 * SCALE
N_CUST = 15_000 * SCALE
N_SUPP = 1_000 * SCALE
N_USERS = 1_500 * SCALE

VOCAB = ("a agg batch big column customer data dup fast filter group hash "
         "join key line merge order part query row scan slow small sort "
         "spark stream table the value vector window").split()
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.412, 0.150, 0.149, 0.148, 0.141]
ADJ = "large hot blue red green cold dim shiny".split()
NOUN = "ring bolt gear cog pin rod cap hub".split()
TYPES = ["ECONOMY", "LARGE", "STANDARD", "MEDIUM", "SMALL", "PROMO"]
SEGS = ["FURNITURE", "MACHINERY", "AUTOMOBILE", "BUILDING", "HOUSEHOLD"]
PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENTS = ["signup", "purchase", "view", "click", "error"]


def write(name: str, table: pa.Table) -> None:
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, f"{name}.parquet")
    pq.write_table(table, path)
    print(f"{name}: {table.num_rows} rows -> {path}", flush=True)


def gen_documents(rng: np.random.Generator) -> None:
    n_words = rng.integers(8, 97, N_DOC)
    widx = rng.integers(0, len(VOCAB), int(n_words.sum()))
    words = np.array(VOCAB, dtype=object)[widx]
    offs = np.concatenate(([0], np.cumsum(n_words)))
    texts = [" ".join(words[offs[i]:offs[i + 1]]) for i in range(N_DOC)]
    lang = rng.choice(LANGS, N_DOC, p=LANG_P)
    source = np.array([f"src{i}" for i in rng.integers(0, 20, N_DOC)],
                      dtype=object)
    write("documents", pa.table({
        "doc_id": pa.array(range(N_DOC), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang, pa.string()),
        "source": pa.array(source, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))


def gen_embeddings(rng: np.random.Generator) -> None:
    labels = rng.integers(0, 10, N_EMB)
    centers = rng.normal(0.0, 0.08, (10, 64))
    vecs = (centers[labels] + rng.normal(0.0, 0.07, (N_EMB, 64))).clip(
        -0.4, 0.4).astype(np.float32)
    write("embeddings", pa.table({
        "vec_id": pa.array(range(N_EMB), pa.int64()),
        "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


def gen_events(rng: np.random.Generator) -> None:
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = np.timedelta64(30 * 24 * 3600 * 1_000_000, "us")
    ts = base + (rng.random(N_EVT) * span.astype("int64")).astype(
        "timedelta64[us]")
    ts.sort()
    write("events", pa.table({
        "event_id": pa.array(range(N_EVT), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, N_USERS, N_EVT), pa.int64()),
        "event_type": pa.array(rng.choice(EVENTS, N_EVT), pa.string()),
        "value": pa.array(np.round(rng.random(N_EVT) * 560.21, 2),
                          pa.float64()),
        "props": pa.array([json.dumps({"k": int(k)})
                           for k in rng.integers(0, 100, N_EVT)],
                          pa.string()),
    }))


def gen_tpch(rng: np.random.Generator) -> None:
    write("lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, N_ORD, N_LI), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, N_PART, N_LI), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, N_SUPP, N_LI), pa.int64()),
        "l_linenumber": pa.array(rng.integers(1, 8, N_LI), pa.int32()),
        "l_quantity": pa.array(rng.integers(1, 51, N_LI).astype("float64")),
        "l_extendedprice": pa.array(
            np.round(900.0 + rng.random(N_LI) * 104100.0, 2)),
        "l_discount": pa.array(np.round(rng.random(N_LI) * 0.1, 2)),
        "l_tax": pa.array(np.round(rng.random(N_LI) * 0.08, 2)),
        "l_returnflag": pa.array(rng.choice(["R", "A", "N"], N_LI)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], N_LI)),
        "l_shipdate": pa.array(
            np.datetime64("1995-01-01", "us")
            + rng.integers(0, 2500, N_LI).astype("timedelta64[D]").astype(
                "timedelta64[us]"),
            pa.timestamp("us")),
    }))
    write("orders", pa.table({
        "o_orderkey": pa.array(range(N_ORD), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, N_CUST, N_ORD), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], N_ORD)),
        "o_totalprice": pa.array(
            np.round(1000.0 + rng.random(N_ORD) * 499000.0, 2)),
        "o_orderdate": pa.array(
            np.datetime64("1995-01-01", "us")
            + rng.integers(0, 2400, N_ORD).astype("timedelta64[D]").astype(
                "timedelta64[us]"),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(PRIOS, N_ORD)),
    }))
    adj = rng.integers(0, len(ADJ), N_PART)
    noun = rng.integers(0, len(NOUN), N_PART)
    write("part", pa.table({
        "p_partkey": pa.array(range(N_PART), pa.int64()),
        "p_name": pa.array([f"{ADJ[a]} {NOUN[n]}"
                            for a, n in zip(adj, noun)]),
        "p_brand": pa.array([f"Brand#{b}"
                             for b in rng.integers(0, 25, N_PART)]),
        "p_type": pa.array(rng.choice(TYPES, N_PART)),
        "p_size": pa.array(rng.integers(1, 51, N_PART), pa.int32()),
        "p_retailprice": pa.array(
            np.round(900.0 + rng.random(N_PART) * 99.9, 2)),
    }))
    write("customer", pa.table({
        "c_custkey": pa.array(range(N_CUST), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(N_CUST)]),
        "c_nationkey": pa.array(rng.integers(0, 25, N_CUST), pa.int32()),
        "c_acctbal": pa.array(
            np.round(-1000.0 + rng.random(N_CUST) * 11000.0, 2)),
        "c_mktsegment": pa.array(rng.choice(SEGS, N_CUST)),
    }))
    write("supplier", pa.table({
        "s_suppkey": pa.array(range(N_SUPP), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(N_SUPP)]),
        "s_nationkey": pa.array(rng.integers(0, 25, N_SUPP), pa.int32()),
        "s_acctbal": pa.array(
            np.round(-1000.0 + rng.random(N_SUPP) * 11000.0, 2)),
    }))
    # nation/region are fixed dimensions — copy sf0.1's verbatim
    import duckdb

    con = duckdb.connect()
    for t in ("nation", "region"):
        src = f"/root/testdata/sf0.1/{t}.parquet"
        con.execute(f"COPY (SELECT * FROM read_parquet('{src}')) TO "
                    f"'{os.path.join(OUT, t)}.parquet' (FORMAT PARQUET)")
        print(f"{t}: copied from sf0.1", flush=True)


def main() -> None:
    rng = np.random.default_rng(42)
    gen_documents(rng)
    gen_embeddings(rng)
    gen_events(rng)
    gen_tpch(rng)


if __name__ == "__main__":
    main()
