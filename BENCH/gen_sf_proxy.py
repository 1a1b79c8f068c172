"""Generate a LOCAL sf1.0-shaped measurement proxy (perf only, never
correctness): the driver's round-end bench escalated to a generated
/root/testdata/sf1.0 in round 5 (BENCH_r05.json "sf"), but that
directory is not present in the sandbox between rounds. This script
extrapolates the deterministic sf0.1 tables 10x with the same schemas
and the distribution parameters measured from sf0.001/0.01/0.1
(documents: 10-100-word texts over the 31-word vocab, 20 sources,
5 langs at the observed mix, ~0.2% planted exact dups; events: 10
events/user/day shape, sequential event_id~ts, props {"k": 0..99};
embeddings: 64-dim unit-norm, 10 uniform labels, 20k rows per the
measured ~20M label-blocked pairs at sf1.0; TPC-H tables: 10 key-shifted
copies of sf0.1 preserving FK structure).

Usage: python BENCH/gen_sf_proxy.py /root/testdata_proxy/sf1.0p
Correctness gates stay on the real sf0.001/0.01/0.1 only.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
SCALE = 10


def gen_documents(out: str, rng: np.random.Generator) -> None:
    con = duckdb.connect()
    vocab = [w for (w,) in con.sql(
        f"select distinct unnest(string_split(text,' ')) w "
        f"from '{SRC}/documents.parquet' order by 1").fetchall()]
    n = 5000 * SCALE
    langs = np.array(["en", "zh", "es", "fr", "de"])
    lang_p = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
    n_words = rng.integers(10, 101, size=n)
    texts = []
    for i in range(n):
        ws = rng.integers(0, len(vocab), size=n_words[i])
        texts.append(" ".join(vocab[w] for w in ws))
    # ~0.2% planted exact dups (copy an earlier doc's text)
    n_dup = n // 500
    dup_at = rng.integers(1, n, size=n_dup)
    for j in dup_at:
        texts[j] = texts[rng.integers(0, j)]
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(rng.choice(langs, p=lang_p, size=n), pa.string()),
        "source": pa.array([f"src{i % 20}" for i in range(n)], pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{out}/documents.parquet")


def gen_events(out: str, rng: np.random.Generator) -> None:
    n = 100000 * SCALE
    n_users = 1500 * SCALE
    t0 = dt.datetime(2024, 1, 1).timestamp() * 1e6
    t1 = dt.datetime(2024, 1, 31).timestamp() * 1e6
    ts = np.sort(rng.uniform(t0, t1, size=n)).astype(np.int64)
    types = np.array(["signup", "click", "error", "view", "purchase"])
    props = [json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)]
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(rng.choice(types, size=n), pa.string()),
        "value": pa.array(np.round(rng.exponential(50.0, size=n), 2),
                          pa.float64()),
        "props": pa.array(props, pa.string()),
    })
    pq.write_table(tbl, f"{out}/events.parquet")


def gen_embeddings(out: str, rng: np.random.Generator) -> None:
    n = 20000
    dim = 64
    v = rng.standard_normal((n, dim)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet")


def gen_tpch(out: str) -> None:
    con = duckdb.connect()
    shifts = {
        "lineitem": {"l_orderkey": 600000, "l_partkey": 20000,
                     "l_suppkey": 1000},
        "orders": {"o_orderkey": 600000, "o_custkey": 15000},
        "customer": {"c_custkey": 15000},
        "supplier": {"s_suppkey": 1000},
        "part": {"p_partkey": 20000},
    }
    for t, keys in shifts.items():
        cols = [c[0] for c in con.sql(
            f"describe select * from '{SRC}/{t}.parquet'").fetchall()]
        selects = []
        for i in range(SCALE):
            exprs = ", ".join(
                f"({c} + {i * keys[c]}) AS {c}" if c in keys else c
                for c in cols)
            selects.append(f"SELECT {exprs} FROM '{SRC}/{t}.parquet'")
        con.sql(f"COPY ({' UNION ALL '.join(selects)}) "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    for t in ("nation", "region"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT PARQUET)")


def main() -> None:
    out = sys.argv[1]
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    gen_documents(out, rng)
    gen_events(out, rng)
    gen_embeddings(out, rng)
    gen_tpch(out)
    print(f"proxy written to {out}")


if __name__ == "__main__":
    main()
