#!/usr/bin/env python
"""Generate an sf-shaped benchmark data directory at an arbitrary scale.

The driver's testdata (TESTDATA.md) ships sf0.001/sf0.01/sf0.1; its
round-end MEASUREMENT may escalate to a larger driver-generated scale
(BENCH_r05.json ran at sf=1.0). This script reproduces the three tables
`bench.py` reads (documents / embeddings / events) with the same schema
and the same measured distributions as the shipped sf0.1 data — 31-word
vocabulary, 10–100 uniform words per doc, the sf0.1 lang mix, 20 sources,
64-dim L2-normalised embeddings with 10 labels, 30 days of events in five
types — scaled 10x (or any --scale). Deterministic (numpy RandomState,
seed 42). It is measurement tooling ONLY: the oracle/correctness gates run
on the shipped sf dirs; this output exists so optimizations can be timed
at the driver's escalated scale (guide §1 — measure at the scale that is
graded, not only the small default).

Usage: python scripts/make_sf_scale.py --out /tmp/sf1.0 [--scale 10]
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.15, 0.15, 0.148, 0.142]
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def make_documents(out: str, n_docs: int, rng: np.random.RandomState) -> None:
    lens = rng.randint(10, 101, n_docs)
    langs = rng.choice(LANGS, n_docs, p=np.array(LANG_P) / sum(LANG_P))
    varr = np.array(VOCAB)
    texts = [" ".join(varr[rng.randint(0, len(VOCAB), n)]) for n in lens]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs.tolist(), pa.string()),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "documents.parquet"))


def make_embeddings(out: str, n_vecs: int, rng: np.random.RandomState) -> None:
    m = rng.randn(n_vecs, 64).astype(np.float32)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs), pa.int64()),
            "embedding": pa.array(list(m), pa.list_(pa.float32())),
            "label": pa.array(rng.randint(0, 10, n_vecs), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out, "embeddings.parquet"))


def make_events(out: str, n_events: int, n_users: int, rng: np.random.RandomState) -> None:
    span_us = 30 * 24 * 3600 * 1_000_000  # 30 days, like sf0.1
    incs = rng.exponential(span_us / n_events, n_events)
    ts = (np.cumsum(incs)).astype(np.int64)
    base = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(n_events), pa.int64()),
            "ts": pa.array(base + ts, pa.timestamp("us")),
            "user_id": pa.array(rng.randint(0, n_users, n_events), pa.int64()),
            "event_type": pa.array(
                np.array(EVENT_TYPES)[rng.randint(0, 5, n_events)].tolist()
            ),
            "value": pa.array(
                np.round(rng.exponential(100.0, n_events), 2), pa.float64()
            ),
            "props": pa.array(
                [json.dumps({"k": int(k)}) for k in rng.randint(0, 100, n_events)]
            ),
        }
    )
    pq.write_table(tbl, os.path.join(out, "events.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", type=float, default=10.0,
                    help="multiplier over the sf0.1 row counts")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.RandomState(42)
    make_documents(args.out, int(5000 * args.scale), rng)
    make_embeddings(args.out, int(2000 * args.scale), rng)
    make_events(args.out, int(100000 * args.scale), int(1500 * args.scale), rng)
    with open(os.path.join(args.out, "_DONE"), "w") as f:
        f.write("ok\n")
    print(f"wrote {args.out} at scale {args.scale}")


if __name__ == "__main__":
    main()
