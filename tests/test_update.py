"""Partial-document update sink (S5): MERGE-shaped docs maintenance rewrites
ONLY touched partitions, keeps unmentioned rows' values, is idempotent, and
leaves the index searchable (reference UpdateStreetsUsage.java:104-113)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.index.update import update_docs_columns
from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions, TermGroup
from gazetteer_search_spark.sources import synthetic_corpus

N_DOCS = 80
N_PARTS = 8


@pytest.fixture()
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_upd"))
    return builder.build_index(
        spark, synthetic_corpus(spark, N_DOCS), out, n_buckets=4,
        n_doc_parts=N_PARTS,
    )


def _part_files(docs_path: str) -> dict[str, set[tuple[str, float]]]:
    out: dict[str, set[tuple[str, float]]] = {}
    for d in os.listdir(docs_path):
        if d.startswith("doc_part="):
            full = os.path.join(docs_path, d)
            out[d] = {
                (f, os.path.getmtime(os.path.join(full, f)))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
    return out


def test_update_rewrites_only_touched_partitions(spark, index):
    docs_path = index.paths.docs
    before = _part_files(docs_path)

    # touch docs 1, 9, 17 — all in doc_part=1
    derived = spark.createDataFrame(
        [(1, 100), (9, 200), (17, 300)], "doc_id long, ref_count long"
    )
    touched = update_docs_columns(spark, docs_path, derived, n_doc_parts=N_PARTS)
    assert touched == [1]

    after = _part_files(docs_path)
    for part in before:
        if part == "doc_part=1":
            assert before[part] != after[part], "touched partition must be rewritten"
        else:
            assert before[part] == after[part], f"{part} must be untouched"

    rows = {
        r.doc_id: r.ref_count
        for r in spark.read.parquet(docs_path).select("doc_id", "ref_count").collect()
    }
    assert rows[1] == 100 and rows[9] == 200 and rows[17] == 300
    # unmentioned row in the SAME partition keeps its default
    assert rows[25] == 0
    assert len(rows) == N_DOCS


def test_update_idempotent_and_searchable(spark, index):
    docs_path = index.paths.docs
    derived = spark.createDataFrame(
        [(i, i * 10) for i in range(0, N_DOCS, 7)], "doc_id long, ref_count long"
    )
    update_docs_columns(spark, docs_path, derived, n_doc_parts=N_PARTS)
    first = sorted(
        (r.doc_id, r.ref_count)
        for r in spark.read.parquet(docs_path).select("doc_id", "ref_count").collect()
    )
    update_docs_columns(spark, docs_path, derived, n_doc_parts=N_PARTS)
    second = sorted(
        (r.doc_id, r.ref_count)
        for r in spark.read.parquet(docs_path).select("doc_id", "ref_count").collect()
    )
    assert first == second

    # the index still serves queries against the rewritten docs table
    idx = builder.load_index(spark, index.paths.root, n_buckets=4)
    eng = SearchEngine(spark, idx)
    g = TermGroup(group_id=0, terms=("postings",), required=True)
    assert eng.search_rung([g], 1, SearchOptions(k=5)).count() > 0
