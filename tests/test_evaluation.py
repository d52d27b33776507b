"""Golden-set accuracy compare (CSVGeocode.java:130-179 analog): known
synthetic goldens produce the exact expected tally."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.evaluation import compare_goldens
from gazetteer_search_spark.index import builder
from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    # doc i content: unique token "uniqtok<i>" + shared filler; doc 7 also
    # carries a strong repeated marker so "marker" ranks it first
    corpus = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.lit("r").alias("repo"),
        F.format_string("src/%d.py", "id").alias("path"),
        F.lit("c").alias("commit"),
        F.lit("python").alias("lang"),
        F.concat(
            F.format_string("uniqtok%d shared filler words ", "id"),
            F.when(F.col("id") == 7, F.lit("marker marker marker")).otherwise(
                F.when(F.col("id") < 20, F.lit("marker")).otherwise(F.lit("plain"))
            ),
        ).alias("content"),
    )
    out = str(tmp_path_factory.mktemp("idx_eval"))
    idx = builder.build_index(spark, corpus, out, n_buckets=4)
    return SearchEngine(spark, idx, serving=True)


def test_compare_goldens_tally(eng):
    goldens = [
        ("uniqtok3", 3),          # rank 1 (unique term)
        ("uniqtok11", 11),        # rank 1
        ("marker", 7),            # rank 1 (highest tf)
        ("marker", 3),            # in page (doc 3 matches, not first)
        ("marker", 40),           # not found (doc 40 says "plain")
        ("zzznothing", 5),        # not found (no hits at all)
    ]
    rep = compare_goldens(eng, goldens, SearchOptions(k=20, prefix=False))
    s = rep.summary()
    assert s["total"] == 6
    assert s["found_at_1"] == 3
    assert s["found_in_page"] == 1
    assert s["not_found"] == 2
    assert s["accuracy_at_1"] == 0.5
    assert s["accuracy_in_page"] == pytest.approx(4 / 6, abs=1e-4)
    assert s["ms_per_query"] > 0
    # per-failure reports carry the rank (or None) and the actual top hit
    fails = {(q, e): (rank, top) for q, e, rank, top in rep.failures}
    assert fails[("marker", 3)][0] is not None and fails[("marker", 3)][0] > 1
    assert fails[("marker", 40)] == (None, 7)
    assert fails[("zzznothing", 5)] == (None, None)
