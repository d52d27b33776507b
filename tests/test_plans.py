"""Physical-plan shape assertions: the scale contract (SURVEY §4.2).

These tests pin the plan properties that matter at 100 TB: term lookups prune
postings partitions AND push term predicates into the parquet scan; dimension
joins broadcast; nothing goes cartesian.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.plans import (
    assert_no_cartesian,
    assert_partition_pruned,
    assert_pushed_filters,
    uses_broadcast_join,
)
from gazetteer_search_spark.sources import synthetic_corpus


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_plans"))
    return builder.build_index(
        spark, synthetic_corpus(spark, 200), out, n_buckets=8, postings_per_group=128
    )


def test_term_lookup_prunes_partitions_and_pushes_filters(spark, index):
    terms = ["merge", "postings"]
    buckets = sorted({builder.term_bucket_py(t, index.n_buckets) for t in terms})
    pruned = index.postings.filter(
        F.col("term_bucket").isin(buckets) & F.col("term").isin(terms)
    )
    assert_partition_pruned(pruned, "term_bucket")
    assert_pushed_filters(pruned, "In(term,")


def test_docs_scan_pushes_lang_filter(spark, index):
    d = index.docs.filter(F.col("lang") == "python").select("doc_id")
    assert_pushed_filters(d, "EqualTo(lang,python)")


def test_dim_join_broadcasts(spark):
    c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    assert uses_broadcast_join(j)
    assert_no_cartesian(j)


def test_engine_query_no_cartesian(spark, index):
    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions, TermGroup

    eng = SearchEngine(spark, index)
    res = eng.search_rung(
        [TermGroup(0, ("merge",), True), TermGroup(1, ("postings",), True)],
        2,
        SearchOptions(),
    )
    assert_no_cartesian(res)
