"""Exact count (ES _count / track_total_hits=true analog) and scroll-export
sink (ES scroll/PIT analog): serving-vs-Spark parity, export roundtrip, the
HTTP routes."""

from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.search.engine import (
    SearchEngine,
    SearchOptions,
    TermGroup,
)
from gazetteer_search_spark.server import make_server
from gazetteer_search_spark.sources import synthetic_corpus

N_DOCS = 400


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("idx_cnt"))
    return builder.build_index(
        spark, synthetic_corpus(spark, N_DOCS), out, n_buckets=4
    )


@pytest.fixture(scope="module")
def spark_eng(spark, index):
    return SearchEngine(spark, index)


@pytest.fixture(scope="module")
def local_eng(spark, index):
    return SearchEngine(spark, index, serving=True)


def _grp(gid, terms, required=True):
    return TermGroup(group_id=gid, terms=tuple(terms), required=required)


CASES = [
    ([_grp(0, ["postings"])], 1, SearchOptions()),
    ([_grp(0, ["merge"]), _grp(1, ["postings"])], 2, SearchOptions()),
    ([_grp(0, ["merge"]), _grp(1, ["block"])], 1, SearchOptions()),
    ([_grp(0, ["postings"])], 1, SearchOptions(lang="python")),
    ([], 0, SearchOptions()),
    ([], 0, SearchOptions(repo="org1/repo1")),
]


@pytest.mark.parametrize("groups,msm,opts", CASES)
def test_count_local_matches_spark(spark_eng, local_eng, groups, msm, opts):
    want = spark_eng.count_matches(groups, msm, opts)
    got = local_eng.count_matches(groups, msm, opts)
    assert got == want
    assert want == spark_eng.match_set(groups, msm, opts).count()
    assert want > 0


def test_count_exceeds_page(local_eng):
    """The whole point: the exact count is bigger than any page."""
    groups = [_grp(0, ["postings"])]
    n = local_eng.count_matches(groups, 1, SearchOptions(k=5))
    page = local_eng.search_rung_rows(groups, 1, SearchOptions(k=5))
    assert len(page) == 5 and n > 5


def test_scored_matches_equal_search_rung_prefix(spark_eng):
    """scored_matches is the UNCUT form of search_rung: sorting it by the
    same key reproduces the top-k page exactly (scores included)."""
    groups = [_grp(0, ["merge"]), _grp(1, ["postings"])]
    opts = SearchOptions(k=10)
    page = spark_eng.search_rung(groups, 2, opts).collect()
    full = spark_eng.scored_matches(groups, 2, opts).collect()
    full.sort(key=lambda r: (-round(r.score, 9), r.doc_id))
    assert [r.doc_id for r in full[:10]] == [r.doc_id for r in page]
    for f, p in zip(full[:10], page):
        assert f.score == pytest.approx(p.score, rel=1e-9)
    # and the full set is the exact match set
    assert len(full) == spark_eng.count_matches(groups, 2, opts)


def test_export_roundtrip(spark, spark_eng, tmp_path):
    out = str(tmp_path / "export")
    groups = [_grp(0, ["postings"])]
    n = spark_eng.export_matches(groups, 1, out, SearchOptions())
    df = spark.read.parquet(out)
    assert df.count() == n == spark_eng.count_matches(groups, 1, SearchOptions())
    assert set(df.columns) == {
        "doc_id", "score", "matched_mask", "repo", "path", "lang"
    }
    # every row carries a positive score and a non-empty mask
    assert df.filter((F.col("score") <= 0) | (F.col("matched_mask") == 0)).count() == 0


def test_export_partitioned(spark, spark_eng, tmp_path):
    out = str(tmp_path / "export_lang")
    n = spark_eng.export_matches(
        [_grp(0, ["postings"])], 1, out, SearchOptions(), partition_by="lang"
    )
    df = spark.read.parquet(out)
    assert df.count() == n
    assert df.select("lang").distinct().count() > 1


def test_http_count_and_track_total(local_eng):
    srv = make_server(local_eng, SearchOptions(k=5, prefix=False), port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/count?q=postings") as r:
            env = json.loads(r.read())
        assert env["relation"] == "eq" and env["count"] > 5
        # track_total=true on /search reports the same exact total
        with urllib.request.urlopen(
            f"{base}/search?q=postings&size=5&track_total=true"
        ) as r:
            senv = json.loads(r.read())
        assert senv["total_hits"] == env["count"]
        assert senv["total_relation"] == "eq"
        assert len(senv["hits"]) == 5
        # filters compose
        with urllib.request.urlopen(
            f"{base}/count?q=postings&lang=python"
        ) as r:
            fenv = json.loads(r.read())
        assert 0 < fenv["count"] < env["count"]
        # missing q -> 400
        try:
            urllib.request.urlopen(f"{base}/count")
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


def test_count_multigen(spark, index, tmp_path_factory):
    """Count across generations: upserts don't double-count."""
    import shutil

    from gazetteer_search_spark.index import segments as segs

    root = str(tmp_path_factory.mktemp("idx_cnt_seg"))
    shutil.rmtree(root)
    shutil.copytree(index.paths.root, root)
    upd = (
        synthetic_corpus(spark, 25)
        .withColumn("commit", F.sha1(F.concat_ws("-", "path", F.lit("v2"))))
    )
    segs.add_segment(spark, upd, root, n_buckets=2)
    meng = segs.open_multi_search(root)
    assert meng.count_matches([], 0, SearchOptions()) == N_DOCS
