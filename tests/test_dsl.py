"""ES query-DSL translator (search/dsl.py): the reference's own golden
query JSONs (src/test/resources/es_queries/*.json) must translate onto the
engine's group algebra and execute."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import builder
from gazetteer_search_spark.search import dsl
from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions

GOLDENS = "/root/reference/src/test/resources/es_queries"

# reference index fields -> this engine's fields: the address-ish text
# fields all live in content; 'type' plays the metadata role our lang
# column plays; name keeps its per-field postings
FIELD_MAP = {
    "full_text": "content",
    "street": "content",
    "locality": "content",
    "street_opt": "content",
    "locality_opt": "content",
    "housenumber_exact": "content",
    "name": "name",
    "type": "lang",
}


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    corpus = spark.range(0, 120).select(
        F.col("id").alias("doc_id"),
        F.lit("org/r").alias("repo"),
        F.format_string("src/%d.py", "id").alias("path"),
        F.lit("c").alias("commit"),
        F.when(F.col("id") % 3 == 0, "adrpnt")
        .when(F.col("id") % 3 == 1, "hghnet")
        .otherwise("plcpnt")
        .alias("lang"),
        F.when(F.col("id") < 30, F.lit("alpha beta gamma street thirteen"))
        .otherwise(F.lit("alpha delta plain words"))
        .alias("content"),
    )
    out = str(tmp_path_factory.mktemp("idx_dsl"))
    idx = builder.build_index(
        spark, corpus, out, n_buckets=4, extra_fields={"name": "path"}
    )
    return SearchEngine(spark, idx, serving=True)


def _load(name: str) -> dict:
    with open(os.path.join(GOLDENS, name)) as f:
        return json.load(f)


@pytest.mark.parametrize(
    "golden",
    [
        "prefix.json",
        "admin-boundaries-terms.json",
        "by-full-text-prefix.json",
        "city-street.json",
        "city-street-hn.json",
        "street-match.json",
        "street-match-2.json",
        "poi-class-prefix.json",
    ],
)
def test_reference_goldens_translate_and_run(eng, golden):
    """Every reference golden parses (lenient mode), yields a plan, and
    executes on this engine."""
    body = _load(golden)
    res, plan = dsl.run_dsl(eng, body, field_map=FIELD_MAP)
    rows = res if isinstance(res, list) else res.collect()
    assert isinstance(rows, list)  # executed
    assert plan.k == int(body.get("size", 10))


def test_admin_boundaries_structure(eng):
    """term-on-metadata maps to the lang filter; must_not exists clauses
    are noted, not silently swallowed."""
    plan = dsl.translate(
        _load("admin-boundaries-terms.json"), eng, field_map=FIELD_MAP
    )
    assert plan.lang == "admbnd"
    assert any("exists" in n for n in plan.notes)


def test_city_street_structure(eng):
    """cross_fields multi_match -> term-centric groups; msm honored; the
    constant_score lang boosts land in lang_boosts; script noted."""
    plan = dsl.translate(_load("city-street.json"), eng, field_map=FIELD_MAP)
    assert plan.msm == 2
    # one group per analyzed token of the multi_match
    assert sum(1 for g in plan.groups if g.required) >= 2
    assert plan.lang_boosts  # plcpnt/admbnd/plcbnd boost 1.5
    assert any("script_score" in n for n in plan.notes)


def test_strict_mode_raises_on_script(eng):
    with pytest.raises(ValueError, match="strict"):
        dsl.translate(
            _load("city-street.json"), eng, field_map=FIELD_MAP, strict=True
        )


def test_operator_and_fuzziness(eng):
    """operator=and emits one required group per token; fuzziness folds
    OSA expansions into the group."""
    body = {
        "query": {
            "bool": {
                "must": [
                    {
                        "match": {
                            "full_text": {
                                "query": "alpha beta",
                                "operator": "and",
                            }
                        }
                    }
                ]
            }
        },
        "size": 5,
    }
    plan = dsl.translate(body, eng, field_map=FIELD_MAP)
    assert len(plan.groups) == 2 and all(g.required for g in plan.groups)
    fuzzy = {
        "query": {
            "match": {"full_text": {"query": "alpah", "fuzziness": "1"}}
        }
    }
    p2 = dsl.translate(fuzzy, eng, field_map=FIELD_MAP)
    assert len(p2.groups) == 1
    assert "alpha" in p2.groups[0].terms  # OSA<=1 correction folded in


def test_must_not_and_filter_execution(eng):
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"full_text": "alpha"}}],
                "must_not": [{"match": {"full_text": "delta"}}],
                "filter": [{"term": {"type": "adrpnt"}}],
            }
        },
        "size": 50,
    }
    res, plan = dsl.run_dsl(eng, body, field_map=FIELD_MAP)
    rows = res if isinstance(res, list) else res.collect()
    ids = [r.doc_id if hasattr(r, "doc_id") else r[0] for r in rows]
    # delta docs (id >= 30) excluded; lang filter keeps id % 3 == 0
    assert ids and all(i < 30 and i % 3 == 0 for i in ids)
    assert plan.exclude_terms == ("delta",)
    assert plan.lang == "adrpnt"


def test_match_phrase_routes_positionally(spark, tmp_path_factory):
    corpus = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        F.lit("org/r").alias("repo"),
        F.format_string("src/%d.py", "id").alias("path"),
        F.lit("c").alias("commit"),
        F.lit("python").alias("lang"),
        F.when(F.col("id") < 10, F.lit("alpha beta tail"))
        .otherwise(F.lit("beta alpha tail"))
        .alias("content"),
    )
    out = str(tmp_path_factory.mktemp("idx_dslph"))
    idx = builder.build_index(
        spark, corpus, out, n_buckets=4, positions=True
    )
    eng2 = SearchEngine(spark, idx, serving=True)
    body = {
        "query": {"match_phrase": {"full_text": "alpha beta"}},
        "size": 30,
    }
    res, plan = dsl.run_dsl(eng2, body, field_map=FIELD_MAP)
    rows = res if isinstance(res, list) else res.collect()
    ids = [r.doc_id for r in rows]
    assert ids and all(i < 10 for i in ids)  # in-order pair only
    assert plan.phrases == [(["alpha", "beta"], 0)]


def test_phrase_with_sibling_clauses_keeps_both(spark, tmp_path_factory):
    """A bool mixing match_phrase with other clauses enforces BOTH — the
    sibling groups join the phrase rung as residual terms (regression:
    every non-phrase group was silently discarded)."""
    corpus = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        F.lit("org/r").alias("repo"),
        F.format_string("src/%d.py", "id").alias("path"),
        F.lit("c").alias("commit"),
        F.lit("python").alias("lang"),
        F.when(F.col("id") < 5, F.lit("alpha beta keepme tail"))
        .when(F.col("id") < 10, F.lit("alpha beta othertail"))
        .otherwise(F.lit("keepme beta alpha reversed"))
        .alias("content"),
    )
    out = str(tmp_path_factory.mktemp("idx_dslmix"))
    idx = builder.build_index(spark, corpus, out, n_buckets=4, positions=True)
    eng2 = SearchEngine(spark, idx, serving=True)
    body = {
        "query": {"bool": {"must": [
            {"match_phrase": {"full_text": "alpha beta"}},
            {"match": {"full_text": "keepme"}},
        ]}},
        "size": 30,
    }
    res, plan = dsl.run_dsl(eng2, body, field_map=FIELD_MAP)
    rows = res if isinstance(res, list) else res.collect()
    ids = sorted(r.doc_id for r in rows)
    # phrase in order AND the sibling term: docs 0..4 only (5..9 lack
    # keepme; 10+ have the words out of order)
    assert ids == [0, 1, 2, 3, 4]
    assert plan.phrases == [(["alpha", "beta"], 0)]


def test_should_only_minimum_should_match_gates(eng):
    """should-only bool with minimum_should_match=2: only docs matching
    >= 2 of the 3 optional clauses (regression: the msm was a silent
    no-op because the engine gate counts required groups)."""
    body = {
        "query": {"bool": {
            "should": [
                {"match": {"full_text": "beta"}},
                {"match": {"full_text": "gamma"}},
                {"match": {"full_text": "delta"}},
            ],
            "minimum_should_match": 2,
        }},
        "size": 120,
    }
    res, plan = dsl.run_dsl(eng, body, field_map=FIELD_MAP)
    rows = res if isinstance(res, list) else res.collect()
    ids = {r.doc_id for r in rows}
    # docs < 30 have beta+gamma (2 hits); docs >= 30 have delta only (1)
    assert ids and all(i < 30 for i in ids)
    assert plan.msm == 2


def test_must_not_on_mapped_metadata_field(eng):
    """must_not term on a field mapping to the class dimension excludes by
    METADATA value, not by content token (regression: 'adrpnt' was
    treated as a content token and excluded nothing)."""
    body = {
        "query": {"bool": {
            "must": [{"match": {"full_text": "alpha"}}],
            "must_not": [{"term": {"type": "adrpnt"}}],
        }},
        "size": 120,
    }
    res, plan = dsl.run_dsl(eng, body, field_map=FIELD_MAP)
    rows = res if isinstance(res, list) else res.collect()
    assert rows and all(r.lang != "adrpnt" for r in rows)
    assert plan.exclude_langs == ("adrpnt",)
    assert plan.exclude_terms == ()
