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


# ---- round-5 review-fix regressions -----------------------------------------

def test_cross_fields_duplicate_term_keeps_best_weight(eng):
    """Two mapped fields colliding in one namespace: term dedup must carry
    each term's BEST weight, not zip the full-length weight tuple onto the
    deduped terms (regression: term_weights misaligned after a duplicate)."""
    body = {
        "query": {
            "bool": {
                "must": [
                    {
                        "multi_match": {
                            "query": "alpha",
                            "type": "cross_fields",
                            "fields": ["street^1", "locality^2", "name^5"],
                        }
                    }
                ]
            }
        }
    }
    plan = dsl.translate(body, eng, field_map=FIELD_MAP)
    (g,) = plan.groups
    w = g.per_term_weights()
    # street and locality both map to content: 'alpha' keeps the max (2)
    assert w["alpha"] == pytest.approx(2.0)
    assert w["name:alpha"] == pytest.approx(5.0)


def test_run_dsl_on_spark_free_engine(eng, tmp_path_factory):
    """run_dsl must work on a --local-only serving engine (spark=None):
    rows come back as a plain list (regression: search_rung raised
    'DataFrame results need a SparkSession' and every /dsl request 400d)."""
    free = SearchEngine(None, builder.load_index_local(eng.index.paths.root),
                        serving=True, lazy_payloads=True)
    body = {"query": {"bool": {"must": [{"match": {"full_text": "alpha"}}]}},
            "size": 5}
    res, plan = dsl.run_dsl(free, body, field_map=FIELD_MAP)
    assert isinstance(res, list) and res
    # phrase path too
    body = {"query": {"match_phrase": {"full_text": "alpha beta"}}, "size": 5}
    # this fixture has no positions sidecar: the phrase rung raises its own
    # ValueError — what must NOT appear is the Spark-free RuntimeError
    # ('DataFrame results need a SparkSession')
    try:
        res, _ = dsl.run_dsl(free, body, field_map=FIELD_MAP)
        assert isinstance(res, list)
    except ValueError as e:
        assert "positions sidecar" in str(e)


def test_dsl_prefix_expands_in_field_namespace(eng):
    """prefix on a mapped per-field name must expand inside 'name:'
    dictionary terms (regression: expanded the bare value against the
    content dictionary and prefixed 'name:' afterwards — fabricating
    nonexistent terms and missing field-only ones)."""
    body = {"query": {"bool": {"must": [{"prefix": {"name": "src"}}]}}}
    plan = dsl.translate(body, eng, field_map=FIELD_MAP)
    (g,) = plan.groups
    assert g.terms, "field-namespace prefix should expand"
    assert all(t.startswith("name:src") for t in g.terms), g.terms


def test_constant_score_filter_in_must_context_filters(eng):
    """ES semantics: constant_score in must/filter context FILTERS — only
    docs passing the inner filter match (regression: became a lang boost
    only, silently returning cross-lang results)."""
    body = {
        "query": {
            "bool": {
                "must": [
                    {"constant_score": {
                        "filter": {"term": {"type": "adrpnt"}},
                        "boost": 2.0,
                    }},
                    {"match": {"full_text": "alpha"}},
                ]
            }
        },
        "size": 100,
    }
    res, plan = dsl.run_dsl(eng, body, field_map=FIELD_MAP)
    rows = res if isinstance(res, list) else res.collect()
    assert plan.lang == "adrpnt"
    assert rows and all(r.lang == "adrpnt" for r in rows)


def test_terms_query_context_boost_reaches_weight(eng):
    """A query-context terms/term boost multiplies the clause score
    (regression: extracted only to be discarded — weight stayed 1.0)."""
    body = {
        "query": {"bool": {"should": [
            {"terms": {"full_text": ["alpha", "delta"], "boost": 3.0}},
        ]}},
    }
    plan = dsl.translate(body, eng, field_map=FIELD_MAP)
    (g,) = plan.groups
    assert g.weight == pytest.approx(3.0)
    body = {"query": {"bool": {"should": [
        {"term": {"full_text": {"value": "alpha", "boost": 4.0}}},
    ]}}}
    plan = dsl.translate(body, eng, field_map=FIELD_MAP)
    (g,) = plan.groups
    assert g.weight == pytest.approx(4.0)


def test_multi_value_meta_terms_filter_notes_not_first_value(eng):
    """ES terms is an OR over values; only a single-value repo/path_prefix
    filter maps. A multi-value filter must be NOTED and dropped (strict:
    raised), never silently narrowed to values[0]."""
    body = {
        "query": {"bool": {
            "must": [{"match": {"full_text": "alpha"}}],
            "filter": [{"terms": {"repo": ["org/a", "org/b"]}}],
        }},
        "size": 10,
    }
    res, plan = dsl.run_dsl(eng, body, field_map=FIELD_MAP)
    assert plan.repo is None  # NOT narrowed to "org/a"
    assert any("repo values" in n for n in plan.notes)
    with pytest.raises(ValueError, match="repo values"):
        dsl.run_dsl(eng, body, field_map=FIELD_MAP, strict=True)
    # single-value form still filters
    body["query"]["bool"]["filter"] = [{"terms": {"repo": ["org/r"]}}]
    _, plan2 = dsl.run_dsl(eng, body, field_map=FIELD_MAP)
    assert plan2.repo == "org/r"
