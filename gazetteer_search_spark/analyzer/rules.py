"""Analyzer rule tables — data, not code.

Analog of the reference's config-driven analyzer resources:
- optional/stop terms  -> /root/reference/config/optional-terms/*.terms and
  IndexAnalyzer optional marking (IndexAnalyzer.java:80-94,124-138)
- synonym chains       -> /root/reference/config/synonims/*.syn
  (QueryAnalyzerImpl.java:225-280)
- regex replacer variants -> /root/reference/config/replacers/* compiled by
  ReplacersCompiler.java:44-132; here precompiled (pattern, template) pairs
  applied batch-wise, never per row.

For source-code search the optional terms are language keywords and other
stop-term-like hot tokens ("def", "return", "public", ...): they are indexed
(they still contribute to doc_len and can boost) but never *gate* a match,
mirroring the reference's optional-term semantics — and they are exactly the
skew-heavy keys the salted posting build handles.
"""

from __future__ import annotations

import re

# Language-keyword stop tokens (optional terms). Deliberately broad across the
# langs in FIXTURES.md (python/java/js/go).
STOP_TOKENS: frozenset[str] = frozenset(
    """
    def return class public private protected static void int float double
    bool boolean str string char if else elif for while do switch case break
    continue import from package func var let const new this self super null
    none nil true false try except catch finally raise throw throws lambda
    yield async await with as in is not and or pass type interface struct
    map chan go defer range
    """.split()
)

# Removal pre-pass (A7): pure function words are REMOVED from the match set
# entirely before group assembly — they neither gate nor boost — but the
# removed set is kept on the Query IR, mirroring the reference's removed-term
# bookkeeping (QueryAnalyzerImpl.java:114-120,282-298; language keywords above
# stay indexed/optional instead because they carry some signal in code).
REMOVED_TOKENS: frozenset[str] = frozenset("the a an of to".split())

# Synonym chains (a=b=c): lookup of any member yields the whole chain as
# variants (QueryAnalyzerImpl.java:225-280 walks chains, cycle-capped).
SYNONYM_CHAINS: list[list[str]] = [
    ["fn", "func", "function"],
    ["str", "string"],
    ["int", "integer"],
    ["bool", "boolean"],
    ["param", "parameter", "arg", "argument"],
    ["dir", "directory", "folder"],
    ["init", "initialize", "initialise"],
    ["config", "configuration", "cfg"],
    # round-2 widening (VERDICT r1 #7): the common code abbreviations, the
    # street-type-synonym analog of config/synonims/*.syn
    ["impl", "implementation"],
    ["util", "utility", "utils"],
    ["mgr", "manager"],
    ["ctx", "context"],
    ["db", "database"],
    ["auth", "authentication"],
    ["msg", "message"],
    ["num", "number"],
    ["tmp", "temp", "temporary"],
    ["val", "value"],
    ["var", "variable"],
    ["obj", "object"],
    ["ptr", "pointer"],
    ["idx", "index"],
    ["len", "length"],
    ["src", "source"],
    ["dst", "dest", "destination"],
    ["cmd", "command"],
    ["env", "environment"],
    ["lib", "library"],
    ["doc", "document", "documentation"],
    ["err", "error"],
    ["exc", "exception"],
    ["buf", "buffer"],
    ["addr", "address"],
    ["gen", "generate", "generator"],
    ["max", "maximum"],
    ["min", "minimum"],
    ["repo", "repository"],
    ["pkg", "package"],
    ["iter", "iterator", "iteration"],
    ["del", "delete"],
    ["upd", "update"],
    ["sync", "synchronize", "synchronise"],
    ["calc", "calculate", "calculation"],
]

SYNONYMS: dict[str, tuple[str, ...]] = {}
for _chain in SYNONYM_CHAINS:
    for _w in _chain:
        SYNONYMS[_w] = tuple(v for v in _chain if v != _w)

# Replacer-style variant rules: (compiled regex, replacement template).
# Each produces an extra query/index token variant (one string in, extra
# strings out — the reference's Groovy replacer UDTF, ReplacersFactory.groovy:45-76).
VARIANT_RULES: list[tuple[re.Pattern[str], str]] = [
    # version literal "v2" -> "2" (housenumber-parse analog,
    # ImportObjectParser.java:243-261)
    (re.compile(r"^v(\d+)$"), r"\1"),
    # leading-zero number "007" -> "7"
    (re.compile(r"^0+(\d+)$"), r"\1"),
    # plural fold variants (the street-type singular/plural replacer analog):
    # an extra dis_max variant only — a nonsense singular matches nothing
    (re.compile(r"^([a-z]{2,})ies$"), r"\1y"),
    (re.compile(r"^([a-z]{3,}[^s])s$"), r"\1"),
]


def expand_variants(token: str) -> list[str]:
    """All variants of a token (synonyms + replacer rules), excluding itself."""
    out: list[str] = list(SYNONYMS.get(token, ()))
    for pat, repl in VARIANT_RULES:
        v = pat.sub(repl, token)
        if v != token and v:
            out.append(v)
    # dedup preserving order (LinkedHashSet semantics, IndexAnalyzer.java:113)
    seen: set[str] = set()
    return [t for t in out if not (t in seen or seen.add(t))]
