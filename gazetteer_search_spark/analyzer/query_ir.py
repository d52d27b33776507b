"""Query IR — typed-token analysis of a free-text query (driver-side).

Analog of the reference's QToken/Query/QueryAnalyzerImpl
(/root/reference/src/main/java/me/osm/gazetteer/search/query/QToken.java:7-83,
Query.java:12-185, QueryAnalyzerImpl.java:96-223). Token typing:

- ``optional``     stop-token (language keyword) or short non-numeric token —
                   doesn't gate matching, only boosts (IndexAnalyzer.java:124-138)
- ``has_numbers`` / ``numbers_only``  numeric typing (QToken.java:30-44),
                   the housenumber analog for numeric/version literals
- ``variants``     synonym/replacer expansions (QueryAnalyzerImpl.java:127-154)
- ``prefix``       search-as-you-type: the last token becomes a prefix unless
                   the raw query ends with whitespace or the token has digits
                   (Query.findPrefix, Query.java:178-185)

Tokenization uses the SAME kernel as the index build (analyzer symmetry).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from gazetteer_search_spark.analyzer import rules  # noqa: F401 (builtin tables)
from gazetteer_search_spark.analyzer.tokenizer import tokenize_text


def _default_rules():
    """The built-in rule tables as an AnalyzerRules (lazy import — config
    imports rules, so this module can't import config at load time)."""
    from gazetteer_search_spark.analyzer.config import DEFAULT_RULES

    return DEFAULT_RULES

MIN_MEANINGFUL_LEN = 3  # len<3 non-numeric tokens are optional (IndexAnalyzer.java:19)


@dataclass(frozen=True)
class QToken:
    text: str
    variants: tuple[str, ...] = ()
    optional: bool = False
    has_numbers: bool = False
    numbers_only: bool = False

    def all_forms(self) -> tuple[str, ...]:
        return (self.text, *self.variants)


@dataclass
class Query:
    original: str
    tokens: list[QToken] = field(default_factory=list)
    prefix: str | None = None  # A12 / Query.findPrefix
    # A7: tokens REMOVED by the pre-pass (pure function words) — excluded from
    # matching entirely, but kept here like the reference keeps its removed
    # set on the query object (QueryAnalyzerImpl.java:114-120,282-298)
    removed: list[str] = field(default_factory=list)

    # --- functional slices, Query.java:40-143 analog -------------------------
    def required(self) -> list[QToken]:
        return [t for t in self.tokens if not t.optional]

    def optional(self) -> list[QToken]:
        return [t for t in self.tokens if t.optional]

    def numeric(self) -> list[QToken]:
        return [t for t in self.tokens if t.has_numbers]

    def wo_numbers(self) -> list[QToken]:
        return [t for t in self.tokens if not t.has_numbers]

    def count_required(self) -> int:
        return len(self.required())

    def all_terms(self) -> list[str]:
        out = []
        for t in self.tokens:
            out.extend(t.all_forms())
        if self.prefix:
            out.append(self.prefix)
        return out


def _type_token(text: str, rule_set=None) -> QToken:
    rs = rule_set if rule_set is not None else _default_rules()
    has_num = any(c.isdigit() for c in text)
    num_only = text.isdigit()
    optional = (not num_only) and (
        text in rs.stop_tokens or len(text) < MIN_MEANINGFUL_LEN
    )
    variants = tuple(rs.expand_variants(text))
    return QToken(
        text=text,
        variants=variants,
        optional=optional,
        has_numbers=has_num,
        numbers_only=num_only,
    )


# A5: bracketed spans -> optional tokens (IndexAnalyzer.java:105-110,143-152:
# "Main Street (old)" indexes/matches "old" as optional)
_BRACKET_RE = re.compile(r"[(\[{]([^)\]}]*)[)\]}]")

# Lucene-style must_not clause: a '-' glued to the front of a word (whitespace
# or start-of-string before it, so hyphenated identifiers like foo-bar are NOT
# negations)
_NEG_RE = re.compile(r"(?<!\S)-([A-Za-z0-9_.][\w.]*)")


def extract_negations(q: str) -> tuple[str, tuple[str, ...]]:
    """Split Lucene-style ``-token`` must_not clauses out of a raw query.

    Returns (residual query, excluded index terms). Semantics are ES bool
    must_not over a match clause (the reference builds exactly that shape —
    BooleanPart.java:36-37,72-77, wired for its street_has_loc exclusion in
    MainAddressQueryBuilder.java:304-306): a match clause defaults to OR, so
    a doc containing ANY analyzed subtoken of a negated word is excluded
    (``-blockMax`` drops docs matching block OR max OR blockmax). Negated
    clauses contribute no score and never relax through the coalesce ladder.
    """
    negs: list[str] = []

    def _take(m: re.Match) -> str:
        negs.append(m.group(1))
        return " "

    residual = _NEG_RE.sub(_take, q)
    terms = tuple(
        dict.fromkeys(
            t
            for w in negs
            for t in tokenize_text(w, joined_identifiers=True)
        )
    )
    return residual, terms


def analyze_query(q: str, prefix: bool = True, rule_set=None) -> Query:
    """Free text -> Query IR. ``prefix=True`` enables search-as-you-type
    (gated like SearchOptions.prefix, reference SearchOptions.java:7-14).

    Pipeline: bracket extraction (A5: bracketed tokens become optional) ->
    tokenize + type -> removal pre-pass (A7: pure function words drop out of
    matching, kept on ``Query.removed``).

    ``rule_set`` (analyzer/config.AnalyzerRules, default = the built-in
    tables): the externally-configurable stop/removed lexicons, synonym
    chains and variant rules — the reference's runtime-loaded replacers /
    .syn / .terms config (ReplacersCompiler.java:44-132,
    QueryAnalyzerImpl.java:64-86). SearchEngine passes the rule set the
    INDEX was built with, so analysis stays symmetric automatically."""
    rs = rule_set if rule_set is not None else _default_rules()
    query = Query(original=q)
    bracket_text = " ".join(m.group(1) for m in _BRACKET_RE.finditer(q))
    main = _BRACKET_RE.sub(" ", q)
    words = main.split()

    prefix_tok: str | None = None
    if prefix and words and not (main[-1:].isspace() or main == ""):
        # the prefix candidate is the last sub-token of the last raw word of
        # the UNBRACKETED text (mid-typed camelCase identifier => its final
        # sub-token is the prefix; its earlier sub-tokens stay required; no
        # joined form is emitted for the incomplete identifier). A query
        # ending in a bracket group has no prefix (main then ends in space).
        last_subs = tokenize_text(words[-1], joined_identifiers=False)
        if last_subs and not any(c.isdigit() for c in last_subs[-1]):
            prefix_tok = last_subs[-1]
            head = " ".join(words[:-1])
            toks = tokenize_text(head, joined_identifiers=True) + last_subs[:-1]
        else:
            toks = tokenize_text(main, joined_identifiers=True)
    else:
        toks = tokenize_text(main, joined_identifiers=True)

    tokens = [_type_token(t, rs) for t in toks]
    for t in tokenize_text(bracket_text, joined_identifiers=True):
        typed = _type_token(t, rs)
        tokens.append(
            QToken(
                text=typed.text,
                variants=typed.variants,
                optional=True,  # A5: bracketed => never gates
                has_numbers=typed.has_numbers,
                numbers_only=typed.numbers_only,
            )
        )

    # A7 removal pre-pass
    query.removed = [t.text for t in tokens if t.text in rs.removed_tokens]
    query.tokens = [t for t in tokens if t.text not in rs.removed_tokens]
    if prefix_tok in rs.removed_tokens:
        query.removed.append(prefix_tok)
        prefix_tok = None
    query.prefix = prefix_tok
    return query
