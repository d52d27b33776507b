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

from dataclasses import dataclass, field

from gazetteer_search_spark.analyzer import rules
from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

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


def _type_token(text: str) -> QToken:
    has_num = any(c.isdigit() for c in text)
    num_only = text.isdigit()
    optional = (not num_only) and (
        text in rules.STOP_TOKENS or len(text) < MIN_MEANINGFUL_LEN
    )
    variants = tuple(rules.expand_variants(text))
    return QToken(
        text=text,
        variants=variants,
        optional=optional,
        has_numbers=has_num,
        numbers_only=num_only,
    )


def analyze_query(q: str, prefix: bool = True) -> Query:
    """Free text -> Query IR. ``prefix=True`` enables search-as-you-type
    (gated like SearchOptions.prefix, reference SearchOptions.java:7-14)."""
    query = Query(original=q)
    words = q.split()

    prefix_tok: str | None = None
    if prefix and words and not q.endswith((" ", "\t", "\n")):
        # the prefix candidate is the last sub-token of the last raw word
        # (mid-typed camelCase identifier => its final sub-token is the prefix;
        # its earlier sub-tokens stay required; no joined form is emitted for
        # the incomplete identifier)
        last_subs = tokenize_text(words[-1], joined_identifiers=False)
        if last_subs and not any(c.isdigit() for c in last_subs[-1]):
            prefix_tok = last_subs[-1]
            head = " ".join(words[:-1])
            toks = tokenize_text(head, joined_identifiers=True) + last_subs[:-1]
        else:
            toks = tokenize_text(q, joined_identifiers=True)
    else:
        toks = tokenize_text(q, joined_identifiers=True)

    query.tokens = [_type_token(t) for t in toks]
    query.prefix = prefix_tok
    return query
