"""Snippet extraction + term highlighting over stored/source document content.

Beyond the reference (a geocoder returns structured addresses, not text
fragments — its closest surface is the full-doc JSON of ``verbose_address``,
api/SearchAPIAdapter.java VERBOSE_ADDRESS); for a CODE search engine the
grep-shaped "matched line + line number + highlighted terms" hit body is the
core serving UX (the ES ``highlight`` analog).

One semantics, three implementations kept rank-identical by tests:

- :func:`best_lines` — pure-Python serving kernel over one document's
  content (driver-side, k-bounded: runs only on the <= k winning docs).
- :func:`snippet_df` — the Spark-tier DataFrame form: hits x corpus join,
  per-line FULL analyzer kernel (Arrow-batched pandas UDF), best-line via
  window. This is the 100-TB shape: content never leaves the executors.
- the DuckDB oracle twin in ``__spark_entry__`` (zipped-unnest lines +
  ``duckdb_tokens_full_sql`` per line).

Pinned semantics (all three sides):

- lines = content split on "\\n" (no trimming), line_no is 1-based;
- a line's tokens = the FULL analyzer kernel (accent fold, camel/digit
  breaks, transliteration + joined-identifier doubling) — so a query term
  ``getusername`` highlights the line ``def getUserName(self):`` and a
  sub-token query ``user`` matches inside the same identifier. Tokens never
  span lines (the kernel splits on every non-alnum run), so per-line
  analysis equals whole-doc analysis restricted to the line;
- n_matched = count of DISTINCT query terms present in the line's token set;
- best lines = order by (n_matched desc, line_no asc), keep ``n_lines``;
  zero-match lines are never returned;
- ``snippet`` = the RAW line truncated to ``max_len`` chars (truncation
  before marking, so the SQL twin's ``substr`` is byte-identical);
- ``marked`` (serving decoration only, not oracled) = the truncated line
  with every ``\\w+`` run whose own analysis intersects the matched terms
  wrapped in ``<em>..</em>``.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

DEFAULT_MAX_LEN = 400

# marking spans: maximal word runs (ASCII identifiers incl. underscore AND
# unicode letter runs — a Cyrillic token highlighted by its Latin query form
# still gets its span marked)
_WORD_RUN = re.compile(r"\w+", re.UNICODE)

_TOKEN_CACHE_MAX = 4096
_token_cache: dict[str, frozenset] = {}


def _run_tokens(run: str) -> frozenset:
    """Full-kernel token set of one word run, memoized (identifier
    frequency is Zipfian — the cache hit rate on real code is ~99%)."""
    hit = _token_cache.get(run)
    if hit is None:
        hit = frozenset(tokenize_text(run, joined_identifiers=True))
        if len(_token_cache) >= _TOKEN_CACHE_MAX:
            _token_cache.clear()
        _token_cache[run] = hit
    return hit


def mark_line(line: str, terms: set[str] | frozenset) -> str:
    """Wrap every word run whose analyzed token set intersects ``terms``
    in <em>..</em> (whole-run marking: query 'user' marks 'getUserName')."""

    def _sub(m: re.Match) -> str:
        run = m.group(0)
        return f"<em>{run}</em>" if _run_tokens(run) & terms else run

    return _WORD_RUN.sub(_sub, line)


def mark_line_html(line: str, terms: set[str] | frozenset) -> str:
    """HTML-safe marking: every text segment is escaped, matched word runs
    are wrapped in <em> AFTER escaping — a term can never collide with an
    entity substring ('&amp;' stays intact for a query term 'amp')."""
    import html as _html

    out = []
    pos = 0
    for m in _WORD_RUN.finditer(line):
        out.append(_html.escape(line[pos : m.start()]))
        run = m.group(0)
        esc = _html.escape(run)  # digits/letters only, but stay uniform
        out.append(f"<em>{esc}</em>" if _run_tokens(run) & terms else esc)
        pos = m.end()
    out.append(_html.escape(line[pos:]))
    return "".join(out)


def line_match_count(line: str, terms: set[str] | frozenset) -> int:
    """Distinct query terms present in the line's full-kernel token set."""
    toks = set(tokenize_text(line, joined_identifiers=True))
    return len(toks & set(terms))


def best_lines(
    content: str,
    terms: set[str] | frozenset,
    n_lines: int = 1,
    max_len: int = DEFAULT_MAX_LEN,
) -> list[dict]:
    """Serving kernel: the top ``n_lines`` matching lines of one document.

    Returns [{line_no, snippet, marked, n_matched}] ordered by
    (n_matched desc, line_no asc); empty when no line matches (possible for
    hits matched via the name field or fuzzy/prefix forms the caller did
    not pass in ``terms``)."""
    terms = set(terms)
    scored: list[tuple[int, int, str]] = []
    for i, line in enumerate(content.split("\n"), start=1):
        n = line_match_count(line, terms)
        if n > 0:
            scored.append((-n, i, line))
    scored.sort()
    out = []
    for neg_n, line_no, line in scored[:n_lines]:
        raw = line[:max_len]
        out.append(
            {
                "line_no": line_no,
                "snippet": raw,
                "marked": mark_line(raw, terms),
                "n_matched": -neg_n,
            }
        )
    return out


def snippet_df(
    hits: DataFrame,
    corpus: DataFrame,
    terms: list[str],
    n_lines: int = 1,
    max_len: int = DEFAULT_MAX_LEN,
    text_col: str = "content",
) -> DataFrame:
    """Spark-tier snippets: (doc_id, score) hits x corpus content ->
    (doc_id, score, line_no, snippet, n_matched), best ``n_lines`` matching
    lines per hit.

    Plan shape: the hits side is k rows -> Catalyst broadcasts it, the
    corpus scan prunes to (doc_id, content), lines explode WITHIN the
    executors, and the per-line analysis is the same Arrow-batched pandas
    kernel the index build uses — content never reaches the driver, so the
    same plan serves a 100-TB corpus (snippets for a bounded hit page cost
    one pruned join, not a corpus pass)."""
    from gazetteer_search_spark.search.bm25 import tokens_col

    lines = (
        F.broadcast(hits.select("doc_id", "score"))
        .join(corpus.select("doc_id", text_col), "doc_id")
        .select(
            "doc_id",
            "score",
            F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
                "pos", "line"
            ),
        )
    )
    term_arr = F.array(*[F.lit(t) for t in sorted(set(terms))])
    lm = (
        lines.withColumn("line_no", (F.col("pos") + 1).cast("int"))
        .withColumn(
            "n_matched",
            F.size(
                F.array_intersect(
                    # distinct terms matched: array_intersect de-dupes
                    tokens_col(F.col("line"), "pandas"),
                    term_arr,
                )
            ),
        )
        .filter(F.col("n_matched") > 0)
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_matched").desc(), F.col("line_no").asc()
    )
    return (
        lm.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= n_lines)
        .select(
            "doc_id",
            "score",
            "line_no",
            F.substring("line", 1, max_len).alias("snippet"),
            "n_matched",
        )
    )
