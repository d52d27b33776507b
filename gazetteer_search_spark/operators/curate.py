"""Declarative corpus curation: taggers + mixer (the Dolma architecture).

Large-scale training-data pipelines (Dolma/AI2, CCNet, RefinedWeb) separate
curation into two roles: independent TAGGERS annotate every document with
typed attributes (length, repetition, language, quality, PII counts), and a
MIXER evaluates a declarative rule configuration over those attributes to
decide keep/drop — with the fired rules recorded per document, so every
drop is auditable and thresholds can be re-tuned WITHOUT re-running the
taggers. The reference has no curation surface (its importer filters
nothing — imp/addr/AddressesImporter.java loads every parsed line); this
family is part of the beyond-reference LLM-pipeline surface.

Spark shape — the whole pass is ONE narrow projection:

- every attribute here is scan-local (array/regexp expressions over the
  text column — no shuffle, no UDF, no join), so Catalyst collapses
  tag + mix into a single WholeStageCodegen scan stage;
- the mixer is pure column arithmetic over the attribute columns: per rule
  one CASE, fired names collected into a sorted reason list. Rules arrive
  as SQL predicate strings (the Dolma config-file analog) and are
  evaluated by Catalyst — adding a rule never adds a pass;
- at 100 TB this is the cheapest possible plan: predicate/column pruning
  reach the parquet scan, output can partition straight into kept/dropped
  sinks. Re-mixing with new thresholds over PERSISTED tags (tag() output)
  touches only the tiny attribute columns, never the text.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from gazetteer_search_spark.operators.textstats import (
    lang_id,
    pii_counts,
    quality_score,
    token_count,
    words_col,
)


@dataclass(frozen=True)
class DropRule:
    """One named drop condition: a SQL boolean over the tagged attribute
    columns (n_tokens, n_chars, dup_word_frac, lang_guess, quality,
    n_email, n_ipv4, n_phone). A document is kept iff NO rule fires."""

    name: str
    predicate: str


#: Gopher/Dolma-flavoured defaults over the attribute surface. Thresholds
#: are config, not truth — the point of the mixer is cheap re-tuning.
DEFAULT_RULES: tuple[DropRule, ...] = (
    DropRule("too_short", "n_tokens < 20"),
    DropRule("too_repetitive", "dup_word_frac > 0.55"),
    DropRule("low_quality", "quality < 0.3"),
    DropRule("has_pii", "n_email + n_phone > 0"),
)


def dup_word_frac(text: Column) -> Column:
    """Within-doc repeated-word mass (the Gopher duplicate-word fraction;
    same formula as textstats.repetition_stats, expression form)."""
    ws = words_col(text)
    return F.round(
        F.when(
            F.size(ws) > 0,
            1.0 - F.size(F.array_distinct(ws)) / F.size(ws),
        ).otherwise(F.lit(0.0)),
        6,
    )


def tag(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Tagger pass: id + every attribute column, one scan-local projection.
    Persist this output to re-mix thresholds later without re-reading text."""
    t = F.col(text_col)
    n_email, n_ipv4, n_phone = pii_counts(t)
    return df.select(
        F.col(id_col).alias("doc_id"),
        token_count(t).alias("n_tokens"),
        F.length(t).cast("int").alias("n_chars"),
        dup_word_frac(t).alias("dup_word_frac"),
        lang_id(t).alias("lang_guess"),
        quality_score(t).alias("quality"),
        n_email.alias("n_email"),
        n_ipv4.alias("n_ipv4"),
        n_phone.alias("n_phone"),
    )


def mix(
    tagged: DataFrame, rules: tuple[DropRule, ...] = DEFAULT_RULES
) -> DataFrame:
    """Mixer pass: evaluate the rule config over tagged attributes. Output
    adds ``keep`` (1 iff no rule fired) and ``reasons`` (comma-joined
    sorted names of fired rules; '' when kept) — the per-doc audit trail."""
    if not rules:
        raise ValueError("mix: empty rule set")
    names = [r.name for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"mix: duplicate rule names in {names}")
    fired = F.array_compact(
        F.array(*[F.when(F.expr(r.predicate), F.lit(r.name)) for r in rules])
    )
    return tagged.select(
        "*",
        (F.size(fired) == 0).cast("int").alias("keep"),
        F.array_join(F.array_sort(fired), ",").alias("reasons"),
    )


def curate(
    df: DataFrame,
    rules: tuple[DropRule, ...] = DEFAULT_RULES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """tag + mix fused (Catalyst collapses the projections into one scan):
    (doc_id, <attributes>, keep, reasons)."""
    return mix(tag(df, text_col=text_col, id_col=id_col), rules)
