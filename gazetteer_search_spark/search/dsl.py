"""ES query-DSL translator — run the reference's own query JSON.

The reference never talks to an engine directly: it BUILDS Elasticsearch
query DSL (golden copies under
/root/reference/src/test/resources/es_queries/*.json, builders in
api/search/MainAddressQueryBuilder.java) and ships it to ES. This module
closes the parity loop by accepting that same JSON shape and translating
it onto this engine's native algebra (TermGroup / SearchOptions), so a
user can POST the reference's queries verbatim.

Mapping (term-centric, the engine's group algebra):

- ``bool.must`` clauses -> required groups; ``should`` -> optional
  groups (their ``boost`` becomes the group weight); ``must_not``
  (match/term/terms) -> ``exclude_terms``; ``filter`` (term/terms on a
  mapped metadata field) -> doc-side options filters.
- ``match``: the clause's analyzed tokens form ONE group —
  dis_max-over-tokens gating (ES ``operator: or``); ``operator: and``
  instead emits one required group PER token (exactly ES's and).
  ``fuzziness`` folds each token's OSA expansion into the group.
- ``multi_match type=cross_fields``: one group per token spanning the
  mapped fields with per-field weights (the engine's P11 shape);
  ``minimum_should_match`` -> the rung's msm.
- ``term``/``terms`` (query context) -> an exact-terms group;
  ``prefix`` -> dictionary expansion (df-capped); ``dis_max`` -> one
  group over the sub-clauses' terms; ``match_phrase`` -> a quoted-phrase
  clause (positional verify); ``match_all`` / empty query -> match-all.
- ``constant_score`` in should with a mapped-lang filter -> a lang
  boost; ``function_score``/``script_score`` scripts are NOT executed —
  recorded in ``notes`` (``strict=True`` raises), because arbitrary
  Painless has no safe analog; the engine's static_boost options cover
  the reference's actual script patterns.

Field names resolve through ``field_map``: reference fields -> this
index's fields ('content' for the main text, an extra-field name for
per-field postings, or a metadata column lang/repo/path_prefix for
filter context). Unmapped fields are notes (or errors under strict).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from gazetteer_search_spark.analyzer.tokenizer import tokenize_text

#: filter-context metadata targets the options support natively
_META_FIELDS = ("lang", "repo", "path_prefix")


@dataclass
class DslPlan:
    groups: list = field(default_factory=list)
    msm: int = 0
    k: int = 10
    exclude_terms: tuple = ()
    lang: str | None = None
    repo: str | None = None
    path_prefix: str | None = None
    exclude_langs: tuple = ()
    lang_boosts: dict = field(default_factory=dict)
    phrases: list = field(default_factory=list)  # (tokens, slop)
    notes: list = field(default_factory=list)


def _field(name: str, field_map: dict) -> str:
    return field_map.get(name, name)


def _tokens(text: str) -> list[str]:
    return tokenize_text(str(text), joined_identifiers=False)


def _namespace(tokens: list[str], mapped: str, engine) -> list[str]:
    """Tokens in a field's term namespace: content stays bare; a known
    extra field prefixes '<field>:'."""
    if mapped in ("content", "full_text", "text"):
        return tokens
    fields = (engine.index.meta or {}).get("fields") or {}
    if mapped in fields or mapped == "name":
        return [f"{mapped}:{t}" for t in tokens]
    return tokens  # unmapped text field: treated as content (noted upstream)


class _Translator:
    def __init__(self, engine, field_map: dict | None, strict: bool):
        from gazetteer_search_spark.search.engine import TermGroup

        self.TermGroup = TermGroup
        self.engine = engine
        self.field_map = dict(field_map or {})
        self.strict = strict
        self.plan = DslPlan()
        self._gid = 0

    # -- helpers ----------------------------------------------------------
    def note(self, msg: str) -> None:
        if self.strict:
            raise ValueError(f"DSL strict mode: {msg}")
        self.plan.notes.append(msg)

    def add_group(
        self, terms: list[str], required: bool, weight: float = 1.0,
        name: str | None = None, term_weights: tuple | None = None,
    ) -> None:
        if not terms:
            self.note("clause analyzed to zero terms — dropped")
            return
        # dedupe terms and weights TOGETHER (keep the max boost per term,
        # TermGroup.per_term_weights' rule) — deduping terms alone would
        # leave term_weights full-length and zip weights onto the wrong
        # terms whenever two mapped fields produce the same term
        if term_weights is not None:
            best: dict[str, float] = {}
            for t, w in zip(terms, term_weights):
                if t not in best or float(w) > best[t]:
                    best[t] = float(w)
            uniq = tuple(best)
            term_weights = tuple(best[t] for t in uniq)
        else:
            uniq = tuple(dict.fromkeys(terms))
        self.plan.groups.append(
            self.TermGroup(
                group_id=self._gid,
                terms=uniq,
                required=required,
                weight=float(weight),
                name=name,
                **(
                    {"term_weights": term_weights}
                    if term_weights is not None
                    else {}
                ),
            )
        )
        self._gid += 1

    def fuzzy_expand(self, tok: str) -> list[str]:
        try:
            return [tok] + [
                c for c in self.engine.expand_fuzzy(tok) if c != tok
            ]
        except Exception:
            return [tok]

    # -- clause dispatch --------------------------------------------------
    def clause(self, node: dict, required: bool) -> None:
        if not node:
            return
        if len(node) != 1:
            self.note(f"multi-key clause {sorted(node)} — first key used")
        kind, body = next(iter(node.items()))
        fn = getattr(self, f"_c_{kind}", None)
        if fn is None:
            self.note(f"unsupported clause type {kind!r} — dropped")
            return
        fn(body, required)

    def _match_body(self, fieldname, body):
        if isinstance(body, dict):
            text = body.get("query", "")
            return (
                text,
                str(body.get("operator", "or")).lower(),
                body.get("fuzziness"),
                float(body.get("boost", 1.0)),
                body.get("_name"),
            )
        return body, "or", None, 1.0, None

    def _c_match(self, body: dict, required: bool) -> None:
        (fieldname, spec), = body.items()
        text, op, fuzz, boost, name = self._match_body(fieldname, spec)
        mapped = _field(fieldname, self.field_map)
        toks = _tokens(text)
        if fuzz not in (None, 0, "0"):
            toks_exp = [self.fuzzy_expand(t) for t in toks]
        else:
            toks_exp = [[t] for t in toks]
        if op == "and":
            for t_and_vars in toks_exp:
                self.add_group(
                    _namespace(t_and_vars, mapped, self.engine),
                    required, boost, name,
                )
        else:
            flat = [t for variants in toks_exp for t in variants]
            self.add_group(
                _namespace(flat, mapped, self.engine), required, boost, name
            )

    def _c_multi_match(self, body: dict, required: bool) -> None:
        text = body.get("query", "")
        fields = body.get("fields") or ["content"]
        mtype = body.get("type", "best_fields")
        msm = body.get("minimum_should_match")
        if mtype not in ("cross_fields", "best_fields", "most_fields"):
            self.note(f"multi_match type {mtype!r} treated as cross_fields")
        toks = _tokens(text)
        if mtype == "most_fields":
            # one group per FIELD (scores sum across fields)
            for f_ in fields:
                base, _, w = f_.partition("^")
                mapped = _field(base, self.field_map)
                self.add_group(
                    _namespace(toks, mapped, self.engine),
                    required, float(w or 1.0),
                )
        else:
            # term-centric: one group per token spanning the fields
            for t in toks:
                terms, weights = [], []
                for f_ in fields:
                    base, _, w = f_.partition("^")
                    mapped = _field(base, self.field_map)
                    nt = _namespace([t], mapped, self.engine)[0]
                    terms.append(nt)
                    weights.append(float(w or 1.0))
                self.add_group(
                    terms, required, 1.0, t, term_weights=tuple(weights)
                )
        if msm is not None:
            self.plan.msm = int(msm)

    def _c_match_phrase(self, body: dict, required: bool) -> None:
        (fieldname, spec), = body.items()
        text = spec.get("query", spec) if isinstance(spec, dict) else spec
        slop = int(spec.get("slop", 0)) if isinstance(spec, dict) else 0
        mapped = _field(fieldname, self.field_map)
        if mapped not in ("content", "full_text", "text"):
            # the positions sidecar is content-only by design (builder
            # docs); a per-field phrase would silently verify against
            # content positions — surface it instead
            self.note(
                f"match_phrase on field {fieldname!r}: positions are "
                "content-only — the phrase verifies against content"
            )
        toks = _tokens(text)
        # the phrase clause carries its own terms: the engine's phrase
        # rung creates the required per-term groups itself (adding them
        # here too would double them when run_dsl reconstructs the query)
        self.plan.phrases.append((toks, slop))
        if not required:
            self.note(
                "match_phrase in should context treated as required — "
                "quoting is an exactness request in this engine"
            )

    def _c_term(self, body: dict, required: bool) -> None:
        (fieldname, spec), = body.items()
        boost = (
            float(spec.get("boost", 1.0)) if isinstance(spec, dict) else 1.0
        )
        value = spec.get("value", spec) if isinstance(spec, dict) else spec
        mapped = _field(fieldname, self.field_map)
        if mapped in _META_FIELDS:
            self._meta_filter(mapped, [value])
            return
        self.add_group(
            _namespace([str(value).lower()], mapped, self.engine), required,
            weight=boost,
        )

    def _c_terms(self, body: dict, required: bool) -> None:
        # query-context boost multiplies the clause score (ES rule) — it
        # must reach the group weight, not silently vanish
        boost = float(body.get("boost", 1.0))
        (fieldname, values), = (
            (k, v) for k, v in body.items() if k != "boost"
        )
        mapped = _field(fieldname, self.field_map)
        if mapped in _META_FIELDS:
            self._meta_filter(mapped, list(values))
            return
        self.add_group(
            _namespace([str(v).lower() for v in values], mapped, self.engine),
            required, weight=boost,
        )

    def _c_prefix(self, body: dict, required: bool) -> None:
        (fieldname, spec), = body.items()
        value = spec.get("value", spec) if isinstance(spec, dict) else spec
        mapped = _field(fieldname, self.field_map)
        # expand in the MAPPED field's own term namespace — expanding the
        # bare value against the content dictionary and prefixing 'field:'
        # afterwards would miss terms that exist only in the field
        # namespace and fabricate nonexistent ones. _namespace owns the
        # field-kind rule; a 'field:'-qualified probe scans that namespace.
        probe = _namespace([str(value).lower()], mapped, self.engine)[0]
        exp = self.engine.expand_prefix(probe)
        if not exp:
            self.note(f"prefix {value!r} expanded to zero dictionary terms")
        self.add_group(exp, required)

    def _c_dis_max(self, body: dict, required: bool) -> None:
        terms: list[str] = []
        for sub in body.get("queries", []):
            kind, sbody = next(iter(sub.items()))
            if kind in ("term", "match"):
                (f_, spec), = sbody.items()
                text = (
                    spec.get("query", spec.get("value", ""))
                    if isinstance(spec, dict)
                    else spec
                )
                mapped = _field(f_, self.field_map)
                terms += _namespace(_tokens(text), mapped, self.engine)
            else:
                self.note(f"dis_max sub-clause {kind!r} dropped")
        self.add_group(terms, required)

    def _c_exists(self, body: dict, required: bool) -> None:
        self.note(
            f"exists on {body.get('field')!r} has no unmapped analog "
            "(content always exists) — dropped"
        )

    def _c_match_all(self, body, required: bool) -> None:
        pass  # no groups = match-all

    def _c_constant_score(self, body: dict, required: bool) -> None:
        boost = float(body.get("boost", 1.0))
        filt = body.get("filter", {})
        kind = next(iter(filt), None)
        if kind in ("term", "terms"):
            (f_, spec), = filt[kind].items()
            mapped = _field(f_, self.field_map)
            values = (
                spec if isinstance(spec, list)
                else [spec.get("value", spec) if isinstance(spec, dict) else spec]
            )
            if required and mapped in ("lang", "repo", "path_prefix"):
                # must/filter context: ES constant_score FILTERS (only
                # matching docs survive) — a boost alone would silently
                # return cross-scope results
                self._meta_filter(mapped, values)
                if mapped == "lang" and boost != 1.0:
                    for v in values:
                        self.plan.lang_boosts[str(v)] = boost
                return
            if mapped == "lang":
                # should context: the clause is optional — a boost is the
                # faithful mapping
                for v in values:
                    self.plan.lang_boosts[str(v)] = boost
                return
        self.note("constant_score filter not mappable to a lang boost")

    def _c_function_score(self, body: dict, required: bool) -> None:
        if "script_score" in body:
            self.note(
                "script_score ignored — Painless has no safe analog; "
                "use SearchOptions.lang_boosts / static boosts"
            )
        inner = body.get("query")
        if inner:
            self.clause(inner, required)

    def _c_bool(self, body: dict, required: bool) -> None:
        self._bool(body)

    # -- bool / filters ---------------------------------------------------
    def _meta_filter(self, mapped: str, values: list) -> None:
        if mapped == "lang":
            if len(values) == 1:
                self.plan.lang = str(values[0])
            else:
                # several allowed langs: no single-lang filter — boost-less
                # inclusion isn't expressible, note it
                self.note(
                    f"terms filter with {len(values)} lang values — only "
                    "a single-value lang filter maps; dropped"
                )
        elif mapped in ("repo", "path_prefix"):
            if len(values) == 1:
                setattr(self.plan, mapped, str(values[0]))
            else:
                # ES terms is an OR over values; a single-value option is
                # the only mappable form — silently filtering to values[0]
                # would drop every other value's docs
                self.note(
                    f"terms filter with {len(values)} {mapped} values — "
                    "only a single-value filter maps; dropped"
                )

    def _as_list(self, v) -> list:
        return v if isinstance(v, list) else [v]

    def _bool(self, body: dict) -> None:
        for node in self._as_list(body.get("must", [])):
            self.clause(node, required=True)
        for node in self._as_list(body.get("should", [])):
            self.clause(node, required=False)
        for node in self._as_list(body.get("filter", [])):
            kind = next(iter(node), None)
            if kind in ("term", "terms"):
                (f_, spec), = node[kind].items()
                mapped = _field(f_, self.field_map)
                values = (
                    spec if isinstance(spec, list)
                    else [
                        spec.get("value", spec)
                        if isinstance(spec, dict)
                        else spec
                    ]
                )
                if mapped in _META_FIELDS:
                    self._meta_filter(mapped, values)
                else:
                    self.note(
                        f"filter field {f_!r} unmapped — add it to "
                        "field_map as lang/repo/path_prefix"
                    )
            else:
                self.note(f"filter clause {kind!r} dropped")
        for node in self._as_list(body.get("must_not", [])):
            kind = next(iter(node), None)
            if kind in ("match", "term", "terms"):
                nbody = node[kind]
                (f_, spec), = nbody.items()
                mapped = _field(f_, self.field_map)
                text = (
                    spec.get("query", spec.get("value", ""))
                    if isinstance(spec, dict)
                    else spec
                )
                vals = (
                    [str(v).lower() for v in text]
                    if isinstance(text, list)
                    else _tokens(text)
                )
                if mapped == "lang":
                    # metadata exclusion: must_not on the class dimension
                    # is the options-level exclude_langs (the no_poi
                    # analog), NOT a content-token exclusion
                    self.plan.exclude_langs = tuple(
                        dict.fromkeys(list(self.plan.exclude_langs) + vals)
                    )
                elif mapped in _META_FIELDS:
                    self.note(
                        f"must_not on metadata field {f_!r} ({mapped}) has "
                        "no options-level exclusion — dropped"
                    )
                else:
                    toks = _namespace(vals, mapped, self.engine)
                    self.plan.exclude_terms = tuple(
                        dict.fromkeys(list(self.plan.exclude_terms) + toks)
                    )
            else:
                self.note(f"must_not clause {kind!r} dropped")
        if "minimum_should_match" in body:
            self.plan.msm = int(body["minimum_should_match"])

    # -- entry ------------------------------------------------------------
    def run(self, dsl: dict) -> DslPlan:
        q = dsl.get("query", {})
        if q:
            self.clause(q, required=True)
        self.plan.k = int(dsl.get("size", 10))
        n_req = sum(1 for g in self.plan.groups if g.required)
        if self.plan.msm > 0 and n_req == 0 and self.plan.groups:
            # should-only bool with minimum_should_match: ES requires
            # >= msm of the OPTIONAL clauses to match. The engine's gate
            # counts REQUIRED groups (and clamps msm to their count), so
            # an optional-only plan would make the msm a silent no-op —
            # flip every group to required: gating becomes
            # matched_required >= msm, exactly the ES semantics
            # (required only gates; scoring is unchanged).
            self.plan.groups = [
                replace(g, required=True) for g in self.plan.groups
            ]
        elif self.plan.msm > 0 and n_req and n_req != len(self.plan.groups):
            self.note(
                "minimum_should_match with BOTH must and should clauses: "
                "the engine gates on required groups only, ES would gate "
                "the should clauses separately"
            )
        if self.plan.msm == 0:
            self.plan.msm = sum(
                1 for g in self.plan.groups if g.required
            )
        return self.plan


def translate(
    dsl: dict, engine, field_map: dict | None = None, strict: bool = False
) -> DslPlan:
    """ES query-DSL JSON -> engine plan (groups, msm, options fields,
    phrase clauses, notes). ``strict=True`` raises on anything dropped."""
    return _Translator(engine, field_map, strict).run(dsl)


def run_dsl(
    engine,
    dsl: dict,
    field_map: dict | None = None,
    strict: bool = False,
    options=None,
):
    """Translate + execute. Returns (result, plan): ``result`` is the
    engine's rows/DataFrame (phrase clauses route through the positional
    verify; everything else through search_rung)."""
    from gazetteer_search_spark.search.engine import SearchOptions

    plan = translate(dsl, engine, field_map, strict)
    base = options or SearchOptions()
    opts = replace(
        base,
        k=plan.k,
        lang=plan.lang or base.lang,
        repo=plan.repo or base.repo,
        path_prefix=plan.path_prefix or base.path_prefix,
        exclude_langs=plan.exclude_langs or base.exclude_langs,
        exclude_terms=plan.exclude_terms or base.exclude_terms,
        lang_boosts={**base.lang_boosts, **plan.lang_boosts},
    )
    if plan.phrases:
        # the engine's phrase rung runs quoted clauses + residual plain
        # tokens in ONE strict rung. Sibling groups join as residual text
        # when they are expressible there (single content term, unit
        # weight); anything richer is surfaced in notes (strict raises)
        # instead of being silently dropped.
        parts = [
            '"%s"%s' % (" ".join(toks), f"~{slop}" if slop else "")
            for toks, slop in plan.phrases
        ]
        for g in plan.groups:
            if (
                len(g.terms) == 1
                and ":" not in g.terms[0]
                and g.required
                and float(g.weight) == 1.0
            ):
                parts.append(g.terms[0])
            else:
                msg = (
                    f"clause group {g.name or g.terms} cannot join a "
                    "phrase query (phrase rungs take plain required "
                    "content terms only) — dropped"
                )
                if strict:
                    raise ValueError(f"DSL strict mode: {msg}")
                plan.notes.append(msg)
        q = " ".join(parts)
        # Spark-free serving engine (serve --local-only): return plain rows
        # — the DataFrame surfaces raise without a SparkSession
        if engine.spark is None:
            return engine.search_hits(q, opts), plan
        df = engine.search(q, opts)
        return df, plan
    if engine.spark is None:
        return engine.search_rung_rows(plan.groups, plan.msm, opts), plan
    return engine.search_rung(plan.groups, plan.msm, opts), plan
