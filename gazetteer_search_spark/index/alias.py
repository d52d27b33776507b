"""Index aliases: stable names over swappable index directories (ES _aliases).

The zero-downtime pattern this enables is the reason ES ships aliases: a
client addresses `alias:products`, you `_reindex` into a new directory
under new settings, then atomically repoint the alias — readers never see
a half state and never change their address. The reference relies on ES
for exactly this (its importer writes into the live ES index and the API
addresses the index by name — server/REServerRoutes.java routes never see
a path). This engine's indexes are directories, so an alias is a tiny
JSON FILE on the same (shared) filesystem:

    {"alias_target": "/abs/path/to/index", "updated_utc": "..."}

- ``set_alias`` validates the target is a real index and writes the file
  via tmp + ``os.replace`` — the swap is a single atomic rename, the same
  primitive the manifest/rules writers already use; readers opening
  mid-swap see either the old or the new target, never garbage.
- ``resolve_index`` is the ONE choke point: every CLI entry resolves its
  ``--index`` argument through it, so all 30+ commands accept an alias
  file anywhere a directory is accepted. Alias->alias chains are allowed
  to a small depth (cycles raise).
- A serving process holds whatever target it opened (the ES behavior:
  in-flight searches finish on the old index); reopening — e.g. the
  server's /bulk live-reopen, or a fresh CLI call — picks up the swap.
"""

from __future__ import annotations

import datetime
import json
import os

MAX_CHAIN = 4


def is_alias(path: str) -> bool:
    """An alias is a JSON *file* carrying alias_target (an index is a
    directory, so the two can never be confused)."""
    if not os.path.isfile(path):
        return False
    try:
        with open(path) as f:
            return "alias_target" in json.load(f)
    except (ValueError, OSError):
        return False


def read_alias(path: str) -> str:
    with open(path) as f:
        d = json.load(f)
    return d["alias_target"]


def resolve_index(path: str) -> str:
    """Follow alias files to the index directory (identity for a plain
    directory path). Raises on cycles / over-deep chains and on an alias
    whose target is missing — a dangling alias is a config error, not an
    empty index."""
    seen = []
    # MAX_CHAIN link FOLLOWS are allowed, so a chain of exactly MAX_CHAIN
    # aliases resolves (the final non-alias check needs one extra pass)
    for _ in range(MAX_CHAIN + 1):
        if not is_alias(path):
            return path
        if len(seen) == MAX_CHAIN:
            break
        seen.append(os.path.abspath(path))
        path = read_alias(path)
        if os.path.abspath(path) in seen:
            raise ValueError(f"alias cycle: {' -> '.join(seen)} -> {path}")
        if not (os.path.isdir(path) or is_alias(path)):
            raise ValueError(
                f"alias {seen[-1]} points at missing target {path!r}"
            )
    raise ValueError(f"alias chain deeper than {MAX_CHAIN}: {seen}")


#: filter keys a FILTERED alias may carry (the ES filtered-alias analog —
#: the multi-tenancy pattern: one shared index, per-tenant aliases whose
#: embedded filter scopes every query). These are exactly the doc-side
#: SearchOptions filter fields, so the serving layer merges them verbatim;
#: repo/path_prefix filters through a (repo, path)-clustered index prune at
#: block min/max docID metadata, so a tenant-scoped alias costs what the
#: TENANT's data costs, not the corpus.
FILTER_KEYS = ("lang", "repo", "path_prefix")


def set_alias(
    alias_path: str, target: str, filter: dict | None = None
) -> dict:
    """Create or atomically repoint an alias. The target must be an
    existing index (or another alias). ``filter`` (optional) makes it a
    FILTERED alias: {lang|repo|path_prefix: value} applied to every query
    served through the alias. Returns the written record."""
    target_abs = os.path.abspath(target)
    if not (
        os.path.isfile(os.path.join(target_abs, "index_meta.json"))
        or is_alias(target_abs)
    ):
        raise ValueError(f"alias target is not an index: {target!r}")
    rec = {
        "alias_target": target_abs,
        "updated_utc": datetime.datetime.now(datetime.timezone.utc).isoformat(
            timespec="seconds"
        ),
    }
    if filter:
        bad = sorted(set(filter) - set(FILTER_KEYS))
        if bad:
            raise ValueError(
                f"unknown alias filter keys {bad}; allowed: {FILTER_KEYS}"
            )
        rec["filter"] = {k: str(v) for k, v in filter.items()}
    tmp = alias_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(rec, f)
    os.replace(tmp, alias_path)  # the atomic swap
    return rec


def resolve_filter(path: str) -> dict:
    """Merged filter of every FILTERED alias along the chain (identity ->
    {} for a plain directory). Conflicting values for one key raise — two
    tenants' scopes composed into one alias is a config error, not a
    silent precedence pick."""
    out: dict = {}
    for _ in range(MAX_CHAIN + 1):
        if not is_alias(path):
            return out
        with open(path) as f:
            rec = json.load(f)
        for k, v in (rec.get("filter") or {}).items():
            if k in out and out[k] != v:
                raise ValueError(
                    f"alias chain defines conflicting {k!r} filters: "
                    f"{out[k]!r} vs {v!r}"
                )
            out[k] = v
        path = rec["alias_target"]
    return out
