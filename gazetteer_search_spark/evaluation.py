"""Golden-set accuracy comparison — the reference's built-in evaluation mode.

Analog of the mass-geocode compare harness (/root/reference/src/main/java/me/
osm/gazetteer/search/csv/CSVGeocode.java:130-179: run each golden (query,
expected location) row, check the first hit against the expectation, tally
``Fails / Not found / On first page / Total``; threshold knob in
csv/MassGeocodeOptions.java:46-47). Transliterated to code search the
expectation is an exact doc_id: "within threshold distance" becomes
"expected doc at rank 1 / anywhere in the first page / absent".

This is the tool a user reaches for after every index rebuild — one command
answering "did ranking quality move?".
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class CompareReport:
    total: int = 0
    found_at_1: int = 0
    found_in_page: int = 0  # in top-k but not rank 1
    not_found: int = 0
    ms_per_query: float = 0.0
    # per-failure detail (CSVGeocode prints one report line per failure):
    # (query, expected_doc_id, rank_or_None, top_hit_doc_id_or_None)
    failures: list[tuple] = field(default_factory=list)

    def summary(self) -> dict:
        return {
            "total": self.total,
            "found_at_1": self.found_at_1,
            "found_in_page": self.found_in_page,
            "not_found": self.not_found,
            "accuracy_at_1": round(self.found_at_1 / self.total, 4) if self.total else 0.0,
            "accuracy_in_page": (
                round((self.found_at_1 + self.found_in_page) / self.total, 4)
                if self.total
                else 0.0
            ),
            "ms_per_query": round(self.ms_per_query, 2),
        }


def compare_goldens(engine, goldens: list[tuple[str, int]], options=None) -> CompareReport:
    """Run every (query, expected_doc_id) golden through the engine's ladder
    and tally rank-1 / in-page / not-found, like CSVGeocode's summary. The
    engine's serving path makes this a pure driver loop (no Spark jobs)."""
    from gazetteer_search_spark.search.engine import SearchOptions

    options = options or SearchOptions()
    rep = CompareReport()
    t0 = time.perf_counter()
    for q, expected in goldens:
        expected = int(expected)
        hits = engine.search_hits(q, options)
        rank = next((i for i, h in enumerate(hits, 1) if h.doc_id == expected), None)
        rep.total += 1
        if rank == 1:
            rep.found_at_1 += 1
        elif rank is not None:
            rep.found_in_page += 1
            rep.failures.append((q, expected, rank, hits[0].doc_id if hits else None))
        else:
            rep.not_found += 1
            rep.failures.append((q, expected, None, hits[0].doc_id if hits else None))
    rep.ms_per_query = 1000 * (time.perf_counter() - t0) / max(rep.total, 1)
    return rep
