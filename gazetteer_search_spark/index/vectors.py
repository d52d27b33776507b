"""Persisted document vectors + serving-side exact KNN (dense_vector analog).

ES stores embeddings in ``dense_vector`` fields and answers `knn` searches
next to BM25 (and fuses the two with RRF in ES 8 retrievers). This module
is that surface with ZERO external model: vectors come from the in-engine
hashed TF-IDF pipeline (``operators/similarity.vectorize_docs``), persist
as an index sidecar, and serve from a driver-side numpy matrix:

- ``build_vectors(spark, index_dir, dim)``: one distributed pass over the
  index's own stored content (the _source contract again — or an explicit
  corpus DataFrame), writing ``vectors/`` (doc_id, vector parquet) and
  ``vector_stats.json`` (dim, n_docs, per-feature df — <= dim entries, the
  WHOLE model; there is no trained artifact beyond these counts). The
  ``md5_60`` hash family is REQUIRED here: query embedding must run on
  Spark-free serving nodes, and md5 is the one hash both tiers (and the
  DuckDB oracle) compute bit-identically.
- ``KnnIndex(index_dir)``: loads the matrix once (n_docs x dim float64 —
  64-dim vectors for 1M docs = 512 MB; at larger corpora shard by doc
  range exactly like the serving executor's doc-sharding), embeds query
  TEXT with the same hashing + the persisted idf, and answers exact
  cosine top-k as one matmul + argpartition. Rank order is the engine's
  deterministic tie-break: (round(cosine, 9) desc, doc_id).
- ``rrf_fuse_rows``: pure-python reciprocal-rank fusion — the serving twin
  of ``similarity.rrf_fuse`` (equality pinned by tests), for hybrid
  BM25 + KNN pages at the HTTP surface.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re

import numpy as np

VECTORS_DIR = "vectors"
STATS_FILE = "vector_stats.json"
_WORD_RE = re.compile(r"[a-z0-9]+")


def _md5_60(token: str) -> int:
    """Python twin of dedup.hash64_col('md5_60') — low 60 bits of md5."""
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16)


def build_vectors(
    spark,
    index_dir: str,
    dim: int = 64,
    source=None,
) -> dict:
    """Vectorize the index's documents and persist the sidecar. ``source``
    overrides the corpus (a DataFrame with doc_id + content/text); default
    reads the index's own stored content (requires store_content=True).
    Returns the stats record."""
    from pyspark.sql import functions as F

    from gazetteer_search_spark.index import builder as _b
    from gazetteer_search_spark.index import segments as _segs
    from gazetteer_search_spark.operators import similarity as _sim

    meta = _b.read_index_meta(index_dir)
    if source is None:
        if not meta.get("stored_content"):
            raise ValueError(
                "build_vectors needs the index's stored content "
                "(store_content=True) or an explicit source DataFrame"
            )
        source = _segs.live_docs(spark, index_dir)
    text_col = "content" if "content" in source.columns else "text"
    docs = source.select("doc_id", F.col(text_col).alias("text"))

    # the tokenize+hash pass is the expensive stage — run it ONCE, persist,
    # and share it between the vector build and the df-stats sidecar (the
    # naive form re-scanned the corpus twice more: ADVICE r5)
    feats = _sim.hashed_feats(docs, dim, hash_fn="md5_60").persist()
    n_docs = int(docs.count())
    dfreq_df = feats.groupBy("feat").agg(
        F.count("*").cast("double").alias("dfc")
    )
    dfreq = dfreq_df.collect()  # <= dim rows — the whole "model"
    vec = _sim.vectorize_docs(
        docs, dim=dim, hash_fn="md5_60",
        feats=feats, n_docs=float(n_docs), dfreq=dfreq_df,
    )
    out = os.path.join(index_dir, VECTORS_DIR)
    vec.write.mode("overwrite").parquet(out)
    feats.unpersist()
    stats = {
        "dim": int(dim),
        "hash_fn": "md5_60",
        "n_docs": n_docs,
        "df": {str(int(r.feat)): int(r.dfc) for r in dfreq},
    }
    tmp = os.path.join(index_dir, STATS_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(index_dir, STATS_FILE))
    meta["vector_dim"] = int(dim)
    _b._write_index_meta(index_dir, meta)
    return stats


def has_vectors(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, STATS_FILE))


class KnnIndex:
    """Spark-free exact-KNN handle over the persisted vector sidecar."""

    def __init__(self, index_dir: str):
        import pyarrow.parquet as pq

        with open(os.path.join(index_dir, STATS_FILE)) as f:
            self.stats = json.load(f)
        self.dim = int(self.stats["dim"])
        self.n_docs = int(self.stats["n_docs"])
        # unseen features carry df=0 under the build's smoothed formula:
        # ln((N+1)/(0+1)) + 1 — NOT 1.0, or out-of-corpus query tokens
        # would deflate the query norm and inflate every reported cosine
        self._idf = np.full(
            self.dim, math.log(self.n_docs + 1.0) + 1.0, dtype=np.float64
        )
        for feat, dfc in self.stats["df"].items():
            self._idf[int(feat)] = math.log(
                (self.n_docs + 1.0) / (int(dfc) + 1.0)
            ) + 1.0
        t = pq.read_table(os.path.join(index_dir, VECTORS_DIR))
        self.doc_ids = t.column("doc_id").to_numpy()
        self.matrix = np.vstack(
            t.column("vector").to_numpy(zero_copy_only=False)
        ).astype(np.float64)

    def embed(self, text: str) -> np.ndarray:
        """Query text -> unit TF-IDF vector (same hashing + the index's own
        df stats — the exact math the build ran, so a query equal to a
        document's text lands on that document's vector)."""
        v = np.zeros(self.dim)
        for tok in _WORD_RE.findall(text.lower()):
            v[_md5_60(tok) % self.dim] += 1.0
        v *= self._idf
        n = float(np.sqrt((v * v).sum()))
        return v / n if n > 0 else v

    def knn(
        self, query, k: int = 10, mask: np.ndarray | None = None
    ) -> list[tuple[int, float]]:
        """Exact cosine top-k: (doc_id, cosine) ordered by the engine's
        deterministic tie-break (round(cosine, 9) desc, doc_id). ``query``
        is text or a vector. Stored vectors are unit (or zero) norm, so
        cosine = dot; zero-vector docs score 0 and lose every tie-break
        against real matches. ``mask``: the ES filtered-kNN form — a
        boolean array aligned with ``doc_ids``; top-k is taken AMONG the
        allowed docs (pre-filter semantics: the page fills with the best
        allowed docs, never fewer because good unallowed ones were cut
        first)."""
        qv = self.embed(query) if isinstance(query, str) else np.asarray(query, dtype=np.float64)
        sims = self.matrix @ qv
        if mask is None:
            return self._topk(sims, self.doc_ids, k)
        idx = np.flatnonzero(mask)
        return self._topk(sims[idx], self.doc_ids[idx], k)

    def mask_for_ids(self, allowed_ids) -> np.ndarray:
        """Boolean mask aligned with ``doc_ids`` from an allowed-id array
        (the route's filter scan output)."""
        return np.isin(self.doc_ids, np.asarray(allowed_ids, dtype=np.int64))

    @staticmethod
    def _topk(sims: np.ndarray, ids: np.ndarray, k: int) -> list[tuple[int, float]]:
        k = min(k, len(sims))
        if k <= 0:
            return []
        # argpartition to a candidate window, then verify no EXCLUDED doc
        # ties (at round-9) with the kept boundary — ties must resolve by
        # doc_id over the full tie group, so a boundary tie falls back to
        # the exact full ranking (rare: needs > m docs above the kth score)
        m = min(len(sims), max(4 * k, 64))
        if m < len(sims):
            part = np.argpartition(-sims, m - 1)
            cand, rest = part[:m], part[m:]
            kept = sorted(
                ((int(ids[i]), float(sims[i])) for i in cand),
                key=lambda r: (-round(r[1], 9), r[0]),
            )[:k]
            if round(float(sims[rest].max()), 9) < round(kept[-1][1], 9):
                return kept
        rows = sorted(
            ((int(ids[i]), float(sims[i])) for i in range(len(sims))),
            key=lambda r: (-round(r[1], 9), r[0]),
        )[:k]
        return rows


def rrf_fuse_rows(
    pages: list[list[tuple[int, float]]], k0: int = 60, topk: int = 20
) -> list[tuple[int, float]]:
    """Pure-python reciprocal-rank fusion — the serving twin of
    ``similarity.rrf_fuse`` (same rank definition: each page ordered by
    (round(score, 9) desc, id); fused = sum 1/(k0 + rank); output by
    (round(fused, 9) desc, id)). Equality with the Spark form is pinned
    in tests."""
    fused: dict[int, float] = {}
    for page in pages:
        ordered = sorted(page, key=lambda r: (-round(r[1], 9), r[0]))
        for rank, (doc, _s) in enumerate(ordered, start=1):
            fused[doc] = fused.get(doc, 0.0) + 1.0 / (k0 + rank)
    return sorted(
        fused.items(), key=lambda r: (-round(r[1], 9), r[0])
    )[:topk]
