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
O(query terms' postings), independent of corpus size. At 10^12 docs a head
term's posting list is itself large — a production deployment shards the
serving tier by doc-id chunk (the same chunk alignment the distributed path
uses) and fans a query out to shard servers, each running this module over
its chunk slice. ShardedTopKServer below IS that wiring: N chunk-striped
TopKServers + a top-k merge, rank-identical to the single server because
BM25 stats stay global and scores are per-doc.
"""

from __future__ import annotations

import json
import os
import threading
from collections import OrderedDict
from dataclasses import dataclass, field

import numpy as np
import pandas as pd


def _entry_nbytes(entry: tuple) -> int:
    return sum(a.nbytes for a in entry)


def _lev_dp(mat: np.ndarray, stem: str) -> np.ndarray:
    """Vectorized Wagner-Fischer over a (n, L) codepoint matrix (candidates
    padded with 0): returns the full final DP row (n, L+1) so callers can
    gather each candidate's distance at its own true length. len(stem) * L
    scalar iterations of whole-array numpy ops — no per-candidate Python.
    Plain codepoint edit distance, no transpositions: must agree exactly
    with the distributed path's JVM `levenshtein` (rank identity across
    tiers depends on the two expansions producing the same term set)."""
    n, L = mat.shape
    m = len(stem)
    stem_codes = np.frombuffer(stem.encode("utf-32-le"), dtype=np.uint32)
    # int16 cells (distances are <= m+L << 2^15) and in-place ops: the DP
    # is memory-bandwidth-bound over vocabulary-sized buckets, so cell
    # width and temporaries dominate wall time (int64 + fresh allocations
    # per row measured ~3x slower at a 190k-term bucket)
    prev = np.broadcast_to(
        np.arange(L + 1, dtype=np.int16), (n, L + 1)
    ).copy()
    cur = np.empty_like(prev)
    sub = np.empty(n, dtype=np.int16)
    ins = np.empty(n, dtype=np.int16)
    for i in range(1, m + 1):
        cur[:, 0] = i
        sc = stem_codes[i - 1]
        for j in range(1, L + 1):
            np.add(
                prev[:, j - 1],
                (mat[:, j - 1] != sc).view(np.int8),
                out=sub,
                casting="unsafe",
            )
            np.minimum(prev[:, j], cur[:, j - 1], out=ins)
            ins += 1
            np.minimum(sub, ins, out=cur[:, j])
        prev, cur = cur, prev
    return prev


def _lev_one(a: str, b: str) -> int:
    """Scalar Levenshtein for ranking an already-expanded candidate list
    (bounded by max_fuzzy_expansions — never vocabulary-sized)."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _lev_mask(cands: list, stem: str, d: int) -> np.ndarray:
    """Boolean mask over `cands` (a Python list of strings): standard
    Levenshtein(cand, stem) <= d, via _lev_dp on a padded codepoint matrix
    (utf-32 decode — no per-char Python loop)."""
    n = len(cands)
    if n == 0:
        return np.zeros(0, dtype=bool)
    lens = np.fromiter((len(c) for c in cands), dtype=np.int64, count=n)
    L = max(1, int(lens.max()))
    padded = "".join(c.ljust(L, "\0") for c in cands)
    mat = np.frombuffer(padded.encode("utf-32-le"), dtype=np.uint32).reshape(
        n, L
    )
    final = _lev_dp(mat, stem)
    return final[np.arange(n), lens] <= d

from ..index.build import IndexReader
from .bm25 import (
    PREFIX_SCORE,
    ParsedQuery,
    parse_disjunction,
    validate_branches,
)
from .wand import score_branch_lists

_BLOCK_COLS = [
    "term", "chunk", "first_doc", "n", "docs_bin", "tfs_bin", "dls_bin",
    "pos_bin", "max_tf", "min_dl",
]


@dataclass
class TopKServer:
    index_dir: str
    k1: float = 1.2
    b: float = 0.75
    analyzer: str = "standard"
    max_cached_terms: int = 4096
    # hard bound on terms one prefix clause (`dang*`) may expand to before
    # the server refuses the query (protects the in-process tier from a
    # single-letter prefix decoding half the vocabulary; the distributed
    # paths expand unbounded — they stream, this tier holds arrays)
    max_prefix_expansions: int = 1024
    # same refusal bound for fuzzy clauses (`dnag~1`) — must match the
    # distributed MAX_FUZZY_EXPANSIONS default so both tiers refuse the
    # same queries instead of one silently diverging
    max_fuzzy_expansions: int = 1024
    # (shard_idx, n_shards) chunk striping: this server decodes only blocks
    # whose chunk % n_shards == shard_idx. Stats (n_docs, avgdl, df) stay
    # GLOBAL — BM25 scores are identical to the unsharded server, so a
    # fan-out merge of per-shard top-k is exact, not approximate.
    shard: tuple[int, int] | None = None
    # decoded-postings budget in BYTES: one head term's arrays can be GBs at
    # 10^9 postings, so a count bound alone cannot cap residency.  Sized so
    # a realistic hot term set stays resident — at 2M docs the 40-query
    # bench set decodes to ~250 MB in compact dtypes; 512 MB caused LRU
    # thrash (47 terms resident, head terms re-decoded per query, warm p95
    # 0.58 s vs 0.07 s at 200k docs)
    max_cache_bytes: int = 1 << 30
    _gens: list[dict] = field(default_factory=list)
    # term -> decoded (ids, tfs, dls, pos, gens); true LRU: moved to end on
    # every hit, evicted from the front by accumulated nbytes
    _term_cache: "OrderedDict[str, tuple]" = field(default_factory=OrderedDict)
    _term_cache_nbytes: int = 0
    _stats_cache: dict = field(default_factory=dict)  # term -> df (int, tiny)
    _tomb: tuple | None = None
    _tomb_key: tuple | None = None  # (version dir name, file mtime)
    _n_docs: int = 0
    _avgdl: float = 0.0
    # pyarrow datasets cached per (gen, stage): dataset() re-lists the
    # directory and re-parses every parquet footer per call — per-query
    # that's O(files) metadata IO; cached, a term read touches only the
    # row groups its stats admit. Unbounded BY DESIGN but bounded BY
    # STRUCTURE: keys are (gen, stage) + one "rgterms" entry per row group,
    # so residency is O(row groups) of the open generations (the term
    # dictionary itself), cleared whenever the generation list changes.
    _dsets: dict = field(default_factory=dict)
    # (stem, dist) -> expanded term list; the vocabulary DP is the
    # expensive part of a fuzzy query, and typo distributions are heavy-
    # tailed (the same misspellings recur), so a small LRU pays for
    # itself. Bounded by count (entries are <= max_fuzzy_expansions short
    # strings); cleared whenever the generation list changes, same as the
    # other caches.
    _fuzzy_cache: "OrderedDict[tuple, list]" = field(
        default_factory=OrderedDict
    )
    max_cached_fuzzy_expansions: int = 512
    # coarse lock over cache fill/eviction — a serving tier answers many
    # queries concurrently; scoring itself is lock-free numpy
    _lock: threading.RLock = field(default_factory=threading.RLock)

    @classmethod
    def open(
        cls, index_dir: str, shard: tuple[int, int] | None = None
    ) -> "TopKServer":
        srv = cls(index_dir, shard=shard)
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
        # compare (generation, build_id) — NOT the generation list alone:
        # compact() of gens [0,N] lands on [0] again with entirely new
        # files, and open parquet handles would silently keep serving the
        # DELETED old build's bytes (posix unlink semantics).  build_id is
        # the per-build nonce written by build_index; absent (pre-nonce
        # indexes) it degrades to the generation-number comparison.
        if [(g["generation"], g.get("build_id")) for g in gens] != [
            (g["generation"], g.get("build_id")) for g in self._gens
        ]:
            self._term_cache.clear()
            self._term_cache_nbytes = 0
            self._stats_cache.clear()
            self._dsets.clear()
            self._fuzzy_cache.clear()
        self._gens = gens
        self.k1 = gens[0]["k1"]
        self.b = gens[0]["b"]
        self.analyzer = gens[0]["analyzer"]
        from ..index.codec import get_codec

        self._codec = get_codec(gens[0].get("postings_codec", "varint"))
        self._n_docs = sum(g["n_docs"] for g in gens)
        self._avgdl = (
            sum(g["avgdl"] * g["n_docs"] for g in gens) / self._n_docs
            if self._n_docs
            else 0.0
        )
        self._load_tombstones()

    def warmup(self, preload_top_terms: int = 0) -> None:
        """Server-startup preload: parquet footers + per-row-group term
        dictionaries for every generation (parallel, one-time). After this,
        a cold term's read touches exactly its own row groups.

        `preload_top_terms`: additionally decode the N highest-df terms
        into the postings cache (the ES index-warmer analog).  Head terms
        are exactly the ones whose one-time cold decode is expensive
        (O(df) varint work — ~0.5 s for a 1.4M-posting term at 2M docs)
        AND the ones every realistic query mix hits, so preloading them
        moves that cost from the first unlucky queries to startup.  The
        preload walks df-descending in small batches, checking the cache
        budget BEFORE each batch and stopping once ~80% is spent — at
        worst one batch of already-preloaded terms is ever evicted; the
        long tail stays cold but tail terms are small (fast) by
        definition."""
        from concurrent.futures import ThreadPoolExecutor

        jobs = []
        for g in self._gens:
            gen = g["generation"]
            for stage in (self._postings_stage(gen), "term_stats"):
                jobs.extend(self._term_directory(gen, stage))
        with ThreadPoolExecutor(max_workers=16) as pool:
            list(pool.map(lambda e: self._rg_terms(e[2], e[3]), jobs))
        if preload_top_terms > 0:
            for batch in self._top_df_terms(preload_top_terms):
                with self._lock:
                    # budget check BEFORE the batch: _read_terms' own
                    # eviction protects only the in-flight batch, so
                    # issuing a batch past the budget could evict terms
                    # preloaded moments ago — stop while ~20% headroom
                    # remains instead
                    if self._term_cache_nbytes > 0.8 * self.max_cache_bytes:
                        break
                    self._read_terms(batch)

    def _top_df_terms(self, n: int, batch: int = 8):
        """Yield the n highest-df terms in df-descending batches.

        Streams term_stats row group by row group keeping a running
        top-(n * n_gens) heap (never materializes the full vocabulary —
        at web scale the term dictionary is 10^8+ rows; this holds O(n)
        in memory), then SUMS df per term across generations: the same
        term has one stats row per generation it appears in, and ranking
        raw rows would both waste heap slots on duplicates and misrank
        terms whose df is split across generations."""
        import heapq

        n_gens = max(1, len(self._gens))
        best: list[tuple[int, str]] = []  # (df, term), ascending heap
        cap = n * n_gens
        for g in self._gens:
            gen = g["generation"]
            for _mn, _mx, pf, rg in self._term_directory(gen, "term_stats"):
                tbl = pf.read_row_group(rg, columns=["term", "df"])
                for t, d in zip(
                    tbl.column("term").to_pylist(),
                    tbl.column("df").to_pylist(),
                ):
                    if len(best) < cap:
                        heapq.heappush(best, (int(d), t))
                    elif d > best[0][0]:
                        heapq.heapreplace(best, (int(d), t))
        totals: dict[str, int] = {}
        for d, t in best:
            totals[t] = totals.get(t, 0) + d
        ordered = [
            t for t, _d in sorted(
                totals.items(), key=lambda kv: (-kv[1], kv[0])
            )
        ][:n]
        for i in range(0, len(ordered), batch):
            yield ordered[i : i + batch]

    def _load_tombstones(self) -> None:
        import pyarrow.dataset as pads

        from ..index.snapshots import resolve_tombstone_dir

        # resolve the CURRENT version through the manifest pointer (merges
        # write new immutable dirs and swing the pointer, so a name change
        # IS the staleness signal; the mtime check remains for the legacy
        # rewritten-in-place layout)
        name = resolve_tombstone_dir(self.index_dir)
        if name is None:
            self._tomb = None
            self._tomb_key = None
            return
        path = os.path.join(self.index_dir, name)
        if not os.path.exists(path):
            self._tomb = None
            self._tomb_key = None
            return
        mtime = max(
            (os.path.getmtime(os.path.join(path, f)) for f in os.listdir(path)),
            default=0.0,
        )
        if self._tomb is not None and (name, mtime) == self._tomb_key:
            return
        t = pads.dataset(path, format="parquet").to_table()
        # collapse to max before_gen per doc, SORTED by doc_id (the query
        # path binary-searches it) — same as IndexReader.tombstones
        pdf = t.to_pandas().groupby("doc_id", sort=True)["before_gen"].max()
        self._tomb = (
            pdf.index.to_numpy(dtype=np.int64),
            pdf.to_numpy(dtype=np.int64),
        )
        self._tomb_key = (name, mtime)

    # -- per-term IO (row-group-pruned parquet reads) --------------------

    def _dataset(self, gen: int, stage: str):
        import pyarrow.dataset as pads

        key = (gen, stage)
        if key not in self._dsets:
            self._dsets[key] = pads.dataset(
                os.path.join(self.index_dir, f"gen{gen}", stage),
                format="parquet",
            )
        return self._dsets[key]

    def _term_directory(self, gen: int, stage: str) -> list[tuple]:
        """[(min_term, max_term, parquet_file, row_group)] — the row-group
        term ranges of one generation's stage, read ONCE from the parquet
        footers (files are term-sorted per partition at build time precisely
        so these stats are selective). The serving analog of Lucene's term
        dictionary: a cold term read touches only the row groups whose
        [min,max] admit it, not every file's metadata per query."""
        import pyarrow.parquet as pq

        key = (gen, stage, "dir")
        if key not in self._dsets:
            d = os.path.join(self.index_dir, f"gen{gen}", stage)
            entries = []
            for fn in sorted(os.listdir(d)):
                if not fn.endswith(".parquet"):
                    continue
                pf = pq.ParquetFile(os.path.join(d, fn))
                md = pf.metadata
                term_col = next(
                    i
                    for i in range(len(md.schema))
                    if md.schema.column(i).name == "term"
                )
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(term_col).statistics
                    entries.append((st.min, st.max, pf, rg))
            self._dsets[key] = entries
        return self._dsets[key]

    def _postings_stage(self, gen: int) -> str:
        """Prefer the term-clustered serve copy (build stage 2b) — a term's
        blocks are contiguous row groups there; fall back to the WAND layout
        for indexes built with serve_layout=False."""
        key = (gen, "stage")
        if key not in self._dsets:
            d = os.path.join(self.index_dir, f"gen{gen}", "postings_term")
            self._dsets[key] = (
                "postings_term" if os.path.exists(d) else "postings"
            )
        return self._dsets[key]

    def _rg_terms(self, pf, rg: int) -> np.ndarray:
        """Sorted unique terms of one row group — the exact term dictionary.
        Read lazily ONCE (the term column alone: dictionary-encoded, tiny
        next to the posting binaries); afterwards membership is a binary
        search, so a cold term read touches only row groups that truly
        contain it. This matters because the build shuffles by
        hash(term, window): per-FILE min/max spans most of the vocabulary,
        so footer stats alone cannot prune."""
        key = ("rgterms", id(pf), rg)
        if key not in self._dsets:
            col = pf.read_row_group(rg, columns=["term"]).column("term")
            self._dsets[key] = np.unique(
                np.asarray(col.to_pandas(), dtype=object)
            )
        return self._dsets[key]

    def _expand_prefix(self, prefix: str) -> list[str]:
        """All index terms starting with `prefix`, via the row-group term
        dictionaries: footer min/max prune to the row groups whose range
        intersects [prefix, prefix+U+10FFFF), then a binary-search slice of
        each group's sorted term array — the serving analog of Lucene's
        term-dictionary prefix seek. Raises when the expansion exceeds
        max_prefix_expansions (consistent refusal, never silent
        truncation — truncating would break rank identity with the
        distributed paths)."""
        hi = prefix + "\U0010ffff"
        out: set[str] = set()
        for g in self._gens:
            gen = g["generation"]
            stage = self._postings_stage(gen)
            for mn, mx, pf, rg in self._term_directory(gen, stage):
                if mx < prefix or mn >= hi:
                    continue
                terms = self._rg_terms(pf, rg)
                lo_i = np.searchsorted(terms, prefix, side="left")
                hi_i = np.searchsorted(terms, hi, side="left")
                out.update(terms[lo_i:hi_i].tolist())
                if len(out) > self.max_prefix_expansions:
                    raise ValueError(
                        f"prefix {prefix!r}* expands to more than "
                        f"{self.max_prefix_expansions} terms on the serve "
                        "tier; narrow the prefix or use the distributed path"
                    )
        return sorted(out)

    def _vocab_buckets(self) -> dict:
        """Vocabulary grouped by TERM LENGTH, each bucket a (sorted term
        array, (n, L) uint32 codepoint matrix) pair — built ONCE per
        generation list from the row-group term dictionaries and cached in
        _dsets (cleared with the other caches on generation change).

        This is the serving analog of a Levenshtein automaton's dictionary
        walk, shaped for numpy: a fuzzy query touches only the buckets
        inside its length band (|len - len(stem)| <= d) and runs the DP on
        prebuilt matrices — no per-query string decode of the vocabulary.
        The matrices are the vocabulary re-encoded as UCS4 (~4 bytes/char,
        bounded by the term dictionary itself), so residency is O(vocab),
        same class as the cached dictionaries they derive from."""
        key = ("vocabbuckets",)
        if key in self._dsets:
            return self._dsets[key]
        terms: set[str] = set()
        for g in self._gens:
            gen = g["generation"]
            stage = self._postings_stage(gen)
            for _mn, _mx, pf, rg in self._term_directory(gen, stage):
                terms.update(self._rg_terms(pf, rg).tolist())
        by_len: dict[int, list] = {}
        for t in terms:
            by_len.setdefault(len(t), []).append(t)
        buckets = {}
        for L, ts in by_len.items():
            ts.sort()
            arr = np.array(ts, dtype=f"U{L}")
            mat = arr.view(np.uint32).reshape(len(ts), L)
            buckets[L] = (np.array(ts, dtype=object), mat)
        self._dsets[key] = buckets
        return buckets

    def _expand_fuzzy(
        self, stem: str, dist: int, cap: int | None = 0
    ) -> list[str]:
        """All index terms within Levenshtein distance `dist` of `stem`
        (field-scoped stems 'path\\x1fterm' measure distance on the term
        part; the namespace must match exactly and prunes each bucket via
        binary search like a prefix). Length-banded bucket walk over the
        precomputed vocabulary matrices, then the vectorized DP (_lev_dp).
        Same refusal-over-truncation contract as _expand_prefix; the term
        set must equal bm25.expand_fuzzy's for rank identity. Results are
        LRU-cached per (stem, dist) — callers already hold self._lock.

        `cap`: 0 (default) applies max_fuzzy_expansions (the QUERY-path
        refusal); None expands unbounded — the suggest path wants the full
        candidate set to rank top-k from, and its output is k rows either
        way (uncapped results bypass the LRU: they can be vocabulary-band
        sized)."""
        from ..index.build import FIELD_SEP

        limit = self.max_fuzzy_expansions if cap == 0 else cap
        ckey = (stem, dist)
        # cache READ is always valid — a stored entry is the COMPLETE
        # expansion (the limit refuses, never truncates); only the store
        # below is skipped for uncapped results (vocabulary-band sized)
        if ckey in self._fuzzy_cache:
            self._fuzzy_cache.move_to_end(ckey)
            return self._fuzzy_cache[ckey]

        ns, _, core = stem.rpartition(FIELD_SEP)
        if ns:
            ns = ns + FIELD_SEP
        buckets = self._vocab_buckets()
        out: list[str] = []
        lo_len = len(ns) + max(1, len(core) - dist)
        hi_len = len(ns) + len(core) + dist
        for L in range(lo_len, hi_len + 1):
            if L not in buckets:
                continue
            terms_arr, mat = buckets[L]
            if ns:
                lo_i = np.searchsorted(terms_arr, ns, side="left")
                hi_i = np.searchsorted(
                    terms_arr, ns + "\U0010ffff", side="left"
                )
                terms_sel = terms_arr[lo_i:hi_i]
                mat_sel = mat[lo_i:hi_i, len(ns):]
            else:
                terms_sel, mat_sel = terms_arr, mat
            if not terms_sel.size:
                continue
            final = _lev_dp(mat_sel, core)
            hit = final[:, L - len(ns)] <= dist
            out.extend(terms_sel[hit].tolist())
            if limit is not None and len(out) > limit:
                raise ValueError(
                    f"fuzzy clause {core!r}~{dist} expands to more than "
                    f"{limit} terms on the serve "
                    "tier; narrow it or lower the distance"
                )
        expansion = sorted(out)
        if limit is not None:
            self._fuzzy_cache[ckey] = expansion
            if len(self._fuzzy_cache) > self.max_cached_fuzzy_expansions:
                self._fuzzy_cache.popitem(last=False)
        return expansion

    def _read_row_groups(
        self, gen: int, stage: str, terms: list[str], columns: list[str]
    ) -> "pd.DataFrame | None":
        """Read only the row groups that CONTAIN one of `terms` (term-
        dictionary membership), slicing exact matches; heavy column reads
        fan out over a thread pool (pyarrow releases the GIL)."""
        from concurrent.futures import ThreadPoolExecutor

        import pyarrow as pa
        import pyarrow.compute as pc

        hits: dict[tuple, set] = {}
        for mn, mx, pf, rg in self._term_directory(gen, stage):
            in_range = [t for t in terms if mn <= t <= mx]
            if not in_range:
                continue
            known = self._rg_terms(pf, rg)
            idx = np.searchsorted(known, in_range)
            present = {
                t
                for t, i in zip(in_range, idx)
                if i < known.size and known[i] == t
            }
            if present:
                hits.setdefault((id(pf), pf, rg), set()).update(present)

        def _read(item):
            (_, pf, rg), ts = item
            tbl = pf.read_row_group(rg, columns=columns)
            mask = pc.is_in(
                tbl.column("term"),
                options=pc.SetLookupOptions(value_set=pa.array(sorted(ts))),
            )
            sub = tbl.filter(mask)
            return sub.to_pandas() if sub.num_rows else None

        if not hits:
            return None
        if len(hits) == 1:
            frames = [_read(next(iter(hits.items())))]
        else:
            with ThreadPoolExecutor(max_workers=min(16, len(hits))) as pool:
                frames = list(pool.map(_read, hits.items()))
        frames = [f for f in frames if f is not None]
        if not frames:
            return None
        return pd.concat(frames, ignore_index=True)

    def _read_terms(self, terms: list[str]) -> None:
        """Fill the decoded-postings cache: per term, the gen-merged sorted
        (ids, tfs, dls, pos_flat, gens) numpy arrays. Decode happens ONCE per
        term per server lifetime — a warm query runs only the scoring kernel.
        """
        from ..index.codec import gather_groups

        codec = self._codec

        missing = []
        for t in dict.fromkeys(terms):  # dedupe, order-preserving
            if t in self._term_cache:
                self._term_cache.move_to_end(t)  # LRU touch
            else:
                missing.append(t)
        if not missing:
            return
        frames: dict[str, list[pd.DataFrame]] = {t: [] for t in missing}
        for g in self._gens:
            gen = g["generation"]
            pdf = self._read_row_groups(
                gen, self._postings_stage(gen), missing, _BLOCK_COLS
            )
            if pdf is None:
                continue
            if self.shard is not None:
                # chunk striping (numpy %, sign of divisor: negative-doc-id
                # chunks land in a valid shard too)
                si, ns = self.shard
                pdf = pdf[pdf["chunk"].to_numpy() % ns == si]
                if pdf.empty:
                    continue
            pdf["gen"] = gen
            for t, grp in pdf.groupby("term", sort=False):
                frames[t].append(grp)
        empty = (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int32),
            np.empty(0, dtype=np.int32),
        )
        for t in missing:
            if not frames[t]:
                self._cache_put(t, empty)
                continue
            pdf = pd.concat(frames[t], ignore_index=True).sort_values(
                ["gen", "first_doc"], kind="mergesort"
            )
            ids_l, tfs_l, dls_l, pos_l, gens_l = [], [], [], [], []
            for gen, g2 in pdf.groupby("gen", sort=True):
                # batch decode: varints are self-delimiting, so each column
                # decodes from ONE concatenated buffer (per-block dispatch
                # would cost ~40us x thousands of blocks for a head term);
                # doc-id gaps reset at block starts, handled by the grouped
                # decode with the per-block posting counts
                # compact resident dtypes: ids must stay int64 (xxhash64
                # full range), but tf/dl/pos/gen all fit int32 — exactly
                # halves cache residency per posting (~49 -> ~21 B), which
                # is the difference between the hot term set fitting the
                # LRU or thrashing it.  BM25 arithmetic is unchanged:
                # int32 operands promote to float64 in the scoring kernel,
                # so scores stay bit-identical to the distributed path.
                ns = g2["n"].to_numpy(dtype=np.int64)
                ids = codec.decode_delta(g2["docs_bin"], ns)
                tfs = codec.decode_plain(g2["tfs_bin"], ns).astype(np.int64)
                dls = codec.decode_plain(g2["dls_bin"], ns).astype(np.int32)
                pos_flat = codec.decode_runs(g2["pos_bin"], ns, tfs).astype(
                    np.int32
                )
                ids_l.append(ids)
                tfs_l.append(tfs)
                dls_l.append(dls)
                pos_l.append(pos_flat)
                gens_l.append(np.full(len(ids), gen, dtype=np.int32))
            ids = np.concatenate(ids_l)
            tfs = np.concatenate(tfs_l)
            order = np.argsort(ids, kind="stable")
            self._cache_put(
                t,
                (
                    ids[order],
                    tfs[order].astype(np.int32),
                    np.concatenate(dls_l)[order],
                    gather_groups(np.concatenate(pos_l), tfs, order).astype(
                        np.int32
                    ),
                    np.concatenate(gens_l)[order],
                ),
            )
        self._evict(protect=set(terms))

    def _cache_put(self, term: str, entry: tuple) -> None:
        old = self._term_cache.pop(term, None)
        if old is not None:
            self._term_cache_nbytes -= _entry_nbytes(old)
        self._term_cache[term] = entry
        self._term_cache_nbytes += _entry_nbytes(entry)

    def _evict(self, protect: set) -> None:
        """Evict least-recently-used terms until BOTH bounds hold: entry
        count <= max_cached_terms and resident bytes <= max_cache_bytes.
        Terms of the in-flight query are never evicted (they're about to be
        scored), so a single query wider than the budget still completes."""
        while (
            len(self._term_cache) > self.max_cached_terms
            or self._term_cache_nbytes > self.max_cache_bytes
        ):
            victim = next(
                (t for t in self._term_cache if t not in protect), None
            )
            if victim is None:
                break
            self._term_cache_nbytes -= _entry_nbytes(
                self._term_cache.pop(victim)
            )

    def suggest(
        self, word: str, k: int = 5, max_dist: int = 2
    ) -> list[tuple[str, int, int]]:
        """Did-you-mean suggestions: the top-k index terms within edit
        distance `max_dist` of `word`, as (term, distance, df) ranked by
        (distance asc, df desc, term asc) — Lucene DirectSpellChecker's
        ordering. Built from the same bucketed-vocabulary expansion the
        fuzzy query path uses — but UNCAPPED: suggest wants the best k of
        the full candidate set, so it must not inherit the query path's
        max_fuzzy_expansions refusal (the distributed twin, TakeOrdered
        over the dictionary, has no cap either). df is summed across
        generations. The exact word, if indexed, ranks first at distance 0
        (callers typically skip suggesting when that happens)."""
        from ..analysis import tokenize

        toks = tokenize(word, self.analyzer)
        if len(toks) != 1:
            raise ValueError(
                f"suggest takes one analyzable word, got {word!r}"
            )
        stem = toks[0]
        with self._lock:
            cands = self._expand_fuzzy(stem, max_dist, cap=None)
            dfs = self._df_of(cands)
        ranked = sorted(
            ((t, _lev_one(t, stem), dfs[t]) for t in cands),
            key=lambda x: (x[1], -x[2], x[0]),
        )
        return ranked[:k]

    def _df_of(self, terms: list[str]) -> dict[str, int]:
        missing = [t for t in terms if t not in self._stats_cache]
        if missing:
            got: dict[str, int] = {t: 0 for t in missing}
            for g in self._gens:
                gen = g["generation"]
                pdf = self._read_row_groups(
                    gen, "term_stats", missing, ["term", "df"]
                )
                if pdf is None:
                    continue
                for t, d in zip(pdf["term"], pdf["df"]):
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
        branches = parse_disjunction(query_text, self.analyzer)
        validate_branches(branches)
        multi = len(branches) > 1
        pq: ParsedQuery = branches[0]
        if not multi and not pq.terms and not pq.const_clauses:
            raise ValueError("query has no positive terms")
        pos_terms = tuple(
            dict.fromkeys(t for br in branches for t in br.terms)
        )
        phrase_terms = [
            t
            for br in branches
            for ph in (br.phrases + br.neg_phrases)
            for t in ph
        ]
        neg_terms = tuple(
            dict.fromkeys(t for br in branches for t in br.neg_terms)
        )
        with self._lock:
            # expansion reads/warms the shared _dsets term-directory cache,
            # so it must sit inside the same lock as the cache fill
            # (multi-branch queries carry no prefixes — validate_branches)
            expansions = {
                p: self._expand_prefix(p)
                for p in dict.fromkeys(pq.prefixes + pq.neg_prefixes)
            } if not multi else {}
            fexpansions = {
                f: self._expand_fuzzy(*f)
                for f in dict.fromkeys(pq.fuzzies + pq.neg_fuzzies)
            } if not multi else {}
            exp_terms = [
                t
                for ts in list(expansions.values())
                + list(fexpansions.values())
                for t in ts
            ]
            all_terms = list(
                dict.fromkeys(
                    pos_terms
                    + neg_terms
                    + tuple(phrase_terms)
                    + tuple(exp_terms)
                )
            )
            self._read_terms(all_terms)
            cached = {t: self._term_cache[t] for t in all_terms}
            dfs = self._df_of(list(pos_terms))
        if not multi and any(dfs[t] == 0 for t in pq.terms):
            return []
        if multi and all(
            any(dfs[t] == 0 for t in br.terms) for br in branches
        ):
            return []  # every branch has a dead term
        n = float(self._n_docs)
        idf = {
            t: float(np.log1p((n - d + 0.5) / (d + 0.5))) for t, d in dfs.items()
        }

        lists: dict[str, tuple] = {}
        for t in all_terms:
            ids, tfs, dls, pos_flat, gens = cached[t]
            if ids.size == 0:
                if not multi and t in pq.terms:
                    return []  # conjunctive
                continue  # multi: a missing term only kills its branch
            if self._tomb is not None:
                from ..index.codec import filter_groups

                t_ids, t_gens = self._tomb
                loc = np.searchsorted(t_ids, ids)
                hit = (loc < t_ids.size) & (
                    t_ids[np.minimum(loc, t_ids.size - 1)] == ids
                )
                dead = hit & (t_gens[np.minimum(loc, t_ids.size - 1)] > gens)
                if dead.any():
                    keep = ~dead
                    pos_flat = filter_groups(pos_flat, tfs, keep)
                    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]
            lists[t] = (ids, tfs, dls, pos_flat)

        # prefix clauses -> one sorted allow/deny id set each (union of the
        # clause's live expansion lists), composed exactly like the
        # distributed filter channel: positives intersect, negatives
        # subtract; the kernel then sees a plain allow_ids array
        prefix_const = PREFIX_SCORE * pq.const_clauses
        pos_sets = [expansions[p] for p in pq.prefixes] + [
            fexpansions[f] for f in pq.fuzzies
        ]
        neg_sets = [expansions[p] for p in pq.neg_prefixes] + [
            fexpansions[f] for f in pq.neg_fuzzies
        ]
        allow = None
        for ts in pos_sets:
            parts = [lists[t][0] for t in ts if t in lists]
            s = (
                np.unique(np.concatenate(parts))
                if parts
                else np.empty(0, dtype=np.int64)
            )
            allow = (
                s
                if allow is None
                else allow[np.isin(allow, s, assume_unique=True)]
            )
            if allow.size == 0:
                return []
        deny = None
        for ts in neg_sets:
            parts = [lists[t][0] for t in ts if t in lists]
            if parts:
                s = np.unique(np.concatenate(parts))
                deny = s if deny is None else np.union1d(deny, s)
        if deny is not None:
            if allow is None:
                # exclusion needs a base: any positive term's posting list
                # is a candidate superset (AND semantics) — use the smallest
                base_t = min(pq.terms, key=lambda t: lists[t][0].size)
                allow = lists[base_t][0]
            allow = allow[~np.isin(allow, deny)]
            if allow.size == 0:
                return []

        n_keep = offset + k
        if not pq.terms:
            # prefix-only: constant scores, doc_id order is the ranking;
            # negated terms/phrases still subtract
            for t in pq.neg_terms:
                if t in lists:
                    allow = allow[~np.isin(allow, lists[t][0])]
            if pq.neg_phrases and allow.size:
                from .wand import _phrase_mask

                pos_max = max(
                    (
                        int(lists[t][3].max())
                        for ph in pq.neg_phrases
                        for t in ph
                        if t in lists and lists[t][3].size
                    ),
                    default=0,
                )
                max_len = max(len(ph) for ph in pq.neg_phrases)
                stride = np.int64(pos_max + max_len + 2)
                for i, ph in enumerate(pq.neg_phrases):
                    allow = allow[
                        ~_phrase_mask(
                            allow, lists, ph, stride, pq.neg_slop_of(i)
                        )
                    ]
            page = allow[offset : offset + k]
            return [
                (int(d), float(prefix_const), offset + i + 1)
                for i, d in enumerate(page)
            ]
        doc_ids, scores = score_branch_lists(
            branches, lists, idf, self.k1, self.b, self._avgdl, n_keep,
            allow_ids=allow,
        )
        return [
            (int(d), float(s) + prefix_const, i + 1)
            for i, (d, s) in enumerate(zip(doc_ids, scores))
            if i + 1 > offset
        ]


@dataclass
class ShardedTopKServer:
    """Chunk-striped serving fan-out — the 10^12-doc shape of the tier.

    N TopKServers each own the blocks whose chunk % n_shards == shard_idx
    (disjoint, complete). A query fans out to every shard (threads here;
    shard RPCs in a real deployment — the per-shard code is identical) and
    the per-shard top-(offset+k) lists merge by (score desc, doc_id asc).

    Exactness: BM25 stats are GLOBAL per shard (same manifests, same
    term_stats), scores are per-document, and every doc lives in exactly one
    shard — so the merged top-k is bit-identical to the unsharded server's.
    Per-shard work and cache residency shrink by ~n_shards; head-term decode
    parallelizes across shards instead of serializing in one process."""

    index_dir: str
    n_shards: int = 4
    _shards: list[TopKServer] = field(default_factory=list)

    @classmethod
    def open(cls, index_dir: str, n_shards: int = 4) -> "ShardedTopKServer":
        srv = cls(index_dir, n_shards)
        srv._shards = [
            TopKServer.open(index_dir, shard=(i, n_shards))
            for i in range(n_shards)
        ]
        return srv

    def refresh(self) -> None:
        for s in self._shards:
            s.refresh()

    def warmup(self, preload_top_terms: int = 0) -> None:
        """Startup preload on every shard (TopKServer.warmup parity);
        `preload_top_terms` forwards — each shard decodes only its own
        chunk stripe of the head terms, so the warmer parallelizes
        exactly like the queries it protects."""
        for s in self._shards:
            s.warmup(preload_top_terms=preload_top_terms)

    def topk(
        self, query_text: str, k: int = 13, offset: int = 0
    ) -> list[tuple[int, float, int]]:
        from concurrent.futures import ThreadPoolExecutor

        n_keep = offset + k
        with ThreadPoolExecutor(max_workers=self.n_shards) as pool:
            parts = list(
                pool.map(lambda s: s.topk(query_text, k=n_keep), self._shards)
            )
        merged = sorted(
            ((d, s) for part in parts for d, s, _ in part),
            key=lambda x: (-x[1], x[0]),
        )[:n_keep]
        return [
            (d, s, i + 1)
            for i, (d, s) in enumerate(merged)
            if i + 1 > offset
        ]
