"""Distributed inverted-index build (the plane SHARE delegated to ES/Lucene).

Pipeline (all DataFrame + Arrow UDFs; see SURVEY.md §3.3 "Spark shape"):

  pages --extract/tokenize (mapInPandas, map-side tf)--> termdoc(term, doc_id, tf, dl)
        --groupBy(term) [partial agg]---------------> term_stats(term, df, cf)
        --repartitionByRange(term, doc_id) + sort --> posting blocks (delta+varint)
        --manifest.json (config checksum, corpus stats, per-partition metrics)

Scale decisions (BASELINE.json north_rule: partitioning/shuffle/skew explicit):

- **No token-level shuffle.** Term frequencies are computed per document
  inside the tokenize UDF (map-side combine), so the shuffle moves one row
  per (term, doc) posting, never one row per token occurrence.
- **Head-term skew.** A head term in >30% of documents would overwhelm any
  hash-partitioned `groupBy(term)` reducer. Posting assembly therefore uses
  `repartitionByRange(term, doc_id)`: a hot term's postings are *split across
  consecutive range partitions* (range salting), each encoding its own
  sorted block run. Blocks carry absolute first-doc ids, so no cross-partition
  merge is needed — the decomposition is exact, not approximate.
  `term_stats` aggregation is safe from the same skew because Spark's partial
  (map-side) aggregation collapses each term to one row per map task before
  the shuffle.
- **Chunk alignment for distributed WAND.** Blocks never span a doc-id chunk
  (chunk = doc_id // chunk_docs), so every term's postings for a given doc
  land in the same chunk — the query planner (query/wand.py) groups by chunk
  and scores document-at-a-time with block-max skipping, with no risk of a
  document's score being split across tasks.
- **Resumable.** Each stage (docs, termdoc, term_stats, postings) is a
  parquet checkpoint with a done-marker; re-running `build_index(resume=True)`
  skips completed stages (analog of SHARE's IndexBackfill state machine,
  share/models/index_backfill.py:35-146). The manifest records per-partition
  lineage + metrics (postings count, encoded bytes) — analog of SHARE's
  harvest-job provenance (SUID + chunk_timestamp,
  share/search/index_strategy/trovesearch_denorm.py:126-139).

Storage is plain parquet here (the production target is Iceberg; the Iceberg
runtime jar is not available in this sandbox — layout and partitioning are
identical, snapshots are modeled by the generation list in the manifest).
"""

from __future__ import annotations

import hashlib
import json
import os
import uuid
from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extract import EXTRACTOR_VERSION, extract_text
from .codec import get_codec, varint_decode

K1_DEFAULT = 1.2  # Lucene BM25 defaults; the reference never overrides
B_DEFAULT = 0.75  # `similarity` (SURVEY.md §2.5, BASELINE.md §A)

TERMDOC_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("tf", T.IntegerType()),
        T.StructField("dl", T.IntegerType()),
        # in-document token positions of this term, delta+varint encoded
        # (first absolute, then gaps) — the positional index that makes
        # phrase queries an index operation instead of a stored-text rescan
        T.StructField("pos_bin", T.BinaryType()),
    ]
)

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("lang", T.StringType()),
        # propertypath scope of this text ('' = whole-document text). When
        # set, index terms are prefixed '<path_key>\x1f<token>' so df/idf
        # resolve per (path, term) — the Lucene-per-field stats analog that
        # makes cardSearchText[path] an index operation (query/fields.py).
        T.StructField("path_key", T.StringType()),
        T.StructField("text_norm", T.StringType()),
    ]
)

FIELD_SEP = "\x1f"  # never produced by the analyzer (non-word char)

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("chunk", T.LongType()),
        T.StructField("first_doc", T.LongType()),
        T.StructField("last_doc", T.LongType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("docs_bin", T.BinaryType()),
        T.StructField("tfs_bin", T.BinaryType()),
        T.StructField("dls_bin", T.BinaryType()),
        # concatenated positional runs: posting i's positions are tf_i
        # delta+varint values; runs concatenate in posting order
        T.StructField("pos_bin", T.BinaryType()),
        # avgdl-INDEPENDENT block-max metadata: impact is increasing in tf
        # and decreasing in dl, so impact(max_tf, min_dl, avgdl_q) computed
        # with the QUERY-TIME global avgdl upper-bounds every posting in the
        # block. A build-time max_impact baked with the generation's own
        # avgdl under-bounds true impact once later generations raise the
        # global avgdl, which would let block-max pruning drop true top-k
        # docs (multi-generation rank-identity bug).
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("min_dl", T.IntegerType()),
        T.StructField("sum_tf", T.LongType()),
        T.StructField("part_id", T.IntegerType()),
    ]
)


@dataclass
class IndexConfig:
    analyzer: str = "standard"
    block_size: int = 128
    chunk_docs: int = 8192
    k1: float = K1_DEFAULT
    b: float = B_DEFAULT
    n_partitions: int | None = None
    salt_chunks: int = 4  # shuffle-salt window = salt_chunks * chunk_docs
    # posting-block binary layout: "varint" (pure LEB128) or "pfor" (hybrid
    # per-block PFor/varint — see codec.py; ~1.2x smaller raw postings).
    # Checksum-relevant: generations of one index must share a codec.
    postings_codec: str = "varint"
    # also write a term-clustered copy of the posting blocks for the serving
    # tier (query/serve.py): the WAND layout hashes terms across partitions
    # (right for distributed scoring), which makes a single term's blocks
    # touch every file; the serve layout range-partitions by (term, chunk)
    # with small row groups so one term's postings are a handful of
    # contiguous row groups — the Lucene-segment term locality property.
    serve_layout: bool = True

    def checksum(self) -> str:
        """Analog of CURRENT_STRATEGY_CHECKSUM (index_strategy/_base.py:47):
        sha-256 over the config that defines index layout semantics."""
        blob = json.dumps(
            {
                "analyzer": self.analyzer,
                "block_size": self.block_size,
                "chunk_docs": self.chunk_docs,
                "k1": self.k1,
                "b": self.b,
                "extractor_version": EXTRACTOR_VERSION,
                # layout string is codec-specific; the varint value is the
                # historical constant so pre-codec indexes keep their checksum
                "layout": get_codec(self.postings_codec).layout,
            },
            sort_keys=True,
        )
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _stage_dir(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, stage)


def _done_marker(index_dir: str, stage: str) -> str:
    return os.path.join(index_dir, f"_DONE_{stage}")


def _stage_done(index_dir: str, stage: str) -> bool:
    return os.path.exists(_done_marker(index_dir, stage))


def _mark_done(index_dir: str, stage: str) -> None:
    with open(_done_marker(index_dir, stage), "w") as f:
        f.write("ok")


def build_docs(
    spark: SparkSession,
    pages: DataFrame,
    analyzer: str,
) -> DataFrame:
    """pages -> docs(doc_id, url, lang, text_norm).

    Extraction is the frozen byte-identical extractor (extract.py); doc ids
    are taken from a `doc_id` column when present, else xxhash64(url)
    (deterministic; dense assignment is the caller's option at small scale).

    Deliberately does NOT tokenize: doc lengths fall out of build_termdoc's
    own token stream and avgdl out of posting-block metadata, so the corpus
    is analyzed exactly once per build (tokenize+stem is the single most
    expensive CPU pass — running it here too doubled it).
    """
    cols = set(pages.columns)
    has_html = "html" in cols
    has_text = "text" in cols
    has_docid = "doc_id" in cols
    has_url = "url" in cols
    has_lang = "lang" in cols
    has_path = "path_key" in cols

    def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            html = pdf["html"] if has_html else pd.Series([None] * len(pdf))
            text = pdf["text"] if has_text else pd.Series([None] * len(pdf))
            norm = [
                extract_text(h, t)
                for h, t in zip(html.tolist(), text.tolist())
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"] if has_docid else pd.NA,
                    "url": pdf["url"] if has_url else "",
                    "lang": pdf["lang"] if has_lang else "",
                    "path_key": pdf["path_key"] if has_path else "",
                    "text_norm": norm,
                }
            )

    docs = pages.mapInPandas(_extract_batches, schema=DOCS_SCHEMA)
    if not has_docid:
        docs = docs.withColumn("doc_id", F.xxhash64("url"))
    return docs


def build_termdoc(docs: DataFrame, analyzer: str) -> DataFrame:
    """docs -> (term, doc_id, tf, dl, pos_bin): per-doc term counting + token
    positions, all inside the UDF (map-side combine — no shuffle here, and
    downstream shuffles move one row per posting, never per token occurrence).

    Positions are the analyzer token offsets (0-based) of each term in its
    document, delta+varint encoded per posting. Fully vectorized: one lexsort
    over the token stream groups (doc, term) pairs while keeping positions in
    ascending order (stable sort), then one grouped delta-encode pass.
    """
    from .codec import delta_encode_blocks

    def _count_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..analysis import tokenize_batch_flat

        for pdf in batches:
            parents, toks = tokenize_batch_flat(pdf["text_norm"], analyzer)
            n = len(toks)
            if n == 0:
                continue
            # per-row token count IS the BM25 dl — same deterministic
            # token stream build_docs used to pre-compute, minus the
            # second corpus-wide tokenize pass
            dlen = np.bincount(parents, minlength=len(pdf)).astype("int32")
            if "path_key" in pdf.columns:
                pk = pdf["path_key"].fillna("").to_numpy()
                if (pk != "").any():
                    # per-path term namespace: '<path>\x1f<token>'
                    pref = pk[parents]
                    toks = np.where(
                        pref == "", toks, pref + FIELD_SEP + toks
                    ).astype(object)
            # token position within each doc: parents is non-decreasing
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = parents[1:] != parents[:-1]
            run_starts = np.nonzero(change)[0]
            run_ids = np.cumsum(change) - 1
            pos = np.arange(n, dtype=np.int64) - run_starts[run_ids]
            # group by (doc, term); stable => positions stay ascending in-group
            order = np.lexsort((toks, parents))
            p_s, t_s, pos_s = parents[order], toks[order], pos[order]
            gchange = np.empty(n, dtype=bool)
            gchange[0] = True
            gchange[1:] = (p_s[1:] != p_s[:-1]) | (t_s[1:] != t_s[:-1])
            gstarts = np.nonzero(gchange)[0]
            gends = np.append(gstarts[1:], n)
            tf = (gends - gstarts).astype(np.int32)
            pos_bins = delta_encode_blocks(pos_s, gstarts, gends)
            gp = p_s[gstarts]
            yield pd.DataFrame(
                {
                    "term": t_s[gstarts],
                    "doc_id": pdf["doc_id"].to_numpy()[gp],
                    "tf": tf,
                    "dl": dlen[gp],
                    "pos_bin": pos_bins,
                }
            )

    sel = ["doc_id", "text_norm"]
    if "path_key" in docs.columns:
        sel.append("path_key")
    return docs.select(*sel).mapInPandas(_count_batches, schema=TERMDOC_SCHEMA)


def decode_termdoc(blocks: DataFrame, postings_codec: str) -> DataFrame:
    """Inverse of the posting-block encoder: decode blocks back to
    (term, doc_id, tf, dl, pos_bin, gen) rows, each posting's positional
    run re-encoded in build_termdoc's own layout (first absolute, then
    gaps, varint).  This is what lets compaction MERGE segments at the
    posting level — decode, drop dead docs, re-encode — instead of
    re-tokenizing the corpus (Lucene's segment merge vs re-index; at web
    scale the avoided analyze pass is the entire corpus' CPU cost, and the
    merge becomes IO-bound).  Map-side only: no shuffle here, the caller
    feeds the rows into the build's own salted exchange."""
    from .codec import delta_encode_blocks

    codec = get_codec(postings_codec)
    schema = T.StructType(
        list(TERMDOC_SCHEMA) + [T.StructField("gen", T.IntegerType())]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ns = pdf["n"].to_numpy(dtype=np.int64)
            ids = codec.decode_delta(pdf["docs_bin"], ns).astype(np.int64)
            tfs = codec.decode_plain(pdf["tfs_bin"], ns).astype(np.int64)
            dls = codec.decode_plain(pdf["dls_bin"], ns).astype(np.int64)
            pos_abs = np.asarray(
                codec.decode_runs(pdf["pos_bin"], ns, tfs), dtype=np.int64
            )
            rends = np.cumsum(tfs)
            rstarts = rends - tfs
            yield pd.DataFrame(
                {
                    "term": np.repeat(pdf["term"].to_numpy(), ns),
                    "doc_id": ids,
                    "tf": tfs.astype(np.int32),
                    "dl": dls.astype(np.int32),
                    "pos_bin": delta_encode_blocks(pos_abs, rstarts, rends),
                    "gen": np.repeat(
                        pdf["gen"].to_numpy(dtype=np.int32), ns
                    ),
                }
            )

    return blocks.select(
        "term", "n", "docs_bin", "tfs_bin", "dls_bin", "pos_bin", "gen"
    ).mapInPandas(_decode, schema=schema)


def _make_block_encoder(cfg: IndexConfig):
    """Posting-block encoder for one range partition — fully vectorized.

    Input arrives sorted by (term, doc_id); the iterator spans the whole
    partition, so the trailing (possibly unfinished) group is carried across
    Arrow batches. Per accumulated super-batch:
      1. group change points on (term, chunk) -> block starts (size-capped)
      2. ONE varint pass per column, sliced per block by byte offsets
      3. per-block max_tf / min_dl via np.maximum/minimum.reduceat — the
         avgdl-independent block-max metadata (impact bounds are computed at
         QUERY time with the then-current global avgdl, so they stay valid
         as later generations shift avgdl)
    No per-block numpy dispatch — the only Python-level loop is the final
    bytes slicing (one cheap bytes[a:b] per block).
    Block boundaries: size limit, term change, chunk boundary
    (chunk = doc_id // chunk_docs) — see module docstring.
    """
    bs, chunk_docs = cfg.block_size, cfg.chunk_docs
    codec = get_codec(cfg.postings_codec)
    MIN_ROWS = 1 << 17  # accumulate small Arrow batches before encoding

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        part_id = TaskContext.get().partitionId() if TaskContext.get() else -1
        carry: pd.DataFrame | None = None

        def process(pdf: pd.DataFrame, final: bool) -> pd.DataFrame | None:
            nonlocal carry
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            n = len(pdf)
            if n == 0:
                return None
            terms = pdf["term"].to_numpy()
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)
            chunks = ids // chunk_docs
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = (terms[1:] != terms[:-1]) | (chunks[1:] != chunks[:-1])
            gstarts = np.nonzero(change)[0]
            if not final:
                if len(gstarts) <= 1:
                    carry = pdf
                    return None
                cut = gstarts[-1]  # last (possibly unfinished) group carries
                carry = pdf.iloc[cut:].reset_index(drop=True)
                pdf = pdf.iloc[:cut]
                n = cut
                terms, ids, chunks = terms[:cut], ids[:cut], chunks[:cut]
                gstarts = gstarts[:-1]
            gends = np.append(gstarts[1:], n)
            glens = gends - gstarts
            # expand groups to size-capped blocks
            nb = (glens + bs - 1) // bs
            total = int(nb.sum())
            gi = np.repeat(np.arange(len(gstarts)), nb)
            within = np.arange(total) - np.repeat(
                np.concatenate(([0], np.cumsum(nb[:-1]))), nb
            )
            bstarts = gstarts[gi] + within * bs
            bends = np.minimum(bstarts + bs, gends[gi])

            tfs = pdf["tf"].to_numpy(dtype=np.int64)
            dls = pdf["dl"].to_numpy(dtype=np.int64)
            max_tf = np.maximum.reduceat(tfs, bstarts).astype(np.int32)
            min_dl = np.minimum.reduceat(dls, bstarts).astype(np.int32)
            sum_tf = np.add.reduceat(tfs, bstarts)

            docs_bin = codec.encode_delta_blocks(ids, bstarts, bends)
            tfs_bin = codec.encode_plain_blocks(tfs, bstarts, bends)
            dls_bin = codec.encode_plain_blocks(dls, bstarts, bends)
            # positional runs: build_termdoc ships them per-posting as
            # delta-varint bytes ([first_abs, gap, ...] per run)
            pos_vals = pdf["pos_bin"].tolist()
            pbuf = b"".join(pos_vals)
            if codec.name == "varint":
                # byte slicing IS re-encoding here: the per-block varint
                # layout equals the concatenation of its runs' varint bytes
                plens = np.fromiter(
                    (len(x) for x in pos_vals), dtype=np.int64, count=n
                )
                poffs = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(plens, out=poffs[1:])
                pos_bin = [
                    pbuf[poffs[s] : poffs[e]] for s, e in zip(bstarts, bends)
                ]
            else:
                # decode the raw run value stream (first_abs + gaps, NOT
                # absolute positions) and re-encode per block in the value
                # domain — posting -> value offsets via the tf prefix sum
                pvals = varint_decode(pbuf)
                ctf = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(tfs, out=ctf[1:])
                pos_bin = codec.encode_plain_blocks(
                    pvals, ctf[bstarts], ctf[bends]
                )
            return pd.DataFrame(
                {
                    "term": terms[bstarts],
                    "chunk": chunks[bstarts],
                    "first_doc": ids[bstarts],
                    "last_doc": ids[bends - 1],
                    "n": (bends - bstarts).astype(np.int32),
                    "docs_bin": docs_bin,
                    "tfs_bin": tfs_bin,
                    "dls_bin": dls_bin,
                    "pos_bin": pos_bin,
                    "max_tf": max_tf,
                    "min_dl": min_dl,
                    "sum_tf": sum_tf,
                    "part_id": np.full(total, part_id, dtype=np.int32),
                }
            )

        buf: list[pd.DataFrame] = []
        buffered = 0
        for pdf in batches:
            buf.append(pdf)
            buffered += len(pdf)
            if buffered >= MIN_ROWS:
                out = process(pd.concat(buf, ignore_index=True), final=False)
                buf, buffered = [], 0
                if out is not None and len(out):
                    yield out
        tail = (
            pd.concat(buf, ignore_index=True)
            if buf
            else pd.DataFrame(
                {
                    "term": pd.Series([], dtype="object"),
                    "doc_id": pd.Series([], dtype="int64"),
                    "tf": pd.Series([], dtype="int64"),
                    "dl": pd.Series([], dtype="int64"),
                    "pos_bin": pd.Series([], dtype="object"),
                }
            )
        )
        out = process(tail, final=True)
        if out is not None and len(out):
            yield out

    return encode


def dedup_pages(pages: DataFrame) -> DataFrame:
    """Keep exactly one row per doc_id within a build batch.

    Harvest feeds realistically repeat urls inside one batch; duplicate
    doc_ids would emit duplicate (term, doc_id) postings in one generation —
    inflating df/cf and breaking the sorted-unique invariant the WAND
    intersection kernel relies on (np.isin(assume_unique=True)).

    Winner: max (warc_ts, xxhash64(url||text)) — latest capture wins, hash
    tie-break keeps the choice deterministic when timestamps tie or are
    absent. One shuffle keyed by doc_id; max_by is partial-aggregated
    map-side, so a hot doc_id never concentrates rows on one reducer.
    """
    cols = pages.columns
    idc = F.col("doc_id") if "doc_id" in cols else F.xxhash64("url")
    ts = F.col("warc_ts") if "warc_ts" in cols else F.lit(0)
    tie_parts = [F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols
                 if c in ("url", "text")]
    tie = F.xxhash64(*tie_parts) if tie_parts else F.lit(0)
    return (
        pages.withColumn("_did", idc)
        .groupBy("_did")
        .agg(F.max_by(F.struct(*cols), F.struct(ts.alias("ts"), tie.alias("tb"))).alias("_row"))
        .select("_row.*")
    )


def build_index(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = False,
    generation: int = 0,
    register: bool = True,
    assume_unique_ids: bool = False,
    docs_df: DataFrame | None = None,
    termdoc_df: DataFrame | None = None,
) -> dict:
    """Full batch index build (see _build_index_impl for the DAG).

    Runs under batch_sql_conf: if interactive top-k queries are in flight
    on the same session (their guard narrows shuffle width and disables
    AQE), the build asserts the session's own settings for its duration —
    a terabyte-scale shuffle must never inherit a 4-partition reduce."""
    from ..session import batch_sql_conf

    with batch_sql_conf(spark):
        return _build_index_impl(
            spark, pages, index_dir, cfg, resume, generation, register,
            assume_unique_ids, docs_df, termdoc_df,
        )


def _build_index_impl(
    spark: SparkSession,
    pages: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    resume: bool = False,
    generation: int = 0,
    register: bool = True,
    assume_unique_ids: bool = False,
    docs_df: DataFrame | None = None,
    termdoc_df: DataFrame | None = None,
) -> dict:
    """Full batch index build; returns the manifest dict.

    Analog of SHARE's backfill (share/models/index_backfill.py:148-188 +
    daemon bulk loop) collapsed into one deterministic Spark DAG.

    `register=False` builds the generation directory WITHOUT adding it to the
    top-level manifest — the incremental path registers only after tombstones
    for replaced docs are merged, so a crash between the two never leaves a
    re-ingested doc live twice (call register_generation afterwards).
    `assume_unique_ids=True` skips the intra-batch doc_id dedup shuffle when
    the producer guarantees unique ids.
    `docs_df` / `termdoc_df` inject pre-computed stage inputs (DOCS_SCHEMA /
    TERMDOC_SCHEMA shapes) in place of extract / tokenize — the posting-level
    segment-merge path (streaming.incremental.compact mode="merge") feeds
    decoded live postings through the very same salted shuffle + encoders,
    so a merged index is byte-equivalent to a rebuilt one minus the analyze
    pass. `pages` may be None when both are given.
    """
    import time as _time

    cfg = cfg or IndexConfig()
    if docs_df is None and not assume_unique_ids:
        pages = dedup_pages(pages)
    gdir = os.path.join(index_dir, f"gen{generation}")
    os.makedirs(gdir, exist_ok=True)
    stage_s: dict[str, float] = {}
    _t = _time.time()

    def _lap(stage: str) -> None:
        nonlocal _t
        now = _time.time()
        stage_s[stage] = round(now - _t, 2)
        _t = now

    docs_path = _stage_dir(gdir, "docs")
    stats_path = _stage_dir(gdir, "term_stats")
    postings_path = _stage_dir(gdir, "postings")

    def _refresh(path: str) -> None:
        # Spark's session-wide FileStatusCache never expires by default; an
        # overwrite to a previously-read path (resume, compaction, generation
        # rebuild on streaming replay) would otherwise serve a stale file
        # listing to the next read.parquet on the same path.
        spark.catalog.refreshByPath(path)

    # stage 1: docs (extract + doc_len)
    if not (resume and _stage_done(gdir, "docs")):
        docs = (
            docs_df
            if docs_df is not None
            else build_docs(spark, pages, cfg.analyzer)
        )
        docs.write.mode("overwrite").parquet(docs_path)
        _refresh(docs_path)
        _mark_done(gdir, "docs")
    _lap("docs")
    docs = spark.read.parquet(docs_path)

    # parquet metadata count only — avgdl is derived below from posting
    # block metadata (sum_tf), so no job ever tokenizes just for stats
    n_docs = docs.count()

    # stage 2: posting blocks, pipelined docs -> tokenize -> shuffle -> sort
    # -> encode with NO intermediate materialization (per-posting rows exist
    # only inside the one exchange; at 10^12 docs the avoided termdoc
    # checkpoint is petabytes of IO).
    #
    # Skew/shuffle design (north rule: explicit salting for head terms):
    # the shuffle key is hash(term, doc_id // window) — the doc-range window
    # IS the salt. A head term present in every document contributes at most
    # `window` rows per partition (hard bound, no sampling needed), while
    # rare terms stay whole. Unlike repartitionByRange this needs no
    # range-boundary sampling pass (which would re-run the entire tokenize
    # upstream once more). Window is a multiple of chunk_docs, so chunk
    # alignment (and therefore WAND correctness) is preserved; files remain
    # term-sorted via sortWithinPartitions, so parquet row-group min/max
    # stats still prune query-term scans.
    if not (resume and _stage_done(gdir, "postings")):
        n_parts = cfg.n_partitions or spark.sparkContext.defaultParallelism
        window = min(cfg.chunk_docs * cfg.salt_chunks, 1 << 62)
        termdoc = (
            termdoc_df
            if termdoc_df is not None
            else build_termdoc(docs, cfg.analyzer)
        )
        (
            termdoc.repartition(
                n_parts,
                F.xxhash64("term", (F.col("doc_id") / window).cast("long")),
            )
            .sortWithinPartitions("term", "doc_id")
            .mapInPandas(_make_block_encoder(cfg), schema=BLOCKS_SCHEMA)
            .write.mode("overwrite")
            .parquet(postings_path)
        )
        _refresh(postings_path)
        _mark_done(gdir, "postings")
    _lap("postings")

    # stage 2b (optional): term-clustered serve copy of the posting blocks.
    # Input is the ENCODED blocks (already delta+varint compressed), so this
    # shuffle moves a small multiple of the final index bytes — far cheaper
    # than re-encoding. repartitionByRange on (term, chunk) splits a head
    # term across partitions at chunk boundaries (no single-reducer skew at
    # 10^12 docs) while keeping each term's blocks contiguous on disk; 1 MiB
    # row groups give the serving tier a fine-grained read unit.
    if cfg.serve_layout:
        serve_path = _stage_dir(gdir, "postings_term")
        if not (resume and _stage_done(gdir, "postings_term")):
            serve_parts = max(4, (cfg.n_partitions or spark.sparkContext.defaultParallelism) // 2)
            (
                spark.read.parquet(postings_path)
                .repartitionByRange(serve_parts, "term", "chunk")
                .sortWithinPartitions("term", "chunk", "first_doc")
                .write.mode("overwrite")
                .option("parquet.block.size", 1 << 20)
                .parquet(serve_path)
            )
            _refresh(serve_path)
            _mark_done(gdir, "postings_term")
        _lap("postings_term")

    # stage 3: term stats DERIVED FROM BLOCK METADATA — df = sum of block
    # sizes per term, cf = sum of per-block tf sums; no posting bytes
    # decoded, no second tokenize pass. Output sorted by term for parquet
    # min/max pruning at query time (the per-query "broadcast term
    # statistics" lookup of the north rule).
    if not (resume and _stage_done(gdir, "term_stats")):
        stats_parts = max(4, spark.sparkContext.defaultParallelism // 2)
        (
            spark.read.parquet(postings_path)
            .groupBy("term")
            .agg(F.sum("n").alias("df"), F.sum("sum_tf").alias("cf"))
            .repartitionByRange(stats_parts, "term")
            .sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(stats_path)
        )
        _refresh(stats_path)
        _mark_done(gdir, "term_stats")
    _lap("term_stats")

    # manifest: config checksum + corpus stats + per-partition lineage/metrics
    # (ONE job over posting metadata; n_chunks is the exact count for dense
    # doc ids — (max_doc // chunk_docs) + 1 — and a safe upper bound for
    # sparse ids, which pushes the query planner to the two-phase plan)
    postings = spark.read.parquet(postings_path)
    part_rows = (
        postings.groupBy("part_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum("n").alias("n_postings"),
            F.sum(
                F.octet_length("docs_bin")
                + F.octet_length("tfs_bin")
                + F.octet_length("dls_bin")
            ).alias("encoded_bytes"),
            F.max("last_doc").alias("max_doc"),
            F.sum("sum_tf").alias("sum_tf"),
        )
        .collect()
    )
    part_metrics = {
        str(r["part_id"]): {
            "n_blocks": int(r["n_blocks"]),
            "n_postings": int(r["n_postings"]),
            "encoded_bytes": int(r["encoded_bytes"]),
        }
        for r in part_rows
    }
    max_doc = max((int(r["max_doc"]) for r in part_rows), default=0)
    n_chunks = max_doc // cfg.chunk_docs + 1
    # avgdl == avg over doc rows of token count: every token contributes
    # exactly one tf unit (field-prefixing renames, never splits, tokens)
    total_tokens = sum(int(r["sum_tf"]) for r in part_rows)
    avgdl = (total_tokens / n_docs) if n_docs else 0.0
    n_terms = spark.read.parquet(stats_path).count()
    gen_manifest = {
        "generation": generation,
        # identity nonce for THIS build of this generation: readers that
        # cache decoded state (the serve tier) must drop it when a
        # generation is REBUILT under the same number — compact() of
        # gens [0,N] lands on [0] again, so the generation list alone
        # cannot distinguish "same files" from "entirely new files"
        "build_id": uuid.uuid4().hex,
        "strategy_check": cfg.checksum(),
        "analyzer": cfg.analyzer,
        "postings_codec": cfg.postings_codec,
        "block_size": cfg.block_size,
        "chunk_docs": cfg.chunk_docs,
        "k1": cfg.k1,
        "b": cfg.b,
        "n_docs": n_docs,
        "avgdl": avgdl,
        "n_terms": int(n_terms),
        "n_chunks": int(n_chunks),
        # non-checksum build knobs, persisted so config_of round-trips the
        # FULL config: ingest/compact of a --no-serve-layout index must not
        # silently build serve-layout generations, and compaction keeps the
        # original partitioning choice
        "serve_layout": cfg.serve_layout,
        "n_partitions": cfg.n_partitions,
        "stage_seconds": stage_s,
        "partitions": part_metrics,
    }
    with open(os.path.join(gdir, "manifest.json"), "w") as f:
        json.dump(gen_manifest, f, indent=1, sort_keys=True)

    if register:
        register_generation(index_dir, generation, cfg)
    return gen_manifest


def config_of(index_dir: str) -> IndexConfig:
    """Reconstruct the IndexConfig an index was built with, from its BASE
    (oldest) generation manifest. Incremental ingest and compaction MUST
    build with the same chunk/block geometry as the existing generations:
    tombstones and WAND pruning are chunk-keyed, so a generation with a
    different chunk_docs silently fails to kill replaced docs. (Checksum
    fields are identical across generations by construction; the oldest is
    read because the non-checksum layout knobs — n_partitions, serve_layout
    — are authoritative from the base build: incremental generations
    right-size n_partitions to their own batch, which must not leak into
    the config a compaction rebuilds the whole corpus with.)"""
    manifest_path = os.path.join(index_dir, "manifest.json")
    with open(manifest_path) as f:
        gens = json.load(f)["generations"]
    gdir = os.path.join(index_dir, f"gen{min(gens)}")
    with open(os.path.join(gdir, "manifest.json")) as f:
        gm = json.load(f)
    return IndexConfig(
        analyzer=gm["analyzer"],
        block_size=gm["block_size"],
        chunk_docs=gm["chunk_docs"],
        k1=gm["k1"],
        b=gm["b"],
        # .get: manifests written before these were persisted fall back to
        # the IndexConfig defaults
        n_partitions=gm.get("n_partitions"),
        serve_layout=gm.get("serve_layout", True),
        postings_codec=gm.get("postings_codec", "varint"),
    )


_KEEP = object()  # sentinel: "leave the manifest's tombstone pointer alone"


def commit_manifest(
    index_dir: str,
    *,
    generations: list[int] | None = None,
    strategy_check: str | None = None,
    tombstones: object = _KEEP,
    operation: str = "append",
    summary: dict | None = None,
) -> dict:
    """The single commit point: atomically update the top-level manifest
    (tmp write + os.replace — readers see either the old or the new state,
    never a torn file) and append the matching snapshot record to the
    lineage log (snapshots.py — the Iceberg-snapshot analog)."""
    from .snapshots import commit_snapshot

    manifest_path = os.path.join(index_dir, "manifest.json")
    manifest: dict = {"generations": []}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    if generations is not None:
        manifest["generations"] = sorted(set(int(g) for g in generations))
    if strategy_check is not None:
        manifest["strategy_check"] = strategy_check
    if tombstones is not _KEEP:
        if tombstones is None:
            manifest.pop("tombstones", None)
        else:
            manifest["tombstones"] = tombstones
    # WAL ordering: append the snapshot record FIRST, then swap the
    # manifest (the visibility point).  A crash between the two leaves a
    # log record for a commit that never became current — harmless (its
    # data dirs exist, time travel to it works) — whereas the reverse
    # order could reuse a snapshot id, and with it a tombstone-version
    # dir name the now-current manifest already references.
    commit_snapshot(
        index_dir,
        operation=operation,
        generations=manifest["generations"],
        tombstones=manifest.get("tombstones"),
        summary=summary,
    )
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, manifest_path)
    return manifest


def register_generation(
    index_dir: str,
    generation: int,
    cfg: IndexConfig,
    *,
    tombstones: object = _KEEP,
    summary: dict | None = None,
) -> None:
    """Commit a built generation: add it to the manifest's generation list
    (optionally swinging the tombstone-version pointer in the SAME commit —
    an incremental batch is one logical transaction) and append an "append"
    snapshot to the lineage log."""
    manifest_path = os.path.join(index_dir, "manifest.json")
    gens = [generation]
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            gens += [
                g
                for g in json.load(f).get("generations", [])
                if g != generation
            ]
    if summary is None:
        gman = os.path.join(index_dir, f"gen{generation}", "manifest.json")
        with open(gman) as f:
            gm = json.load(f)
        summary = {
            "generation": generation,
            "n_docs": gm.get("n_docs"),
            "n_terms": gm.get("n_terms"),
        }
    commit_manifest(
        index_dir,
        generations=gens,
        strategy_check=cfg.checksum(),
        tombstones=tombstones,
        operation="append",
        summary=summary,
    )


@dataclass
class IndexReader:
    """Handle over a built index (all generations)."""

    spark: SparkSession
    index_dir: str
    manifest: dict = field(default_factory=dict)
    gen_manifests: list[dict] = field(default_factory=list)
    _df_cache: dict = field(default_factory=dict)
    # tombstone dir NAME this reader sees (a versioned immutable table, the
    # legacy in-place dir, or None) — fixed at open() so the view is a
    # consistent snapshot even while writers commit new versions
    tombstone_dir: str | None = None

    @classmethod
    def open(
        cls,
        spark: SparkSession,
        index_dir: str,
        snapshot_id: int | None = None,
    ) -> "IndexReader":
        """Open the current committed state, or — with `snapshot_id` — the
        index exactly as of that commit (Iceberg time travel: the snapshot
        record pins the generation list, per-generation build nonces, and
        the tombstone version; raises SnapshotExpiredError if those bytes
        were since expired or rebuilt)."""
        from .snapshots import (
            resolve_tombstone_dir,
            snapshot_by_id,
            verify_snapshot_readable,
        )

        with open(os.path.join(index_dir, "manifest.json")) as f:
            manifest = json.load(f)
        if snapshot_id is None:
            gen_list = manifest["generations"]
            tomb_dir = resolve_tombstone_dir(index_dir, manifest)
        else:
            rec = snapshot_by_id(index_dir, snapshot_id)
            verify_snapshot_readable(index_dir, rec)
            gen_list = rec["generations"]
            tomb_dir = rec.get("tombstones")
            manifest = {**manifest, "generations": gen_list}
        gens = []
        for g in gen_list:
            with open(os.path.join(index_dir, f"gen{g}", "manifest.json")) as f:
                gens.append(json.load(f))
        return cls(spark, index_dir, manifest, gens, tombstone_dir=tomb_dir)

    def _union(self, stage: str) -> DataFrame:
        """Union across generations with a `gen` provenance column (the
        segment id — tombstones are generation-scoped, Lucene-style)."""
        if stage not in self._df_cache:
            parts = []
            for g in self.gen_manifests:
                gen = g["generation"]
                df = self.spark.read.parquet(
                    os.path.join(self.index_dir, f"gen{gen}", stage)
                ).withColumn("gen", F.lit(gen))
                parts.append(df)
            out = parts[0]
            for df in parts[1:]:
                out = out.unionByName(df)
            self._df_cache[stage] = out
        return self._df_cache[stage]

    @property
    def k1(self) -> float:
        return self.gen_manifests[0]["k1"]

    @property
    def b(self) -> float:
        return self.gen_manifests[0]["b"]

    @property
    def analyzer(self) -> str:
        return self.gen_manifests[0]["analyzer"]

    @property
    def postings_codec(self) -> str:
        """Block binary layout (uniform across generations — strategy_check
        folds the codec's layout string, so mixed-codec indexes can't
        register). Pre-codec manifests are pure varint."""
        return self.gen_manifests[0].get("postings_codec", "varint")

    @property
    def chunk_docs(self) -> int:
        """Doc-id chunking constant (identical across generations by
        strategy_check — the query planner's groupBy key derives from it)."""
        return self.gen_manifests[0]["chunk_docs"]

    @property
    def n_docs(self) -> int:
        return sum(g["n_docs"] for g in self.gen_manifests)

    @property
    def n_chunks(self) -> int:
        """Upper bound on distinct chunks (gens may overlap) — used by the
        query planner to choose single- vs two-phase WAND."""
        return sum(g.get("n_chunks", 1 << 30) for g in self.gen_manifests)

    @property
    def avgdl(self) -> float:
        n = self.n_docs
        if n == 0:
            return 0.0
        return sum(g["avgdl"] * g["n_docs"] for g in self.gen_manifests) / n

    def postings(self) -> DataFrame:
        return self._union("postings")

    def docs(self) -> DataFrame:
        return self._union("docs")

    def term_stats(self) -> DataFrame:
        """Union across generations, re-aggregated (df/cf add)."""
        df = self._union("term_stats").drop("gen")
        if len(self.gen_manifests) == 1:
            return df
        return df.groupBy("term").agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))

    def tombstones(self) -> DataFrame | None:
        """(doc_id, before_gen): the doc is dead in every generation
        strictly below before_gen (a replacement tombstones only older
        segments; expel uses before_gen = EXPEL_ALL). Collapsed to the max
        before_gen per doc. Reads the tombstone VERSION resolved at open()
        — later merges write new versions and never mutate this one."""
        if self.tombstone_dir is None:
            return None
        path = os.path.join(self.index_dir, self.tombstone_dir)
        if os.path.exists(path):
            return (
                self.spark.read.parquet(path)
                .groupBy("doc_id")
                .agg(F.max("before_gen").alias("before_gen"))
            )
        return None

    def live_docs(self) -> DataFrame:
        """docs() minus generation-superseded and expelled rows."""
        docs = self.docs()
        tomb = self.tombstones()
        if tomb is None:
            return docs
        # un-hinted: tombstones are unbounded between compactions; AQE
        # broadcasts when small, shuffles when not (never a driver OOM)
        joined = docs.join(tomb, "doc_id", "left")
        return joined.filter(
            F.col("before_gen").isNull() | (F.col("gen") >= F.col("before_gen"))
        ).drop("before_gen")


EXPEL_ALL = 1 << 30
