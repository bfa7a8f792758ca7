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


def _parquet_rows(path: str) -> int | None:
    """Exact row count of a local parquet directory from file FOOTERS only
    (no Spark job — same trick the compaction policy uses for tombstones).
    Returns None when the path is not a local directory of parquet files
    (object stores etc.), so callers fall back to a metadata count job."""
    try:
        import pyarrow.parquet as pq

        if not os.path.isdir(path):
            return None
        total = 0
        for name in os.listdir(path):
            if name.endswith(".parquet"):
                total += pq.ParquetFile(
                    os.path.join(path, name)
                ).metadata.num_rows
        return total
    except Exception:
        return None


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
        from ..extract import extract_text_only_arrow

        for pdf in batches:
            html = pdf["html"] if has_html else pd.Series([None] * len(pdf))
            text = pdf["text"] if has_text else pd.Series([None] * len(pdf))
            norm = None
            if has_text and (not has_html or not html.notna().any()):
                # text-only batch: vectorized Arrow normalization when all
                # ASCII (byte-identical; None -> frozen per-row fallback)
                norm = extract_text_only_arrow(text)
            if norm is None:
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


def _binary_from_offsets(n: int, bounds: np.ndarray, data) -> "object":
    """Arrow binary array over an existing byte buffer: `bounds` are the
    int64 byte offsets of each of the n+1 value boundaries. Zero per-value
    Python objects (guide: Arrow binary = one data buffer + offsets)."""
    import pyarrow as pa

    off32 = np.ascontiguousarray(bounds, dtype=np.int32)
    buf = data if isinstance(data, pa.Buffer) else pa.py_buffer(
        np.ascontiguousarray(data, dtype=np.uint8)
    )
    return pa.Array.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(off32), buf]
    )


def _as_array(col):
    """pa.Table column (ChunkedArray) -> single pa.Array."""
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        if col.num_chunks == 1:
            return col.chunk(0)
        if col.num_chunks == 0:
            return pa.array([], type=col.type)
        return pa.concat_arrays(col.chunks)
    return col


def _binary_parts(arr) -> tuple[np.ndarray, np.ndarray]:
    """(uint8 data view, int64 value offsets) of an Arrow BinaryArray,
    slice-offset corrected. data is the WHOLE buffer; offsets are absolute
    byte positions into it (len(arr)+1 entries)."""
    o = arr.offset
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        o : o + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data, offs


def build_termdoc(docs: DataFrame, analyzer: str) -> DataFrame:
    """docs -> (term, doc_id, tf, dl, pos_bin): per-doc term counting + token
    positions, all inside the UDF (map-side combine — no shuffle here, and
    downstream shuffles move one row per posting, never per token occurrence).

    Positions are the analyzer token offsets (0-based) of each term in its
    document, delta+varint encoded per posting. Fully vectorized — and, on
    the standard-analyzer ASCII fast path, fully Arrow-native (mapInArrow):
    tokens are dictionary-encoded so grouping sorts int32 codes instead of
    Python strings, and the output batch is assembled from Arrow buffers
    (pos_bin via one offsets array over one encode buffer) with zero
    per-row Python objects crossing the JVM boundary. Row ORDER within a
    batch differs from the legacy pandas path (code order vs lexicographic),
    which is immaterial: rows feed a hash repartition + sortWithinPartitions
    that fixes the final order; group contents and bytes are identical.
    """
    from .codec import delta_encode_blocks, delta_encode_offsets

    def _pandas_body(pdf: pd.DataFrame):
        """Frozen fallback (non-ASCII batches / field-scoped path_key)."""
        from ..analysis import tokenize_batch_flat

        parents, toks = tokenize_batch_flat(pdf["text_norm"], analyzer)
        n = len(toks)
        if n == 0:
            return None
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
        return pd.DataFrame(
            {
                "term": t_s[gstarts],
                "doc_id": pdf["doc_id"].to_numpy()[gp],
                "tf": tf,
                "dl": dlen[gp],
                "pos_bin": pos_bins,
            }
        )

    def _count_batches_arrow(batches) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        if pa.cpu_count() != 1:  # one Spark worker per core already
            pa.set_cpu_count(1)
            pa.set_io_thread_count(1)

        names = None

        def fallback(batch):
            out = _pandas_body(batch.to_pandas())
            if out is None or not len(out):
                return None
            return pa.RecordBatch.from_pandas(out, preserve_index=False)

        for batch in batches:
            if batch.num_rows == 0:
                continue
            if names is None:
                names = batch.schema.names
            text = pc.fill_null(batch.column(names.index("text_norm")), "")
            fast = analyzer == "standard" and pc.all(
                pc.string_is_ascii(text)
            ).as_py()
            if fast and "path_key" in names:
                pk = pc.fill_null(batch.column(names.index("path_key")), "")
                if not pc.all(pc.equal(pk, "")).as_py():
                    fast = False  # field-prefixed terms: frozen pandas path
            if not fast:
                out = fallback(batch)
                if out is not None:
                    yield out
                continue
            # --- Arrow fast path: byte-identical groups to the fallback ---
            split = pc.split_pattern_regex(pc.utf8_lower(text), r"[^0-9a-z_]+")
            flat = pc.list_flatten(split)
            parents = pc.list_parent_indices(split).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            keep = pc.not_equal(flat, "")
            flat = flat.filter(keep)
            parents = parents[keep.to_numpy(zero_copy_only=False)]
            n = len(flat)
            if n == 0:
                continue
            dct = flat.dictionary_encode()
            codes = dct.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            dlen = np.bincount(parents, minlength=batch.num_rows).astype(
                np.int32
            )
            change = np.empty(n, dtype=bool)
            change[0] = True
            change[1:] = parents[1:] != parents[:-1]
            run_starts = np.nonzero(change)[0]
            run_ids = np.cumsum(change) - 1
            pos = np.arange(n, dtype=np.int64) - run_starts[run_ids]
            order = np.lexsort((codes, parents))  # stable: positions ascend
            p_s, c_s, pos_s = parents[order], codes[order], pos[order]
            gchange = np.empty(n, dtype=bool)
            gchange[0] = True
            gchange[1:] = (p_s[1:] != p_s[:-1]) | (c_s[1:] != c_s[:-1])
            gstarts = np.nonzero(gchange)[0]
            gends = np.append(gstarts[1:], n)
            tf = (gends - gstarts).astype(np.int32)
            pos_buf, pos_bounds = delta_encode_offsets(pos_s, gstarts, gends)
            gp = p_s[gstarts]
            doc_ids = batch.column(names.index("doc_id")).to_numpy(
                zero_copy_only=False
            )
            yield pa.RecordBatch.from_arrays(
                [
                    dct.dictionary.take(pa.array(c_s[gstarts])),
                    pa.array(doc_ids[gp], type=pa.int64()),
                    pa.array(tf, type=pa.int32()),
                    pa.array(dlen[gp], type=pa.int32()),
                    _binary_from_offsets(len(gstarts), pos_bounds, pos_buf),
                ],
                names=["term", "doc_id", "tf", "dl", "pos_bin"],
            )

    sel = ["doc_id", "text_norm"]
    if "path_key" in docs.columns:
        sel.append("path_key")
    return docs.select(*sel).mapInArrow(
        _count_batches_arrow, schema=TERMDOC_SCHEMA
    )


def _decode_block_rows(tbl, codec):
    """One table/batch of posting-block rows -> decoded posting rows as a
    pa.RecordBatch (term, doc_id, tf, dl, pos_bin, gen); None when empty.

    Varint path is Arrow-native: ids/tfs/dls decode from the binary
    columns' own data buffers, and each posting's positional run is a
    RE-SLICE of the stored per-block stream at varint value boundaries
    (the block stream is the byte-concatenation of per-posting runs in
    build_termdoc's own layout) — no decode, no re-encode, zero copy.
    Other codecs go through the generic pandas body."""
    import pyarrow as pa

    from .codec import (
        delta_encode_blocks,
        grouped_delta_decode,
        varint_decode,
        varint_value_ends,
    )

    if isinstance(tbl, pa.RecordBatch):
        tbl = pa.Table.from_batches([tbl])
    tbl = tbl.combine_chunks()
    n_rows = tbl.num_rows
    if n_rows == 0:
        return None
    ns = _as_array(tbl.column("n")).to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    if codec.name != "varint":
        pdf = tbl.to_pandas()
        ids = codec.decode_delta(pdf["docs_bin"], ns).astype(np.int64)
        tfs = codec.decode_plain(pdf["tfs_bin"], ns).astype(np.int64)
        dls = codec.decode_plain(pdf["dls_bin"], ns).astype(np.int64)
        pos_abs = np.asarray(
            codec.decode_runs(pdf["pos_bin"], ns, tfs), dtype=np.int64
        )
        rends = np.cumsum(tfs)
        rstarts = rends - tfs
        out = pd.DataFrame(
            {
                "term": np.repeat(pdf["term"].to_numpy(), ns),
                "doc_id": ids,
                "tf": tfs.astype(np.int32),
                "dl": dls.astype(np.int32),
                "pos_bin": delta_encode_blocks(pos_abs, rstarts, rends),
                "gen": np.repeat(pdf["gen"].to_numpy(dtype=np.int32), ns),
            }
        )
        if not len(out):
            return None
        return pa.RecordBatch.from_pandas(out, preserve_index=False)
    # --- varint fast path, Arrow-native ---
    dd, do = _binary_parts(_as_array(tbl.column("docs_bin")))
    ids = grouped_delta_decode(
        np.ascontiguousarray(dd[do[0] : do[-1]]), ns
    ).astype(np.int64)
    td, to = _binary_parts(_as_array(tbl.column("tfs_bin")))
    tfs = varint_decode(
        np.ascontiguousarray(td[to[0] : to[-1]])
    ).astype(np.int64)
    ld, lo = _binary_parts(_as_array(tbl.column("dls_bin")))
    dls = varint_decode(
        np.ascontiguousarray(ld[lo[0] : lo[-1]])
    ).astype(np.int64)
    pos_arr = _as_array(tbl.column("pos_bin"))
    pd_data, pd_off = _binary_parts(pos_arr)
    seg = np.ascontiguousarray(pd_data[pd_off[0] : pd_off[-1]])
    ve = varint_value_ends(seg)
    n_post = ids.shape[0]
    vstarts = np.zeros(n_post + 1, dtype=np.int64)
    np.cumsum(tfs, out=vstarts[1:])
    byte_bounds = np.zeros(ve.shape[0] + 1, dtype=np.int64)
    byte_bounds[1:] = ve
    post_bounds = byte_bounds[vstarts] + pd_off[0]
    rep = pa.array(np.repeat(np.arange(n_rows, dtype=np.int64), ns))
    return pa.RecordBatch.from_arrays(
        [
            _as_array(tbl.column("term")).take(rep),
            pa.array(ids, type=pa.int64()),
            pa.array(tfs.astype(np.int32), type=pa.int32()),
            pa.array(dls.astype(np.int32), type=pa.int32()),
            _binary_from_offsets(n_post, post_bounds, pos_arr.buffers()[2]),
            _as_array(tbl.column("gen")).take(rep),
        ],
        names=["term", "doc_id", "tf", "dl", "pos_bin", "gen"],
    )


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
    codec = get_codec(postings_codec)
    schema = T.StructType(
        list(TERMDOC_SCHEMA) + [T.StructField("gen", T.IntegerType())]
    )

    def _decode_arrow(batches) -> Iterator:
        for batch in batches:
            if batch.num_rows == 0:
                continue
            out = _decode_block_rows(batch, codec)
            if out is not None and out.num_rows:
                yield out

    return blocks.select(
        "term", "n", "docs_bin", "tfs_bin", "dls_bin", "pos_bin", "gen"
    ).mapInArrow(_decode_arrow, schema=schema)


def _make_block_encoder(cfg: IndexConfig):
    """Posting-block encoder for one range partition — fully vectorized and
    Arrow-native (mapInArrow).

    Input arrives sorted by (term, doc_id); the iterator spans the whole
    partition, so the trailing (possibly unfinished) group is carried across
    Arrow batches. Per accumulated super-batch:
      1. group change points on (term, chunk) -> block starts (size-capped)
      2. ONE varint pass per column, wrapped per block by byte OFFSETS over
         the single encode buffer (no per-block bytes objects)
      3. per-block max_tf / min_dl via np.maximum/minimum.reduceat — the
         avgdl-independent block-max metadata (impact bounds are computed at
         QUERY time with the then-current global avgdl, so they stay valid
         as later generations shift avgdl)
      4. pos_bin (varint codec): blocks tile the posting stream, so the
         per-block positional payload is a RE-SLICE of the incoming binary
         column's own data buffer — new offsets, same bytes, zero copy
    No per-block (or per-row) Python objects cross the JVM boundary in
    either direction; term strings stay inside Arrow arrays end to end.
    Block boundaries: size limit, term change, chunk boundary
    (chunk = doc_id // chunk_docs) — see module docstring.
    """
    bs, chunk_docs = cfg.block_size, cfg.chunk_docs
    codec = get_codec(cfg.postings_codec)
    MIN_ROWS = 1 << 17  # accumulate small Arrow batches before encoding

    def encode(batches) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc
        from pyspark import TaskContext

        from .codec import delta_encode_offsets, varint_encode_offsets

        part_id = TaskContext.get().partitionId() if TaskContext.get() else -1
        carry = None  # pa.Table

        def process(tbl, final: bool):
            nonlocal carry
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
                carry = None
            n = tbl.num_rows
            if n == 0:
                return None
            term_arr = _as_array(tbl.column("term"))
            ids = _as_array(tbl.column("doc_id")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            chunks = ids // chunk_docs
            change = np.empty(n, dtype=bool)
            change[0] = True
            if n > 1:
                tdiff = pc.not_equal(
                    term_arr.slice(1), term_arr.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
                change[1:] = tdiff | (chunks[1:] != chunks[:-1])
            gstarts = np.nonzero(change)[0]
            if not final:
                if len(gstarts) <= 1:
                    carry = tbl
                    return None
                cut = int(gstarts[-1])  # last (unfinished) group carries
                carry = tbl.slice(cut)
                tbl = tbl.slice(0, cut)
                term_arr = term_arr.slice(0, cut)
                n = cut
                ids, chunks = ids[:cut], chunks[:cut]
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

            tfs = _as_array(tbl.column("tf")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            dls = _as_array(tbl.column("dl")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            max_tf = np.maximum.reduceat(tfs, bstarts).astype(np.int32)
            min_dl = np.minimum.reduceat(dls, bstarts).astype(np.int32)
            sum_tf = np.add.reduceat(tfs, bstarts)

            pos_arr = _as_array(tbl.column("pos_bin"))
            pdata, poffs = _binary_parts(pos_arr)
            if codec.name == "varint":
                docs_buf, docs_off = delta_encode_offsets(ids, bstarts, bends)
                tfs_buf, tfs_off = varint_encode_offsets(tfs, bstarts, bends)
                dls_buf, dls_off = varint_encode_offsets(dls, bstarts, bends)
                docs_bin = _binary_from_offsets(total, docs_off, docs_buf)
                tfs_bin = _binary_from_offsets(total, tfs_off, tfs_buf)
                dls_bin = _binary_from_offsets(total, dls_off, dls_buf)
                # byte slicing IS re-encoding here: the per-block varint
                # layout equals the concatenation of its runs' varint
                # bytes, and blocks tile the stream — so the pos payload
                # is the input buffer re-offset per block, zero copy
                pos_bounds = np.empty(total + 1, dtype=np.int64)
                pos_bounds[:-1] = poffs[bstarts]
                pos_bounds[-1] = poffs[n]
                pos_bin = _binary_from_offsets(
                    total, pos_bounds, pos_arr.buffers()[2]
                )
            else:
                docs_bin = pa.array(
                    codec.encode_delta_blocks(ids, bstarts, bends),
                    type=pa.binary(),
                )
                tfs_bin = pa.array(
                    codec.encode_plain_blocks(tfs, bstarts, bends),
                    type=pa.binary(),
                )
                dls_bin = pa.array(
                    codec.encode_plain_blocks(dls, bstarts, bends),
                    type=pa.binary(),
                )
                # decode the raw run value stream (first_abs + gaps, NOT
                # absolute positions) and re-encode per block in the value
                # domain — posting -> value offsets via the tf prefix sum
                pvals = varint_decode(
                    np.ascontiguousarray(pdata[poffs[0] : poffs[n]])
                )
                ctf = np.zeros(n + 1, dtype=np.int64)
                np.cumsum(tfs, out=ctf[1:])
                pos_bin = pa.array(
                    codec.encode_plain_blocks(pvals, ctf[bstarts], ctf[bends]),
                    type=pa.binary(),
                )
            bidx = pa.array(bstarts)
            return pa.RecordBatch.from_arrays(
                [
                    term_arr.take(bidx),
                    pa.array(chunks[bstarts], type=pa.int64()),
                    pa.array(ids[bstarts], type=pa.int64()),
                    pa.array(ids[bends - 1], type=pa.int64()),
                    pa.array((bends - bstarts).astype(np.int32)),
                    docs_bin,
                    tfs_bin,
                    dls_bin,
                    pos_bin,
                    pa.array(max_tf),
                    pa.array(min_dl),
                    pa.array(sum_tf, type=pa.int64()),
                    pa.array(np.full(total, part_id, dtype=np.int32)),
                ],
                names=[
                    "term", "chunk", "first_doc", "last_doc", "n",
                    "docs_bin", "tfs_bin", "dls_bin", "pos_bin",
                    "max_tf", "min_dl", "sum_tf", "part_id",
                ],
            )

        cols = ["term", "doc_id", "tf", "dl", "pos_bin"]
        buf: list = []
        buffered = 0
        for rb in batches:
            buf.append(rb)
            buffered += rb.num_rows
            if buffered >= MIN_ROWS:
                out = process(
                    pa.Table.from_batches(buf).select(cols).combine_chunks(),
                    final=False,
                )
                buf, buffered = [], 0
                if out is not None and out.num_rows:
                    yield out
        if buf:
            tail = pa.Table.from_batches(buf).select(cols).combine_chunks()
        else:
            tail = pa.table(
                {
                    "term": pa.array([], type=pa.string()),
                    "doc_id": pa.array([], type=pa.int64()),
                    "tf": pa.array([], type=pa.int32()),
                    "dl": pa.array([], type=pa.int32()),
                    "pos_bin": pa.array([], type=pa.binary()),
                }
            )
        out = process(tail, final=True)
        if out is not None and out.num_rows:
            yield out

    return encode


def _make_block_merger(cfg: IndexConfig, tomb_bc):
    """mapInArrow kernel for posting-level compaction WITHOUT a decoded-row
    shuffle (guide §2.3/§8: shuffle the compressed representation, decode
    at the destination).

    Input: ENCODED block rows of every generation, hash-partitioned by the
    build's own salted key — a block never spans a chunk, and the salt
    window is a whole number of chunks, so keying on first_doc lands each
    block in exactly the partition its decoded rows would have landed in —
    and sorted by (term, first_doc, gen), which makes (term, chunk) groups
    contiguous with chunks in doc order.  The kernel decodes one span of
    complete groups at a time, sorts postings by doc within each group
    (generations interleave only inside a chunk), drops tombstoned rows
    (tomb_bc: broadcast (sorted doc_ids, aligned max before_gen)), and
    pipes the merged stream through the STANDARD block encoder — output
    blocks are produced by the same encoder from the same rows in the same
    order as the row-level merge, so results are identical, while the
    exchange moved ~1x index bytes instead of ~10x decoded postings.

    Measured at 200k docs / 2 gens / local[32]: the decode->shuffle->sort->
    encode chain's exchange step (3.5 s beyond decode) drops to a 0.3 s
    block shuffle.

    Future work: a (term, chunk) group holding a single generation and no
    tombstoned doc (checkable from first_doc/last_doc + the broadcast ids
    without decoding) could pass its blocks through verbatim with only
    part_id restamped — the encoder would regenerate identical bytes from
    identical rows, so the copy is exact (Lucene's untouched-segment
    copy). Worth adding when compaction churn is concentrated rather than
    uniform; the byte-identity test pins safety."""
    codec = get_codec(cfg.postings_codec)
    encode = _make_block_encoder(cfg)
    MIN_BLOCK_ROWS = 1 << 12

    def merged(batches) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        tomb_ids, tomb_gens = tomb_bc.value
        carry = None

        def process(tbl, final: bool):
            nonlocal carry
            if carry is not None:
                tbl = pa.concat_tables([carry, tbl]).combine_chunks()
                carry = None
            n = tbl.num_rows
            if n == 0:
                return None
            term_arr = _as_array(tbl.column("term"))
            chunks = _as_array(tbl.column("chunk")).to_numpy(
                zero_copy_only=False
            )
            change = np.empty(n, dtype=bool)
            change[0] = True
            if n > 1:
                tdiff = pc.not_equal(
                    term_arr.slice(1), term_arr.slice(0, n - 1)
                ).to_numpy(zero_copy_only=False)
                change[1:] = tdiff | (chunks[1:] != chunks[:-1])
            if not final:
                gstarts = np.nonzero(change)[0]
                if len(gstarts) <= 1:
                    carry = tbl
                    return None
                cut = int(gstarts[-1])  # last (unfinished) group carries
                carry = tbl.slice(cut)
                tbl = tbl.slice(0, cut).combine_chunks()
                n = cut
                change = change[:cut]
            rows = _decode_block_rows(tbl, codec)
            if rows is None or rows.num_rows == 0:
                return None
            ns = _as_array(tbl.column("n")).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            gidx = np.repeat(np.cumsum(change) - 1, ns)
            ids = rows.column(1).to_numpy(zero_copy_only=False)
            # stable (group, doc_id) sort: groups are already in stream
            # order, generations interleave only within a group
            order = np.lexsort((ids, gidx))
            if tomb_ids.size:
                gens = rows.column(5).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64)
                loc = np.searchsorted(tomb_ids, ids)
                locc = np.minimum(loc, tomb_ids.size - 1)
                dead = (
                    (loc < tomb_ids.size)
                    & (tomb_ids[locc] == ids)
                    & (gens < tomb_gens[locc])
                )
                order = order[~dead[order]]
            if order.size == 0:
                return None
            perm = pa.array(order)
            return pa.RecordBatch.from_arrays(
                [rows.column(i).take(perm) for i in range(5)],
                names=["term", "doc_id", "tf", "dl", "pos_bin"],
            )

        buf: list = []
        buffered = 0
        for rb in batches:
            if rb.num_rows == 0:
                continue
            buf.append(rb)
            buffered += rb.num_rows
            if buffered >= MIN_BLOCK_ROWS:
                out = process(
                    pa.Table.from_batches(buf).combine_chunks(), final=False
                )
                buf, buffered = [], 0
                if out is not None and out.num_rows:
                    yield out
        if buf or carry is not None:
            tail = (
                pa.Table.from_batches(buf).combine_chunks()
                if buf
                else carry.slice(0, 0)
            )
            out = process(tail, final=True)
            if out is not None and out.num_rows:
                yield out

    def kernel(batches) -> Iterator:
        yield from encode(merged(batches))

    return kernel


def merge_generations_blocks(
    reader: "IndexReader",
    cfg: IndexConfig,
    tomb_ids: np.ndarray,
    tomb_gens: np.ndarray,
) -> DataFrame:
    """All generations' posting blocks -> single-generation blocks, as one
    block-shuffle + merge-kernel plan (see _make_block_merger). The caller
    (streaming.incremental.compact) guarantees cfg matches the registered
    block/chunk/salt/codec geometry and that the tombstone set fits the
    driver-side arrays; otherwise it falls back to the row-level
    decode_termdoc path."""
    spark = reader.spark
    window = min(cfg.chunk_docs * cfg.salt_chunks, 1 << 62)
    n_parts = cfg.n_partitions or spark.sparkContext.defaultParallelism
    tomb_bc = spark.sparkContext.broadcast(
        (
            np.ascontiguousarray(tomb_ids, dtype=np.int64),
            np.ascontiguousarray(tomb_gens, dtype=np.int64),
        )
    )
    cols = [
        "term", "chunk", "first_doc", "n",
        "docs_bin", "tfs_bin", "dls_bin", "pos_bin", "gen",
    ]
    return (
        reader.postings()
        .select(*cols)
        .repartition(
            n_parts,
            F.xxhash64("term", (F.col("first_doc") / window).cast("long")),
        )
        .sortWithinPartitions("term", "first_doc", "gen")
        .mapInArrow(_make_block_merger(cfg, tomb_bc), schema=BLOCKS_SCHEMA)
    )


def local_tombstone_arrays(
    index_dir: str, tombstone_dir: str | None, cap: int = 2_000_000
):
    """Driver-side (sorted doc_ids, aligned max before_gen) from the local
    tombstone version dir — parquet footers bound the size first, so an
    over-cap set costs one listing and no reads. Returns None when the dir
    is non-local or larger than cap (callers use the distributed row-level
    merge instead); empty arrays when there are no tombstones at all."""
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if tombstone_dir is None:
        return empty
    path = os.path.join(index_dir, tombstone_dir)
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        if not os.path.isdir(path):
            return None
        files = [
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith(".parquet")
        ]
        total = sum(
            pq.ParquetFile(f).metadata.num_rows for f in files
        )
        if total > cap:
            return None
        if total == 0:
            return empty
        t = pa.concat_tables(
            [pq.read_table(f, columns=["doc_id", "before_gen"]) for f in files]
        )
        ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        bg = t.column("before_gen").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        o = np.argsort(ids, kind="stable")
        ids, bg = ids[o], bg[o]
        last = np.empty(ids.size, dtype=bool)
        last[:-1] = ids[1:] != ids[:-1]
        last[-1] = True
        ends = np.nonzero(last)[0]
        starts = np.concatenate(([0], ends[:-1] + 1))
        return ids[ends], np.maximum.reduceat(bg, starts)
    except Exception:
        return None


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
    postings_df: DataFrame | None = None,
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
            assume_unique_ids, docs_df, termdoc_df, postings_df,
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
    postings_df: DataFrame | None = None,
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
    pass. `postings_df` injects FULLY ENCODED block rows (BLOCKS_SCHEMA,
    already partitioned — the block-level merge of merge_generations_blocks)
    and short-circuits stage 2 to a plain write. `pages` may be None when
    the stage inputs are given.
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

    # stage 1: docs (extract + doc_len) — OVERLAPPED with the postings
    # chain (guide §2.6): the docs-table write and the postings shuffle are
    # independent sinks, and serializing them just left the cluster idle
    # during each one's tail. When the termdoc stream derives from the same
    # extracted frame, that frame is persisted (MEMORY_AND_DISK) so extract
    # runs ONCE and both consumers share it — the "analyzed exactly once"
    # invariant holds; the persist is scoped to the build and unpersisted
    # the moment both writes land. On the merge path (termdoc_df given) the
    # two lineages are already independent, so no persist is needed.
    # Measured at 200k docs / local[32]: warm build 7.2 -> 6.3 s, cold
    # 17.6 -> ~14 s (the two first-job warmups amortize concurrently).
    from concurrent.futures import ThreadPoolExecutor as _TPE

    docs_future = None
    feed = None
    _stage1_pool = _TPE(max_workers=1)
    if resume and _stage_done(gdir, "docs"):
        feed = spark.read.parquet(docs_path)
        _lap("docs")
    else:
        src = (
            docs_df
            if docs_df is not None
            else build_docs(spark, pages, cfg.analyzer)
        )
        if termdoc_df is None and postings_df is None:
            from pyspark import StorageLevel

            src = src.persist(StorageLevel.MEMORY_AND_DISK)
        feed = src

        def _docs_write() -> None:
            t0 = _time.time()
            src.write.mode("overwrite").parquet(docs_path)
            _refresh(docs_path)
            _mark_done(gdir, "docs")
            stage_s["docs"] = round(_time.time() - t0, 2)

        docs_future = _stage1_pool.submit(_docs_write)
    docs = feed

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
        if postings_df is not None:
            # block-level merge: rows arrive encoded, partitioned and
            # ordered by the merge kernel — nothing left but the write
            postings_df.write.mode("overwrite").parquet(postings_path)
        else:
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
                .mapInArrow(_make_block_encoder(cfg), schema=BLOCKS_SCHEMA)
                .write.mode("overwrite")
                .parquet(postings_path)
            )
        _refresh(postings_path)
        _mark_done(gdir, "postings")
    _lap("postings")

    # join the overlapped docs write; release the shared extract cache
    if docs_future is not None:
        docs_future.result()
    _stage1_pool.shutdown(wait=True)
    if docs_future is not None and termdoc_df is None and postings_df is None:
        feed.unpersist()

    # parquet FOOTER count only (no Spark job; falls back to a metadata
    # count job on non-local filesystems) — avgdl is derived below from
    # posting block metadata (sum_tf), so no job ever tokenizes for stats
    n_docs = _parquet_rows(docs_path)
    if n_docs is None:
        n_docs = spark.read.parquet(docs_path).count()

    # stages 2b + 3 + the manifest metrics job all read ONLY the finished
    # postings files and are mutually independent — submit them from a
    # small thread pool so their tails back-fill each other's idle
    # executors (guide §2.6: overlap independent jobs; actions were only
    # sequential because this code called them sequentially).
    import time as _time2
    from concurrent.futures import ThreadPoolExecutor

    def _serve_stage() -> None:
        # stage 2b (optional): term-clustered serve copy of the posting
        # blocks. Input is the ENCODED blocks (already delta+varint
        # compressed), so this shuffle moves a small multiple of the final
        # index bytes — far cheaper than re-encoding. repartitionByRange on
        # (term, chunk) splits a head term across partitions at chunk
        # boundaries (no single-reducer skew at 10^12 docs) while keeping
        # each term's blocks contiguous on disk; 1 MiB row groups give the
        # serving tier a fine-grained read unit.
        t0 = _time2.time()
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
        stage_s["postings_term"] = round(_time2.time() - t0, 2)

    def _stats_stage() -> None:
        # stage 3: term stats DERIVED FROM BLOCK METADATA — df = sum of
        # block sizes per term, cf = sum of per-block tf sums; no posting
        # bytes decoded, no second tokenize pass. Output sorted by term for
        # parquet min/max pruning at query time (the per-query "broadcast
        # term statistics" lookup of the north rule).
        t0 = _time2.time()
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
        stage_s["term_stats"] = round(_time2.time() - t0, 2)

    def _metrics_job() -> list:
        # manifest metrics: ONE job over posting metadata; n_chunks is the
        # exact count for dense doc ids — (max_doc // chunk_docs) + 1 — and
        # a safe upper bound for sparse ids, which pushes the query planner
        # to the two-phase plan
        return (
            spark.read.parquet(postings_path)
            .groupBy("part_id")
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

    with ThreadPoolExecutor(max_workers=3) as pool:
        serve_f = pool.submit(_serve_stage) if cfg.serve_layout else None
        stats_f = pool.submit(_stats_stage)
        part_rows = pool.submit(_metrics_job).result()
        stats_f.result()
        if serve_f is not None:
            serve_f.result()
    _lap("parallel_finish")

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
    n_terms = _parquet_rows(stats_path)
    if n_terms is None:
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

    def _union(self, stage: str, interactive: bool = False) -> DataFrame:
        """Union across generations with a `gen` provenance column (the
        segment id — tombstones are generation-scoped, Lucene-style).

        `interactive=True` creates the parquet relations under the
        interactive SQL conf scope: file-scan SPLITS are decided when the
        relation is created (not at action time), so a top-k's pruned
        slice read must be born with the byte-sized split shape
        (session.INTERACTIVE_SCAN_*) while batch consumers (compaction,
        serve-layout copy) keep cluster-width scans from the default
        variant. Cached separately per variant."""
        key = (stage, interactive)
        if key not in self._df_cache:
            from contextlib import nullcontext

            from ..session import interactive_sql_conf

            ctx = (
                interactive_sql_conf(self.spark)
                if interactive
                else nullcontext()
            )
            with ctx:
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
            self._df_cache[key] = out
        return self._df_cache[key]

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

    def postings(self, interactive: bool = False) -> DataFrame:
        return self._union("postings", interactive=interactive)

    def docs(self) -> DataFrame:
        return self._union("docs")

    def term_stats(self) -> DataFrame:
        """Union across generations, re-aggregated (df/cf add)."""
        df = self._union("term_stats").drop("gen")
        if len(self.gen_manifests) == 1:
            return df
        return df.groupBy("term").agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))

    def term_stats_local(self, terms) -> dict[str, int] | None:
        """df per query term, summed across generations, read DRIVER-SIDE
        via parquet row-group pruning — no Spark job. The per-query stats
        slice is at most len(terms) rows, and the stats files are written
        range-partitioned + term-sorted exactly so min/max statistics
        prune this lookup (the serve tier reads them the same way).
        Returns None when any generation's stats dir is not a local
        directory — callers fall back to the distributed broadcast-join
        plan, which works on any filesystem."""
        terms = [t for t in terms]
        if not terms:
            return {}
        try:
            import pyarrow.parquet as pq

            out: dict[str, int] = {}
            for g in self.gen_manifests:
                path = os.path.join(
                    self.index_dir, f"gen{g['generation']}", "term_stats"
                )
                if not os.path.isdir(path):
                    return None
                tbl = pq.read_table(
                    path,
                    columns=["term", "df"],
                    filters=[("term", "in", terms)],
                )
                for t, df_ in zip(
                    tbl.column("term").to_pylist(),
                    tbl.column("df").to_pylist(),
                ):
                    out[t] = out.get(t, 0) + int(df_)
            return out
        except Exception:
            return None

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
