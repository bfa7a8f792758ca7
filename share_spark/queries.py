"""Operator registry backing __spark_entry__.py.

Each entry is one operator/query from SURVEY.md §2 (or the training-data
pipeline extension set), expressed over the driver-provided parquet tables
(documents, embeddings, events, orders, ...). Every entry has a matching
ANSI-SQL oracle in ORACLES (DuckDB), column-name- and type-aligned, with
floats rounded in BOTH engines so the driver's value-hash compares stably.

Determinism rules used throughout:
- every ORDER BY ends with a unique key (doc_id/vec_id/event_id)
- floats are rounded BEFORE ordering/limiting, so the boundary row of a
  LIMIT is the same in both engines
- hashes are md5-hex (portable across Spark and DuckDB)
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import similarity, textops
from .index.build import IndexConfig, IndexReader, build_index
from .query.wand import wand_topk

K1, B = 1.2, 0.75

BM25_TERMS = ("spark", "join", "stream")
BM25_K = 20


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, term) token rows — single-space split to mirror the oracle's
    string_split exactly (documents.text is pre-normalized)."""
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")


# ---------------------------------------------------------------- full text

def _inline_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact BM25 top-k as one declarative DataFrame plan over raw documents
    (the oracle-checkable twin of the posting-index path below)."""
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens(docs)
    dls = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    corpus = dls.agg(
        F.count("*").cast("double").alias("n"), F.avg("dl").alias("avgdl")
    )
    qt = list(BM25_TERMS)
    tf = (
        toks.filter(F.col("term").isin(qt))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfs = (
        toks.filter(F.col("term").isin(qt))
        .select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(dfs), "term")
        .join(dls, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "tscore",
            F.log1p((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * (K1 + 1.0))
            / (F.col("tf") + K1 * (1.0 - B + B * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.sum("tscore").alias("score"), F.count("*").alias("nt"))
        .filter(F.col("nt") == len(qt))
        .select("doc_id", F.round("score", 4).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(BM25_K)


_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, t AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
),
dls AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
corpus AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dls),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ('spark', 'join', 'stream') GROUP BY doc_id, term
),
dfs AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM toks
  WHERE term IN ('spark', 'join', 'stream') GROUP BY term
),
scored AS (
  SELECT tf.doc_id,
         sum(ln(1 + (n - df + 0.5) / (df + 0.5))
             * (tf * {K1 + 1.0}) / (tf + {K1} * (1.0 - {B} + {B} * dl / avgdl))
         ) AS s,
         count(*) AS nt
  FROM tf JOIN dfs USING (term) JOIN dls USING (doc_id) CROSS JOIN corpus
  GROUP BY tf.doc_id
)
SELECT doc_id, round(s, 4) AS score FROM scored WHERE nt = 3
ORDER BY score DESC, doc_id LIMIT {BM25_K}
"""

_INDEX_CACHE: dict[str, str] = {}


def _indexed(spark: SparkSession, sf_dir: str) -> IndexReader:
    """Build (once per sf_dir per process) a posting-block index over the
    documents table; used by the wand entry so the driver's correctness gate
    exercises the real index path, not just the inline plan."""
    key = os.path.abspath(sf_dir)
    if key not in _INDEX_CACHE:
        d = tempfile.mkdtemp(prefix="ss_idx_")
        docs = _t(spark, sf_dir, "documents").withColumn("url", F.lit(None).cast("string"))
        build_index(
            spark, docs, d,
            IndexConfig(analyzer="standard", block_size=128, chunk_docs=1024),
        )
        _INDEX_CACHE[key] = d
    return IndexReader.open(spark, _INDEX_CACHE[key])


def _wand_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _indexed(spark, sf_dir)
    out = wand_topk(idx, " ".join(BM25_TERMS), k=BM25_K)
    return out.select("doc_id", F.round("score", 4).alias("score")).orderBy(
        F.desc("score"), F.asc("doc_id")
    )


def _ft_and(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.filter(
        F.array_contains(toks, "window") & F.array_contains(toks, "merge")
    ).select("doc_id")


def _ft_or(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.filter(
        F.array_contains(toks, "spark") | F.array_contains(toks, "slow")
    ).select("doc_id")


def _ft_not(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.filter(
        F.array_contains(toks, "spark") & ~F.array_contains(toks, "slow")
    ).select("doc_id")


def _ft_phrase(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    return docs.filter(padded.contains(" group query ")).select("doc_id")


def _term_stats_top(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        _tokens(docs)
        .select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(30)
    )


def _corpus_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    per_doc = docs.select(
        F.size(F.filter(toks, lambda t: t != F.lit(""))).cast("long").alias("dl")
    )
    return per_doc.agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("dl"), 4).alias("avgdl"),
        F.sum("dl").alias("total_tokens"),
    )


# ----------------------------------------------------- structured search ops

def _filter_anyof_lang(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .filter(F.col("lang").isin("en", "de"))
        .select("doc_id", "lang")
    )


def _filter_noneof_source(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    matching = docs.filter(F.col("source").isin("src0", "src1")).select("doc_id")
    return docs.join(matching, "doc_id", "left_anti").select("doc_id", "source")


def _date_at_year(spark, sf_dir):
    """AT_DATE granularity ('1995' = the whole year), grouped by month."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-01-01"))
        )
        .groupBy(F.month("o_orderdate").cast("long").alias("month"))
        .agg(F.count("*").alias("n_orders"))
    )


def _date_histogram_years(spark, sf_dir):
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.year("o_orderdate").cast("long").alias("year"))
        .agg(F.count("*").alias("match_count"))
        .orderBy(F.desc("year"))
    )


def _valuesearch_terms(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("match_count"))
        .orderBy(F.desc("match_count"), F.asc("event_type"))
        .limit(14)
    )


def _related_props(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("usage_count"))
        .orderBy(F.desc("usage_count"), F.asc("source"))
    )


def _sort_int_page(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.coalesce("n_chars", F.lit(0)).alias("n_chars"))
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(13)
    )


def _paging_offset(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.coalesce("n_chars", F.lit(0)).alias("n_chars")
    )
    w = Window.orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(39)
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") > 26)
    )


def _oai_keyset(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id") > 100)
        .orderBy(F.asc("doc_id"))
        .limit(14)
        .select("doc_id", "source")
    )


def _feed_recent(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(250)
        .select("event_id", "ts", "event_type")
    )


def _total_saturating(spark, sf_dir):
    """hits.total parity: exact count saturating at 10k with eq/gte relation
    (trovesearch_denorm.py:553-560, page_cursor.py:15-16)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.least(F.count("*"), F.lit(10000)).alias("total"),
        F.when(F.count("*") > 10000, F.lit("gte")).otherwise(F.lit("eq")).alias(
            "relation"
        ),
    )


def _running_value_sum(spark, sf_dir):
    """Windowed running aggregate per user over the event stream."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.withColumn("running_value", F.round(F.sum("value").over(w), 4))
        .filter(F.col("user_id") < 20)
        .select("user_id", "event_id", "running_value")
    )


def _latest_event_per_user(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts")
    )


# ------------------------------------------------------------- dedup suite

def _dedup_fingerprint(spark, sf_dir):
    return textops.with_fingerprint(_t(spark, sf_dir, "documents")).select(
        "doc_id", "fingerprint"
    )


def _dedup_jaccard(spark, sf_dir):
    return textops.jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=0.8, n=3
    )


def _dedup_minhash(spark, sf_dir):
    return textops.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), n_perm=16, band_size=4
    )


def _dedup_simhash(spark, sf_dir):
    return textops.simhash(_t(spark, sf_dir, "documents"), bits=32)


def _text_quality(spark, sf_dir):
    out = textops.text_quality(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_token_len",
        "stopword_ratio",
    )


def _langid(spark, sf_dir):
    return textops.langid(_t(spark, sf_dir, "documents")).select(
        "doc_id", "lang_pred"
    )


def _token_counts(spark, sf_dir):
    out = textops.token_counts(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        F.col("n_tokens_ws").cast("long").alias("n_tokens_ws"),
        F.col("n_tokens_bpe").cast("long").alias("n_tokens_bpe"),
    )


# ------------------------------------------------------------- similarity

def _query_vec(spark, sf_dir) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0).first()
    )
    return [float(x) for x in row["embedding"]]


def _knn_bruteforce(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.knn_bruteforce(emb, _query_vec(spark, sf_dir), k=10)


def _knn_lsh_buckets(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.lsh_signature(emb, n_planes=4).select("vec_id", "lsh_bucket")


def _knn_lsh(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.knn_lsh(emb, _query_vec(spark, sf_dir), k=10, n_planes=4)


# ------------------------------------------------------- scalar / misc ops

def _iri_normalize(spark, sf_dir):
    from .iri import suffuniq_col

    docs = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example/d/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 13 == 0, F.lit("/")).otherwise(F.lit("")),
    )
    return docs.select("doc_id", suffuniq_col(url).alias("suffuniq_iri"))


def _binary_meta(spark, sf_dir):
    """Multimodal plumbing surrogate: opaque binary payload -> size + digest."""
    docs = _t(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


QUERIES = {
    # full-text plane (SURVEY.md §2.8, §2.5)
    "ft_bm25_topk": _inline_bm25,
    "ft_bm25_wand": _wand_bm25,
    "ft_and_terms": _ft_and,
    "ft_or_any": _ft_or,
    "ft_not": _ft_not,
    "ft_phrase": _ft_phrase,
    "term_stats_top": _term_stats_top,
    "corpus_stats": _corpus_stats,
    # filters / aggs / sorts / paging (SURVEY.md §2.2, §2.4, §2.6)
    "filter_anyof_lang": _filter_anyof_lang,
    "filter_noneof_source": _filter_noneof_source,
    "date_at_year": _date_at_year,
    "date_histogram_years": _date_histogram_years,
    "valuesearch_terms": _valuesearch_terms,
    "related_props": _related_props,
    "sort_int_page": _sort_int_page,
    "paging_offset": _paging_offset,
    "oai_keyset": _oai_keyset,
    "feed_recent": _feed_recent,
    "latest_event_per_user": _latest_event_per_user,
    "total_saturating": _total_saturating,
    "running_value_sum": _running_value_sum,
    # dedup / text pipeline
    "dedup_fingerprint": _dedup_fingerprint,
    "dedup_jaccard3": _dedup_jaccard,
    "dedup_minhash_lsh": _dedup_minhash,
    "dedup_simhash": _dedup_simhash,
    "text_quality": _text_quality,
    "langid": _langid,
    "token_counts": _token_counts,
    # similarity
    "knn_bruteforce": _knn_bruteforce,
    "knn_lsh_buckets": _knn_lsh_buckets,
    "knn_lsh": _knn_lsh,
    # scalar / misc
    "iri_normalize": _iri_normalize,
    "binary_meta": _binary_meta,
}


def _minhash_oracle() -> str:
    return """
WITH toks AS (
  SELECT DISTINCT doc_id, t AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
),
sigs AS (
  SELECT doc_id, p.perm, min(md5(term || '#' || p.perm)) AS mh
  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS perm) p
  GROUP BY doc_id, p.perm
),
bands AS (
  SELECT doc_id, perm // 4 AS band,
         string_agg(mh, ',' ORDER BY perm) AS band_key
  FROM sigs GROUP BY doc_id, perm // 4
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
"""


def _simhash_oracle() -> str:
    return """
WITH toks AS (
  SELECT DISTINCT doc_id, t AS term
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
  WHERE t <> ''
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(term), 1, 15))::BIGINT AS th FROM toks
),
bitsum AS (
  SELECT doc_id, b.bit,
         sum(CASE WHEN (th >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS bit) b
  GROUP BY doc_id, b.bit
)
SELECT doc_id,
       CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT)
         AS simhash
FROM bitsum GROUP BY doc_id
"""


def _jaccard3_oracle() -> str:
    return """
WITH arr AS (
  SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(toks[i.i : i.i + 2], ' ') AS g
  FROM arr CROSS JOIN
       (SELECT unnest(generate_series(1, 4096)) AS i) i
  WHERE i.i + 2 <= len(toks)
),
sizes AS (SELECT doc_id, count(*) AS s FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(i * 1.0 / (sa.s + sb.s - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON inter.doc_a = sa.doc_id
JOIN sizes sb ON inter.doc_b = sb.doc_id
WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.8
"""


def _knn_oracle(page_query: str) -> str:
    return f"""
WITH q AS (
  SELECT generate_subscripts(embedding, 1) AS i, unnest(embedding)::DOUBLE AS v
  FROM embeddings WHERE vec_id = 0
),
e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
dots AS (
  SELECT e.vec_id,
         sum(e.v * q.v) AS dot,
         sqrt(sum(e.v * e.v)) AS ne
  FROM e JOIN q USING (i) GROUP BY e.vec_id
),
qn AS (SELECT sqrt(sum(v * v)) AS nq FROM q)
SELECT vec_id, round(dot / (ne * nq), 6) AS cos
FROM dots CROSS JOIN qn
{page_query}
"""


def _lsh_bucket_oracle(n_planes: int = 4) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
proj AS (
  SELECT vec_id, p.p,
         sum(v * CASE WHEN ('0x' || substr(md5('p' || p.p || '#' || (i - 1)), 1, 1))::INT % 2 = 0
                      THEN 1.0 ELSE -1.0 END) AS s
  FROM e CROSS JOIN (SELECT unnest(generate_series(0, {n_planes - 1})) AS p) p
  GROUP BY vec_id, p.p
)
SELECT vec_id,
       CAST(sum(CASE WHEN s >= 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS BIGINT)
         AS lsh_bucket
FROM proj GROUP BY vec_id
"""


ORACLES = {
    "ft_bm25_topk": _BM25_ORACLE,
    "ft_bm25_wand": _BM25_ORACLE,
    "ft_and_terms": (
        "SELECT doc_id FROM documents WHERE "
        "list_contains(string_split(text,' '),'window') AND "
        "list_contains(string_split(text,' '),'merge')"
    ),
    "ft_or_any": (
        "SELECT doc_id FROM documents WHERE "
        "list_contains(string_split(text,' '),'spark') OR "
        "list_contains(string_split(text,' '),'slow')"
    ),
    "ft_not": (
        "SELECT doc_id FROM documents WHERE "
        "list_contains(string_split(text,' '),'spark') AND NOT "
        "list_contains(string_split(text,' '),'slow')"
    ),
    "ft_phrase": (
        "SELECT doc_id FROM documents WHERE "
        "(' ' || text || ' ') LIKE '% group query %'"
    ),
    "term_stats_top": """
        SELECT term, count(DISTINCT doc_id) AS df
        FROM (SELECT doc_id, unnest(string_split(text,' ')) AS term
              FROM documents)
        WHERE term <> '' GROUP BY term
        ORDER BY df DESC, term LIMIT 30
    """,
    "corpus_stats": """
        SELECT count(*) AS n_docs,
               round(avg(dl), 4) AS avgdl,
               CAST(sum(dl) AS BIGINT) AS total_tokens
        FROM (SELECT len(list_filter(string_split(text,' '), t -> t <> ''))
                AS dl FROM documents)
    """,
    "filter_anyof_lang":
        "SELECT doc_id, lang FROM documents WHERE lang IN ('en','de')",
    "filter_noneof_source":
        "SELECT doc_id, source FROM documents WHERE source NOT IN ('src0','src1')",
    "date_at_year": """
        SELECT CAST(month(o_orderdate) AS BIGINT) AS month,
               count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
        GROUP BY month
    """,
    "date_histogram_years": """
        SELECT CAST(year(o_orderdate) AS BIGINT) AS year, count(*) AS match_count
        FROM orders GROUP BY year ORDER BY year DESC
    """,
    "valuesearch_terms": """
        SELECT event_type, count(DISTINCT user_id) AS match_count
        FROM events GROUP BY event_type
        ORDER BY match_count DESC, event_type LIMIT 14
    """,
    "related_props": """
        SELECT source, count(DISTINCT doc_id) AS usage_count
        FROM documents GROUP BY source
        ORDER BY usage_count DESC, source
    """,
    "sort_int_page": """
        SELECT doc_id, coalesce(n_chars, 0) AS n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT 13
    """,
    "paging_offset": """
        SELECT doc_id, n_chars, rank FROM (
          SELECT doc_id, coalesce(n_chars, 0) AS n_chars,
                 row_number() OVER (ORDER BY coalesce(n_chars,0) DESC, doc_id)
                   AS rank
          FROM documents
        ) WHERE rank > 26 AND rank <= 39
    """,
    "oai_keyset": """
        SELECT doc_id, source FROM documents WHERE doc_id > 100
        ORDER BY doc_id LIMIT 14
    """,
    "feed_recent": """
        SELECT event_id, ts, event_type FROM events
        ORDER BY ts DESC, event_id LIMIT 250
    """,
    "latest_event_per_user": """
        SELECT user_id, event_id, ts FROM (
          SELECT user_id, event_id, ts,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id) AS rn
          FROM events
        ) WHERE rn = 1
    """,
    "total_saturating": """
        SELECT least(count(*), 10000) AS total,
               CASE WHEN count(*) > 10000 THEN 'gte' ELSE 'eq' END AS relation
        FROM lineitem
    """,
    "running_value_sum": """
        SELECT user_id, event_id,
               round(sum(value) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                 AS running_value
        FROM events WHERE user_id < 20
    """,
    "dedup_fingerprint":
        "SELECT doc_id, md5(text) AS fingerprint FROM documents",
    "dedup_jaccard3": _jaccard3_oracle(),
    "dedup_minhash_lsh": _minhash_oracle(),
    "dedup_simhash": _simhash_oracle(),
    "text_quality": """
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               round(list_sum(list_transform(toks, t -> length(t))) * 1.0
                     / greatest(len(toks), 1), 4) AS mean_token_len,
               round(len(list_filter(toks, t -> t IN
                     ('the','and','of','to','in','is','that','for','with','was')))
                     * 1.0 / greatest(len(toks), 1), 4) AS stopword_ratio
        FROM (SELECT doc_id,
                     list_filter(string_split(text,' '), t -> t <> '') AS toks
              FROM documents)
    """,
    "langid": """
        SELECT doc_id,
          CASE
            WHEN en >= greatest(de, fr, es, 1) THEN 'en'
            WHEN de >= greatest(fr, es, 1) THEN 'de'
            WHEN fr >= greatest(es, 1) THEN 'fr'
            WHEN es >= 1 THEN 'es'
            ELSE 'und'
          END AS lang_pred
        FROM (
          SELECT doc_id,
            len(list_filter(toks, t -> t IN ('the','and','of','to','in','is','that','for','with','was'))) AS en,
            len(list_filter(toks, t -> t IN ('der','die','das','und','ist','nicht','mit','ein','von','zu'))) AS de,
            len(list_filter(toks, t -> t IN ('le','la','les','et','est','pas','pour','dans','une','que'))) AS fr,
            len(list_filter(toks, t -> t IN ('el','los','las','es','no','por','para','una','con','del'))) AS es
          FROM (SELECT doc_id, string_split(text,' ') AS toks FROM documents)
        )
    """,
    "token_counts": """
        SELECT doc_id,
               CAST(len(list_filter(string_split(text,' '), t -> t <> ''))
                 AS BIGINT) AS n_tokens_ws,
               CAST(len(list_filter(
                 string_split(regexp_replace(text, '([^a-zA-Z0-9_\\s])',
                                             ' \\1 ', 'g'), ' '),
                 t -> t <> '')) AS BIGINT) AS n_tokens_bpe
        FROM documents
    """,
    "knn_bruteforce": _knn_oracle("ORDER BY cos DESC, vec_id LIMIT 10"),
    "knn_lsh_buckets": _lsh_bucket_oracle(4),
    "iri_normalize": """
        SELECT doc_id,
          CASE WHEN u LIKE '%/' THEN substr(nrm, 1, length(nrm) - 1) ELSE nrm
          END AS suffuniq_iri
        FROM (
          SELECT doc_id, u,
                 regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://', '://') AS nrm
          FROM (
            SELECT doc_id,
                   'https://' || source || '.example/d/' || doc_id ||
                   (CASE WHEN doc_id % 13 = 0 THEN '/' ELSE '' END) AS u
            FROM documents
          )
        )
    """,
    "binary_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha256
        FROM documents
    """,
    # knn_lsh intentionally has no oracle: multiprobe candidate pruning is an
    # approximate, non-SQL-expressible traversal; the driver records the
    # rows-only check and tests/test_similarity.py covers recall.
}


def clear_index_cache() -> None:
    for d in _INDEX_CACHE.values():
        shutil.rmtree(d, ignore_errors=True)
    _INDEX_CACHE.clear()
