"""Training-data pipeline text operators over a documents table.

These are the large-scale corpus-hygiene operators a 100 TB web-text
pipeline needs on top of the search engine: deduplication (exact, MinHash-
LSH, SimHash, n-gram Jaccard), language ID, quality scoring, token counting,
fingerprinting.

Design rules:
- JVM-side built-ins only in the hot path (md5, split, explode, groupBy,
  higher-order array functions) — whole-stage codegen, no Python UDFs.
- Hash functions are md5-hex based so results are engine-portable and
  oracle-checkable (DuckDB computes identical signatures).
- Pair-producing operators emit (doc_a < doc_b) canonical pairs.

Scale notes per operator are in each docstring.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker token sets for the n-gram/stopword language-ID heuristic.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"),
    "fr": ("le", "la", "les", "et", "est", "pas", "pour", "dans", "une", "que"),
    "es": ("el", "los", "las", "es", "no", "por", "para", "una", "con", "del"),
}

EN_STOPWORDS_SMALL = LANG_MARKERS["en"]


def _tokens_col(text_col: str = "text") -> Column:
    """Whitespace tokens (documents tables ship pre-normalized text; for raw
    html/text go through extract + analysis first)."""
    return F.split(F.col(text_col), r"\s+")


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dup fingerprint: md5 of the text. At scale, groupBy(fingerprint)
    is skew-free (hash keys uniform) and map-side combined."""
    return docs.withColumn("fingerprint", F.md5(F.col(text_col)))


def exact_duplicates(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (fingerprint, group_size, doc_ids).
    Keep-first dedup = min(doc_id) per group."""
    return (
        with_fingerprint(docs, text_col)
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("group_size"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("group_size") > 1)
    )


def token_set(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token) distinct rows — the explode feeding set-based ops."""
    return (
        docs.select("doc_id", F.explode(F.array_distinct(_tokens_col(text_col))).alias("token"))
        .filter(F.col("token") != "")
    )


def ngram_rows(docs: DataFrame, n: int, text_col: str = "text") -> DataFrame:
    """(doc_id, ngram) distinct word-shingles of length n, built with
    higher-order array functions (JVM-side, no UDF).

    Per-gram cost must be O(n), NOT O(len): the token array is
    materialized ONCE per row (a projection, so gram construction reads a
    bound attribute) and each gram reads n elements via constant-time
    element_at. The earlier form both sliced O(len) per gram AND inlined
    the filter(split(text)) expression into the lambda — Catalyst
    re-evaluates inlined subexpressions per element access, so a single
    50k-token page (real crawls have them) hung the shingle stages for
    minutes at O(len^2) and worse."""
    base = docs.select(
        "doc_id",
        F.filter(_tokens_col(text_col), lambda t: t != F.lit("")).alias(
            "_toks"
        ),
    )
    toks = F.col("_toks")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k + 1) for k in range(n)]
        ),
    )
    grams = F.when(F.size(toks) >= n, grams).otherwise(F.array())
    return base.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("ngram")
    )


def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs >= threshold.

    Shape: token self-join -> intersection counts -> |A u B| = |A|+|B|-|int|.
    This is the quadratic *exact* oracle — at 100 TB use minhash_lsh_pairs
    (candidate generation) and verify candidates with this on the tiny
    candidate set. The join key is the token: head tokens are skewed, so for
    the standalone exact version prefilter ultra-common tokens upstream or
    rely on AQE skew-join splitting; the LSH path avoids the issue entirely.
    """
    rows = token_set(docs, text_col) if n == 1 else ngram_rows(docs, n, text_col)
    rows = rows.withColumnRenamed("ngram", "token") if n > 1 else rows
    sizes = rows.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    a = rows.alias("a")
    b = rows.alias("b")
    inter = (
        a.join(b, (F.col("a.token") == F.col("b.token")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def jaccard_verify(
    docs: DataFrame,
    pairs: DataFrame,
    threshold: float = 0.5,
    n: int = 1,
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard restricted to CANDIDATE pairs (doc_a, doc_b) —
    the verify stage of the scale-safe dedup plan (LSH candidates -> exact
    verify). Shingles are computed only for docs appearing in a pair
    (semi-join pushdown); the join fans out |pairs| x grams-per-doc, never
    the corpus-quadratic token self-join of jaccard_pairs."""
    cand_docs = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sub = docs.join(cand_docs, "doc_id", "left_semi")
    rows = token_set(sub, text_col) if n == 1 else ngram_rows(sub, n, text_col)
    if n > 1:
        rows = rows.withColumnRenamed("ngram", "token")
    sizes = rows.groupBy("doc_id").agg(F.count("*").alias("set_size"))
    ga = rows.select(F.col("doc_id").alias("doc_a"), "token")
    gb = rows.select(
        F.col("doc_id").alias("_doc_b2"), F.col("token").alias("_token_b")
    )
    inter = (
        pairs.select("doc_a", "doc_b")
        .join(ga, "doc_a")
        .join(
            gb,
            (F.col("doc_b") == F.col("_doc_b2"))
            & (F.col("token") == F.col("_token_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _perm_hash_col(
    p: int, token_col: str = "token", hash_fn: str = "md5"
) -> Column:
    """Permutation p's int64 hash of a token.

    'md5': first 15 hex digits of md5(token || '#' || p) as an integer —
    engine-portable (DuckDB: ('0x' || substr(md5(...), 1, 15))::BIGINT), the
    oracle-pinned form. 'xxhash64': one JVM hash op per token (no hex
    round-trip) — ~same collision behavior, not SQL-oracle-reproducible; the
    fast path for production-size corpora."""
    if hash_fn == "xxhash64":
        return F.xxhash64(F.col(token_col), F.lit(p))
    return F.conv(
        F.substring(
            F.md5(F.concat(F.col(token_col), F.lit(f"#{p}"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def _md5_sig_partials(n_perm: int):
    """mapInArrow kernel: (doc_id, token) batches -> per-batch-partial
    (doc_id, mh0..mh{n-1}) minima, md5-hash form.

    Bit-identical to the JVM expression chain
    conv(substring(md5(concat(token, '#p')), 1, 15), 16, 10)::long —
    int(md5(tok + b'#p').hexdigest()[:15], 16) is the same 60-bit value —
    but each DISTINCT token in a batch is hashed once (dictionary-encode,
    then an n_perm-wide gather): with a Zipf vocabulary that removes
    ~97% of the md5 calls (guide §4.2; measured 1.6 s -> 0.5 s at 116k
    token rows / 31-token vocab). Per-doc mins are folded per batch in C
    (pandas groupby), so rows crossing back are n_docs-per-batch, not
    n_tokens."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    cols = [f"mh{p}" for p in range(n_perm)]
    schema = pa.schema(
        [pa.field("doc_id", pa.int64())] + [pa.field(c, pa.int64()) for c in cols]
    )
    suffixes = [f"#{p}".encode() for p in range(n_perm)]

    def fn(batches):
        import pandas as pd

        for batch in batches:
            if batch.num_rows == 0:
                continue
            enc = batch.column("token").dictionary_encode()
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            uniq = enc.dictionary.to_pylist()
            hashes = np.empty((len(uniq), n_perm), dtype=np.int64)
            for j, tok in enumerate(uniq):
                tb = tok.encode("utf-8")
                for p, suf in enumerate(suffixes):
                    hashes[j, p] = int(
                        hashlib.md5(tb + suf).hexdigest()[:15], 16
                    )
            codes = enc.indices.to_numpy(zero_copy_only=False)
            pdf = pd.DataFrame(hashes[codes], columns=cols, copy=False)
            pdf["doc_id"] = batch.column("doc_id").to_numpy(
                zero_copy_only=False
            )
            part = pdf.groupby("doc_id", sort=False).min().reset_index()
            yield pa.RecordBatch.from_pandas(
                part[["doc_id"] + cols], schema=schema, preserve_index=False
            )

    return fn


def minhash_signatures_wide(
    docs: DataFrame, n_perm: int = 16, text_col: str = "text",
    hash_fn: str = "md5", ngram: int = 1,
) -> DataFrame:
    """(doc_id, mh0..mh{n-1}): all permutation minima as COLUMNS of one
    aggregation — no (token x n_perm) row explode.

    `ngram` sets the SHINGLE length the signature sketches (the Jaccard
    space): 1 = unigram token sets, 3-5 = the word-shingle space real
    web-dedup runs use. This matters at scale: with a Zipf vocabulary,
    unigram sets of unrelated documents overlap heavily, so their
    signatures collide and LSH candidate volume grows superlinearly in
    corpus size (measured: 2.8M candidate pairs at 200k docs -> OOM at 2M
    under the default 16/4 banding); shingles make unrelated docs nearly
    disjoint and collapse candidates to true near-dups.

    Scale shape: the old layout shuffled n_tokens * n_perm rows; this one
    computes the n_perm hashes per token row BEFORE the shuffle and
    min-aggregates them in a single groupBy(doc_id) whose partial aggregation
    collapses each task's rows to one row per doc — shuffle bytes are
    n_docs * n_perm * 8, independent of document length.

    Hashing placement by hash_fn: 'xxhash64' is one native JVM op per
    token and stays a codegen expression; the 'md5' (oracle-pinned) form's
    md5+conv chain is ~20x slower per call, so it runs in an Arrow batch
    kernel that hashes each batch-distinct token ONCE and folds per-doc
    minima in C before the shuffle (see _md5_sig_partials — values are
    bit-identical to the expression form, pinned by
    tests/test_textops.py::test_md5_signature_kernel_matches_expressions).
    """
    if ngram == 1:
        toks = token_set(docs, text_col)
    else:
        toks = ngram_rows(docs, ngram, text_col).withColumnRenamed(
            "ngram", "token"
        )
    if hash_fn == "md5":
        mh_schema = ", ".join(
            ["doc_id long"] + [f"mh{p} long" for p in range(n_perm)]
        )
        partials = toks.select("doc_id", "token").mapInArrow(
            _md5_sig_partials(n_perm), schema=mh_schema
        )
        return partials.groupBy("doc_id").agg(
            *[F.min(f"mh{p}").alias(f"mh{p}") for p in range(n_perm)]
        )
    return toks.groupBy("doc_id").agg(
        *[
            F.min(_perm_hash_col(p, hash_fn=hash_fn)).alias(f"mh{p}")
            for p in range(n_perm)
        ]
    )


def minhash_signatures(
    docs: DataFrame, n_perm: int = 16, text_col: str = "text"
) -> DataFrame:
    """(doc_id, perm, minhash) long form — thin unpivot over the wide
    aggregation (kept for API compat; the pair pipeline uses the wide form).
    """
    wide = minhash_signatures_wide(docs, n_perm, text_col)
    pairs = ", ".join(f"{p}, mh{p}" for p in range(n_perm))
    return wide.selectExpr(
        "doc_id", f"stack({n_perm}, {pairs}) AS (perm, minhash)"
    )


def minhash_band_rows(
    docs: DataFrame,
    n_perm: int = 16,
    band_size: int = 4,
    text_col: str = "text",
    hash_fn: str = "md5",
    ngram: int = 1,
) -> DataFrame:
    """(doc_id, band, band_key) LSH band rows — the bucketing half of the
    MinHash dedup plan, exposed separately so incremental pipelines can
    persist band keys and anti-join new batches against history
    (streaming/corpus.py) instead of re-pairing the full corpus."""
    sig = minhash_signatures_wide(
        docs, n_perm, text_col, hash_fn=hash_fn, ngram=ngram
    )
    n_bands = n_perm // band_size
    band_keys = F.array(
        *[
            F.concat_ws(
                ",",
                *[
                    F.col(f"mh{b * band_size + i}").cast("string")
                    for i in range(band_size)
                ],
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(
        "doc_id", F.posexplode(band_keys).alias("band", "band_key")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_perm: int = 16,
    band_size: int = 4,
    text_col: str = "text",
    hash_fn: str = "md5",
    ngram: int = 1,
    materialize: bool = True,
    broadcast_threshold: int = 1_000_000,
) -> DataFrame:
    """MinHash + LSH candidate pairs: band the signature, bucket-join.

    shingle -> minhash -> band -> bucket-join (SURVEY-mandated scale path):
    the self-join is on (band, band_key) — collision buckets are tiny, so the
    quadratic blowup of jaccard_pairs never happens. Verify candidates with
    exact Jaccard on the candidate set (jaccard_verify) when a threshold
    guarantee is needed.

    Execution shape: a DataFrame self-join recomputes its subtree for BOTH
    sides (Spark reuses the exchange only when plans canonicalize equal,
    which the banded aggregate does not), so with ``materialize=True``
    (default) the band frame — a few dozen bytes per doc, tiny relative to
    the corpus it sketches — is computed once via an eager localCheckpoint
    and respread across the cluster (checkpoints coalesce under AQE, which
    would otherwise serialize the quadratic pair generation onto one core).
    When the materialized frame is under ``broadcast_threshold`` rows the
    build side is broadcast (no join shuffle, and bucket skew spreads with
    the stream side's partitioning instead of landing on one reducer);
    above it, the shuffle join with AQE skew splitting stands. At 10^9+
    docs pass ``materialize=False``: executor-memory checkpoints of a
    corpus-sized frame trade fault tolerance for speed the wrong way
    there, and the incremental path (streaming/corpus.py) persists band
    keys properly instead."""
    banded = minhash_band_rows(
        docs, n_perm, band_size, text_col, hash_fn=hash_fn, ngram=ngram
    )
    build = None
    if materialize:
        spark = docs.sparkSession
        banded = banded.repartition(
            spark.sparkContext.defaultParallelism
        ).localCheckpoint()
        if banded.count() <= broadcast_threshold:
            build = F.broadcast(banded.alias("b"))
    a = banded.alias("a")
    b = build if build is not None else banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


def simhash(docs: DataFrame, bits: int = 32, text_col: str = "text") -> DataFrame:
    """SimHash fingerprint: bit j is the sign of sum over distinct tokens of
    (+1 if bit j of md5-derived token hash set else -1).

    Uses the top `bits` bits of a 60-bit integer from the md5 hex prefix
    (conv is hex->decimal). Near-dups then differ in few bits (hamming).

    The bit explode multiplies rows by `bits` — fine map-side, no shuffle
    until the final per-doc groupBy. (A wide-aggregation variant — one
    groupBy(doc_id) with `bits` conditional sums, the MinHash-signature
    trick — was A/B'd this round and measured ~2x SLOWER at 5k docs
    (0.9 s vs 0.4 s warm): 32 sum(when(shiftright...)) buffers per group
    codegen worse than the cheap explode + two skew-free aggregations.
    Kept the explode form; re-evaluate if bits grows past 52.)"""
    if not 1 <= bits <= 52:
        # the fingerprint is reassembled via pow(2.0, bit), exact only
        # while 2^bit fits a double's 52-bit mantissa — reject silently
        # lossy configurations instead of producing corrupt fingerprints
        raise ValueError(f"simhash bits must be in [1, 52], got {bits}")
    toks = token_set(docs, text_col).withColumn(
        "th", F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("long")
    )
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    contrib = (
        toks.select("doc_id", "th", bit)
        .withColumn(
            "w",
            F.when(F.expr("shiftright(th, bit) & 1") == 1, 1).otherwise(-1),
        )
        .groupBy("doc_id", "bit")
        .agg(F.sum("w").alias("s"))
        .withColumn("bitval", F.when(F.col("s") > 0, F.lit(1)).otherwise(F.lit(0)))
    )
    return contrib.groupBy("doc_id").agg(
        F.sum(
            F.col("bitval").cast("long") * F.pow(F.lit(2.0), F.col("bit")).cast("long")
        ).alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame,
    bits: int = 32,
    max_hamming: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance. Scale path: block on
    bit-bands of the fingerprint (pigeonhole: distance <= k implies an exact
    match on one of k+1 bands), join per band.

    ``materialize=True`` computes the per-doc fingerprint once (eager
    localCheckpoint, respread) instead of letting the self-join recompute
    the signature aggregation for both sides — same rationale and same
    at-scale caveat as minhash_lsh_pairs."""
    sh = simhash(docs, bits)
    if materialize:
        sh = sh.repartition(
            docs.sparkSession.sparkContext.defaultParallelism
        ).localCheckpoint()
    n_bands = max_hamming + 1
    band_bits = bits // n_bands
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(simhash, band * {band_bits}) & {(1 << band_bits) - 1}"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("ham", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("ham") <= max_hamming)
        .select("doc_a", "doc_b", "ham")
    )


def text_quality_cols(text_col: str = "text") -> dict[str, Column]:
    """The quality-gate metrics as pure column expressions (one codegen
    pass; callers compose them into a single projection — see
    queries._text_quality, which fuses quality + token counts + langid
    into one select instead of three joins)."""
    toks = F.filter(_tokens_col(text_col), lambda t: t != F.lit(""))
    n_tokens = F.size(toks)
    mean_len = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    ) / F.greatest(n_tokens.cast("double"), F.lit(1.0))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS_SMALL])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    stop_ratio = n_stop.cast("double") / F.greatest(n_tokens.cast("double"), F.lit(1.0))
    return {
        "n_tokens": n_tokens,
        "mean_token_len": F.round(mean_len, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
    }


def text_quality(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: token count, mean token length, stopword ratio, and a
    boolean keep flag — the standard web-text quality gate shape."""
    cols = text_quality_cols(text_col)
    out = docs.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )
    return out.withColumn(
        "keep",
        (F.col("n_tokens") >= 10)
        & (F.col("mean_token_len") >= 2.0)
        & (F.col("mean_token_len") <= 12.0),
    )


def langid_cols(text_col: str = "text") -> dict[str, Column]:
    """Language-ID scores + argmax prediction as column expressions."""
    toks = _tokens_col(text_col)
    scores = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array(*[F.lit(m) for m in markers])
        scores[lang] = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
    pred = F.lit("und")
    best = F.lit(0)
    for lang in ("es", "fr", "de", "en"):  # reverse priority; later wins ties
        pred = F.when(scores[lang] >= F.greatest(best, F.lit(1)), F.lit(lang)).otherwise(pred)
        best = F.greatest(best, scores[lang])
    out = {f"score_{lang}": scores[lang] for lang in LANG_MARKERS}
    out["lang_pred"] = pred
    return out


def langid(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-token language ID: score per language = count of marker tokens;
    argmax with deterministic tie order (en > de > fr > es > und)."""
    cols = langid_cols(text_col)
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )


def token_count_cols(text_col: str = "text") -> dict[str, Column]:
    """Whitespace + BPE-ish token counts as column expressions."""
    ws = F.size(F.filter(_tokens_col(text_col), lambda t: t != F.lit("")))
    bpe_ish = F.size(
        F.filter(
            F.split(F.regexp_replace(F.col(text_col), r"([^\w\s])", r" $1 "), r"\s+"),
            lambda t: t != F.lit(""),
        )
    )
    return {"n_tokens_ws": ws, "n_tokens_bpe": bpe_ish}


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish sub-token count
    (alnum runs and single punctuation marks counted separately)."""
    cols = token_count_cols(text_col)
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )


def winnow_fingerprints(
    docs: DataFrame, k: int = 8, w: int = 4, text_col: str = "text"
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003):
    hash every k-char gram, slide a w-gram window, keep each window's MIN
    hash — a position-robust fingerprint set with guaranteed detection of
    matches >= k+w-1 chars. The standard local-document fingerprint for
    plagiarism/near-dup detection at corpus scale.

    Plan shape (all JVM-side): k-grams via sequence+transform+explode (one
    map stage, no UDF), hash = md5->int64 (oracle-portable), window MIN via
    a frame-bounded window function partitioned by doc, then DISTINCT.
    Partitioning is by doc_id, so the window sort never crosses docs and the
    distinct's partial aggregation collapses map-side.

    Returns (doc_id, fp) — one row per distinct selected hash.
    """
    n_grams = F.length(F.col(text_col)) - F.lit(k - 1)
    grams = docs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n_grams, F.lit(0))),
                lambda i: F.substring(F.col(text_col), i, F.lit(k)),
            )
        ).alias("pos", "gram"),
    )
    hashed = grams.select(
        "doc_id",
        "pos",
        F.conv(F.substring(F.md5("gram"), 1, 15), 16, 10)
        .cast("long")
        .alias("gh"),
    )
    from pyspark.sql import Window

    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        hashed.withColumn("fp", F.min("gh").over(win))
        # the last w-1 window starts are partial windows; the classic
        # algorithm slides only full windows
        .withColumn("_n", F.count("gh").over(win))
        .filter(F.col("_n") == w)
        .select("doc_id", "fp")
        .distinct()
    )


def pack_documents(
    docs: DataFrame,
    budget_tokens: int = 4096,
    text_col: str = "text",
    bucket_width: int = 10_000,
) -> DataFrame:
    """Assign documents to fixed-token-budget training packs.

    The sequence-packing step of an LLM data pipeline: documents in
    deterministic doc_id order are laid end to end on a global token tape;
    a document's pack is the budget-sized tape block its FIRST token falls
    in (`pack_id = floor(start_offset / budget)`). Every pack holds >= 1
    whole documents and overflows the budget by at most one document's
    tokens (downstream token-level chunking handles the boundary doc —
    the standard approximate-packing contract).

    Scale shape — a distributed prefix sum, no global window:
      1. per-doc token counts (JVM expressions)
      2. within-BUCKET running sums (window partitioned by
         doc_id // bucket_width — bounded partitions, shuffles by bucket)
      3. bucket offsets via a running sum over the bucket-totals frame
         (one row per bucket — thousands of rows at 10^9 docs, so the
         single-partition window there is metadata-sized)
      4. broadcast-join the offsets back
    Returns (doc_id, n_tokens, pack_id, pack_offset) where pack_offset is
    the document's token start within the global tape.
    """
    from pyspark.sql import Window

    n_tok = F.size(F.filter(_tokens_col(text_col), lambda t: t != F.lit("")))
    base = docs.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        (F.col("doc_id") - F.pmod("doc_id", F.lit(bucket_width)))
        .alias("_bucket"),
    )
    in_bucket = Window.partitionBy("_bucket").orderBy("doc_id")
    local = base.withColumn(
        "_local_end", F.sum("n_tokens").over(in_bucket)
    )
    totals = local.groupBy("_bucket").agg(
        F.sum("n_tokens").alias("_bucket_total")
    )
    over_buckets = Window.orderBy("_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_bucket_offset",
        F.coalesce(F.sum("_bucket_total").over(over_buckets), F.lit(0)),
    ).select("_bucket", "_bucket_offset")
    start = (
        F.col("_bucket_offset") + F.col("_local_end") - F.col("n_tokens")
    )
    return (
        local.join(F.broadcast(offsets), "_bucket")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(start / budget_tokens).cast("long").alias("pack_id"),
            start.cast("long").alias("pack_offset"),
        )
    )


def repetition_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signals (the Gopher-style heuristics, Rae
    et al. 2021 appendix A1.1 — published method): documents dominated by
    repeated lines or a single repeated n-gram are boilerplate/spam.

    Returns (doc_id, dup_line_frac, top_bigram_frac, top_trigram_frac):
      dup_line_frac    fraction of lines that repeat an earlier line
      top_{n}gram_frac occurrences of the most frequent word {n}-gram over
                       all {n}-grams of the doc

    Scale shape: line metrics are per-row array expressions (codegen); the
    n-gram mode needs a per-(doc, gram) count — explode + two-stage
    aggregation with map-side partial counts, shuffle keyed by (doc_id,
    gram) (uniform; no skew: a gram's rows never leave its doc's key)."""
    lines = F.filter(
        F.split(F.col(text_col), r"\n"), lambda ln: ln != F.lit("")
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        F.round(
            (n_lines - F.size(F.array_distinct(lines)))
            / n_lines.cast("double"),
            4,
        ),
    ).otherwise(F.lit(0.0))
    # token array materialized ONCE per row: gram construction must read
    # a bound attribute with constant-time element_at — an inlined
    # filter(split(_t)) re-evaluates per element access and a slice copies
    # O(len) per gram, O(len^2)+ per document (hung on 50k-token pages;
    # same fix as ngram_rows)
    base = docs.select(
        "doc_id",
        F.filter(
            F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
        ).alias("_toks"),
        dup_line_frac.alias("dup_line_frac"),
    )

    def top_frac(n: int, out_col: str) -> DataFrame:
        toks = F.col("_toks")
        grams = F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + k + 1) for k in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        exploded = base.select(
            "doc_id", F.explode(grams).alias("_g")
        )
        return (
            exploded.groupBy("doc_id", "_g")
            .agg(F.count("*").alias("_c"))
            .groupBy("doc_id")
            .agg(
                F.round(
                    F.max("_c") / F.sum("_c").cast("double"), 4
                ).alias(out_col)
            )
        )

    out = (
        base.select("doc_id", "dup_line_frac")
        .join(top_frac(2, "top_bigram_frac"), "doc_id", "left")
        .join(top_frac(3, "top_trigram_frac"), "doc_id", "left")
    )
    return out.select(
        "doc_id",
        "dup_line_frac",
        F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        F.coalesce("top_trigram_frac", F.lit(0.0)).alias("top_trigram_frac"),
    )


def dedup_lines(
    docs: DataFrame,
    text_col: str = "text",
    min_occurrences: int = 2,
) -> DataFrame:
    """Cross-document line deduplication (the C4 / RefinedWeb boilerplate
    pass — published method: Raffel et al. 2020 §2.2 dedupe repeated spans
    corpus-wide; Penedo et al. 2023 §3.3 drop lines repeated across pages).
    Distinct from :func:`repetition_metrics`, which is within-document.

    Every non-empty line that occurs in the corpus `min_occurrences` or
    more times is kept ONLY at its first occurrence (smallest (doc_id,
    line_no)) and removed everywhere else.  Empty lines never participate
    and are always kept, so document structure survives.  Returns one row
    per input doc: (doc_id, text, n_lines, n_removed) with `text` the
    reassembled cleaned document.

    Scale shape (100 TB): posexplode -> groupBy(line hash) with
    min(struct(doc_id, line_no)) + count — both algebraic, so map-side
    partial aggregation absorbs boilerplate-line skew ("Home", cookie
    banners: millions of occurrences collapse to one partial per input
    partition before the shuffle).  The keeper join is hash-keyed on the
    line hash (empty lines carry a null key, so they pass the left join
    untouched); head keys on the probe side are exactly the boilerplate
    lines, which AQE skew-join splits.  Keep/drop is decided as a flag so
    ONE per-doc aggregation reassembles text AND counts lines — the text
    column is scanned twice total (keeper agg + flag join), with nothing
    corpus-sized converging anywhere.  Line identity uses xxhash64(line):
    at 2^64 a trillion-line corpus has ~3e-8 collision odds per pair of
    distinct lines; collisions only ever remove a line, never corrupt one.
    """
    if min_occurrences < 2:
        raise ValueError("min_occurrences must be >= 2 (1 would drop every line)")
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), r"\n")).alias("line_no", "_ln"),
    ).withColumn(
        "_h", F.when(F.col("_ln") != "", F.xxhash64(F.col("_ln")))
    )
    keepers = (
        lines.filter(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(
            F.min(F.struct("doc_id", "line_no")).alias("_first"),
            F.count("*").alias("_occ"),
        )
    )
    flagged = lines.join(keepers, "_h", "left").withColumn(
        "_keep",
        F.col("_h").isNull()
        | (F.col("_occ") < F.lit(min_occurrences))
        | (
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("line_no") == F.col("_first.line_no"))
        ),
    )
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.filter(
                    F.array_sort(
                        F.collect_list(F.struct("line_no", "_ln", "_keep"))
                    ),
                    lambda s: s["_keep"],
                ),
                lambda s: s["_ln"],
            ),
            "\n",
        ).alias("text"),
        F.count("*").alias("n_lines"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
    )


# ------------------------------------------------------------- PII scrubbing

#: (category, regex) applied IN ORDER — each category's count is taken on
#: the text as already scrubbed by the previous categories, so an IPv4's
#: digits can never double-count as a phone number. Patterns restrict to
#: the RE2-compatible subset (no backrefs, no lookaround) so the Java-regex
#: engine (Spark) and RE2 (DuckDB oracle) agree character-for-character.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"(\+\d{1,2}[-. ])?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
)


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """C4/RefinedWeb-style PII redaction: emails, IPv4 addresses, and
    phone numbers replaced with typed placeholders ('<EMAIL>', '<IPV4>',
    '<PHONE>'), with per-category match counts for corpus auditing.

    Returns (doc_id, n_email, n_ipv4, n_phone, text_scrubbed).

    Scale shape: a pure map — three regexp_count + regexp_replace chains,
    all JVM-side inside whole-stage codegen; no shuffle, no UDF, trivially
    partition-parallel at any corpus size."""
    cols = []
    cur = F.col(text_col)
    for name, pat in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, f"<{name.upper()}>")
    return docs.select("doc_id", *cols, cur.alias("text_scrubbed"))


# -------------------------------------------------------- decontamination

def decontaminate(
    docs: DataFrame,
    eval_texts: DataFrame,
    n: int = 8,
    text_col: str = "text",
    normalize: bool = False,
) -> DataFrame:
    """GPT-3-style eval-set decontamination: flag every document sharing
    at least one word n-gram with a held-out evaluation set (GPT-3 used
    13-grams; `n` is the knob). `eval_texts` must carry (eval_id, text).
    `normalize=True` lowercases and strips punctuation on BOTH sides
    before gramming (the GPT-3 paper's normalization — eval sets rarely
    match a crawl's casing and punctuation byte-for-byte).

    Returns (doc_id, n_contaminated_grams, contaminated) over ALL docs.

    Scale shape: document n-grams are generated map-side (higher-order
    array fns, distinct per doc); the eval-set gram table is tiny by
    nature (benchmarks are KB..MB against a 100 TB corpus) so the overlap
    join is an explicit broadcast — the corpus never shuffles, and the
    per-doc aggregation is partial-aggregated on the gram join's output,
    which is at most (docs x eval grams) hits, in practice a sliver."""
    def _norm(df: DataFrame, id_expr) -> DataFrame:
        t = F.col(text_col)
        if normalize:
            t = F.regexp_replace(F.lower(t), r"[^a-z0-9\s]", " ")
        return df.select(id_expr.alias("doc_id"), t.alias(text_col))

    # the overlap join runs on xxhash64(gram), not the gram string: the
    # corpus side explodes to n_docs x grams-per-doc rows, and 8-byte
    # keys measured ~2x faster than strings at 2M docs (same counts
    # barring a 64-bit collision — the standard at-scale tradeoff)
    doc_grams = ngram_rows(_norm(docs, F.col("doc_id")), n, text_col).select(
        "doc_id", F.xxhash64("ngram").alias("gh")
    )
    eval_grams = (
        ngram_rows(_norm(eval_texts, F.col("eval_id")), n, text_col)
        .select(F.xxhash64("ngram").alias("gh"))
        .distinct()
    )
    hits = (
        doc_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_grams"))
    )
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_contaminated_grams"), F.lit(0))
            .cast("long")
            .alias("n_contaminated_grams"),
            (F.coalesce(F.col("n_contaminated_grams"), F.lit(0)) > 0).alias(
                "contaminated"
            ),
        )
    )


def materialize_packs(
    packed: DataFrame, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Turn pack ASSIGNMENTS (pack_documents output: doc_id, n_tokens,
    pack_id, pack_offset) into physical training shards: one row per pack
    with the member texts in tape order plus boundary metadata —
    (pack_id, doc_ids, boundaries, texts, total_tokens).

    `boundaries[i]` is the token offset of doc i WITHIN the pack (first is
    0 by construction; a downstream tokenizer uses these to place document
    separators / reset attention masks).

    Scale shape: one groupBy(pack_id) whose values are whole documents —
    the only corpus-sized shuffle, keyed uniformly (pack ids are dense
    sequential), with each group bounded by the token budget + one
    boundary-straddling document. array_sort on struct(pack_offset, ...)
    keeps tape order deterministic without a window."""
    rows = packed.join(docs.select("doc_id", text_col), "doc_id")
    agg = rows.groupBy("pack_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("pack_offset", "doc_id", "n_tokens", text_col)
            )
        ).alias("_m")
    )
    first_off = F.col("_m")[0]["pack_offset"]
    return agg.select(
        "pack_id",
        F.transform(F.col("_m"), lambda m: m["doc_id"]).alias("doc_ids"),
        F.transform(
            F.col("_m"), lambda m: m["pack_offset"] - first_off
        ).alias("boundaries"),
        F.transform(F.col("_m"), lambda m: m[text_col]).alias("texts"),
        F.aggregate(
            F.col("_m"),
            F.lit(0).cast("long"),
            lambda acc, m: acc + m["n_tokens"],
        ).alias("total_tokens"),
    )
