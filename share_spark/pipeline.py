"""End-to-end training-corpus pipeline: the composition every web-scale
LLM data run executes, built entirely from this repo's operators.

    raw pages ──> url dedup ──> quality gate ──> language filter
        ──> exact dedup ──> MinHash-LSH near-dedup ──> embedding near-dedup
        ──> repetition gate ──> eval-set decontamination ──> PII scrub
        ──> deterministic source sampling ──> sequence packing

Each stage is one of the already-tested operators (urltools, textops,
graph); this module contributes the COMPOSITION — correct ordering (cheap
row-local gates before shuffle-heavy dedup; dedup before decontamination
so grams are computed once per surviving doc), the keep/drop bookkeeping,
and a per-stage audit trail.

Scale notes: the whole pipeline is lazily composed — one Spark job graph,
no intermediate materialization unless `audit=True` (which counts each
stage and is explicitly an audit mode: counts are actions). Stage order
puts O(row) filters (quality, language, repetition) before the shuffling
stages (minhash, packing) so the expensive operators see the smallest
corpus. Nothing corpus-sized reaches the driver.

Deterministic sampling: keep a doc when
    (xxhash64(doc_id, seed) mod 1_000_000) / 1e6 < rate(source)
— reproducible across runs and cluster sizes (pure function of doc_id),
no RNG state, no sampleBy approximation drift.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import graph, similarity, textops, urltools


@dataclass(frozen=True)
class PipelineConfig:
    lang: str | None = "en"          # langid gate (None = keep all)
    min_tokens: int = 10             # quality gate floor (THE floor —
                                     # not ANDed with a hidden default)
    min_mean_token_len: float = 2.0  # quality gate mean-length band
    max_mean_token_len: float = 12.0
    max_dup_line_frac: float = 0.3   # Gopher A1.1 repetition gates
    max_top_bigram_frac: float = 0.2
    jaccard_threshold: float = 0.5   # near-dup verify bar
    # shingle length for BOTH the MinHash signature space and the exact
    # verify (one Jaccard space end-to-end); 1 = unigram sets, 3-5 = the
    # word-shingle space real web dedup uses — at corpus scale unigram
    # signatures collide superlinearly (see minhash_signatures_wide)
    jaccard_ngram: int = 3
    minhash_perm: int = 16
    minhash_band: int = 4
    decontaminate_n: int = 8         # eval-overlap gram length
    # embedding near-dup gate (runs only when docs carry an `embedding`
    # array column): cosine threshold + hyperplane-LSH bucket count
    embedding_cos_threshold: float = 0.95
    embedding_lsh_planes: int = 8
    budget_tokens: int = 2048        # pack size
    seed: int = 7
    # source -> keep rate in [0,1]; sources absent from the map keep 1.0
    sample_rates: dict = field(default_factory=dict)


def build_training_corpus(
    docs: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    eval_texts: DataFrame | None = None,
    audit: bool = False,
) -> tuple[DataFrame, dict]:
    """Run the full hygiene pipeline over `docs` (doc_id, text, and
    optionally url / source columns — absent columns skip their stage).

    Returns (corpus, stats): `corpus` is the packed training corpus
    (doc_id, text_scrubbed, n_tokens, pack_id, pack_offset), lazily
    composed; `stats` maps stage -> surviving doc count when `audit=True`
    (empty dict otherwise — counting forces a job per stage). To emit
    physical one-row-per-pack training shards from the assignments, feed
    the result through textops.materialize_packs."""
    stats: dict = {}

    def checkpoint(name: str, df: DataFrame) -> DataFrame:
        if audit:
            stats[name] = df.count()
        return df

    cur = checkpoint("input", docs)

    # 1. url-keyed dedup (cheapest, highest-yield — crawl snapshots carry
    #    scheme/slash/tracking variants of the same page). Reuses the
    #    url_duplicates contract: NULL/empty urls have no key and pass
    #    through; only non-keeper members of a >1 group drop.
    if "url" in cur.columns:
        groups = urltools.url_duplicates(cur, "url")
        losers = (
            urltools.canonicalize_urls(cur, "url")
            .join(groups, "url_canonical")
            .filter(F.col("doc_id") != F.col("keep_doc_id"))
            .select("doc_id")
        )
        cur = checkpoint("url_dedup", cur.join(losers, "doc_id", "left_anti"))

    # 2. quality gate (row-local, before anything that shuffles) — built
    #    from the raw metrics so every threshold is cfg-driven (the
    #    operator's own `keep` flag hardcodes n_tokens >= 10, which would
    #    silently override a lower cfg.min_tokens)
    q = textops.text_quality(cur).filter(
        (F.col("n_tokens") >= cfg.min_tokens)
        & F.col("mean_token_len").between(
            cfg.min_mean_token_len, cfg.max_mean_token_len
        )
    )
    cur = checkpoint(
        "quality", cur.join(q.select("doc_id"), "doc_id", "left_semi")
    )

    # 3. language filter
    if cfg.lang is not None:
        li = textops.langid(cur).filter(F.col("lang_pred") == cfg.lang)
        cur = checkpoint(
            "language", cur.join(li.select("doc_id"), "doc_id", "left_semi")
        )

    # 4. exact dedup: drop every member of a byte-identical group except
    #    its min doc_id
    groups = textops.exact_duplicates(cur)
    # no broadcast hint: on a dup-heavy crawl the group table is
    # corpus-proportional — let AQE pick the strategy
    losers = (
        textops.with_fingerprint(cur)
        .join(groups, "fingerprint")
        .filter(F.col("doc_id") != F.col("keep_doc_id"))
        .select("doc_id")
    )
    cur = checkpoint("exact_dedup", cur.join(losers, "doc_id", "left_anti"))

    # 5. near-dedup: LSH candidates -> exact Jaccard verify -> connected
    #    components -> canonical keep-list (the SURVEY-mandated scale path)
    cand = textops.minhash_lsh_pairs(
        cur, n_perm=cfg.minhash_perm, band_size=cfg.minhash_band,
        ngram=cfg.jaccard_ngram,
    )
    verified = textops.jaccard_verify(
        cur, cand, threshold=cfg.jaccard_threshold, n=cfg.jaccard_ngram
    )
    clusters = graph.connected_components(verified)
    keep = graph.canonical_docs(cur, clusters).filter(F.col("keep"))
    cur = checkpoint(
        "near_dedup", cur.join(keep.select("doc_id"), "doc_id", "left_semi")
    )

    # 5b. embedding near-dedup (the fifth modality — semantic dups that
    #     survive lexical dedup: translations, templated rewrites), when
    #     an embedding column is present: within-bucket cosine pairs ->
    #     connected components -> canonical keep-list, same shape as 5
    if "embedding" in cur.columns:
        epairs = similarity.all_pairs_above(
            cur.select(F.col("doc_id").alias("vec_id"), "embedding"),
            threshold=cfg.embedding_cos_threshold,
            n_planes=cfg.embedding_lsh_planes,
        ).select(
            F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
        )
        eclusters = graph.connected_components(epairs)
        ekeep = graph.canonical_docs(cur, eclusters).filter(F.col("keep"))
        cur = checkpoint(
            "embedding_dedup",
            cur.join(ekeep.select("doc_id"), "doc_id", "left_semi"),
        )

    # 6. repetition gate (Gopher A1.1)
    rep = textops.repetition_metrics(cur).filter(
        (F.col("dup_line_frac") <= cfg.max_dup_line_frac)
        & (F.col("top_bigram_frac") <= cfg.max_top_bigram_frac)
    )
    cur = checkpoint(
        "repetition", cur.join(rep.select("doc_id"), "doc_id", "left_semi")
    )

    # 7. eval-set decontamination (normalized gramming; broadcast overlap)
    if eval_texts is not None:
        flags = textops.decontaminate(
            cur, eval_texts, n=cfg.decontaminate_n, normalize=True
        ).filter(~F.col("contaminated"))
        cur = checkpoint(
            "decontaminate",
            cur.join(flags.select("doc_id"), "doc_id", "left_semi"),
        )

    # 8. deterministic source sampling (reproducible down-weighting)
    if cfg.sample_rates and "source" in cur.columns:
        expr = None
        for src, r in sorted(cfg.sample_rates.items()):
            cond = F.col("source") == src
            expr = (F.when(cond, F.lit(float(r))) if expr is None
                    else expr.when(cond, F.lit(float(r))))
        rate = expr.otherwise(F.lit(1.0))
        u = (F.pmod(F.xxhash64(F.col("doc_id"), F.lit(cfg.seed)), F.lit(1_000_000))
             .cast("double") / 1e6)
        cur = checkpoint("sample", cur.filter(u < rate))

    # 9. PII scrub (pure map over the survivors)
    scrubbed = textops.scrub_pii(cur)

    # 10. sequence packing on the scrubbed text
    packed = textops.pack_documents(
        scrubbed.select("doc_id", F.col("text_scrubbed").alias("text")),
        budget_tokens=cfg.budget_tokens,
    )
    corpus = (
        scrubbed.select("doc_id", "text_scrubbed")
        .join(packed, "doc_id")
    )
    checkpoint("output", corpus)
    return corpus, stats
