"""End-to-end training-corpus pipeline (share_spark/pipeline.py): a
corpus with one planted violation per stage must lose exactly the right
documents at exactly the right stage, and the survivors pack correctly."""

import pandas as pd
import pytest

from share_spark.pipeline import PipelineConfig, build_training_corpus

GOOD = (
    "the data pipeline runs with clean and useful text for training "
    "models that is long enough to pass the quality gate easily today"
)
GOOD2 = (
    "another document about distributed systems and query engines with "
    "plenty of fresh vocabulary covering storage formats and shuffle plans"
)
GOOD3 = (
    "a third piece on web crawling infrastructure describing fetch "
    "politeness and parsing of markup into plain readable content"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # survivors
        (0, GOOD, "https://a.example/p0", "web"),
        (1, GOOD2, "https://a.example/p1", "web"),
        # url variant of doc 0 -> dropped at url_dedup
        (2, GOOD + " shared page body", "HTTP://www.a.example/p0/", "web"),
        # too short -> quality
        (3, "tiny text", "https://a.example/p3", "web"),
        # german markers -> language
        (4, "der hund ist nicht klein und das ist gut because der und das "
            "ist von zu mit ein nicht der die das und ist", "https://a.example/p4", "web"),
        # byte-identical to doc 0 -> exact_dedup (distinct url)
        (5, GOOD, "https://a.example/p5", "web"),
        # near-dup of doc 0 (one word changed) -> near_dedup
        (6, GOOD.replace("clean", "shiny"), "https://a.example/p6", "web"),
        # one bigram repeated everywhere -> repetition
        (7, "the spam ham " * 40, "https://a.example/p7", "web"),
        # contains the eval 8-gram -> decontaminate
        (8, GOOD3 + " held out benchmark answer key row nine extra",
         "https://a.example/p8", "web"),
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "url", "source"])
    )


@pytest.fixture(scope="module")
def evals(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            [(100, "the held out benchmark answer key row nine extra words")],
            columns=["eval_id", "text"],
        )
    )


def test_each_stage_drops_its_doc(spark, corpus, evals):
    cfg = PipelineConfig(budget_tokens=30)
    out, stats = build_training_corpus(
        corpus, cfg, eval_texts=evals, audit=True
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert set(rows) == {0, 1}
    assert stats["input"] == 9
    assert stats["url_dedup"] == 8        # doc 2 out
    assert stats["quality"] == 7          # doc 3 out
    assert stats["language"] == 6         # doc 4 out
    assert stats["exact_dedup"] == 5      # doc 5 out
    assert stats["near_dedup"] == 4       # doc 6 out
    assert stats["repetition"] == 3       # doc 7 out
    assert stats["decontaminate"] == 2    # doc 8 out
    assert stats["output"] == 2
    # packing: two ~23-token docs under a 30-token budget -> doc 0 starts
    # pack 0, doc 1 starts inside... compute from n_tokens
    n0 = rows[0]["n_tokens"]
    assert rows[0]["pack_id"] == 0 and rows[0]["pack_offset"] == 0
    assert rows[1]["pack_offset"] == n0
    assert rows[1]["pack_id"] == n0 // 30


def test_sampling_is_deterministic(spark, corpus):
    cfg = PipelineConfig(
        lang=None, min_tokens=1, max_dup_line_frac=1.0,
        max_top_bigram_frac=1.0, sample_rates={"web": 0.5}, seed=7,
    )
    out1, _ = build_training_corpus(corpus, cfg)
    out2, _ = build_training_corpus(corpus, cfg)
    ids1 = sorted(r["doc_id"] for r in out1.collect())
    ids2 = sorted(r["doc_id"] for r in out2.collect())
    assert ids1 == ids2  # pure function of (doc_id, seed)
    # a different seed reshuffles membership
    out3, _ = build_training_corpus(
        corpus,
        PipelineConfig(
            lang=None, min_tokens=1, max_dup_line_frac=1.0,
            max_top_bigram_frac=1.0, sample_rates={"web": 0.5}, seed=8,
        ),
    )
    ids3 = sorted(r["doc_id"] for r in out3.collect())
    assert ids1 != ids3 or len(ids1) == 0


def test_pii_scrubbed_in_output(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            [(0, GOOD + " contact admin@example.com for details and more "
              "information about the data that is described here")],
            columns=["doc_id", "text"],
        )
    )
    cfg = PipelineConfig(lang=None)
    out, _ = build_training_corpus(docs, cfg)
    (row,) = out.collect()
    assert "<EMAIL>" in row["text_scrubbed"]
    assert "admin@example.com" not in row["text_scrubbed"]


def test_embedding_neardup_stage(spark):
    """Docs carrying an `embedding` column get the fifth dedup modality:
    near-parallel vectors cluster and only the min doc_id survives."""
    import numpy as np

    rng = np.random.default_rng(3)
    base = rng.normal(size=8)
    rows = []
    texts = [
        "first document with plenty of distinct useful words about storage",
        "second piece covering query planners and shuffle strategies today",
        "third text on crawling the web politely and parsing the content",
    ]
    vecs = [
        base,                               # doc 0
        base + rng.normal(scale=0.01, size=8),  # doc 1: semantic dup of 0
        rng.normal(size=8),                 # doc 2: unrelated
    ]
    for i, (t, v) in enumerate(zip(texts, vecs)):
        rows.append((i, t, [float(x) for x in v]))
    docs = spark.createDataFrame(rows, "doc_id long, text string, embedding array<double>")
    from share_spark.pipeline import PipelineConfig, build_training_corpus

    out, stats = build_training_corpus(
        docs, PipelineConfig(lang=None), audit=True
    )
    assert stats["embedding_dedup"] == 2
    assert {r["doc_id"] for r in out.collect()} == {0, 2}


def test_pipeline_adversarial_inputs(spark):
    """Pathological rows must flow through without crashing: NULL text,
    empty text, a huge document, unicode, whitespace-only."""
    big = "word " * 50_000
    rows = [
        (0, None, None, "web"),
        (1, "", "https://a.example/e", "web"),
        (2, "   \t  \n ", None, "web"),
        (3, big + "the and of to in is that for with was", "https://a.example/big", "web"),
        (4, "émojis 😀 and ünïcode tokens mixed with the usual english "
            "words that is for the gate to pass", "https://a.example/u", "web"),
        (5, GOOD, "https://a.example/g", "web"),
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "url", "source"])
    )
    from share_spark.pipeline import PipelineConfig, build_training_corpus

    out, stats = build_training_corpus(
        docs, PipelineConfig(max_top_bigram_frac=1.0), audit=True
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # null/empty/whitespace die at quality; big+unicode+good survive
    assert set(got) == {3, 4, 5}, stats
    assert got[3]["n_tokens"] >= 50_000
    assert "😀" in got[4]["text_scrubbed"]
