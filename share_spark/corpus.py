"""Deterministic synthetic web-page corpus (FIXTURES.md §1, §4).

Generates the `input_hint` table shape
  (url string, warc_ts timestamp, html binary, text string, lang string)
plus doc_id, seeded — no external data. Mirrors the reference test corpus's
*shape* (tests/share/search/index_strategy/_common_trovesearch_tests.py:237-322):

- Zipf token stream over a 10k-word vocabulary
- a few very hot head terms in >30% of docs (head-term salting exercise)
- planted phrase classes A/B/C for text-semantics parity
  (_common_trovesearch_tests.py:455-474)
- every 13th row re-emits an earlier url with trailing-slash + http scheme
  variants (suffuniq exercise, trove/util/iris.py:31-113)
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

PHRASE_A = (
    "This place is not a place of honor... no highly esteemed deed is "
    "commemorated here... nothing valued is here."
)
PHRASE_B = (
    "What is here was dangerous and repulsive to us. This message is a "
    "warning about danger."
)
PHRASE_C = (
    "The danger is unleashed only if you substantially disturb this place "
    "physically."
)

HEAD_TERMS = ["the", "data", "science"]
VOCAB_SIZE = 10_000


def _vocab() -> list[str]:
    return [f"w{i:05d}" for i in range(VOCAB_SIZE)]


def make_web_pages(n: int, seed: int = 42) -> pd.DataFrame:
    """Build the web_pages pandas frame; deterministic for (n, seed)."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(), dtype=object)
    # zipf-ranked sampling over the vocabulary
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = 1.0 / ranks
    probs /= probs.sum()

    base_ts = datetime(1999, 12, 31, tzinfo=timezone.utc)
    rows = []
    for i in range(n):
        n_tok = int(rng.integers(20, 120))
        toks = list(rng.choice(vocab, size=n_tok, p=probs))
        for h in HEAD_TERMS:
            if rng.random() < 0.35:
                toks.insert(int(rng.integers(0, len(toks) + 1)), h)
        cls = i % 17
        if cls == 3:
            planted = PHRASE_A
        elif cls == 5:
            planted = PHRASE_B
        elif cls == 7:
            planted = PHRASE_C
        else:
            planted = ""
        body = " ".join(toks) + (" " + planted if planted else "")
        url = f"https://site{i % 97}.example/page/{i}"
        if i % 13 == 12 and i >= 13:
            # scheme + trailing-slash variant of an earlier url
            url = f"http://site{(i - 13) % 97}.example/page/{i - 13}/"
        html = (
            "<html><head><title>Page {}</title>"
            "<script>var x = 'noise &amp; nonsense';</script>"
            "<style>.c {{ color: red }}</style></head>"
            "<body><!-- boilerplate --><h1>Doc &#35;{}</h1><p>{}</p></body></html>"
        ).format(i, i, body).encode("utf-8")
        lang_roll = rng.random()
        lang = "en" if lang_roll < 0.95 else ("de" if lang_roll < 0.975 else "fr")
        rows.append(
            {
                "doc_id": i,
                "url": url,
                "warc_ts": base_ts + timedelta(hours=7 * i),
                "html": html,
                "text": body,
                "lang": lang,
            }
        )
    return pd.DataFrame(rows)


def make_web_pages_fast(n: int, seed: int = 42) -> pd.DataFrame:
    """Vectorized bench-scale generator (no html wrapping, no per-row Python
    beyond C-speed joins): same token distribution + planted classes as
    make_web_pages, built for 10^5-10^6 rows."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab(), dtype=object)
    ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
    probs = (1.0 / ranks) / (1.0 / ranks).sum()

    lengths = rng.integers(20, 120, size=n)
    bounds = np.concatenate(([0], np.cumsum(lengths)))
    flat = rng.choice(vocab, size=int(bounds[-1]), p=probs)
    head_mask = rng.random((n, len(HEAD_TERMS))) < 0.35

    texts = []
    cls = np.arange(n) % 17
    planted = {3: PHRASE_A, 5: PHRASE_B, 7: PHRASE_C}
    for i in range(n):
        toks = flat[bounds[i] : bounds[i + 1]]
        s = " ".join(toks)
        extra = [h for j, h in enumerate(HEAD_TERMS) if head_mask[i, j]]
        if extra:
            s = s + " " + " ".join(extra)
        p = planted.get(int(cls[i]))
        if p:
            s = s + " " + p
        texts.append(s)

    idx = np.arange(n)
    urls = pd.Series(idx % 97).astype(str).radd("https://site") + pd.Series(
        idx
    ).astype(str).radd(".example/page/")
    base_ts = datetime(1999, 12, 31, tzinfo=timezone.utc)
    return pd.DataFrame(
        {
            "doc_id": idx.astype(np.int64),
            "url": urls,
            "warc_ts": pd.Series([base_ts] * n)
            + pd.to_timedelta((idx * 7) % (24 * 365 * 20), unit="h"),
            "html": None,
            "text": texts,
            "lang": "en",
        }
    )


SUBJECT_POOL = [f"://subjects.example/s{i}" for i in range(50)]
CREATOR_POOL = [f"://people.example/p{i}" for i in range(30)]


def make_doc_values(pages: pd.DataFrame, seed: int = 44) -> pd.DataFrame:
    """Long-format structured metadata (FIXTURES.md §2), mirroring the
    reference GraphWalk output shape (_trovesearch_util.py:111-237):
    2-5 subject IRIs (one pool member written with/without trailing slash),
    1-3 creators with name text, dateCreated = warc_ts date, every 10th doc
    an integer at a depth-2 path."""
    rng = np.random.default_rng(seed)
    rows = []
    for r in pages.itertuples():
        d = int(r.doc_id)
        n_subj = int(rng.integers(2, 6))
        for s in rng.choice(len(SUBJECT_POOL), size=n_subj, replace=False):
            iri = SUBJECT_POOL[int(s)]
            if int(s) == 0 and d % 2 == 1:
                iri = iri + "/"  # trailing-slash variant, suffuniq exercise
            rows.append(
                dict(doc_id=d, path_key='["dcterms:subject"]', depth=1,
                     value_type="iri", iri_value=iri, text_value=None,
                     date_value=None, int_value=None)
            )
        n_cre = int(rng.integers(1, 4))
        for c in rng.choice(len(CREATOR_POOL), size=n_cre, replace=False):
            rows.append(
                dict(doc_id=d, path_key='["dcterms:creator"]', depth=1,
                     value_type="iri", iri_value=CREATOR_POOL[int(c)],
                     text_value=None, date_value=None, int_value=None)
            )
            rows.append(
                dict(doc_id=d, path_key='["dcterms:creator","foaf:name"]',
                     depth=2, value_type="text", iri_value=None,
                     text_value=f"Person {int(c)}", date_value=None,
                     int_value=None)
            )
        rows.append(
            dict(doc_id=d, path_key='["dcterms:created"]', depth=1,
                 value_type="date", iri_value=None, text_value=None,
                 date_value=r.warc_ts.date(), int_value=None)
        )
        if d % 10 == 0:
            rows.append(
                dict(doc_id=d, path_key='["osf:stats","osf:downloads"]',
                     depth=2, value_type="int", iri_value=None,
                     text_value=None, date_value=None,
                     int_value=int(rng.integers(0, 1000)))
            )
    return pd.DataFrame(rows)


def make_synonyms(pages: pd.DataFrame) -> pd.DataFrame:
    """sameAs closure fixture (FIXTURES.md §3): every 7th doc, 1-2 synonyms."""
    rows = []
    for r in pages.itertuples():
        d = int(r.doc_id)
        if d % 7 == 0:
            rows.append(dict(doc_id=d, synonym_iri=f"://alias.example/a{d}"))
            if d % 14 == 0:
                rows.append(dict(doc_id=d, synonym_iri=f"://doi.example/10.0/{d}"))
    return pd.DataFrame(rows)


def make_queries(n: int = 200, seed: int = 43) -> list[dict]:
    """Reference query set (FIXTURES.md §4): head/mid/tail keywords, phrase
    quotes, negations, and the planted-phrase parity cases."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    queries: list[dict] = [
        {"query_id": 0, "query_text": "danger", "k": 13},
        {"query_id": 1, "query_text": '"nothing valued is here"', "k": 13},
        {"query_id": 2, "query_text": '"nothing valued here"', "k": 13},
        {"query_id": 3, "query_text": "place honor", "k": 13},
        {"query_id": 4, "query_text": "danger -warning", "k": 13},
        {"query_id": 5, "query_text": "the data science", "k": 101},
    ]
    qid = len(queries)
    while qid < n:
        n_terms = int(rng.integers(1, 5))
        # mix head, mid, tail ranks
        terms = []
        for _ in range(n_terms):
            bucket = rng.random()
            if bucket < 0.3:
                terms.append(vocab[int(rng.integers(0, 20))])
            elif bucket < 0.7:
                terms.append(vocab[int(rng.integers(20, 500))])
            else:
                terms.append(vocab[int(rng.integers(500, VOCAB_SIZE))])
        k = 13 if rng.random() < 0.8 else 101
        queries.append(
            {"query_id": qid, "query_text": " ".join(terms), "k": k}
        )
        qid += 1
    return queries
