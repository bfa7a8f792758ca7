"""Dedup / quality / langid / token-count operators, verified against
pure-pandas oracles on the documents-style table."""

import hashlib
from itertools import combinations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from share_spark import textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the cat sat on the mat", "en"),          # exact dup of 0
        (2, "the cat sat on the red mat", "en"),      # near dup of 0
        (3, "der hund ist nicht klein und laut", "de"),
        (4, "le chat est dans la maison pour une nuit", "fr"),
        (5, "completely different words appear here tonight", "en"),
        (6, "the cat sat on the mat", "en"),          # exact dup of 0
        (7, "zz", "und"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang"])
    df = spark.createDataFrame(pdf).cache()
    df.count()
    return df, pdf


def _token_sets(pdf):
    return {r.doc_id: set(r.text.split()) for r in pdf.itertuples()}


def test_fingerprint_is_md5(docs):
    df, pdf = docs
    got = {r["doc_id"]: r["fingerprint"] for r in textops.with_fingerprint(df).collect()}
    for r in pdf.itertuples():
        assert got[r.doc_id] == hashlib.md5(r.text.encode()).hexdigest()


def test_exact_duplicates(docs):
    df, _ = docs
    groups = textops.exact_duplicates(df).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g["group_size"] == 3 and g["keep_doc_id"] == 0


def test_jaccard_pairs_match_oracle(docs):
    df, pdf = docs
    sets = _token_sets(pdf)
    want = set()
    for a, b in combinations(sorted(sets), 2):
        j = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if j >= 0.5:
            want.add((a, b, round(j, 6)))
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in textops.jaccard_pairs(df, threshold=0.5).collect()
    }
    assert got == want
    assert (0, 1, 1.0) in got and (0, 6, 1.0) in got


def test_ngram_rows(docs):
    df, _ = docs
    grams = {
        r["ngram"]
        for r in textops.ngram_rows(df.filter("doc_id = 0"), 3).collect()
    }
    assert grams == {
        "the cat sat", "cat sat on", "sat on the", "on the mat",
    }


def test_minhash_identical_docs_always_pair(docs):
    df, _ = docs
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in textops.minhash_lsh_pairs(df, n_perm=16, band_size=4).collect()
    }
    # identical docs have identical signatures -> must collide in every band
    assert {(0, 1), (0, 6), (1, 6)} <= pairs
    # unrelated docs must not pair
    assert (3, 4) not in pairs and (0, 5) not in pairs


def test_minhash_signature_matches_python_oracle(docs):
    df, pdf = docs
    sig = {
        (r["doc_id"], r["perm"]): r["minhash"]
        for r in textops.minhash_signatures(df, n_perm=4).collect()
    }
    for r in pdf.itertuples():
        toks = set(r.text.split())
        for p in range(4):
            # int64 permutation hash: first 15 hex digits of md5 as integer
            want = min(
                int(hashlib.md5(f"{t}#{p}".encode()).hexdigest()[:15], 16)
                for t in toks
            )
            assert sig[(r.doc_id, p)] == want


def test_simhash_dups_and_pairs(docs):
    df, _ = docs
    sh = {r["doc_id"]: r["simhash"] for r in textops.simhash(df).collect()}
    assert sh[0] == sh[1] == sh[6]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["ham"]
        for r in textops.simhash_pairs(df, max_hamming=6).collect()
    }
    assert pairs[(0, 1)] == 0
    # near dup (added 'red') should be close in hamming space
    assert (0, 2) in pairs


def test_simhash_matches_python_oracle(docs):
    df, pdf = docs
    bits = 32
    got = {r["doc_id"]: r["simhash"] for r in textops.simhash(df, bits=bits).collect()}
    for r in pdf.itertuples():
        toks = set(r.text.split())
        val = 0
        for j in range(bits):
            s = 0
            for t in toks:
                h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                s += 1 if (h >> j) & 1 else -1
            if s > 0:
                val |= 1 << j
        assert got[r.doc_id] == val, r.doc_id


def test_text_quality(docs):
    df, _ = docs
    q = {r["doc_id"]: r for r in textops.text_quality(df).collect()}
    assert q[0]["n_tokens"] == 6
    assert q[0]["stopword_ratio"] == round(2 / 6, 4)  # the, the
    assert not q[7]["keep"]  # too short


def test_langid(docs):
    df, _ = docs
    out = {r["doc_id"]: r["lang_pred"] for r in textops.langid(df).collect()}
    assert out[0] == "en"
    assert out[3] == "de"
    assert out[4] == "fr"
    assert out[7] == "und"


def test_token_counts(docs, spark):
    df, _ = docs
    tc = {r["doc_id"]: r for r in textops.token_counts(df).collect()}
    assert tc[0]["n_tokens_ws"] == 6
    punct = spark.createDataFrame(
        pd.DataFrame([(99, "hello, world! it's fine", "en")],
                     columns=["doc_id", "text", "lang"])
    )
    got = textops.token_counts(punct).collect()[0]
    assert got["n_tokens_ws"] == 4
    # hello , world ! it ' s fine
    assert got["n_tokens_bpe"] == 8


def test_minhash_xxhash64_variant_semantics(spark):
    """The fast (xxhash64) permutation hash keeps MinHash-LSH semantics: any
    two docs with identical token sets share every band key, so all exact
    duplicate pairs surface — same guarantee the md5 oracle form has."""
    from share_spark.textops import minhash_lsh_pairs, minhash_signatures_wide

    rows = [(i, f"alpha beta gamma delta doc{i % 5}") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for fn in ("md5", "xxhash64"):
        pairs = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(docs, hash_fn=fn).collect()
        }
        want = {(i, i + 5) for i in range(5)}  # identical token sets
        assert want <= pairs, fn
    sig = minhash_signatures_wide(docs, hash_fn="xxhash64").collect()
    by_id = {r["doc_id"]: tuple(r[f"mh{p}"] for p in range(16)) for r in sig}
    assert by_id[0] == by_id[5] and by_id[0] != by_id[1]


def test_md5_signature_kernel_matches_expressions(spark):
    """The Arrow md5-signature kernel (_md5_sig_partials) is bit-identical
    to the JVM expression chain it replaced, across unigram and shingle
    spaces — including non-ASCII tokens (utf-8 md5 input) and tokens that
    repeat across documents (per-batch dictionary dedup)."""
    from share_spark.textops import (
        _perm_hash_col, minhash_signatures_wide, ngram_rows, token_set,
    )

    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "beta gamma delta"),
        (3, "café naïve beta"),
        (4, "x"),
        (5, "alpha beta gamma alpha"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for ngram in (1, 3):
        got = {
            r["doc_id"]: tuple(r[f"mh{p}"] for p in range(8))
            for r in minhash_signatures_wide(
                docs, n_perm=8, hash_fn="md5", ngram=ngram
            ).collect()
        }
        toks = (
            token_set(docs)
            if ngram == 1
            else ngram_rows(docs, ngram).withColumnRenamed("ngram", "token")
        )
        want = {
            r["doc_id"]: tuple(r[f"mh{p}"] for p in range(8))
            for r in toks.groupBy("doc_id")
            .agg(
                *[
                    F.min(_perm_hash_col(p, hash_fn="md5")).alias(f"mh{p}")
                    for p in range(8)
                ]
            )
            .collect()
        }
        assert got == want, f"ngram={ngram}"


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee (SWA 2003): any shared substring of length
    >= k + w - 1 yields at least one shared fingerprint; disjoint texts
    share nothing; a doc shorter than k has no full window at all."""
    from share_spark.textops import winnow_fingerprints

    shared = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, f"AAAA {shared} BBBB"),
            (2, f"XXXXXXX {shared} YYY"),
            (3, "completely different material 0123456789 qwerty"),
            (4, "tiny"),  # < k chars: zero k-grams
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(docs, k=8, w=4).collect()
    by_doc: dict[int, set] = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2]            # shared substring detected
    assert not (by_doc[1] & by_doc[3])      # disjoint texts: no collision
    assert 4 not in by_doc                  # too short for any window
    # deterministic: same input -> same set
    again = {(r["doc_id"], r["fp"]) for r in
             winnow_fingerprints(docs, k=8, w=4).collect()}
    assert again == {(r["doc_id"], r["fp"]) for r in fps}


def test_pack_documents_invariants(docs, spark):
    """pack_documents: start-based block assignment on the global token
    tape; packs hold >= 1 whole docs and overflow the budget by < one doc;
    bucket_width is an implementation knob that must not change output
    (distributed prefix-sum correctness across bucket boundaries)."""
    from share_spark.textops import pack_documents

    df, _pdf = docs
    budget = 12
    out = {
        r["doc_id"]: r
        for r in pack_documents(df, budget_tokens=budget).collect()
    }
    # sequential ground truth
    rows = sorted(out.values(), key=lambda r: r["doc_id"])
    tape = 0
    for r in rows:
        assert r["pack_offset"] == tape
        assert r["pack_id"] == tape // budget
        tape += r["n_tokens"]
    # per-pack: token sum bounded by budget + (boundary doc's tokens - 1)
    per_pack: dict[int, int] = {}
    for r in rows:
        per_pack[r["pack_id"]] = per_pack.get(r["pack_id"], 0) + r["n_tokens"]
    max_doc = max(r["n_tokens"] for r in rows)
    assert all(v < budget + max_doc for v in per_pack.values())
    assert len(per_pack) > 1  # fixture actually spans packs
    # bucket width must be output-invariant
    alt = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_documents(df, budget_tokens=budget, bucket_width=3).collect()
    }
    assert alt == {d: (r["pack_id"], r["pack_offset"]) for d, r in out.items()}


def test_repetition_metrics(spark):
    """Gopher-style repetition signals: duplicate-line fraction and
    most-frequent-n-gram dominance."""
    from share_spark.textops import repetition_metrics

    rows = [
        (0, "a b a b a b"),          # bigram 'a b' = 3 of 5 bigrams
        (1, "all words differ here completely"),
        (2, "x x x\nx x x\ny y y"),  # 1 of 3 lines repeats
        (3, "one"),                  # too short for bigrams
        (4, "p q r p q r p q r"),    # trigram 'p q r' 3 of 7
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_metrics(df).collect()}
    assert got[0]["top_bigram_frac"] == 0.6
    assert got[1]["top_bigram_frac"] == 0.25  # 4 bigrams, all unique
    assert got[1]["dup_line_frac"] == 0.0
    assert got[2]["dup_line_frac"] == round(1 / 3, 4)
    assert got[3]["top_bigram_frac"] == 0.0 and got[3]["top_trigram_frac"] == 0.0
    assert got[4]["top_trigram_frac"] == round(3 / 7, 4)


def test_simhash_rejects_lossy_bits(docs):
    with pytest.raises(ValueError, match=r"\[1, 52\]"):
        textops.simhash(docs, bits=64)
    with pytest.raises(ValueError):
        textops.simhash(docs, bits=0)


@pytest.fixture(scope="module")
def line_docs(spark):
    rows = [
        (0, "unique alpha\ncookie banner\n\nbody zero"),
        (1, "cookie banner\nunique beta\nshared tail"),
        (2, "cookie banner\nshared tail\n\nunique gamma"),
        (3, ""),
        (4, "only once\n\n\nlast line"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    df = spark.createDataFrame(pdf).cache()
    df.count()
    return df, pdf


def _line_dedup_oracle(pdf, min_occurrences=2):
    """Pandas twin: first (doc_id, line_no) keeps a repeated non-empty line."""
    occ = {}
    split = {}
    for r in pdf.sort_values("doc_id").itertuples():
        lns = r.text.split("\n")
        split[r.doc_id] = lns
        for ln in lns:
            if ln:
                occ[ln] = occ.get(ln, 0) + 1
    seen = set()
    out = {}
    for doc_id in sorted(split):
        kept = []
        removed = 0
        for ln in split[doc_id]:
            if not ln:
                kept.append(ln)
            elif occ[ln] < min_occurrences or ln not in seen:
                kept.append(ln)
                seen.add(ln)
            else:
                removed += 1
        out[doc_id] = ("\n".join(kept), len(split[doc_id]), removed)
    return out


def test_dedup_lines_matches_oracle(line_docs):
    df, pdf = line_docs
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in textops.dedup_lines(df).collect()
    }
    assert got == _line_dedup_oracle(pdf)


def test_dedup_lines_threshold_three(line_docs):
    df, pdf = line_docs
    got = {
        r["doc_id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in textops.dedup_lines(df, min_occurrences=3).collect()
    }
    # "shared tail" occurs twice -> under threshold 3 it survives everywhere
    assert got == _line_dedup_oracle(pdf, min_occurrences=3)
    assert "shared tail" in got[2][0]


def test_dedup_lines_preserves_structure(line_docs):
    df, _ = line_docs
    got = {r["doc_id"]: r for r in textops.dedup_lines(df).collect()}
    # doc 4 has no cross-doc duplicates: byte-identical round trip
    assert got[4]["text"] == "only once\n\n\nlast line"
    assert got[4]["n_removed"] == 0
    # the all-empty doc round-trips as one empty line
    assert got[3]["text"] == "" and got[3]["n_lines"] == 1


def test_dedup_lines_guard():
    with pytest.raises(ValueError):
        textops.dedup_lines(None, min_occurrences=1)


def test_scrub_pii(spark):
    rows = [
        (0, "mail me at jo.doe+x@sub.example.org or admin@test.io now"),
        (1, "server at 10.0.255.7 and 192.168.1.1 responded"),
        (2, "call 555-123-4567 or +1 555 987 6543 today"),
        (3, "mixed: a@b.co from 8.8.8.8 dial 555-000-1111"),
        (4, "clean text with no sensitive content at all"),
        (5, "version 1.2.3 costs 12.50 not an ip or phone"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {r["doc_id"]: r for r in textops.scrub_pii(df).collect()}
    assert (got[0]["n_email"], got[0]["n_ipv4"], got[0]["n_phone"]) == (2, 0, 0)
    assert got[0]["text_scrubbed"] == "mail me at <EMAIL> or <EMAIL> now"
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_phone"]) == (0, 2, 0)
    assert got[1]["text_scrubbed"] == "server at <IPV4> and <IPV4> responded"
    assert (got[2]["n_email"], got[2]["n_ipv4"], got[2]["n_phone"]) == (0, 0, 2)
    assert got[2]["text_scrubbed"] == "call <PHONE> or <PHONE> today"
    assert (got[3]["n_email"], got[3]["n_ipv4"], got[3]["n_phone"]) == (1, 1, 1)
    assert got[3]["text_scrubbed"] == "mixed: <EMAIL> from <IPV4> dial <PHONE>"
    assert (got[4]["n_email"], got[4]["n_ipv4"], got[4]["n_phone"]) == (0, 0, 0)
    assert got[4]["text_scrubbed"] == rows[4][1]
    # version strings / prices are neither IPs nor phones; an IPv4 already
    # scrubbed can never re-count as a phone (ordered scrub)
    assert (got[5]["n_email"], got[5]["n_ipv4"], got[5]["n_phone"]) == (0, 0, 0)


def test_decontaminate(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (0, "alpha beta gamma delta epsilon zeta"),
                (1, "unrelated words entirely here my friend"),
                (2, "prefix alpha beta gamma delta filler tail"),
                (3, "beta gamma delta epsilon trailing words"),
                (4, "short text"),
            ],
            columns=["doc_id", "text"],
        )
    )
    evals = spark.createDataFrame(
        pd.DataFrame(
            [(100, "xx alpha beta gamma delta epsilon yy")],
            columns=["eval_id", "text"],
        )
    )
    got = {
        r["doc_id"]: (r["n_contaminated_grams"], r["contaminated"])
        for r in textops.decontaminate(docs, evals, n=4).collect()
    }
    # eval 4-grams: {xx a b g, a b g d, b g d e, g d e yy}
    assert got[0] == (2, True)     # 'a b g d' and 'b g d e'
    assert got[1] == (0, False)
    assert got[2] == (1, True)     # 'a b g d'
    assert got[3] == (1, True)     # 'b g d e'
    assert got[4] == (0, False)    # shorter than n -> no grams
    assert len(got) == 5           # every doc gets a row


def test_decontaminate_normalized(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            [
                (0, "Alpha, Beta GAMMA delta!"),
                (1, "alpha beta gamma delta"),
                (2, "something else entirely here"),
            ],
            columns=["doc_id", "text"],
        )
    )
    evals = spark.createDataFrame(
        pd.DataFrame([(9, "xx ALPHA beta Gamma DELTA yy")],
                     columns=["eval_id", "text"])
    )
    raw = {
        r["doc_id"]: r["contaminated"]
        for r in textops.decontaminate(docs, evals, n=4).collect()
    }
    normed = {
        r["doc_id"]: r["contaminated"]
        for r in textops.decontaminate(
            docs, evals, n=4, normalize=True
        ).collect()
    }
    # raw gramming is case/punct-sensitive: only doc 1 shares a raw gram
    # with... actually none (eval is uppercased) — normalization finds both
    assert raw == {0: False, 1: False, 2: False}
    assert normed == {0: True, 1: True, 2: False}


def test_materialize_packs(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            [(i, " ".join(["tok"] * n)) for i, n in
             enumerate([4, 3, 5, 2, 6])],
            columns=["doc_id", "text"],
        )
    )
    packed = textops.pack_documents(docs, budget_tokens=8)
    shards = {
        r["pack_id"]: r
        for r in textops.materialize_packs(packed, docs).collect()
    }
    # tape: doc0@0 doc1@4 doc2@7 doc3@12 doc4@14 -> packs 0,0,0,1,1
    assert sorted(shards) == [0, 1]
    p0, p1 = shards[0], shards[1]
    assert p0["doc_ids"] == [0, 1, 2] and p0["boundaries"] == [0, 4, 7]
    assert p0["total_tokens"] == 12
    assert p1["doc_ids"] == [3, 4] and p1["boundaries"] == [0, 2]
    assert p1["total_tokens"] == 8
    # texts align with member docs in tape order
    assert p1["texts"] == ["tok tok", " ".join(["tok"] * 6)]
