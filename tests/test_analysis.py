import pandas as pd

from share_spark.analysis import (
    LUCENE_ENGLISH_STOPWORDS,
    porter_stem,
    tokenize,
    tokenize_series,
)


def test_standard_tokenizer_lowercases_and_splits():
    assert tokenize("Hello, World! FOO-bar_baz 42") == [
        "hello", "world", "foo", "bar_baz", "42",
    ]


def test_standard_keeps_stopwords():
    assert tokenize("the quick and the dead") == ["the", "quick", "and", "the", "dead"]


def test_english_removes_stopwords_and_stems():
    toks = tokenize("the running dogs are jumping", analyzer="english")
    assert "the" not in toks and "are" not in toks
    assert toks == ["run", "dog", "jump"]


def test_porter_classic_cases():
    cases = {
        "caresses": "caress", "ponies": "poni", "caress": "caress", "cats": "cat",
        "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
        "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration", "valenci": "valenc",
        "digitizer": "digit", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "homologou": "homolog", "communism": "commun",
        "activate": "activ", "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
    }
    for word, want in cases.items():
        assert porter_stem(word) == want, f"{word}: {porter_stem(word)} != {want}"


def test_tokenize_series_matches_scalar():
    s = pd.Series(["A b C", "", None])
    out = tokenize_series(s)
    assert out[0] == ["a", "b", "c"]
    assert out[1] == []
    assert out[2] == []


def test_stopword_set_is_lucene_default_33():
    assert len(LUCENE_ENGLISH_STOPWORDS) == 33


def test_path_hierarchy_tokenizer(spark):
    from pyspark.sql import functions as F

    from share_spark.analysis import path_hierarchy_col, path_hierarchy_tokens

    want = [
        "bepress",
        "bepress|life sciences",
        "bepress|life sciences|biology",
    ]
    assert path_hierarchy_tokens("bepress|Life Sciences|Biology") == want
    assert path_hierarchy_tokens("") == []
    got = (
        spark.createDataFrame([("bepress|Life Sciences|Biology",)], "s string")
        .select(path_hierarchy_col(F.col("s")).alias("t"))
        .collect()[0]["t"]
    )
    assert got == want
