"""Deriver scalar pack: byte-contract goldens vs the reference semantics."""

from share_spark.derive import (
    deobfuscate_id,
    format_typename,
    format_typename_col,
    obfuscate_id,
    obfuscate_id_col,
    serialize_subject,
    strip_empty_values,
    subject_lineage,
    subject_lineage_paths,
)
from share_spark.iri import unquote_iri


def test_strip_empty_values_golden():
    got = strip_empty_values(
        {
            "title": "x",
            "none": None,
            "empty": "",
            "elist": [],
            "nested": {"a": None, "b": ["", None, "keep", []]},
            "tuple": (None, "t", ""),
            "zero": 0,  # 0 and False are NOT empty (sharev2_elastic.py:99)
            "false": False,
        }
    )
    assert got == {
        "title": "x",
        "nested": {"b": ["keep"]},
        "tuple": ("t",),
        "zero": 0,
        "false": False,
    }


def test_format_typename_golden(spark):
    cases = {
        "CreativeWork": "creative work",
        "DataSet": "data set",
        "Preprint": "preprint",
        "ABTest": "a b test",
    }
    for src, want in cases.items():
        assert format_typename(src) == want
    from pyspark.sql import functions as F

    rows = spark.createDataFrame([(s,) for s in cases], "t string").select(
        "t", format_typename_col(F.col("t")).alias("f")
    ).collect()
    for r in rows:
        assert r["f"] == cases[r["t"]]


def test_id_obfuscation_roundtrip(spark):
    from pyspark.sql import functions as F

    pks = [1, 7, 12345, 99999999]
    for pk in pks:
        enc = obfuscate_id(pk, model_id=42)
        assert len(enc) == 13 and enc[5] == "-" and enc[9] == "-"
        model, dec = deobfuscate_id(enc)
        assert (model, dec) == (42, pk)
    # column form produces identical strings
    rows = spark.createDataFrame([(p,) for p in pks], "pk long").select(
        "pk", obfuscate_id_col(F.col("pk"), model_id=42).alias("enc")
    ).collect()
    for r in rows:
        assert r["enc"] == obfuscate_id(r["pk"], model_id=42)


def test_subject_lineage_walk_and_serialize():
    labels = {"s:leaf": "Leaf", "s:mid": "Mid", "s:root": "Root", "s:x": "X"}
    broader = {"s:leaf": "s:mid", "s:mid": "s:root", "s:x": "s:x"}  # s:x cycles
    assert subject_lineage(labels, broader, "s:leaf") == ("Root", "Mid", "Leaf")
    assert subject_lineage(labels, broader, "s:root") == ("Root",)
    assert subject_lineage(labels, broader, "s:x") == ("X",)  # cycle guard
    assert subject_lineage(labels, broader, "s:none") == ()
    assert (
        serialize_subject("bepress", ("Root", "Mid", "Leaf"))
        == "bepress|Root|Mid|Leaf"
    )


def test_subject_lineage_paths_spark(spark):
    subjects = spark.createDataFrame(
        [
            ("s:leaf", "Leaf", "s:mid"),
            ("s:mid", "Mid", "s:root"),
            ("s:root", "Root", None),
            ("s:cyc_a", "A", "s:cyc_b"),
            ("s:cyc_b", "B", "s:cyc_a"),
            ("s:orphan", "O", "s:missing"),
        ],
        "subject_iri string, pref_label string, broader_iri string",
    )
    got = {
        r["subject_iri"]: r["lineage"]
        for r in subject_lineage_paths(subjects).collect()
    }
    assert got["s:leaf"] == "Root|Mid|Leaf"
    assert got["s:mid"] == "Root|Mid"
    assert got["s:root"] == "Root"
    assert got["s:cyc_a"] == "B|A"  # cycle stops once a node repeats
    assert got["s:orphan"] == "O"  # parent missing from the table
    # Spark walk agrees with the plain-Python contract
    labels = {"s:leaf": "Leaf", "s:mid": "Mid", "s:root": "Root"}
    broader = {"s:leaf": "s:mid", "s:mid": "s:root"}
    for iri in ("s:leaf", "s:mid", "s:root"):
        assert got[iri] == "|".join(subject_lineage(labels, broader, iri))


def test_unquote_iri_parity_and_parse_wiring():
    # doctest cases from trove/util/iris.py:154-188
    assert unquote_iri("flipl%3A//iri.example/blarg/%3F%23") == (
        "flipl://iri.example/blarg/?#"
    )
    assert unquote_iri("namly%3Aurn.example%3Ablerg") == "namly:urn.example:blerg"
    assert unquote_iri("werbleWord") == "werbleWord"
    import urllib.parse as urp

    raw = "https://x.example/a b?c=d&e"
    triple = urp.quote(urp.quote(urp.quote(raw)))
    assert unquote_iri(triple) == raw

    # filter values decode through the querystring parser
    from share_spark.query.params import parse_cardsearch

    qs = (
        "cardSearchFilter[subject][any-of]="
        + urp.quote(urp.quote("https://s.example/one two"))
    )
    params = parse_cardsearch(qs)
    assert params.filters[0].values == ("https://s.example/one two",)
