"""Deriver scalar pack — the byte-contract helpers the reference golden-tests.

Reference: trove/derive/sharev2_elastic.py (strip_empty_values :105-124,
PascalCase type names :341-343, subject-lineage skos:broader walk :365-400,
'taxonomy|a|b|c' serialization :402-403) and share/util/__init__.py
IDObfuscator (:11-46). Each helper has a plain-Python form (the golden
contract) and, where it runs in the hot path, a Spark column / DataFrame
form that produces identical bytes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# values that, for the purpose of indexing, are equivalent to absence
# (sharev2_elastic.py:99)
EMPTY_VALUES = (None, "", [])

_OBF_NUM = 0xDEADBEEF  # share/util/__init__.py:12-14
_OBF_MOD = 10_000_000_000
_OBF_MOD_INV = 0x17A991C0F
_OBF_ID_RE = re.compile(
    r"([0-9A-Fa-f]{2,})([0-9A-Fa-f]{3})-([0-9A-Fa-f]{3})-([0-9A-Fa-f]{3})"
)


def strip_empty_values(thing):
    """Recursively drop None / '' / [] from dicts, lists, tuples
    (sharev2_elastic.py:105-124, byte-identical semantics)."""
    if isinstance(thing, dict):
        return {
            k: strip_empty_values(v)
            for k, v in thing.items()
            if v not in EMPTY_VALUES
        }
    if isinstance(thing, list):
        return [strip_empty_values(v) for v in thing if v not in EMPTY_VALUES]
    if isinstance(thing, tuple):
        return tuple(
            strip_empty_values(v) for v in thing if v not in EMPTY_VALUES
        )
    return thing


def format_typename(sharev2_typename: str) -> str:
    """PascalCase -> lower case with spaces (sharev2_elastic.py:341-343)."""
    return re.sub(r"\B([A-Z])", r" \1", sharev2_typename).lower()


def format_typename_col(col: Column) -> Column:
    """Column form of format_typename (Java regex \\B matches identically)."""
    return F.lower(F.regexp_replace(col, r"\B([A-Z])", " $1"))


def obfuscate_id(pk: int, model_id: int = 1) -> str:
    """IDObfuscator.encode_id (share/util/__init__.py:23-28):
    'MM' + 9 hex digits of pk*NUM%MOD split as HHH-HHH-HHH."""
    encoded = "{:09X}".format(pk * _OBF_NUM % _OBF_MOD)
    return "{:02X}{}-{}-{}".format(
        model_id, encoded[:3], encoded[3:6], encoded[6:]
    )


def deobfuscate_id(obfuscated: str) -> tuple[int, int]:
    """Inverse (share/util/__init__.py:31-46): (model_id, pk)."""
    m = _OBF_ID_RE.match(obfuscated)
    if not m:
        raise ValueError(f"invalid obfuscated id: {obfuscated}")
    model_hex, *pks = m.groups()
    return int(model_hex, 16), int("".join(pks), 16) * _OBF_MOD_INV % _OBF_MOD


def obfuscate_id_col(pk: Column, model_id: int = 1) -> Column:
    """Column form — pure JVM expressions (conv/lpad/concat), codegen'd.
    pk*NUM stays within int64 for pk < ~7.9e8 (Django int PKs); guarded by
    the same MOD arithmetic as the reference."""
    enc = F.lpad(
        F.upper(F.conv((pk.cast("long") * _OBF_NUM % _OBF_MOD).cast("string"), 10, 16)),
        9,
        "0",
    )
    prefix = F.lit("{:02X}".format(model_id))
    return F.concat(
        prefix,
        F.substring(enc, 1, 3),
        F.lit("-"),
        F.substring(enc, 4, 3),
        F.lit("-"),
        F.substring(enc, 7, 3),
    )


def subject_lineage(
    labels: dict[str, str], broader: dict[str, str], subject_iri: str
) -> tuple[str, ...]:
    """Plain-Python skos:broader walk (sharev2_elastic.py:380-400): root
    first, cycle-guarded; () when the subject has no label."""
    visiting: set[str] = set()
    out: list[str] = []
    cur: str | None = subject_iri
    while cur is not None and cur not in visiting:
        visiting.add(cur)
        label = labels.get(cur)
        if label is None:
            return () if cur == subject_iri else tuple(out)
        out.insert(0, label)
        cur = broader.get(cur)
    return tuple(out)


def serialize_subject(taxonomy_name: str, lineage: tuple[str, ...]) -> str:
    """'taxonomy|root|...|leaf' (sharev2_elastic.py:402-403)."""
    return "|".join((taxonomy_name, *lineage))


def subject_lineage_paths(
    subjects: DataFrame, max_depth: int = 10, taxonomy_col: str | None = None
) -> DataFrame:
    """Distributed skos:broader walk over a subjects table
    (subject_iri, pref_label, broader_iri nullable [, taxonomy]).

    Iterative self-join to the fixpoint (or max_depth — taxonomies are
    shallow; the reference's recursion has the same implicit bound via its
    visiting-set). Each iteration prepends the parent's label; rows whose
    frontier is NULL are done. Joins are on subject_iri — broadcast when the
    taxonomy is small (it always is relative to the corpus), so the walk
    costs zero shuffles of the big side when used to derive per-card subject
    strings. Returns (subject_iri, lineage string 'root|...|leaf').
    """
    base = subjects.select(
        "subject_iri",
        F.col("pref_label").alias("lineage"),
        F.col("broader_iri").alias("frontier"),
        F.array(F.col("subject_iri")).alias("seen"),
    )
    parents = subjects.select(
        F.col("subject_iri").alias("frontier"),
        F.col("pref_label").alias("parent_label"),
        F.col("broader_iri").alias("parent_broader"),
    )
    cur = base
    for _ in range(max_depth):
        if cur.filter(F.col("frontier").isNotNull()).isEmpty():
            break
        stepped = cur.join(F.broadcast(parents), "frontier", "left")
        cur = stepped.select(
            "subject_iri",
            F.when(
                F.col("frontier").isNotNull()
                & F.col("parent_label").isNotNull()
                & ~F.array_contains(F.col("seen"), F.col("frontier")),
                F.concat_ws("|", F.col("parent_label"), F.col("lineage")),
            )
            .otherwise(F.col("lineage"))
            .alias("lineage"),
            F.when(
                F.col("frontier").isNotNull()
                & ~F.array_contains(F.col("seen"), F.col("frontier")),
                F.col("parent_broader"),
            )
            .otherwise(F.lit(None))
            .alias("frontier"),
            F.when(
                F.col("frontier").isNotNull(),
                F.array_union(F.col("seen"), F.array(F.col("frontier"))),
            )
            .otherwise(F.col("seen"))
            .alias("seen"),
        )
    return cur.select("subject_iri", "lineage")
