"""OAI-PMH repository over a Spark cards DataFrame — the full verb surface.

Reference: share/oaipmh/ — verb validation (verbs.py:46-53), error codes
(errors.py), keyset-paged record queries (indexcard_repository.py:199-242,
PAGE_SIZE=13, +1 overfetch), XML rendering (response_renderer.py). The
Django-ORM queryset becomes a DataFrame plan: datestamp/set filters and the
`id > last_id` keyset predicate are pushed to the parquet scan; only the
rendered page (<= 14 rows) ever reaches the driver.

The cards table schema:
  (card_id long, identifier string,     -- the uuid-ish suffix of oai ids
   datestamp timestamp,                 -- LatestResourceDescription.modified
   setspec string,                      -- source name
   metadata_xml string)                 -- pre-derived oai_dc payload
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from datetime import datetime, timezone
from xml.sax.saxutils import escape as _esc
from xml.sax.saxutils import quoteattr

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_SIZE = 13  # indexcard_repository.py:33

FORMATS = {  # indexcard_repository.py:26-32
    "oai_dc": {
        "schema": "http://www.openarchives.org/OAI/2.0/oai_dc.xsd",
        "namespace": "http://www.openarchives.org/OAI/2.0/oai_dc/",
    },
}


@dataclass
class OaiVerb:  # verbs.py:4-53
    name: str
    required: frozenset = frozenset()
    optional: frozenset = frozenset()
    exclusive: str | None = None


VERBS = {
    v.name: v
    for v in (
        OaiVerb("Identify"),
        OaiVerb("ListMetadataFormats", optional=frozenset({"identifier"})),
        OaiVerb("ListSets", exclusive="resumptionToken"),
        OaiVerb(
            "ListIdentifiers",
            required=frozenset({"metadataPrefix"}),
            optional=frozenset({"from", "until", "set"}),
            exclusive="resumptionToken",
        ),
        OaiVerb(
            "ListRecords",
            required=frozenset({"metadataPrefix"}),
            optional=frozenset({"from", "until", "set"}),
            exclusive="resumptionToken",
        ),
        OaiVerb(
            "GetRecord", required=frozenset({"identifier", "metadataPrefix"})
        ),
    )
}


def validate_verb(params: dict[str, list[str]]):
    """(verb | None, errors) — verbs.py:11-43 semantics: unknown/missing
    verb, illegal / repeated / missing-required / exclusive arguments."""
    errors: list[tuple[str, str]] = []
    verbs = params.get("verb")
    if not verbs or len(verbs) > 1:
        errors.append(("badVerb", "Missing or repeated OAI verb"))
        return None, errors
    verb = VERBS.get(verbs[0])
    if verb is None:
        errors.append(("badVerb", f"Illegal OAI verb: {verbs[0]}"))
        return None, errors
    keys = set(params) - {"verb"}
    for arg in keys - verb.required - verb.optional - {verb.exclusive}:
        errors.append(("badArgument", f"Illegal argument: {arg}"))
    for k, v in params.items():
        if k != "verb" and len(v) > 1:
            errors.append(("badArgument", f"Repeated argument: {k}"))
    if verb.exclusive and verb.exclusive in keys:
        if len(keys) > 1 or len(params[verb.exclusive]) > 1:
            errors.append(
                ("badArgument", f"Exclusive argument: {verb.exclusive}")
            )
    else:
        for arg in verb.required - keys:
            errors.append(("badArgument", f"Required argument: {arg}"))
    return (verb if not errors else None), errors


def _iso_z(dt) -> str:
    if isinstance(dt, str):
        return dt
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return dt.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def build_oai_cards(
    cards: DataFrame,
    latest_descriptions: DataFrame,
    suids: DataFrame,
    source_configs: DataFrame,
    derived: DataFrame,
    metadata_deriver: str = "oai_dc",
) -> DataFrame:
    """Derive the OaiRepository cards table from NORMALIZED inputs — the
    Spark join plan of the reference's per-card annotate subqueries
    (indexcard_repository.py:244-271):

      base       = Indexcard WHERE deleted IS NULL            (:245-246)
      datestamp  = LatestResourceDescription.modified          (:249-255)
      setspec    = suid -> source_config -> source name        (:256)
      metadata   = DerivedIndexcard.derived_text for deriver   (:258-271);
                   cards without a derived row for the prefix are excluded
                   (:203-207 deriver filter)

    Input schemas:
      cards:               (card_id, suid_id, deleted boolean-ish/null)
      latest_descriptions: (card_id, modified timestamp) — collapsed to the
                           max per card (the reference keeps exactly one
                           LatestResourceDescription per card; max is the
                           idempotent reduction if ingest raced)
      suids:               (suid_id, identifier, source_config_id)
      source_configs:      (source_config_id, source_name) — small dim,
                           broadcast
      derived:             (card_id, deriver_id, derived_text)

    Scale shape: one shuffle each on card_id / suid_id (co-partitionable by
    bucketing both on their keys); source_configs broadcasts.
    """
    live = cards.filter(F.col("deleted").isNull()).select("card_id", "suid_id")
    stamps = latest_descriptions.groupBy("card_id").agg(
        F.max("modified").alias("datestamp")
    )
    meta = (
        derived.filter(F.col("deriver_id") == metadata_deriver)
        .groupBy("card_id")
        .agg(F.max("derived_text").alias("metadata_xml"))
    )
    suid_src = suids.join(
        F.broadcast(source_configs), "source_config_id"
    ).select("suid_id", "identifier", F.col("source_name").alias("setspec"))
    return (
        live.join(suid_src, "suid_id")
        .join(stamps, "card_id")
        .join(meta, "card_id")  # inner: no derived text -> not exposed
        .select("card_id", "identifier", "datestamp", "setspec", "metadata_xml")
    )


def derive_oai_metadata(turtle_cards: DataFrame) -> DataFrame:
    """(card_id, focus_iri, turtle) -> the `derived` input of
    build_oai_cards, produced by the REAL oai_dc deriver
    (derive_oaidc.py — trove/derive/oaidc_xml.py contract) instead of a
    fixture passthrough. Cards whose focus type is out of the deriver's
    scope emit no row, so build_oai_cards' inner join excludes them — the
    reference's deriver-filter semantics (indexcard_repository.py:203-207).
    """
    from .derive_oaidc import derive_oai_dc_xml

    out = derive_oai_dc_xml(
        turtle_cards.select(
            F.col("card_id").alias("doc_id"), "focus_iri", "turtle"
        )
    )
    return out.select(
        F.col("doc_id").alias("card_id"),
        F.lit("oai_dc").alias("deriver_id"),
        F.col("metadata_xml").alias("derived_text"),
    )


@dataclass
class OaiRepository:
    """The verb handlers; `cards` is the indexcard DataFrame (see module
    docstring), `sets` a list of (setspec, name)."""

    cards: DataFrame
    sets: list[tuple[str, str]] = dc_field(default_factory=list)
    name: str = "share_spark/trove"
    repository_identifier: str = "share.example"
    base_url: str = "https://share.example/oai-pmh"
    admin_email: str = "share-support@example.example"
    granularity: str = "YYYY-MM-DD"
    now: datetime | None = None  # injectable for golden tests
    # memoized earliestDatestamp: Identify is a rare verb but the min()
    # is a full table scan — at scale that must run at most once per
    # repository instance, not once per request.  Wrapped in a list so
    # "not computed yet" is distinguishable from "computed, empty table".
    _earliest_memo: list = dc_field(default_factory=list, repr=False)

    # -- identifiers ----------------------------------------------------

    def oai_identifier(self, identifier: str) -> str:
        return f"oai:{self.repository_identifier}:{identifier}"

    def parse_identifier(self, oai_id: str) -> str | None:
        parts = oai_id.split(":")
        if len(parts) != 3 or parts[:2] != ["oai", self.repository_identifier]:
            return None
        return parts[2]

    # -- request entry ----------------------------------------------------

    def handle_request(self, params: dict[str, list[str]]) -> str:
        verb, errors = validate_verb(params)
        if errors:
            return self._render_errors(params, errors)
        kwargs = {k: v[0] for k, v in params.items()}
        prefix = kwargs.get("metadataPrefix")
        if prefix is not None and prefix not in FORMATS:
            return self._render_errors(
                params,
                [("cannotDisseminateFormat", f"Invalid metadataPrefix: {prefix}")],
            )
        handler = {
            "Identify": self._do_identify,
            "ListMetadataFormats": self._do_listmetadataformats,
            "ListSets": self._do_listsets,
            "ListIdentifiers": self._do_listidentifiers,
            "ListRecords": self._do_listrecords,
            "GetRecord": self._do_getrecord,
        }[verb.name]
        body, errors = handler(kwargs)
        if errors:
            return self._render_errors(params, errors)
        return self._render(kwargs, body)

    # -- verb handlers ----------------------------------------------------

    def _do_identify(self, kwargs):
        if not self._earliest_memo:
            self._earliest_memo.append(
                self.cards.agg(F.min("datestamp").alias("d")).collect()[0]["d"]
            )
        earliest = self._earliest_memo[0]
        sample = self.oai_identifier("0")
        parts = [
            "<Identify>",
            f"<repositoryName>{_esc(self.name)}</repositoryName>",
            f"<baseURL>{_esc(self.base_url)}</baseURL>",
            "<protocolVersion>2.0</protocolVersion>",
        ]
        if earliest is not None:
            parts.append(
                f"<earliestDatestamp>{_iso_z(earliest)}</earliestDatestamp>"
            )
        parts += [
            "<deletedRecord>no</deletedRecord>",
            f"<granularity>{self.granularity}</granularity>",
            f"<adminEmail>{_esc(self.admin_email)}</adminEmail>",
            "<description><oai-identifier>",
            "<scheme>oai</scheme>",
            f"<repositoryIdentifier>{_esc(self.repository_identifier)}"
            "</repositoryIdentifier>",
            "<delimiter>:</delimiter>",
            f"<sampleIdentifier>{_esc(sample)}</sampleIdentifier>",
            "</oai-identifier></description>",
            "</Identify>",
        ]
        return "".join(parts), []

    def _do_listmetadataformats(self, kwargs):
        if "identifier" in kwargs:
            ident = self.parse_identifier(kwargs["identifier"])
            if ident is None or not self._card_by_identifier(ident):
                return None, [
                    ("idDoesNotExist", f"Invalid record identifier: {kwargs['identifier']}")
                ]
        parts = ["<ListMetadataFormats>"]
        for prefix, info in FORMATS.items():
            parts += [
                "<metadataFormat>",
                f"<metadataPrefix>{prefix}</metadataPrefix>",
                f"<schema>{info['schema']}</schema>",
                f"<metadataNamespace>{info['namespace']}</metadataNamespace>",
                "</metadataFormat>",
            ]
        parts.append("</ListMetadataFormats>")
        return "".join(parts), []

    def _do_listsets(self, kwargs):
        if "resumptionToken" in kwargs:
            return None, [
                ("badResumptionToken", "ListSets does not paginate here")
            ]
        parts = ["<ListSets>"]
        for spec, name in self.sets:
            parts += [
                "<set>",
                f"<setSpec>{_esc(spec)}</setSpec>",
                f"<setName>{_esc(name)}</setName>",
                "</set>",
            ]
        parts.append("</ListSets>")
        return "".join(parts), []

    def _do_listidentifiers(self, kwargs):
        return self._list_page(kwargs, just_identifiers=True)

    def _do_listrecords(self, kwargs):
        return self._list_page(kwargs, just_identifiers=False)

    def _do_getrecord(self, kwargs):
        ident = self.parse_identifier(kwargs["identifier"])
        if ident is None:
            return None, [
                ("idDoesNotExist", f"Invalid record identifier: {kwargs['identifier']}")
            ]
        rows = self._card_by_identifier(ident)
        if not rows:
            return None, [
                ("idDoesNotExist", f"Invalid record identifier: {kwargs['identifier']}")
            ]
        r = rows[0]
        if r["metadata_xml"] is None:
            return None, [
                (
                    "cannotDisseminateFormat",
                    f"Record unavailable in format: {kwargs['metadataPrefix']}",
                )
            ]
        return f"<GetRecord>{self._record(r)}</GetRecord>", []

    # -- paging (the Spark plan) -------------------------------------------

    def _card_by_identifier(self, ident: str):
        return self.cards.filter(F.col("identifier") == ident).limit(1).collect()

    def _page_plan(self, kwargs, last_id: int | None) -> DataFrame:
        """Keyset page: every predicate is a pushed-down scan filter; the
        +1 overfetch row decides has-more (indexcard_repository.py:199-242).
        """
        out = self.cards
        if "from" in kwargs:
            out = out.filter(F.col("datestamp") >= F.lit(kwargs["from"]).cast("timestamp"))
        if "until" in kwargs:
            out = out.filter(F.col("datestamp") <= F.lit(kwargs["until"]).cast("timestamp"))
        if "set" in kwargs:
            out = out.filter(F.col("setspec") == kwargs["set"])
        if last_id is not None:
            out = out.filter(F.col("card_id") > last_id)
        return out.orderBy(F.asc("card_id")).limit(PAGE_SIZE + 1)

    def _list_page(self, kwargs, just_identifiers: bool):
        last_id = None
        if "resumptionToken" in kwargs:
            try:
                _from, _until, _set, _prefix, _last = kwargs[
                    "resumptionToken"
                ].split("|")
                last_id = int(_last)
                kwargs = {"metadataPrefix": _prefix}
                if _from:
                    kwargs["from"] = _from
                if _until:
                    kwargs["until"] = _until
                if _set:
                    kwargs["set"] = _set
            except (ValueError, KeyError):
                return None, [
                    ("badResumptionToken", "Invalid or expired resumption token")
                ]
        try:
            rows = self._page_plan(kwargs, last_id).collect()
        except Exception:
            return None, [("badArgument", "Invalid value for from/until")]
        if not rows:
            return None, [("noRecordsMatch", "No records match that query")]
        next_token = None
        if len(rows) > PAGE_SIZE:
            rows = rows[:PAGE_SIZE]
            next_token = "|".join(
                (
                    kwargs.get("from", ""),
                    kwargs.get("until", ""),
                    kwargs.get("set", ""),
                    kwargs["metadataPrefix"],
                    str(rows[-1]["card_id"]),
                )
            )
        tag = "ListIdentifiers" if just_identifiers else "ListRecords"
        render = self._header if just_identifiers else self._record
        parts = [f"<{tag}>"]
        parts += [render(r) for r in rows]
        parts.append(
            f"<resumptionToken>{_esc(next_token)}</resumptionToken>"
            if next_token
            else "<resumptionToken/>"
        )
        parts.append(f"</{tag}>")
        return "".join(parts), []

    # -- rendering ----------------------------------------------------------

    def _header(self, r) -> str:
        return (
            "<header>"
            f"<identifier>{_esc(self.oai_identifier(r['identifier']))}</identifier>"
            f"<datestamp>{_iso_z(r['datestamp'])}</datestamp>"
            f"<setSpec>{_esc(r['setspec'])}</setSpec>"
            "</header>"
        )

    def _record(self, r) -> str:
        meta = r["metadata_xml"] or ""
        return f"<record>{self._header(r)}<metadata>{meta}</metadata></record>"

    def _render(self, kwargs: dict, body: str) -> str:
        now = self.now or datetime.now(timezone.utc)
        attrs = "".join(
            f" {k}={quoteattr(v)}" for k, v in sorted(kwargs.items())
        )
        return (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<OAI-PMH xmlns="http://www.openarchives.org/OAI/2.0/">'
            f"<responseDate>{_iso_z(now)}</responseDate>"
            f"<request{attrs}>{_esc(self.base_url)}</request>"
            f"{body}"
            "</OAI-PMH>"
        )

    def _render_errors(self, params, errors) -> str:
        body = "".join(
            f"<error code={quoteattr(code)}>{_esc(desc)}</error>"
            for code, desc in errors
        )
        kwargs = {
            k: v[0] for k, v in params.items() if k == "verb" and len(v) == 1
        }
        return self._render(kwargs, body)
