"""Result renderers — the reference's outbound serialization surface.

Reference: trove/render/__init__.py:19-37 registers jsonapi / jsonld /
turtle / html / csv / tsv / rss / atom renderers. Here the engine-relevant
subset (machine formats) renders a result DataFrame; the row-graph assembly
of JSON:API is simplified to its data shape.

CSV parity details (trove/render/trovesearch_csv.py):
- multivalue cells joined with ' ; '  (:37-38)
- value-key preference order ('@value','@id','name','prefLabel','label')
  when rendering nested objects (:114-129) — here: first non-null of the
  equivalent columns.
"""

from __future__ import annotations

import csv
import io
import json
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MULTIVALUE_JOIN = " ; "  # trove/render/trovesearch_csv.py:37-38
VALUE_KEY_PREFERENCE = ("@value", "@id", "name", "prefLabel", "label")


def to_csv_rows(df: DataFrame, limit: int | None = None) -> Iterator[str]:
    """Streaming CSV rendering: header + rows; arrays joined with ' ; '.

    Streams via toLocalIterator — only one partition's rows are resident on
    the driver at a time (the reference's streaming renderer analog,
    trove/render/_base.py + trovesearch_csv.py:57-65)."""
    cols = df.columns
    out_df = df.select(
        *[
            F.array_join(F.col(c).cast("array<string>"), MULTIVALUE_JOIN).alias(c)
            if df.schema[c].dataType.typeName() == "array"
            else F.col(c)
            for c in cols
        ]
    )
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(cols)
    yield buf.getvalue()
    it = out_df.toLocalIterator()
    n = 0
    for row in it:
        buf = io.StringIO()
        csv.writer(buf).writerow([row[c] for c in cols])
        yield buf.getvalue()
        n += 1
        if limit is not None and n >= limit:
            break


def to_csv(df: DataFrame, limit: int | None = None) -> str:
    return "".join(to_csv_rows(df, limit))


def to_tsv(df: DataFrame, limit: int | None = None) -> str:
    cols = df.columns
    lines = ["\t".join(cols)]
    for row in df.toLocalIterator():
        vals = []
        for c in cols:
            v = row[c]
            if isinstance(v, list):
                v = MULTIVALUE_JOIN.join(str(x) for x in v)
            vals.append("" if v is None else str(v))
        lines.append("\t".join(vals))
        if limit is not None and len(lines) - 1 >= limit:
            break
    return "\n".join(lines) + "\n"


def to_jsonapi(
    df: DataFrame,
    resource_type: str,
    id_col: str,
    total: int | None = None,
    total_relation: str = "eq",
    limit: int = 101,
    render_params=None,
    related: DataFrame | None = None,
    related_meta: DataFrame | None = None,
    unblended: bool | None = None,
) -> dict:
    """JSON:API-shaped document: {data: [{type, id, attributes}], meta}.

    (Shape parity with trove/render/jsonapi; the reference's full gathering
    graph is out of scope — attributes are the result columns.) `limit`
    defaults to the reference MAX_PAGE_SIZE and is always applied — a page
    renderer must never collect an unbounded result.

    `render_params` (query.params.TroveRenderParams) applies the
    `fields[TYPE]=a,b` restriction (trove/util/trove_params.py:44-117): only
    the requested attribute columns are emitted for this resource type.

    blendCards note: the reference's UNblended default wraps every hit in a
    'search-result' resource that merely references an 'index-card'
    resource carrying the content (trovesearch_gathering.py:156-211
    `_unblended_card`); `blendCards` collapses that indirection. A
    DataFrame result row IS the collapsed form — attributes inline, one
    resource per hit — so this renderer emits the blended shape by
    default (the indirection carries no additional information).
    `unblended=True` reproduces the reference's wire shape exactly: data
    becomes 'search-result' wrappers whose only payload is an `indexCard`
    relationship, and the cards move to `included` with their attributes
    (and any include= relationships) intact. `unblended=None` (default)
    follows the querystring when one was parsed: an explicit
    `blendCards=false` (or bare-false value) in render_params selects the
    unblended wrapper, `blendCards=1` the blended collapse; with
    blendCards absent the renderer keeps the blended default (documented
    deviation from the reference's unblended absent-default — the
    collapse is the information-preserving DataFrame-native shape).

    `include=path,path` (JSON:API compound documents; the reference resolves
    includes during gathering, trove/util/trove_params.py:44-117 +
    trovesearch_gathering.py:381-474) needs `related`: a doc_values-shaped
    table (doc_id, path_key, iri_value). Each data row gains a
    `relationships[path]` linkage and the distinct related values are
    emitted once in `included`. Dot-separated include paths walk further
    hops (`include=subj.type`): hop >= 2 resolves against `related_meta`
    (a value_meta-shaped table (doc_id, value_iri, path_key, iri_value) —
    rdf.extract_value_values), attaching relationships to the included
    resources themselves and pulling their targets into `included` — the
    gatherer's arbitrary-path walk, scoped to each card's own graph. Every
    scan is filtered to the page's <=`limit` ids and the requested paths —
    both predicates push down to the parquet scan, so the page cost is
    independent of corpus size."""
    keep = render_params.fields_for(resource_type) if render_params else None
    rows = df.limit(limit).collect()
    inc_paths = tuple(
        getattr(render_params, "included_relations", ()) or ()
    )
    rel_by_doc: dict[object, dict[str, list[str]]] = {}
    inc_entries: dict[tuple[str, str], dict] = {}  # (type, id) -> entry
    if inc_paths and related is None:
        # never silently return a plain document when a compound one was
        # asked for (the reference rejects invalid include params)
        raise ValueError(
            "include= requires a doc_values-shaped `related` table"
        )
    seg_lists = [p.split(".") for p in inc_paths]
    if any(len(s) > 1 for s in seg_lists) and related_meta is None:
        raise ValueError(
            "multi-hop include= (dotted path) requires a value_meta-shaped "
            "`related_meta` table (rdf.extract_value_values)"
        )
    if inc_paths and related is not None and rows:
        page_ids = [r[id_col] for r in rows]
        hop1 = sorted({s[0] for s in seg_lists})
        rel_rows = (
            related.filter(F.col("path_key").isin(hop1))
            .filter(F.col("doc_id").isin(page_ids))
            .filter(F.col("iri_value").isNotNull())
            .select("doc_id", "path_key", "iri_value")
            .distinct()
            .collect()
        )
        # frontier per path-prefix: the (doc, value) pairs reached so far
        frontiers: dict[tuple[str, ...], set[tuple[object, str]]] = {}
        for rr in sorted(
            rel_rows, key=lambda r: (str(r["doc_id"]), r["path_key"], r["iri_value"])
        ):
            rel_by_doc.setdefault(rr["doc_id"], {}).setdefault(
                rr["path_key"], []
            ).append(rr["iri_value"])
            inc_entries.setdefault(
                (rr["path_key"], rr["iri_value"]),
                {"type": rr["path_key"], "id": rr["iri_value"]},
            )
            frontiers.setdefault((rr["path_key"],), set()).add(
                (rr["doc_id"], rr["iri_value"])
            )
        # hop >= 2: walk each dotted path one segment at a time over the
        # card-scoped value_meta rows (one bounded collect per hop depth)
        max_depth = max((len(s) for s in seg_lists), default=1)
        for depth in range(1, max_depth):
            active = {
                tuple(s[: depth + 1])
                for s in seg_lists
                if len(s) > depth and tuple(s[:depth]) in frontiers
            }
            if not active:
                break
            seg_of = {pfx: pfx[depth] for pfx in active}
            want_vals = sorted(
                {v for pfx in active for _, v in frontiers[pfx[:depth]]}
            )
            meta_rows = (
                related_meta.filter(
                    F.col("path_key").isin(sorted(set(seg_of.values())))
                )
                .filter(F.col("doc_id").isin(page_ids))
                .filter(F.col("value_iri").isin(want_vals))
                .filter(F.col("iri_value").isNotNull())
                .select("doc_id", "value_iri", "path_key", "iri_value")
                .distinct()
                .collect()
            )
            for pfx in sorted(active):
                seg = seg_of[pfx]
                src_type = pfx[depth - 1]
                prev = frontiers[pfx[:depth]]
                for mr in sorted(
                    meta_rows,
                    key=lambda r: (str(r["doc_id"]), r["value_iri"], r["iri_value"]),
                ):
                    if mr["path_key"] != seg:
                        continue
                    if (mr["doc_id"], mr["value_iri"]) not in prev:
                        continue
                    src = inc_entries[(src_type, mr["value_iri"])]
                    tgt_ref = {"type": seg, "id": mr["iri_value"]}
                    rels = src.setdefault("relationships", {}).setdefault(
                        seg, {"data": []}
                    )
                    if tgt_ref not in rels["data"]:
                        rels["data"].append(tgt_ref)
                    inc_entries.setdefault((seg, mr["iri_value"]), dict(tgt_ref))
                    frontiers.setdefault(pfx, set()).add(
                        (mr["doc_id"], mr["iri_value"])
                    )
    included = [inc_entries[k] for k in sorted(inc_entries)]
    data = []
    for r in rows:
        attrs = {
            c: r[c]
            for c in df.columns
            if c != id_col and (keep is None or c in keep)
        }
        entry = {
            "type": resource_type,
            "id": str(r[id_col]),
            "attributes": json.loads(json.dumps(attrs, default=str)),
        }
        rels = rel_by_doc.get(r[id_col])
        if rels:
            entry["relationships"] = {
                path: {"data": [{"type": path, "id": v} for v in vals]}
                for path, vals in sorted(rels.items())
            }
        data.append(entry)
    if unblended is None:
        explicit = getattr(render_params, "blend_cards", None)
        unblended = explicit is False  # only an explicit blendCards=false
    if unblended:
        # the reference's default wire shape: a 'search-result' wrapper
        # per hit referencing its 'index-card'; the card (with its
        # attributes and include= relationships) moves to `included`
        cards = [dict(e) for e in data]
        data = [
            {
                "type": "search-result",
                "id": e["id"],
                "relationships": {
                    "indexCard": {
                        "data": {"type": resource_type, "id": e["id"]}
                    }
                },
            }
            for e in data
        ]
        included = cards + included
    doc: dict = {"data": data}
    if included:
        doc["included"] = included
    if total is not None:
        doc["meta"] = {"total": total, "totalRelation": total_relation}
    return doc


def to_jsonl(df: DataFrame, limit: int | None = None) -> Iterator[str]:
    """Newline-delimited JSON (the bulk-export shape)."""
    n = 0
    for row in df.toLocalIterator():
        yield json.dumps(row.asDict(recursive=True), default=str)
        n += 1
        if limit is not None and n >= limit:
            break


def pick_preferred_value(obj: dict) -> object:
    """Value-key preference for nested objects
    (trove/render/trovesearch_csv.py:114-129)."""
    for k in VALUE_KEY_PREFERENCE:
        if k in obj and obj[k] not in (None, ""):
            return obj[k]
    return None


# ---------------------------------------------------------------- XML surface
#
# The reference's remaining renderer registry (trove/render/__init__.py:19-31):
# turtle, jsonld, rss, atom (+ html browse, a human surface out of engine
# scope). These operate on a deterministic row-triples model: an iterable of
# (subject, predicate, object, kind) with kind in {'iri', 'literal'} —
# the engine's flat analog of the reference's tripledict
# (primitive_metadata rdf; trove/render/turtle.py:20-24).

import re as _re
from xml.sax.saxutils import escape as _xml_escape
from xml.sax.saxutils import unescape as _xml_unescape

# match characters not allowed in XML (share/util/xml.py:4-16 parity:
# control chars, lone surrogates, U+FFFE/U+FFFF)
RE_XML_ILLEGAL = _re.compile(
    "([\u0000-\u0008\u000b-\u000c\u000e-\u001f\ufffe-\uffff])"
    + "|"
    + (
        "([%s-%s][^%s-%s])|([^%s-%s][%s-%s])|([%s-%s]$)|(^[%s-%s])"
        % (
            chr(0xD800), chr(0xDBFF), chr(0xDC00), chr(0xDFFF),
            chr(0xD800), chr(0xDBFF), chr(0xDC00), chr(0xDFFF),
            chr(0xD800), chr(0xDBFF), chr(0xDC00), chr(0xDFFF),
        )
    )
)


def strip_illegal_xml_chars(s: str) -> str:
    """share/util/xml.py:19-20."""
    return RE_XML_ILLEGAL.sub("", s)


def prepare_xml_string(s: str | None) -> str | None:
    """Feed-text preparation parity (api/views/feeds.py:21-27): strip
    XML-illegal chars, then unescape pre-escaped entities (escaping happens
    once, at XML generation)."""
    if s:
        return _xml_unescape(strip_illegal_xml_chars(s))
    return s


def _turtle_escape(s: str) -> str:
    return (
        s.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")
        .replace("\r", "\\r").replace("\t", "\\t")
    )


def to_turtle(
    triples: list[tuple],
    prefixes: dict[str, str] | None = None,
) -> str:
    """Deterministic Turtle: prefix block, subjects sorted, predicates sorted
    within subject, objects sorted within predicate (';'/',' grouping like
    rdf.turtle_from_tripledict output shape, trove/render/turtle.py:20-24).
    """
    prefixes = prefixes or {}

    def q(iri: str) -> str:
        for pfx, base in prefixes.items():
            if iri.startswith(base):
                rest = iri[len(base):]
                if rest and all(c.isalnum() or c in "_-." for c in rest):
                    return f"{pfx}:{rest}"
        return f"<{iri}>"

    def obj_str(o, kind):
        if kind == "iri":
            return q(str(o))
        if isinstance(o, bool):
            return "true" if o else "false"
        if isinstance(o, int):
            return str(o)
        if isinstance(o, float):
            return repr(o)
        return f'"{_turtle_escape(str(o))}"'

    by_subj: dict[str, dict[str, list[str]]] = {}
    for s, p, o, kind in triples:
        by_subj.setdefault(s, {}).setdefault(p, []).append(obj_str(o, kind))
    lines = [f"@prefix {pfx}: <{base}> ." for pfx, base in sorted(prefixes.items())]
    if lines:
        lines.append("")
    for s in sorted(by_subj):
        preds = by_subj[s]
        plines = []
        for p in sorted(preds):
            objs = ", ".join(sorted(set(preds[p])))
            plines.append(f"    {q(p)} {objs}")
        lines.append(q(s) + "\n" + " ;\n".join(plines) + " .")
    return "\n".join(lines) + "\n"


def to_html(
    df: DataFrame,
    title: str = "search results",
    limit: int = 101,
    render_params=None,
    resource_type: str = "index-card",
) -> str:
    """Minimal HTML browse surface (trove/render/__init__.py:20 registers an
    html renderer for human browsing): a deterministic table of the result
    page — header row from the columns, arrays joined with ' ; ', everything
    escaped exactly once. `render_params.fields_for(resource_type)` prunes
    columns like the jsonapi renderer. Bounded like every page renderer."""
    keep = render_params.fields_for(resource_type) if render_params else None
    cols = [c for c in df.columns if keep is None or c in keep]
    rows = df.select(*cols).limit(limit).collect()

    def cell(v) -> str:
        if isinstance(v, list):
            v = MULTIVALUE_JOIN.join(str(x) for x in v)
        return _xml_escape("" if v is None else str(v))

    parts = [
        "<!DOCTYPE html><html><head><meta charset=\"utf-8\">",
        f"<title>{_xml_escape(title)}</title></head><body>",
        f"<h1>{_xml_escape(title)}</h1><table><thead><tr>",
        *(f"<th>{_xml_escape(c)}</th>" for c in cols),
        "</tr></thead><tbody>",
    ]
    for r in rows:
        parts.append("<tr>")
        parts.extend(f"<td>{cell(r[c])}</td>" for c in cols)
        parts.append("</tr>")
    parts.append("</tbody></table></body></html>")
    return "".join(parts)


def df_triples(
    df: DataFrame,
    id_col: str = "doc_id",
    base_iri: str = "urn:result:",
    limit: int = 250,
) -> list[tuple]:
    """Row-triples adapter: a result DataFrame -> (s, p, o, kind) rows for
    the RDF renderers. Each row becomes a subject `base_iri + id`; each
    non-id column a predicate; string values that look like IRIs keep 'iri'
    kind so turtle/jsonld emit them as resources (the flat analog of the
    reference's gathered tripledict, trove/render/turtle.py:20-24).
    Bounded by `limit` — a renderer never collects unbounded results."""
    triples: list[tuple] = []
    for r in df.limit(limit).collect():
        subj = f"{base_iri}{r[id_col]}"
        for c in df.columns:
            if c == id_col:
                continue
            vals = r[c] if isinstance(r[c], list) else [r[c]]
            for v in vals:
                if v is None:
                    continue
                kind = (
                    "iri"
                    if isinstance(v, str)
                    and ("://" in v or v.startswith("urn:"))
                    else "literal"
                )
                triples.append((subj, c, v, kind))
    return triples


def to_jsonld(
    triples: list[tuple],
    context: dict[str, str] | None = None,
) -> str:
    """Deterministic JSON-LD: @graph of @id-keyed nodes, sort_keys
    (trove/render/jsonld.py render shape: json.dumps(indent=2, sort_keys))."""
    nodes: dict[str, dict] = {}
    for s, p, o, kind in triples:
        node = nodes.setdefault(s, {"@id": s})
        val = {"@id": str(o)} if kind == "iri" else o
        node.setdefault(p, []).append(val)
    doc: dict = {"@graph": [nodes[s] for s in sorted(nodes)]}
    if context:
        doc["@context"] = dict(sorted(context.items()))
    return json.dumps(doc, indent=2, sort_keys=True, default=str)


def _feed_items(df: DataFrame, limit: int) -> list[dict]:
    rows = df.limit(limit).collect()
    return [r.asDict() for r in rows]


def to_rss(
    df: DataFrame,
    *,
    title: str,
    link: str,
    description: str,
    item_title_col: str = "title",
    item_link_col: str = "link",
    item_desc_col: str = "description",
    item_date_col: str = "date",
    limit: int = 250,
) -> str:
    """RSS 2.0 feed over a result DataFrame (api/views/feeds.py analog;
    RESULTS_PER_PAGE=250). Text goes through prepare_xml_string then is
    escaped exactly once at generation."""

    def el(tag, text):
        t = prepare_xml_string(str(text)) if text is not None else ""
        return f"<{tag}>{_xml_escape(t)}</{tag}>"

    parts = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<rss version="2.0"><channel>',
        el("title", title),
        el("link", link),
        el("description", description),
    ]
    for it in _feed_items(df, limit):
        parts.append("<item>")
        parts.append(el("title", it.get(item_title_col)))
        parts.append(el("link", it.get(item_link_col)))
        parts.append(el("description", it.get(item_desc_col)))
        d = it.get(item_date_col)
        if d is not None:
            parts.append(el("pubDate", d))
        parts.append(el("guid", it.get(item_link_col)))
        parts.append("</item>")
    parts.append("</channel></rss>")
    return "".join(parts)


def to_atom(
    df: DataFrame,
    *,
    title: str,
    link: str,
    feed_id: str,
    updated: str,
    item_title_col: str = "title",
    item_link_col: str = "link",
    item_desc_col: str = "description",
    item_date_col: str = "date",
    limit: int = 250,
) -> str:
    """Atom 1.0 feed (django Atom1Feed shape, api/views/feeds.py:88-97)."""

    def el(tag, text):
        t = prepare_xml_string(str(text)) if text is not None else ""
        return f"<{tag}>{_xml_escape(t)}</{tag}>"

    parts = [
        '<?xml version="1.0" encoding="utf-8"?>',
        '<feed xmlns="http://www.w3.org/2005/Atom">',
        el("title", title),
        f'<link href="{_xml_escape(link, {chr(34): "&quot;"})}"/>',
        el("id", feed_id),
        el("updated", updated),
    ]
    for it in _feed_items(df, limit):
        parts.append("<entry>")
        parts.append(el("title", it.get(item_title_col)))
        href = _xml_escape(str(it.get(item_link_col) or ""), {chr(34): "&quot;"})
        parts.append(f'<link href="{href}"/>')
        parts.append(el("id", it.get(item_link_col)))
        d = it.get(item_date_col)
        if d is not None:
            parts.append(el("updated", d))
        parts.append(el("summary", it.get(item_desc_col)))
        parts.append("</entry>")
    parts.append("</feed>")
    return "".join(parts)
