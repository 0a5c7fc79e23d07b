"""XES-XML reader/writer (reference ``src/stream/xes.rs``).

Reader semantics mirror the reference's streaming parser
(``xes.rs:562-714``): one ``<log>`` root required (fail otherwise,
``xes.rs:700-705``); the header (extensions, globals, classifiers,
log-level attributes) may appear in any order *before* the first trace
or event, but any header element after payload has started is a parse
error (meta -> payload state machine, ``observer.rs:90-100``; corpus
``non_parsing/misplaced_*``); unknown elements are a parse error
(``non_parsing/element_incorrect.xes``); typed values (int/float/
boolean/date) are parsed eagerly and fail fast (``xes.rs:99-125``).
Extra XML attributes on known elements are tolerated (superset-lenient,
corpus ``recoverable/*_too_many_attributes``).

The parse itself is driver-side ``iterparse`` (XES is a single-document
interchange format — the root element makes the file inherently
sequential). For cluster-scale logs use :func:`read_xes_distributed`,
which parses each ``<trace>`` block independently via Spark's built-in
XML source, or — better — convert once to parquet and never touch XML
again.

Deviations from the reference (documented, deliberate):
- Timestamps are normalized to UTC on read (Spark has no
  timestamp-with-offset type); the writer emits UTC RFC-3339. Write →
  read → write therefore converges byte-identically from generation 1.
- Nested child attributes and list attributes are JSON-encoded into the
  ``attrs`` map (type tag suffixed ``+json``) instead of kept as a
  recursive structure; they round-trip losslessly.
"""

from __future__ import annotations

import io as _io
import json
import math
import os
from datetime import datetime, timezone
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

from pyspark.sql import SparkSession

from promi_spark.log import EventLog
from promi_spark.schema import (
    EVENTS_SCHEMA,
    RE_XS_ANYURI,
    RE_XS_NAME,
    RE_XS_NCNAME,
    RE_XS_TOKEN,
    WELL_KNOWN_KEYS,
    ClassifierDecl,
    ExtensionDecl,
    Global,
    Meta,
    parse_xml_bool,
)

XES_NS = "http://www.xes-standard.org/"

ATTR_TAGS = frozenset(("string", "date", "int", "float", "boolean", "id", "list"))
_COL_FOR_KEY = dict(WELL_KNOWN_KEYS)


class XesParseError(ValueError):
    """Raised on malformed XES (the corpus' ``non_parsing`` class)."""


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _parse_date(lexical: str) -> datetime:
    """RFC-3339 -> aware UTC datetime. Fail fast on malformed input
    (``non_parsing/date_incorrect_value.xes``, ``date_no_t_z_d.xes``)."""
    try:
        dt = datetime.fromisoformat(lexical.replace("Z", "+00:00"))
    except ValueError as e:
        raise XesParseError(f"bad date literal {lexical!r}") from e
    if dt.tzinfo is None:
        raise XesParseError(f"date literal missing offset: {lexical!r}")
    return dt.astimezone(timezone.utc)


def _parse_scalar(tag: str, value: str) -> str:
    """Validate + canonicalize a typed lexical value; returns the
    canonical lexical form stored in the attrs map."""
    try:
        if tag == "int":
            return str(int(value))
        if tag == "float":
            f = float(value)
            if math.isnan(f) or math.isinf(f):
                return value
            return repr(f)
        if tag == "boolean":
            return "true" if parse_xml_bool(value) else "false"
        if tag == "date":
            return _parse_date(value).strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "+00:00"
    except XesParseError:
        raise
    except ValueError as e:
        raise XesParseError(f"bad {tag} literal {value!r}") from e
    return value


def _attr_from_elem(elem) -> tuple[str, str, str]:
    """One attribute element -> (key, type_tag, canonical_value).

    Nested children / list values are JSON-encoded (tag suffix
    ``+json``): ``{"v": scalar, "c": [[key, tag, value, children], ...]}``.
    """
    tag = _strip_ns(elem.tag)
    if tag not in ATTR_TAGS:
        raise XesParseError(f"unknown attribute element <{tag}>")
    key = elem.get("key")
    if key is None:
        raise XesParseError(f"<{tag}> without key")
    value = elem.get("value")
    if tag != "list" and value is None:
        raise XesParseError(f"<{tag} key={key!r}> without value")

    children = _child_attrs(elem)
    if tag == "list":
        # <list><values>attr*</values></list>; duplicate keys allowed,
        # order preserved (reference attribute.rs:24-33 List variant)
        values = []
        for sub in elem:
            if _strip_ns(sub.tag) == "values":
                for a in sub:
                    values.append(_attr_tuple(a))
            elif _strip_ns(sub.tag) in ATTR_TAGS:  # nested attr on the list itself
                continue
            else:
                raise XesParseError(f"unknown element <{_strip_ns(sub.tag)}> in list")
        return key, "list+json", json.dumps(values, ensure_ascii=False)
    canonical = _parse_scalar(tag, value)
    if children:
        payload = json.dumps({"v": canonical, "c": children}, ensure_ascii=False)
        return key, tag + "+json", payload
    return key, tag, canonical


def _attr_tuple(elem) -> list:
    tag = _strip_ns(elem.tag)
    if tag not in ATTR_TAGS:
        raise XesParseError(f"unknown attribute element <{tag}>")
    key = elem.get("key")
    value = elem.get("value")
    if key is None or (tag != "list" and value is None):
        raise XesParseError(f"<{tag}> missing key/value")
    return [key, tag, _parse_scalar(tag, value) if tag != "list" else None,
            _child_attrs(elem)]


def _child_attrs(elem) -> list:
    out = []
    for sub in elem:
        t = _strip_ns(sub.tag)
        if t == "values":  # handled by list logic
            continue
        if t in ATTR_TAGS:
            out.append(_attr_tuple(sub))
        else:
            raise XesParseError(f"unknown element <{t}> inside attribute")
    return out


def _collect_attrs(elem, context: str) -> tuple[dict[str, str], dict[str, str]]:
    """All attribute children of a trace/event element -> (attrs,
    attr_types) maps. Last write wins on duplicate keys (BTreeMap
    insert semantics, reference attribute.rs:327-336; fixture
    ``non_validating/event_identical_attributes.xes``)."""
    attrs: dict[str, str] = {}
    types: dict[str, str] = {}
    for sub in elem:
        t = _strip_ns(sub.tag)
        if t in ATTR_TAGS:
            k, tag, v = _attr_from_elem(sub)
            attrs[k] = v
            types[k] = tag
        elif context == "trace" and t == "event":
            continue  # events handled by the caller
        else:
            raise XesParseError(f"unknown element <{t}> in <{context}>")
    return attrs, types


def _meta_elem(meta: Meta, elem, tag: str) -> None:
    if tag == "extension":
        name, prefix, uri = elem.get("name"), elem.get("prefix"), elem.get("uri")
        if name is None or prefix is None or uri is None:
            raise XesParseError("extension missing name/prefix/uri")
        meta.extensions.append(ExtensionDecl(name, prefix, uri))
    elif tag == "global":
        # missing scope defaults to event; a bad literal is an error
        # (reference component.rs Scope::try_from)
        scope = elem.get("scope", "event")
        if scope not in ("trace", "event"):
            raise XesParseError(f"global with bad scope {scope!r}")
        for sub in elem:
            k, t, v = _attr_from_elem(sub)
            meta.globals.append(Global(scope=scope, key=k, type=t, default=v))
    elif tag == "classifier":
        name, keys = elem.get("name"), elem.get("keys")
        scope = elem.get("scope", "event")
        if name is None or keys is None:
            raise XesParseError("classifier missing name/keys")
        if scope not in ("trace", "event"):
            raise XesParseError(f"classifier with bad scope {scope!r}")
        meta.classifiers.append(ClassifierDecl(name=name, scope=scope, keys=keys))


def parse_xes(source) -> tuple[Meta, list[dict]]:
    """Parse an XES file (path or file-like) into (Meta, event rows).

    Rows are dicts matching :data:`EVENTS_SCHEMA`. Trace-level
    attributes ride on every row of the trace (``case_attrs``; their
    type tags in ``attr_types`` under ``case:<key>``). An empty trace
    yields one marker row with ``seq`` NULL.
    """
    if isinstance(source, (str, os.PathLike)):
        source = _open_xes(source)
    meta = Meta()
    rows: list[dict] = []
    payload_started = False
    saw_log = False
    trace_idx = -1
    standalone_idx = 0

    try:
        it = ET.iterparse(source, events=("start", "end"))
        _, root = next(it)
    except ET.ParseError as e:
        raise XesParseError(f"broken XML: {e}") from e
    if _strip_ns(root.tag) != "log":
        raise XesParseError(f"root element is <{_strip_ns(root.tag)}>, not <log>")
    saw_log = True

    depth = 1  # inside <log>
    try:
        for ev, elem in it:
            if ev == "start":
                depth += 1
                continue
            depth -= 1
            if depth != 1:
                continue  # only handle direct children of <log>, fully built
            tag = _strip_ns(elem.tag)
            if tag in ("extension", "global", "classifier"):
                if payload_started:
                    raise XesParseError(f"<{tag}> after payload started")
                _meta_elem(meta, elem, tag)
            elif tag in ATTR_TAGS:
                if payload_started:
                    raise XesParseError("log attribute after payload started")
                k, t, v = _attr_from_elem(elem)
                meta.attributes[k] = v
                meta.attribute_types[k] = t
            elif tag == "trace":
                payload_started = True
                if standalone_idx > 0:
                    # Meta < Trace < Event monotonicity: a trace after a
                    # standalone event parses (superset-lenient) but the
                    # validator must flag it (reference observer state
                    # machine, observer.rs:90-100; corpus
                    # non_validating/misplaced_trace_event.xes)
                    meta.notes["order"] = "trace-after-standalone-event"
                trace_idx += 1
                rows.extend(_trace_rows(elem, trace_idx))
            elif tag == "event":
                payload_started = True
                rows.append(_event_row(elem, None, standalone_idx, None, None))
                standalone_idx += 1
            else:
                raise XesParseError(f"unknown element <{tag}> in <log>")
            elem.clear()
    except ET.ParseError as e:
        raise XesParseError(f"broken XML: {e}") from e
    if not saw_log:
        raise XesParseError("no <log> element")
    return meta, rows


def _trace_rows(elem, trace_idx: int) -> list[dict]:
    case_attrs, case_types = _collect_attrs(elem, "trace")
    case_id = case_attrs.get("concept:name", f"trace#{trace_idx}")
    prefixed_types = {f"case:{k}": v for k, v in case_types.items()}
    out = []
    seq = 0
    for sub in elem:
        if _strip_ns(sub.tag) == "event":
            out.append(_event_row(sub, case_id, seq, case_attrs, prefixed_types))
            seq += 1
    if not out:  # empty trace: marker row, seq NULL
        out.append(
            {
                "case_id": case_id,
                "seq": None,
                "case_attrs": case_attrs,
                "attr_types": prefixed_types,
            }
        )
    return out


def _event_row(
    elem, case_id, seq, case_attrs, case_types
) -> dict:
    attrs, types = _collect_attrs(elem, "event")
    row: dict = {
        "case_id": case_id,
        "seq": seq,
        "case_attrs": case_attrs,
    }
    for key, col in _COL_FOR_KEY.items():
        expected = "date" if col == "ts" else "string"
        if key in attrs and types.get(key) == expected:
            v = attrs.pop(key)
            types.pop(key)
            row[col] = _parse_date(v) if col == "ts" else v
    if case_types:
        types.update(case_types)
    row["attrs"] = attrs or None
    row["attr_types"] = types or None
    return row


def _open_xes(path):
    """Binary reader over a (possibly gzip-compressed) XES file. Sniffs
    the gzip magic rather than trusting the extension, so ``.xes`` files
    that are secretly compressed (a common corpus-mirror artifact) parse
    too."""
    import gzip

    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return gzip.open(f, "rb")
    return f


def read_xes(spark: SparkSession, path: str) -> EventLog:
    """XES file (plain or ``.xes.gz``) -> EventLog (driver-side parse;
    see module docstring)."""
    meta, rows = parse_xes(path)
    df = spark.createDataFrame(rows, schema=EVENTS_SCHEMA) if rows else (
        spark.createDataFrame([], schema=EVENTS_SCHEMA)
    )
    return EventLog(df=df, meta=meta)


def read_xes_distributed(spark: SparkSession, path: str) -> EventLog:
    """Cluster-scale XES ingest: header parsed on the driver (it is a
    bounded prefix), ``<trace>`` blocks parsed in parallel by Spark's
    built-in XML source with ``rowTag='trace'`` — the XML source splits
    a single file at rowTag boundaries, so trace parsing scales across
    executors. Each raw trace string is re-parsed with the same strict
    element rules as :func:`read_xes` inside ``mapInPandas``
    (Arrow-batched; the per-trace XML subtrees are independent).

    ``path`` may be a single file, a ``.xes.gz`` file, a directory, or
    a glob — the realistic corpus layout (the reference parses single
    plain files only, ``/root/reference/src/stream/xes.rs:812-823``).
    Spark's text source lists directories/globs and decompresses gzip
    natively; gz files are unsplittable so they parallelize per-file
    (one task each), plain files also split WITHIN the file at trace
    boundaries. For a directory/glob the Meta header is taken from the
    lexicographically FIRST file — multi-file corpora are presumed
    header-consistent shards of one log (the usual export layout);
    parse per-file with :func:`read_xes` when headers genuinely differ.

    The XML source cannot enforce the reference's whole-document
    element-order state machine (e.g. a ``<classifier>`` after the first
    trace); use :func:`read_xes` when strict corpus semantics matter.
    Standalone log-level events are not supported on this path.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    meta, _ = parse_xes(_header_only(_first_xes_file(path)))
    # Split the file at </trace> boundaries with the text source's
    # lineSep — a distributed, splittable scan (each "line" is one
    # trace block plus whatever preceded it; the header lands in the
    # first fragment and is stripped by the regex).
    txt = spark.read.option("lineSep", "</trace>").text(path)
    frag = F.regexp_extract("value", r"(?s).*?(<trace[\s>].*)", 1)
    raw = (
        txt.select(F.concat(frag, F.lit("</trace>")).alias("_raw"))
        .filter(F.length(frag) > 0)
        # Unique fallback identity for traces lacking concept:name —
        # without it every unnamed trace would collapse into one
        # "trace#-1" case. monotonically_increasing_id is unique across
        # partitions without any coordination (partition id in the high
        # bits), so the fallback stays a narrow, shuffle-free expression.
        .withColumn("_tid", F.monotonically_increasing_id())
    )

    def convert(batches):
        for pdf in batches:
            out: list[dict] = []
            for xml, tid in zip(pdf["_raw"], pdf["_tid"]):
                elem = ET.fromstring(xml)
                out.extend(_trace_rows(elem, int(tid)))
            res = pd.DataFrame(
                out, columns=[f.name for f in EVENTS_SCHEMA.fields]
            )
            # An all-NULL ts column infers as float64 and Arrow refuses
            # the double->timestamp cast; coerce so timestamp-less
            # traces survive the Arrow conversion.
            res["ts"] = pd.to_datetime(res["ts"])
            yield res

    df = raw.mapInPandas(convert, schema=EVENTS_SCHEMA)
    return EventLog(df=df, meta=meta)


def _first_xes_file(path: str) -> str:
    """Resolve a file/dir/glob ingest path to the single file whose
    header supplies the log Meta (lexicographically first for
    multi-file layouts)."""
    import glob as _glob

    if os.path.isdir(path):
        cands = sorted(
            p
            for p in _glob.glob(os.path.join(path, "*"))
            if p.endswith((".xes", ".xes.gz"))
        )
    elif any(ch in path for ch in "*?["):
        cands = sorted(_glob.glob(path))
    else:
        return path
    if not cands:
        raise XesParseError(f"no .xes/.xes.gz files under {path!r}")
    return cands[0]


def _header_only(path: str):
    """A file-like over the log header (everything before the first
    <trace>/<event>) closed with </log> — driver reads O(header) bytes
    (gzip: O(header) decompressed)."""
    import io as _tio

    buf = []
    with _tio.TextIOWrapper(
        _open_xes(path), encoding="utf-8", errors="replace"
    ) as f:
        for line in f:
            s = line.lstrip()
            if s.startswith("<trace") or s.startswith("<event"):
                buf.append("</log>")
                break
            buf.append(line)
        else:
            pass
    return _io.BytesIO("".join(buf).encode())


# ---------------------------------------------------------------------------
# Writer (reference xes.rs:717-796; per-type writers xes.rs:272-458)
# ---------------------------------------------------------------------------


class XesWriteError(ValueError):
    pass


def _check(pattern, value: str, what: str) -> str:
    if not pattern.match(value):
        raise XesWriteError(f"invalid {what}: {value!r}")
    return value


def _fmt_ts(dt: datetime) -> str:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    dt = dt.astimezone(timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "+00:00"


def _attr_xml(key: str, tag: str, value: str | None, children: list, ind: str) -> str:
    """Serialize one attribute (possibly nested/list) to XML."""
    _check(RE_XS_NAME, key, "attribute key (xs:Name)")
    base = tag.removesuffix("+json")
    if base == "list":
        values = json.loads(value) if value else []
        inner = "".join(
            _attr_xml(k, t, v, c, ind + "\t\t") for k, t, v, c in values
        )
        return (
            f"{ind}<list key={quoteattr(key)}>\n{ind}\t<values>\n"
            f"{inner}{ind}\t</values>\n{ind}</list>\n"
        )
    if tag.endswith("+json"):
        payload = json.loads(value)
        scalar, children = payload["v"], payload["c"]
    else:
        scalar = value
    child_xml = "".join(_attr_xml(k, t, v, c, ind + "\t") for k, t, v, c in children)
    open_tag = f"{ind}<{base} key={quoteattr(key)} value={quoteattr(scalar)}"
    if child_xml:
        return f"{open_tag}>\n{child_xml}{ind}</{base}>\n"
    return f"{open_tag}/>\n"


def _row_attr_items(attrs, attr_types, skip_prefix: str | None = None):
    for k in sorted((attrs or {}).keys()):  # BTreeMap parity: sorted keys
        tag = (attr_types or {}).get(k, "string")
        yield k, tag, attrs[k]


def _render_header(meta: Meta) -> str:
    """Document header: decl, log open tag, extensions, globals,
    classifiers, log-level attributes — with the reference's lexical
    validation (xes.rs writer + xml_util.rs): extension prefix /
    classifier name are xs:NCName, extension name xs:Name, URIs
    xs:anyURI, attribute keys xs:Name, classifier keys xs:token."""
    out = ["<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"]
    out.append(
        '<log xes.version="1849.2016" xes.features="nested-attributes">\n'
    )
    for e in meta.extensions:
        _check(RE_XS_NAME, e.name, "extension name (xs:Name)")
        _check(RE_XS_NCNAME, e.prefix, "extension prefix (xs:NCName)")
        _check(RE_XS_ANYURI, e.uri, "extension uri (xs:anyURI)")
        out.append(
            f"\t<extension name={quoteattr(e.name)} prefix={quoteattr(e.prefix)} "
            f"uri={quoteattr(e.uri)}/>\n"
        )
    for scope in ("trace", "event"):
        gs = meta.globals_for(scope)
        if gs:
            out.append(f'\t<global scope="{scope}">\n')
            for g in gs:
                out.append(_attr_xml(g.key, g.type, g.default, [], "\t\t"))
            out.append("\t</global>\n")
    for c in meta.classifiers:
        _check(RE_XS_NCNAME, c.name, "classifier name (xs:NCName)")
        _check(RE_XS_TOKEN, c.keys, "classifier keys (xs:token)")
        out.append(
            f"\t<classifier name={quoteattr(c.name)} keys={quoteattr(c.keys)}/>\n"
        )
    for k, tag_v in sorted(meta.attributes.items()):
        # meta.attributes stores canonical lexical values; type defaults
        # to string unless the value was stored with a typed tag
        out.append(_attr_xml(k, _meta_attr_tag(meta, k), tag_v, [], "\t"))
    return "".join(out)


def _event_xml(r, ind: str) -> str:
    """One <event> element from a row-mapping (Spark Row or plain dict
    with the EVENTS_SCHEMA column names)."""
    parts = [f"{ind}<event>\n"]
    merged: list[tuple[str, str, str]] = []
    for key, col in _COL_FOR_KEY.items():
        v = r[col]
        if v is not None:
            tag = "date" if col == "ts" else "string"
            merged.append((key, tag, _fmt_ts(v) if col == "ts" else v))
    for k, tag, v in _row_attr_items(r["attrs"], r["attr_types"]):
        merged.append((k, tag, v))
    for k, tag, v in sorted(merged):
        parts.append(_attr_xml(k, tag, v, [], ind + "\t"))
    parts.append(f"{ind}</event>\n")
    return "".join(parts)


def _trace_xml(case_id: str, cattrs: dict, ctypes: dict, rows) -> str:
    """One <trace> element; ``rows`` already ordered by seq."""
    out = ["\t<trace>\n"]
    if "concept:name" not in cattrs:
        # Logs built from generic tables carry case identity only in
        # the case_id column; persist it as the trace's concept:name
        # (which is exactly what the reader derives case_id from) so
        # the round-trip preserves case identity.
        cattrs = {**cattrs, "concept:name": case_id}
    for k in sorted(cattrs.keys()):
        out.append(_attr_xml(k, ctypes.get(k, "string"), cattrs[k], [], "\t\t"))
    for r in rows:
        out.append(_event_xml(r, "\t\t"))
    out.append("\t</trace>\n")
    return "".join(out)


def _case_types(attr_types: dict | None) -> dict:
    return {
        k.removeprefix("case:"): v
        for k, v in (attr_types or {}).items()
        if k.startswith("case:")
    }


# write_xes collects at most this many rows to the driver; above it the
# export automatically takes the bounded-memory distributed path
# (byte-identical output, one partition resident at a time). Sized so
# the collect path stays a fixture/interop convenience: 100k rows of
# the widest test logs is ~100 MB on the driver.
XES_COLLECT_ROW_CEILING = 100_000


def write_xes(
    log: EventLog,
    path: str,
    max_collect_rows: int | None = XES_COLLECT_ROW_CEILING,
) -> None:
    """Serialize an EventLog to XES-XML (traces ordered by case_id,
    events by seq — deterministic, convergent round-trip).

    Logs larger than ``max_collect_rows`` are NOT collected: the write
    delegates to :func:`write_xes_distributed` (distributed render,
    streamed merge — byte-identical output), so the default path is
    safe at any size. Pass ``max_collect_rows=None`` to force the
    driver-side collect regardless of size."""
    if max_collect_rows is not None and log.df.count() > max_collect_rows:
        return write_xes_distributed(log, path)
    meta = log.meta
    rows = log.df.collect()

    traces: dict[str, list] = {}
    trace_attrs: dict[str, tuple] = {}
    attr_src_seq: dict[str, float] = {}
    standalone: list = []
    for r in rows:
        if r["case_id"] is None:
            standalone.append(r)
        else:
            traces.setdefault(r["case_id"], [])
            if r["seq"] is not None:
                traces[r["case_id"]].append(r)
            # Take case_attrs/attr_types from the seq-min row (not the
            # arbitrary collect order) so output matches
            # write_xes_distributed byte-for-byte even when rows of a
            # case disagree on case-level attributes. A null seq maps to
            # -inf because the distributed writer sorts (case_id, seq)
            # ascending NULLS FIRST — a trace-attrs marker row (null
            # seq) must win the pick in BOTH writers.
            seq = float("-inf") if r["seq"] is None else r["seq"]
            if r["case_id"] not in trace_attrs or seq < attr_src_seq[r["case_id"]]:
                attr_src_seq[r["case_id"]] = seq
                trace_attrs[r["case_id"]] = (
                    r["case_attrs"] or {},
                    _case_types(r["attr_types"]),
                )

    out = [_render_header(meta)]
    for case_id in sorted(traces.keys()):
        cattrs, ctypes = trace_attrs.get(case_id, ({}, {}))
        out.append(
            _trace_xml(
                case_id,
                cattrs,
                ctypes,
                sorted(traces[case_id], key=lambda r: r["seq"]),
            )
        )
    for r in standalone:
        out.append(_event_xml(r, "\t"))
    out.append("</log>\n")
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(out))


def write_xes_distributed(log: EventLog, path: str) -> None:
    """XES export that never collects the log: traces are rendered to
    XML fragments in parallel (range-partitioned on ``case_id`` and
    sorted, so each task owns whole traces in output order), then the
    driver streams partition results to the file with
    ``toLocalIterator`` — one partition resident at a time, bounded
    driver memory regardless of log size. This is the 100 TB shape of
    single-document export: distributed render, sequential merge
    (reference writer is inherently sequential, ``xes.rs:717-796``).

    Output is byte-identical to :func:`write_xes` for the same log.
    """
    import pandas as pd
    from pyspark.sql import functions as F

    meta = log.meta
    df = log.df

    def render(batches):
        # Batches arrive range-partitioned+sorted; a trace may straddle
        # Arrow batch boundaries but never partition boundaries, so a
        # carry buffer across batches per partition is enough.
        cur_id = None
        cur_rows: list[dict] = []
        cur_attrs: tuple = ({}, {})
        pend: list[str] = []

        def flush():
            if cur_id is not None:
                pend.append(
                    _trace_xml(cur_id, cur_attrs[0], cur_attrs[1], cur_rows)
                )

        def norm(k, v):
            # Arrow->pandas turns MapType into a list of (k, v) tuples
            # and NULL scalars into NaN/NaT; normalize back to the
            # dict/None shapes the shared renderers expect.
            if k in ("attrs", "attr_types", "case_attrs"):
                if v is None:
                    return None
                if isinstance(v, dict):
                    return v
                try:
                    return dict(v)
                except (TypeError, ValueError):
                    return None
            if v is None:
                return None
            try:
                if pd.isna(v):
                    return None
            except (TypeError, ValueError):
                pass
            return v

        for pdf in batches:
            for rec in pdf.to_dict("records"):
                r = {k: norm(k, v) for k, v in rec.items()}
                cid = r["case_id"]
                if cid != cur_id:
                    flush()
                    cur_id, cur_rows = cid, []
                    cur_attrs = (
                        r["case_attrs"] or {},
                        _case_types(r["attr_types"]),
                    )
                if r["seq"] is not None:
                    cur_rows.append(r)
            if pend:
                yield pd.DataFrame({"xml": pend})
                pend = []
        flush()
        if pend:
            yield pd.DataFrame({"xml": pend})

    traced = (
        df.filter(F.col("case_id").isNotNull())
        .repartitionByRange("case_id")
        .sortWithinPartitions("case_id", "seq")
    )
    fragments = traced.mapInPandas(render, schema="xml string")

    # standalone (NULL-case) events stream through toLocalIterator too —
    # a log that is mostly standalone events must not collect to driver
    standalone = df.filter(F.col("case_id").isNull())
    with open(path, "w", encoding="utf-8") as f:
        f.write(_render_header(meta))
        for row in fragments.toLocalIterator():
            f.write(row["xml"])
        for r in standalone.toLocalIterator():
            f.write(_event_xml(r, "\t"))
        f.write("</log>\n")


def _meta_attr_tag(meta: Meta, key: str) -> str:
    # Prefer the recorded type tag (parse_xes stores it); fall back to
    # inferring from the stored canonical form for Metas built by hand.
    t = meta.attribute_types.get(key)
    if t:
        return t
    v = meta.attributes.get(key, "")
    if v.startswith("{") and '"c"' in v:
        return "string+json"
    if v.startswith("["):
        return "list+json"
    return "string"


def log_counts(log: EventLog) -> tuple[int, int, int]:
    """[n_traces, n_events_in_traces, n_events_total] — the reference's
    golden-count triple (stats.rs:104, tests stats.rs:177-200)."""
    from pyspark.sql import functions as F

    r = log.df.agg(
        F.countDistinct("case_id").alias("t"),
        F.count(F.when(F.col("case_id").isNotNull() & F.col("seq").isNotNull(), 1)).alias("e"),
        F.count(F.when(F.col("seq").isNotNull(), 1)).alias("n"),
    ).first()
    return r["t"], r["e"], r["n"]
