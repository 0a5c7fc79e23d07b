"""Pure-Python structural validator for IEEE 1849-2016 XES documents.

The reference validates its writer output with ``xmllint --schema
static/xes/xes-ieee-1849-2016.xsd`` (``static/xes/validate.sh``,
``src/stream/xes.rs:918-964``).  This module encodes that XSD's closed
grammar directly — element content models, required/allowed XML
attributes, and lexical datatype checks — so the same oracle runs in
environments without the ``xmllint`` binary or an XSD library.

It is NOT a generic XSD engine: the IEEE 1849-2016 schema is a closed
129-line grammar with no wildcards, so a direct encoding is both smaller
and easier to audit than a schema interpreter.  Driver-side only; used
as a test oracle for :func:`promi_spark.io.xes.write_xes` output, never
in a distributed hot path.

Grammar encoded (xes-ieee-1849-2016.xsd, April-15-2020 revision):

- root ``log`` [xes.version: decimal required; xes.features: token]
  with sequence: extension*, global*, classifier*, attribute*, trace*,
  event* (order enforced — it is an ``xs:sequence``).
- ``trace``: attribute*, event* (order enforced).  ``event``: attribute*.
- attribute elements are the choice {string, date, int, float, boolean,
  id, list}; each requires ``key`` (xs:Name) and — except ``list`` —
  ``value`` with a per-tag lexical space (dateTime/long/double/boolean).
- ``list`` = nested attribute* followed by exactly one ``values`` child
  (type AttributeType, so ``values`` itself requires a ``key``).
- ``extension`` [name, prefix: NCName required; uri required],
  ``classifier`` [name: NCName, keys: token required; scope: NCName],
  ``global`` [scope: NCName] — attribute-element children only for
  ``global``; none for extension/classifier.
- complex types are closed: undeclared XML attributes and non-whitespace
  text content are errors, exactly as xmllint reports them.
"""
from __future__ import annotations

import re
import xml.etree.ElementTree as ET

__all__ = ["validate_xes", "is_valid_xes"]

ATTR_TAGS = ("string", "date", "int", "float", "boolean", "id", "list")

_LONG_RE = re.compile(r"^[+-]?\d+$")
_DOUBLE_RE = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?$")
_DECIMAL_RE = re.compile(r"^[+-]?(\d+(\.\d*)?|\.\d+)$")
_DATETIME_RE = re.compile(
    r"^(-?\d{4,})-(\d{2})-(\d{2})T(\d{2}):(\d{2}):(\d{2})(\.\d+)?"
    r"(Z|[+-]\d{2}:\d{2})?$"
)
# Practical XML-name subset: unicode word chars plus .-·, no leading
# digit/punct.  (Full XML 1.0 name classes are broader but nothing in
# the corpus or our writer leaves this subset.)
_NCNAME_RE = re.compile(r"^[^\W\d][\w.\-·]*$", re.UNICODE)


def _is_long(s: str) -> bool:
    s = s.strip()
    return bool(_LONG_RE.match(s)) and -(2**63) <= int(s) < 2**63


def _is_double(s: str) -> bool:
    s = s.strip()
    return s in ("INF", "-INF", "NaN") or bool(_DOUBLE_RE.match(s))


def _is_boolean(s: str) -> bool:
    return s.strip() in ("true", "false", "1", "0")


def _is_decimal(s: str) -> bool:
    return bool(_DECIMAL_RE.match(s.strip()))


_MONTH_DAYS = (31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31)


def _is_datetime(s: str) -> bool:
    m = _DATETIME_RE.match(s.strip())
    if not m:
        return False
    year, month, day = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hh, mm, ss = int(m.group(4)), int(m.group(5)), int(m.group(6))
    # proleptic-Gregorian calendar check for ANY year (datetime.date
    # only covers 1..9999, and clamping would judge leap days against
    # the wrong year); year 0000 is invalid in the XSD 1.0 lexical
    # space xmllint enforces
    if year == 0 or not 1 <= month <= 12:
        return False
    leap = year % 4 == 0 and (year % 100 != 0 or year % 400 == 0)
    max_day = 29 if (month == 2 and leap) else _MONTH_DAYS[month - 1]
    if not 1 <= day <= max_day:
        return False
    if hh == 24:  # xs:dateTime allows 24:00:00(.0*) as end-of-day
        if mm != 0 or ss != 0 or (m.group(7) or "").strip(".0"):
            return False
    elif hh > 23 or mm > 59 or ss > 59:
        return False
    tz = m.group(8)
    if tz and tz != "Z":
        tzh, tzm = int(tz[1:3]), int(tz[4:6])
        if tzh > 14 or tzm > 59 or (tzh == 14 and tzm != 0):
            return False
    return True


def _is_ncname(s: str) -> bool:
    return bool(_NCNAME_RE.match(s.strip()))


_NAME_RE = re.compile(r"^[^\W\d][\w.\-·:]*$|^:[\w.\-·:]*$", re.UNICODE)


def _is_name(s: str) -> bool:  # xs:Name = NCName alphabet + ':'
    return bool(_NAME_RE.match(s.strip()))


_VALUE_CHECKS = {
    "date": (_is_datetime, "xs:dateTime"),
    "int": (_is_long, "xs:long"),
    "float": (_is_double, "xs:double"),
    "boolean": (_is_boolean, "xs:boolean"),
    # string / id: any string is lexically valid
}


def _check_xml_attrs(el, path, allowed, required, errors):
    for a in el.attrib:
        if a not in allowed:
            errors.append(f"{path}: undeclared attribute '{a}'")
    for a in required:
        if a not in el.attrib:
            errors.append(f"{path}: missing required attribute '{a}'")


def _check_no_text(el, path, errors):
    if el.text and el.text.strip():
        errors.append(f"{path}: unexpected text content {el.text.strip()!r}")
    for child in el:
        if child.tail and child.tail.strip():
            errors.append(f"{path}: unexpected text content {child.tail.strip()!r}")


def _validate_attribute(el, path, errors):
    """AttributeType / Attribute*Type: key required, value required and
    lexically checked (except list), children = nested attributes, plus
    exactly one trailing ``values`` for list."""
    tag = el.tag
    allowed = {"key"} if tag == "list" else {"key", "value"}
    _check_xml_attrs(el, path, allowed, allowed, errors)
    _check_no_text(el, path, errors)
    if tag in _VALUE_CHECKS and "value" in el.attrib:
        fn, ty = _VALUE_CHECKS[tag]
        if not fn(el.attrib["value"]):
            errors.append(
                f"{path}: value {el.attrib['value']!r} is not a valid {ty}"
            )
    if "key" in el.attrib and not _is_name(el.attrib["key"]):
        errors.append(f"{path}: key {el.attrib['key']!r} is not a valid xs:Name")
    values_seen = 0
    for i, child in enumerate(el):
        cpath = f"{path}/{child.tag}[{i}]"
        if child.tag in ATTR_TAGS:
            if values_seen:
                errors.append(f"{cpath}: attribute after <values> in list")
            _validate_attribute(child, cpath, errors)
        elif child.tag == "values" and tag == "list":
            values_seen += 1
            if values_seen > 1:
                errors.append(f"{cpath}: more than one <values> in list")
            _check_xml_attrs(child, cpath, {"key"}, {"key"}, errors)
            _check_no_text(child, cpath, errors)
            for j, gc in enumerate(child):
                gpath = f"{cpath}/{gc.tag}[{j}]"
                if gc.tag in ATTR_TAGS:
                    _validate_attribute(gc, gpath, errors)
                else:
                    errors.append(f"{gpath}: element not allowed here")
        else:
            errors.append(f"{cpath}: element not allowed in <{tag}>")
    if tag == "list" and values_seen == 0:
        errors.append(f"{path}: list requires exactly one <values> child")


def _validate_attributable(el, path, errors):
    """AttributableGroup: children are attribute elements only."""
    _check_no_text(el, path, errors)
    for i, child in enumerate(el):
        cpath = f"{path}/{child.tag}[{i}]"
        if child.tag in ATTR_TAGS:
            _validate_attribute(child, cpath, errors)
        else:
            errors.append(f"{cpath}: element not allowed here")


def _validate_trace(el, path, errors):
    """TraceType sequence: attribute*, then event* (order enforced)."""
    _check_xml_attrs(el, path, set(), set(), errors)
    _check_no_text(el, path, errors)
    seen_event = False
    for i, child in enumerate(el):
        cpath = f"{path}/{child.tag}[{i}]"
        if child.tag == "event":
            seen_event = True
            _validate_attributable(child, cpath, errors)
            _check_xml_attrs(child, cpath, set(), set(), errors)
        elif child.tag in ATTR_TAGS:
            if seen_event:
                errors.append(f"{cpath}: trace attribute after first <event>")
            _validate_attribute(child, cpath, errors)
        else:
            errors.append(f"{cpath}: element not allowed in <trace>")


# LogType xs:sequence stages, in required order.
_LOG_STAGES = {"extension": 0, "global": 1, "classifier": 2,
               **{t: 3 for t in ATTR_TAGS}, "trace": 4, "event": 5}


def validate_xes(path: str) -> list[str]:
    """Validate an XES file against the IEEE 1849-2016 structure.

    Returns a list of error strings; empty means schema-valid.  Parse
    errors (malformed XML) are returned as a single-element list rather
    than raised, mirroring ``xmllint``'s exit-code contract.
    """
    try:
        root = ET.parse(path).getroot()
    except ET.ParseError as e:
        return [f"XML parse error: {e}"]
    errors: list[str] = []
    if root.tag != "log":
        return [f"root element is <{root.tag}>, expected <log> "
                "(namespaced roots do not match the no-targetNamespace XSD)"]
    _check_xml_attrs(root, "log", {"xes.version", "xes.features"},
                     {"xes.version"}, errors)
    if "xes.version" in root.attrib and not _is_decimal(root.attrib["xes.version"]):
        errors.append(
            f"log: xes.version {root.attrib['xes.version']!r} is not xs:decimal")
    _check_no_text(root, "log", errors)
    stage = 0
    for i, child in enumerate(root):
        path = f"log/{child.tag}[{i}]"
        s = _LOG_STAGES.get(child.tag)
        if s is None:
            errors.append(f"{path}: element not allowed in <log>")
            continue
        if s < stage:
            errors.append(
                f"{path}: out of order — LogType is a sequence of "
                "extension*, global*, classifier*, attribute*, trace*, event*")
        stage = max(stage, s)
        if child.tag == "extension":
            _check_xml_attrs(child, path, {"name", "prefix", "uri"},
                             {"name", "prefix", "uri"}, errors)
            for a in ("name", "prefix"):
                v = child.attrib.get(a)
                if v is not None and not _is_ncname(v):
                    errors.append(f"{path}: {a} {v!r} is not a valid xs:NCName")
            _check_no_text(child, path, errors)
            if len(child):
                errors.append(f"{path}: extension must be empty")
        elif child.tag == "global":
            _check_xml_attrs(child, path, {"scope"}, set(), errors)
            sc = child.attrib.get("scope")
            if sc is not None and not _is_ncname(sc):
                errors.append(f"{path}: scope {sc!r} is not a valid xs:NCName")
            _validate_attributable(child, path, errors)
        elif child.tag == "classifier":
            _check_xml_attrs(child, path, {"name", "scope", "keys"},
                             {"name", "keys"}, errors)
            nm = child.attrib.get("name")
            if nm is not None and not _is_ncname(nm):
                errors.append(f"{path}: name {nm!r} is not a valid xs:NCName")
            _check_no_text(child, path, errors)
            if len(child):
                errors.append(f"{path}: classifier must be empty")
        elif child.tag in ATTR_TAGS:
            _validate_attribute(child, path, errors)
        elif child.tag == "trace":
            _validate_trace(child, path, errors)
        elif child.tag == "event":
            _check_xml_attrs(child, path, set(), set(), errors)
            _validate_attributable(child, path, errors)
    return errors


def is_valid_xes(path: str) -> bool:
    return not validate_xes(path)
