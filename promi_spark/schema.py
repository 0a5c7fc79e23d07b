"""Canonical flat event-log schema + out-of-band ``Meta`` descriptor.

The reference models a log as Meta + ordered Traces of Events, each an
attribute map (reference ``src/stream/core/component.rs:84-211``,
``src/stream/core/attribute.rs:171-176``). We flatten to ONE events
DataFrame — fixed typed columns for the well-known XES extension
attributes (``src/stream/extension/{concept,time,organizational}.rs``)
plus a MapType long tail — and keep the log header (extensions, globals,
classifiers, log attributes; ``component.rs:84-90``) out-of-band in a
small :class:`Meta` dataclass, since it is not a per-row concept.

Trace order is semantically load-bearing (IEEE 1849 quote at
``component.rs:155-165``): ``seq`` is assigned at ingest and every
ordered operation sorts by ``(ts, seq)`` to stay deterministic.
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field, asdict

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# The flat events schema (SURVEY §1.4)
# ---------------------------------------------------------------------------

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("case_id", T.StringType(), True),  # NULL => standalone event
        T.StructField("seq", T.LongType(), True),  # 0-based order within trace
        T.StructField("activity", T.StringType(), True),  # concept:name
        T.StructField("instance", T.StringType(), True),  # concept:instance
        T.StructField("ts", T.TimestampType(), True),  # time:timestamp
        T.StructField("resource", T.StringType(), True),  # org:resource
        T.StructField("role", T.StringType(), True),  # org:role
        T.StructField("group", T.StringType(), True),  # org:group
        T.StructField("lifecycle", T.StringType(), True),  # lifecycle:transition
        T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("attr_types", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("case_attrs", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# XES attribute key -> flat column (reference extension modules)
WELL_KNOWN_KEYS = {
    "concept:name": "activity",
    "concept:instance": "instance",
    "time:timestamp": "ts",
    "org:resource": "resource",
    "org:role": "role",
    "org:group": "group",
    "lifecycle:transition": "lifecycle",
}

# The 7-variant XES value type tags (reference attribute.rs:12-21)
ATTRIBUTE_TYPES = ("string", "date", "int", "float", "boolean", "id", "list")

SPARK_TYPE_FOR_TAG = {
    "string": T.StringType(),
    "date": T.TimestampType(),
    "int": T.LongType(),
    "float": T.DoubleType(),
    "boolean": T.BooleanType(),
    "id": T.StringType(),
    "list": T.ArrayType(T.StringType()),
}


# ---------------------------------------------------------------------------
# Meta descriptor (reference component.rs:84-90)
# ---------------------------------------------------------------------------


@dataclass
class ExtensionDecl:
    """XES extension declaration (reference component.rs:33-38)."""

    name: str
    prefix: str
    uri: str


@dataclass
class Global:
    """Required-attribute declaration with a typed default exemplar
    (reference component.rs:45-72). ``scope`` is 'trace' or 'event'."""

    scope: str
    key: str
    type: str = "string"
    default: str | None = None


@dataclass
class ClassifierDecl:
    """Named identity classifier: space-separated attribute key list
    (reference component.rs:76-81). Names must be xs:NCName
    (validator.rs:84-91)."""

    name: str
    scope: str  # 'trace' | 'event'
    keys: str  # space-separated attribute keys

    def key_list(self) -> list[str]:
        return self.keys.split()


@dataclass
class Meta:
    """Log header: extensions, globals, classifiers, log-level attrs.

    ``notes`` records parse-time observations that only whole-document
    scanning can see (e.g. a trace appearing after a standalone event —
    the reference observer's Meta<Trace<Event state machine rejects
    that, ``observer.rs:90-100``); the validator surfaces them.
    """

    extensions: list[ExtensionDecl] = field(default_factory=list)
    globals: list[Global] = field(default_factory=list)
    classifiers: list[ClassifierDecl] = field(default_factory=list)
    attributes: dict[str, str] = field(default_factory=dict)
    # Type tag per log-level attribute key (e.g. "int", "date") so a
    # typed <int key=... /> round-trips as <int>, not <string>.
    attribute_types: dict[str, str] = field(default_factory=dict)
    notes: dict[str, str] = field(default_factory=dict)

    def classifier(self, name: str) -> ClassifierDecl:
        for c in self.classifiers:
            if c.name == name:
                return c
        raise KeyError(f"no classifier named {name!r}")

    def globals_for(self, scope: str) -> list[Global]:
        return [g for g in self.globals if g.scope == scope]

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Meta":
        d = json.loads(s)
        return cls(
            extensions=[ExtensionDecl(**e) for e in d.get("extensions", [])],
            globals=[Global(**g) for g in d.get("globals", [])],
            classifiers=[ClassifierDecl(**c) for c in d.get("classifiers", [])],
            attributes=d.get("attributes", {}),
            attribute_types=d.get("attribute_types", {}),
            notes=d.get("notes", {}),
        )


# Standard extension vocabulary (reference extension/{concept,time,organizational}.rs)
STANDARD_EXTENSIONS = [
    ExtensionDecl("Concept", "concept", "http://www.xes-standard.org/concept.xesext"),
    ExtensionDecl("Time", "time", "http://www.xes-standard.org/time.xesext"),
    ExtensionDecl(
        "Organizational", "org", "http://www.xes-standard.org/org.xesext"
    ),
    ExtensionDecl(
        "Lifecycle", "lifecycle", "http://www.xes-standard.org/lifecycle.xesext"
    ),
]


# ---------------------------------------------------------------------------
# XML lexical classes (reference src/stream/xml_util.rs:21-147) — used by the
# validator pack and the XES writer. Python `re` ports of the W3C classes.
# ---------------------------------------------------------------------------

_NAME_START = (
    ":A-Z_a-z\xc0-\xd6\xd8-\xf6\xf8-\u02ff\u0370-\u037d\u037f-\u1fff"
    "\u200c-\u200d\u2070-\u218f\u2c00-\u2fef\u3001-\ud7ff\uf900-\ufdcf"
    "\ufdf0-\ufffd"
)
_NAME_CHAR = _NAME_START + "\\-.0-9\xb7\u0300-\u036f\u203f-\u2040"

RE_XS_NAME = re.compile(f"^[{_NAME_START}][{_NAME_CHAR}]*$")
RE_XS_NCNAME = re.compile(
    f"^[{_NAME_START.replace(':', '', 1)}][{_NAME_CHAR.replace(':', '', 1)}]*$"
)
# xs:token: no leading/trailing space, no doubled spaces, no tab/CR/LF
RE_XS_TOKEN = re.compile(r"^(?!\s)(?!.*\s\s)(?!.*[\t\n\r]).*(?<!\s)$|^$")
RE_XS_ANYURI = re.compile(r"^[^\s<>\"{}|\\^`]*$")

# Same classes as Spark-SQL-compatible regex strings (Java regex) for
# F.regexp_like / rlike use in validation queries.
SQL_NCNAME_PATTERN = "^[A-Z_a-z][A-Z_a-z\\-.0-9]*$"  # ASCII subset used in logs


def parse_xml_bool(s: str) -> bool:
    """XML lexical boolean: true/1/false/0 (reference xml_util.rs:80-87)."""
    if s in ("true", "1"):
        return True
    if s in ("false", "0"):
        return False
    raise ValueError(f"not an XML boolean literal: {s!r}")
