"""Linked-Data (Turtle) config front door + shape gate (EP2).

Reference surface (/root/reference/packages/bucketizers/lib/bucketizers.ts):
``createBucketizerLD(quads)`` finds a subject typed
``ldes:BucketizeStrategy`` that conforms to ``schema:BucketizeShape``
(lib/shape.ttl:8-89) and builds the configured bucketizer; an invalid
``bucketType`` yields no valid shape and the build throws
(factory.test.ts:231-256).

This engine has no RDF stack (and needs none at 100 TB — the config is a
few dozen triples), so it ships a minimal self-contained Turtle reader
covering the config subset the reference's own tests exercise: @prefix,
';'/',' predicate-object lists, 'a', IRIs, prefixed names, integer and
string literals, and RDF collections '(...)' for tree:path property
paths. The SHACL shape is enforced as the same closed checks shape.ttl
declares (enum bucketType, cardinalities, datatypes, tree:path required
for ext strategies, zoomLevel required for geospatial).

The parsed strategy maps onto a validated JobSpec (config.py): tree:path
becomes ``property_path`` verbatim plus the fixed-schema ``column`` (the
path's final segment's local name — SURVEY.md §1.4's quad→column
mapping).
"""

from __future__ import annotations

import re
from typing import Any, Optional

from bucketizers_spark.config import ConfigError, JobSpec

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
LDES = "https://w3id.org/ldes#"
TREE = "https://w3id.org/tree#"

_TOKEN_RE = re.compile(
    r"""<[^>]*>                 # IRI
      | "(?:[^"\\]|\\.)*"(?:\^\^(?:<[^>]*>|[^\s;,()]+)|@[\w-]+)?   # literal
                                # datatype suffix must stop at ;/,/(/) so a
                                # p-o list after a typed literal still splits;
                                # a trailing statement '.' is stripped below
      | @prefix | @base
      | \(|\)|;|,
      | [^\s;,()]+              # bare token (prefixed name, number, '.', 'a')
    """,
    re.VERBOSE,
)


class TurtleError(ConfigError):
    """Malformed Turtle in the config subset."""


def _tokenize(text: str) -> list[str]:
    # strip comments (a '#' outside <>/"" starts a comment)
    lines = []
    for line in text.splitlines():
        out, in_iri, in_str, escaped = [], False, False, False
        for c in line:
            if in_str:
                if escaped:
                    escaped = False
                elif c == "\\":
                    escaped = True
                elif c == '"':
                    in_str = False
            elif c == "<" and not in_iri:
                in_iri = True
            elif c == ">" and in_iri:
                in_iri = False
            elif c == '"' and not in_iri:
                in_str = True
            elif c == "#" and not in_iri:
                break
            out.append(c)
        lines.append("".join(out))
    tokens: list[str] = []
    for raw in _TOKEN_RE.findall("\n".join(lines)):
        # split a statement-terminating dot off bare tokens ('50.' / 'x:y.')
        while raw.endswith(".") and raw not in (".",) and not raw.startswith("<"):
            raw = raw[:-1]
            tokens.append(raw) if raw else None
            tokens.append(".")
            break
        else:
            tokens.append(raw)
    return [t for t in tokens if t]


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple[Any, Any, Any]] = []

    def _peek(self) -> Optional[str]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> str:
        if self.i >= len(self.toks):
            raise TurtleError("unexpected end of Turtle input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _expect(self, tok: str) -> None:
        got = self._next()
        if got != tok:
            raise TurtleError(f"expected {tok!r}, got {got!r}")

    def term(self) -> Any:
        t = self._next()
        if t == "a":
            return RDF_TYPE
        if t == "(":  # RDF collection → Python list of terms
            items = []
            while self._peek() != ")":
                items.append(self.term())
            self._expect(")")
            return items
        if t.startswith("<") and t.endswith(">"):
            return t[1:-1]
        if t.startswith('"'):
            m = re.match(r'"((?:[^"\\]|\\.)*)"(?:\^\^(?P<dt>\S+))?', t)
            body = re.sub(
                r"\\(.)",
                lambda e: {"n": "\n", "t": "\t", "r": "\r"}.get(
                    e.group(1), e.group(1)
                ),
                m.group(1),
            )
            dt = m.group("dt")
            if dt:
                # a datatyped literal carries the same RDF value as the
                # plain form (shape.ttl declares sh:datatype xsd:integer;
                # the reference's N3 stack accepts "50"^^xsd:integer where
                # this subset would otherwise reject it as a string)
                if dt.startswith("<") and dt.endswith(">"):
                    dt_iri = dt[1:-1]
                elif ":" in dt:
                    pfx, local_name = dt.split(":", 1)
                    dt_iri = self.prefixes.get(pfx, pfx + ":") + local_name
                else:
                    dt_iri = dt
                local = dt_iri.rsplit("#", 1)[-1].rsplit("/", 1)[-1]
                if local in (
                    "integer", "int", "long", "short", "byte",
                    "nonNegativeInteger", "positiveInteger",
                    "unsignedInt", "unsignedLong",
                ):
                    return int(body)
                if local in ("decimal", "double", "float"):
                    return float(body)
                if local == "boolean":
                    return body == "true"
            return body
        if re.fullmatch(r"[+-]?\d+", t):
            return int(t)
        if re.fullmatch(r"[+-]?\d*\.\d+", t):
            return float(t)
        if ":" in t:
            pfx, local = t.split(":", 1)
            if pfx not in self.prefixes:
                raise TurtleError(f"unknown prefix {pfx!r}:")
            return self.prefixes[pfx] + local
        raise TurtleError(f"cannot parse term {t!r}")

    def parse(self) -> list[tuple[Any, Any, Any]]:
        while self._peek() is not None:
            if self._peek() in ("@prefix", "@base"):
                directive = self._next()
                if directive == "@prefix":
                    name = self._next()
                    if not name.endswith(":"):
                        raise TurtleError(f"bad prefix name {name!r}")
                    iri = self._next()
                    if not (iri.startswith("<") and iri.endswith(">")):
                        raise TurtleError(f"bad prefix IRI {iri!r}")
                    self.prefixes[name[:-1]] = iri[1:-1]
                else:
                    self._next()  # base IRI, unused in the config subset
                self._expect(".")
                continue
            subject = self.term()
            while True:
                pred = self.term()
                while True:
                    obj = self.term()
                    self.triples.append((subject, pred, obj))
                    if self._peek() == ",":
                        self._next()
                        continue
                    break
                if self._peek() == ";":
                    self._next()
                    # permit dangling ';' before '.'
                    if self._peek() == ".":
                        break
                    continue
                break
            self._expect(".")
        return self.triples


def parse_turtle(text: str) -> list[tuple[Any, Any, Any]]:
    """Parse the Turtle config subset into (subject, predicate, object)
    triples with expanded IRIs; integer literals become ints, collections
    become Python lists."""
    return _Parser(_tokenize(text)).parse()


# -- the shape gate (shape.ttl as closed checks) ----------------------------

_BUCKET_TYPES = {
    LDES + "basic": "basic",
    LDES + "geospatial": "geospatial",
    LDES + "substring": "substring",
    LDES + "subject": "subject",
}


def _objects(triples, s, p) -> list[Any]:
    return [o for (s2, p2, o) in triples if s2 == s and p2 == p]


def _conforms(triples, s) -> bool:
    """schema:BucketizeShape (shape.ttl:8-89) over one candidate subject."""
    btypes = _objects(triples, s, LDES + "bucketType")
    if len(btypes) != 1 or btypes[0] not in _BUCKET_TYPES:  # sh:in, 1..1
        return False
    page = _objects(triples, s, LDES + "pageSize")
    if len(page) > 1 or any(not isinstance(v, int) for v in page):
        return False  # 0..1 xsd:integer
    bprop = _objects(triples, s, LDES + "bucketProperty")
    if len(bprop) > 1 or any(not isinstance(v, str) for v in bprop):
        return False  # 0..1 sh:IRI
    kind = _BUCKET_TYPES[btypes[0]]
    if kind == "basic":
        return True  # schema:BasicBucketization
    # schema:BucketizationCoreExt: exactly one tree:path (IRI/blank or str)
    paths = _objects(triples, s, TREE + "path")
    if len(paths) != 1:
        return False
    if kind == "geospatial":
        zooms = _objects(triples, s, LDES + "zoomLevel")
        if len(zooms) != 1 or not isinstance(zooms[0], int):
            return False
    return True


def get_valid_shape(triples, subject: str | None = None) -> Optional[str]:
    """First ldes:BucketizeStrategy subject conforming to the shape
    (bucketizers.ts:27-46); None when nothing validates."""
    for s, p, o in triples:
        if p == RDF_TYPE and o == LDES + "BucketizeStrategy":
            if subject is not None and s != subject:
                continue
            if _conforms(triples, s):
                return s
    return None


def _local_name(iri: str) -> str:
    for sep in ("#", "/"):
        if sep in iri:
            iri = iri.rsplit(sep, 1)[1]
    return iri


def _path_str(path: Any) -> str:
    if isinstance(path, list):
        return "(" + " ".join(f"<{p}>" for p in path) + ")"
    if isinstance(path, str):
        return f"<{path}>"
    return str(path)


def _map_props(triples, s, kind: str) -> JobSpec:
    """Map a strategy subject's properties onto a JobSpec (the per-factory
    ldConfig extraction, BucketizerFactories.ts:15-72)."""
    kwargs: dict[str, Any] = {"strategy": kind}
    page = _objects(triples, s, LDES + "pageSize")
    if page:
        kwargs["page_size"] = page[0]
    if kind != "basic":
        paths = _objects(triples, s, TREE + "path")
        if not paths:
            raise ConfigError(f"strategy {s} ({kind}) is missing tree:path")
        path = paths[0]
        kwargs["property_path"] = _path_str(path)
        last = path[-1] if isinstance(path, list) else path
        kwargs["column"] = _local_name(str(last))
    if kind == "geospatial":
        zooms = _objects(triples, s, LDES + "zoomLevel")
        if not zooms:
            raise ConfigError(f"strategy {s} is missing ldes:zoomLevel")
        kwargs["zoom"] = zooms[0]
    return JobSpec(**kwargs)


def _child_spec(triples, s) -> JobSpec:
    """Resolve a multi child subject the way MultiBucketizerFactory.ldConfig
    does: read its properties directly, with NO rdf:type or shape gate (the
    reference's own MultiBucketizer.test.ts fixture uses an untyped child).
    Unknown/missing bucketType still rejects — there is no factory for it."""
    bts = _objects(triples, s, LDES + "bucketType")
    if bts == [LDES + "multi"]:
        return _multi_spec(triples, s)
    if len(bts) != 1 or bts[0] not in _BUCKET_TYPES:
        raise ConfigError(f"multi child {s} has no known ldes:bucketType")
    return _map_props(triples, s, _BUCKET_TYPES[bts[0]])


def _multi_spec(triples, s) -> JobSpec:
    cfgs = _objects(triples, s, LDES + "configs")
    if len(cfgs) != 1 or not isinstance(cfgs[0], list) or not cfgs[0]:
        raise ConfigError(
            "ldes:multi requires exactly one non-empty "
            "ldes:configs collection"
        )
    return JobSpec(
        strategy="multi",
        configs=[_child_spec(triples, c) for c in cfgs[0]],
    )


def spec_from_ld(triples, subject: str | None = None) -> JobSpec:
    """createBucketizerLD's config extraction: validate against the shape,
    then map the strategy's triples onto a JobSpec.

    ``ldes:multi`` is an INTENTIONAL EXTENSION of the front door, handled
    before the shape gate: the reference's shape enum excludes multi
    (createBucketizerLD rejects it; it is only reachable via
    MultiBucketizerFactory.ldConfig directly, MultiBucketizer.ts:22-44).
    This engine accepts a TYPED ldes:multi strategy here so one entry
    point covers both, and resolves each ``ldes:configs`` child exactly
    like the reference's ldConfig does — by properties, with no rdf:type
    or shape requirement on the child subject."""
    for s2, p2, o2 in triples:
        if (
            p2 == RDF_TYPE
            and o2 == LDES + "BucketizeStrategy"
            and (subject is None or s2 == subject)
            and _objects(triples, s2, LDES + "bucketType") == [LDES + "multi"]
        ):
            return _multi_spec(triples, s2)
    s = get_valid_shape(triples, subject)
    if s is None:
        raise ConfigError("No valid shape found!")  # bucketizers.ts:51
    kind = _BUCKET_TYPES[_objects(triples, s, LDES + "bucketType")[0]]
    return _map_props(triples, s, kind)


def create_bucketizer_ld(df, turtle_or_triples, subject: str | None = None):
    """The createBucketizerLD front door on a DataFrame: parse (if given
    Turtle text), shape-gate, build."""
    from bucketizers_spark.pipeline import build

    triples = (
        parse_turtle(turtle_or_triples)
        if isinstance(turtle_or_triples, str)
        else turtle_or_triples
    )
    return build(df, spec_from_ld(triples, subject))
