"""Distributed N-Triples / N-Quads source — RDF members as a quad table.

The reference consumes rdf-js quad streams (its bucketize() takes member
quads; see /root/reference/packages/bucketizer-core/lib/BucketizerCore.ts
record/member handling). This engine's equivalent front door: parse RDF
into a (subject, predicate, object, graph) DataFrame and feed
functions/quads.extract_property_path → the bucketize pipeline.

Why N-Triples/N-Quads and not Turtle: NT/NQ are line-delimited by spec —
one statement per line, no multi-line constructs — so ``spark.read.text``
splits a 100 TB dump into parallel scan tasks for free, and parsing is a
per-line regexp in whole-stage codegen (no Python). Turtle/TriG need a
stateful parser (prefixes, multi-line literals) and are NOT splittable:
parse those driver-side for small config-sized files (config_ld.py does
exactly that for shapes) or convert to NT upstream. This is the same
split Hadoop-era RDF tooling settled on.

Every column stays a string term; literals are decoded into lexical
form + datatype + language so downstream bucketizers compare values, not
serializations (the reference's N3 layer does this at parse time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# one statement per line: subject predicate object [graph] .
_TERM_IRI = r"<[^>]*>"
_TERM_BNODE = r"_:\S+"
_TERM_LITERAL = r'"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z][A-Za-z0-9\-]*)?'
_LINE_RE = (
    rf"^\s*({_TERM_IRI}|{_TERM_BNODE})"
    rf"\s+({_TERM_IRI})"
    rf"\s+({_TERM_IRI}|{_TERM_BNODE}|{_TERM_LITERAL})"
    rf"(?:\s+({_TERM_IRI}|{_TERM_BNODE}))?"
    # a conforming line may carry a trailing '# comment' after the dot
    r"\s*\.\s*(?:#.*)?$"
)

# Sentinel for the pure-JVM unescape chain. \x1f (unit separator), not
# NUL: Arrow string transfer on the Python-UDF paths drops \x00, so the
# engine standardises on \x1f for in-flight separators/sentinels
# (operators/substring._PSEP does the same). A raw \x1f in a literal is
# grammar-legal but means the value already violates the "text" contract
# every downstream operator assumes; the Python unescape path below is
# sentinel-free and handles such inputs exactly.
_SEP = "\x1f"


def _uchar_decode(col):
    """Arrow-batched UCHAR (\\uXXXX / \\UXXXXXXXX) decoder. Cheap early
    exit per value keeps the Python cost near-zero for inputs without
    UCHAR escapes; the surrounding plan stays whole-stage codegen and
    this is one extra projection stage at ingestion time only.

    Nonconforming escapes — codepoints past U+10FFFF or in the surrogate
    range (lone surrogates break Arrow/Parquet UTF-8 serialization) —
    are left UNDECODED rather than raising, so one bad line cannot crash
    a 100 TB read; it just carries its raw escape to the dead-letter /
    downstream filters."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _dec(s):
        import re

        pat = re.compile(r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})")

        def sub(m):
            cp = int(m.group(1) or m.group(2), 16)
            if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                return m.group(0)
            return chr(cp)

        def one(v):
            if v is None or "\\" not in v:
                return v
            return pat.sub(sub, v)

        return s.map(one)

    return _dec(col)


def _unescape_py(col):
    """One-pass Arrow-batched literal unescape: ECHAR (\\" \\\\ \\n \\t
    \\r \\b \\f) and UCHAR in a single left-to-right regex scan — the
    scan consumes backslash PAIRS as it goes, so ``\\\\u0041`` yields a
    literal backslash + 'u0041' with no sentinel round-trip at all.
    UCHAR validation matches _uchar_decode (invalid escapes stay raw);
    unknown single-char escapes (nonconforming) also stay raw."""
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _un(s):
        import re

        pat = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)")
        echar = {
            '"': '"',
            "\\": "\\",
            "n": "\n",
            "t": "\t",
            "r": "\r",
            "b": "\b",
            "f": "\f",
            "'": "'",
        }

        def sub(m):
            g = m.group(1)
            if len(g) > 1:
                cp = int(g[1:], 16)
                if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
                    return m.group(0)
                return chr(cp)
            return echar.get(g, m.group(0))

        def one(v):
            if v is None or "\\" not in v:
                return v
            return pat.sub(sub, v)

        return s.map(one)

    return _un(col)


def _strip_iri(col):
    """<iri> → iri; blank-node labels pass through unchanged."""
    return F.when(
        col.startswith("<"), F.regexp_replace(col, "^<|>$", "")
    ).otherwise(col)


def _unescape(col, *, decode_uchar: bool = False):
    """Decode N-Triples string escapes. With ``decode_uchar`` the whole
    job runs in _unescape_py — one left-to-right Arrow-batched pass that
    handles ECHAR + UCHAR + backslash pairs with no sentinel. Without it
    (the fully-JVM plan), a regexp_replace chain decodes the SAME full
    ECHAR set as the Python path (\" \\\\ \\n \\t \\r \\b \\f \\') so
    ``decode_uchar`` toggles UCHAR handling only, never ECHAR
    semantics; backslash PAIRS are protected with the \\x1f sentinel
    first so a literal backslash followed by 'n' round-trips as
    backslash+n, not a newline."""
    if decode_uchar:
        return _unescape_py(col)
    c = F.regexp_replace(col, r"\\\\", _SEP)
    c = F.regexp_replace(c, r"\\" + '"', '"')
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\t", "\t")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\b", "\b")
    c = F.regexp_replace(c, r"\\f", "\f")
    c = F.regexp_replace(c, r"\\'", "'")
    return F.regexp_replace(c, _SEP, r"\\")


def read_ntriples(
    spark: SparkSession,
    path: str,
    *,
    keep_malformed: bool = False,
    decode_uchar: bool = True,
) -> DataFrame:
    """Parse an N-Triples/N-Quads file (or directory/glob of files) into
    a quad table:

    - ``subject`` / ``predicate`` / ``graph``: IRI (brackets stripped)
      or blank-node label; ``graph`` NULL for triples.
    - ``object``: IRI / bnode label / decoded literal lexical form.
    - ``object_kind``: 'iri' | 'bnode' | 'literal'.
    - ``object_datatype`` / ``object_lang``: literal annotations (NULL
      otherwise; plain literals get NULL datatype like rdf-js).

    Malformed lines are dropped (spec says a conforming document has
    none); ``keep_malformed=True`` keeps them with NULL terms and the
    raw line in ``_malformed`` for a dead-letter sink. Comments (#) and
    blank lines are always dropped; a trailing ``# comment`` after the
    statement dot is allowed. The parse is one regexp per term in
    whole-stage codegen; ``decode_uchar=True`` (default) adds a single
    Arrow-batched projection that decodes ``\\uXXXX``/``\\UXXXXXXXX``
    escapes in IRIs and literals (per-value early exit keeps it cheap;
    pass False for a fully JVM plan when inputs are known ASCII-safe)."""
    lines = spark.read.text(path).where(
        (F.trim("value") != "") & ~F.trim(F.col("value")).startswith("#")
    )
    parsed = lines.select(
        "value",
        F.regexp_extract("value", _LINE_RE, 1).alias("_s"),
        F.regexp_extract("value", _LINE_RE, 2).alias("_p"),
        F.regexp_extract("value", _LINE_RE, 3).alias("_o"),
        F.regexp_extract("value", _LINE_RE, 4).alias("_g"),
    )
    is_lit = F.col("_o").startswith('"')
    lex = F.regexp_extract("_o", r'^"((?:[^"\\]|\\.)*)"', 1)
    dtype = F.regexp_extract("_o", r"\^\^<([^>]*)>$", 1)
    lang = F.regexp_extract("_o", r"@([A-Za-z][A-Za-z0-9\-]*)$", 1)
    def iri(col):
        # IRIREF allows only UCHAR escapes (no backslash pairs), so the
        # decoder applies directly; bnode labels contain no backslash
        s = _strip_iri(col)
        return _uchar_decode(s) if decode_uchar else s

    out = parsed.select(
        "value",
        iri(F.col("_s")).alias("subject"),
        iri(F.col("_p")).alias("predicate"),
        F.when(is_lit, _unescape(lex, decode_uchar=decode_uchar))
        .otherwise(iri(F.col("_o")))
        .alias("object"),
        F.when(is_lit, F.lit("literal"))
        .when(F.col("_o").startswith("_:"), F.lit("bnode"))
        .otherwise(F.lit("iri"))
        .alias("object_kind"),
        F.when(is_lit & (dtype != ""), dtype).alias("object_datatype"),
        F.when(is_lit & (lang != ""), lang).alias("object_lang"),
        F.when(F.col("_g") != "", iri(F.col("_g"))).alias("graph"),
        (F.col("_s") == "").alias("_bad"),
    )
    if keep_malformed:
        return out.select(
            F.when(~F.col("_bad"), F.col("subject")).alias("subject"),
            F.when(~F.col("_bad"), F.col("predicate")).alias("predicate"),
            F.when(~F.col("_bad"), F.col("object")).alias("object"),
            F.when(~F.col("_bad"), F.col("object_kind")).alias("object_kind"),
            "object_datatype",
            "object_lang",
            "graph",
            F.when(F.col("_bad"), F.col("value")).alias("_malformed"),
        )
    return out.where(~F.col("_bad")).drop("value", "_bad")


def member_quads(
    quads: DataFrame, *, member_from: str = "subject"
) -> DataFrame:
    """Stamp ``member_id`` onto a quad table for the property-path /
    bucketize pipeline (functions/quads.extract_property_path expects
    it). ``member_from='subject'`` treats each subject as a member (the
    common LDES member shape); ``'graph'`` uses the named graph (the SDS
    record shape, one graph per member)."""
    if member_from not in ("subject", "graph"):
        raise ValueError("member_from must be 'subject' or 'graph'")
    return quads.withColumn("member_id", F.col(member_from))
