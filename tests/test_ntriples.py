"""N-Triples/N-Quads source (sources/ntriples.py): term decoding,
escapes, malformed routing, and the quad-table → property-path →
bucketize integration (the reference's rdf-js member path,
BucketizerCore.ts:336-348)."""

from __future__ import annotations

import os

import pytest

_NT = r"""
# a comment line

<http://ex.org/s1> <http://ex.org/name> "John Doe" .
<http://ex.org/s1> <http://ex.org/knows> <http://ex.org/s2> .
_:b1 <http://ex.org/name> "quote \" backslash \\ newline \n tab \t" .
<http://ex.org/s2> <http://ex.org/name> "Jän"@de .
<http://ex.org/s2> <http://ex.org/age> "42"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex.org/s3> <http://ex.org/name> "has \\n literal backslash-n" .
this line is not a triple
<http://ex.org/s4> <http://ex.org/in> <http://ex.org/o4> <http://ex.org/graph1> .
""".strip("\n")


@pytest.fixture()
def nt_path(tmp_path):
    p = tmp_path / "data.nt"
    p.write_text(_NT)
    return str(p)


class TestReadNtriples:
    def test_terms_and_literals(self, spark, nt_path):
        from bucketizers_spark.sources.ntriples import read_ntriples

        rows = {
            (r["subject"], r["predicate"]): r
            for r in read_ntriples(spark, nt_path).collect()
        }
        assert len(rows) == 7  # malformed line dropped
        r = rows[("http://ex.org/s1", "http://ex.org/name")]
        assert (r["object"], r["object_kind"]) == ("John Doe", "literal")
        assert r["object_datatype"] is None and r["object_lang"] is None
        r = rows[("http://ex.org/s1", "http://ex.org/knows")]
        assert (r["object"], r["object_kind"]) == ("http://ex.org/s2", "iri")
        r = rows[("_:b1", "http://ex.org/name")]
        assert r["object"] == 'quote " backslash \\ newline \n tab \t'
        r = rows[("http://ex.org/s2", "http://ex.org/name")]
        assert r["object_lang"] == "de"
        r = rows[("http://ex.org/s2", "http://ex.org/age")]
        assert r["object"] == "42"
        assert r["object_datatype"].endswith("XMLSchema#integer")
        # a literal backslash before 'n' survives as backslash+n
        r = rows[("http://ex.org/s3", "http://ex.org/name")]
        assert r["object"] == "has \\n literal backslash-n"

    def test_nquads_graph_term(self, spark, nt_path):
        from bucketizers_spark.sources.ntriples import read_ntriples

        out = read_ntriples(spark, nt_path)
        g = {r["subject"]: r["graph"] for r in out.collect()}
        assert g["http://ex.org/s4"] == "http://ex.org/graph1"
        assert g["http://ex.org/s1"] is None

    def test_malformed_dead_letter(self, spark, nt_path):
        from bucketizers_spark.sources.ntriples import read_ntriples

        out = read_ntriples(spark, nt_path, keep_malformed=True)
        bad = [r for r in out.collect() if r["_malformed"] is not None]
        assert len(bad) == 1
        assert bad[0]["_malformed"].startswith("this line")
        assert bad[0]["subject"] is None

    def test_uchar_escapes_and_trailing_comment(self, spark, tmp_path):
        """N-Triples UCHAR (\\uXXXX / \\UXXXXXXXX) decoding in IRIs and
        literals; escaped-backslash pairs never decode; a trailing
        '# comment' after the statement dot is conforming, not
        malformed."""
        from bucketizers_spark.sources.ntriples import read_ntriples

        nt = "\n".join(
            [
                # é = é in literal; trailing comment after the dot
                '<http://ex.org/u1> <http://ex.org/name> '
                '"caf\\u00e9" . # trailing comment',
                # UCHAR inside an IRI (A = A)
                '<http://ex.org/\\u0041> <http://ex.org/p> "x" .',
                # supplementary plane \U0001F600 = 😀
                '<http://ex.org/u2> <http://ex.org/emoji> '
                '"\\U0001F600" .',
                # escaped backslash pair before u: stays literal A
                '<http://ex.org/u3> <http://ex.org/raw> '
                '"keep \\\\u0041 raw" .',
            ]
        )
        p = tmp_path / "uchar.nt"
        p.write_text(nt)
        rows = {
            (r["subject"], r["predicate"]): r["object"]
            for r in read_ntriples(spark, str(p)).collect()
        }
        assert len(rows) == 4
        assert rows[("http://ex.org/u1", "http://ex.org/name")] == "café"
        assert ("http://ex.org/A", "http://ex.org/p") in rows
        assert rows[("http://ex.org/u2", "http://ex.org/emoji")] == "\U0001F600"
        assert rows[("http://ex.org/u3", "http://ex.org/raw")] == (
            "keep \\u0041 raw"
        )
        # decode_uchar=False: raw escapes survive (pure-JVM plan)
        raw = {
            r["subject"]: r["object"]
            for r in read_ntriples(
                spark, str(p), decode_uchar=False
            ).collect()
        }
        assert raw["http://ex.org/u1"] == "caf\\u00e9"

    def test_invalid_uchar_survives(self, spark, tmp_path):
        """Nonconforming UCHAR escapes — codepoints past U+10FFFF and
        surrogate-range \\uD800 (a lone surrogate would break
        Arrow/Parquet UTF-8) — stay raw instead of crashing the read;
        ECHAR \\b and \\f decode on the Python path (ADVICE r4:
        _uchar_decode previously chr()'d unvalidated hex)."""
        from bucketizers_spark.sources.ntriples import read_ntriples

        nt = "\n".join(
            [
                '<http://ex.org/b1> <http://ex.org/p> "\\UFFFFFFFF big" .',
                '<http://ex.org/b2> <http://ex.org/p> "\\uD800 lone" .',
                '<http://ex.org/b3> <http://ex.org/\\uDFFF> "iri" .',
                '<http://ex.org/b4> <http://ex.org/p> "a\\bb\\fc" .',
            ]
        )
        p = tmp_path / "bad_uchar.nt"
        p.write_text(nt)
        rows = {
            r["subject"]: (r["predicate"], r["object"])
            for r in read_ntriples(spark, str(p)).collect()
        }
        assert len(rows) == 4
        assert rows["http://ex.org/b1"][1] == "\\UFFFFFFFF big"
        assert rows["http://ex.org/b2"][1] == "\\uD800 lone"
        assert rows["http://ex.org/b3"][0] == "http://ex.org/\\uDFFF"
        assert rows["http://ex.org/b4"][1] == "a\bb\fc"

    def test_echar_parity_between_modes(self, spark, tmp_path):
        """decode_uchar toggles UCHAR handling ONLY: the JVM regexp
        chain and the Python path must decode the full ECHAR set
        (\b \f \' included) identically (ADVICE r5)."""
        from bucketizers_spark.sources.ntriples import read_ntriples

        nt = "\n".join(
            [
                '<http://ex.org/e1> <http://ex.org/p> "a\\bb\\fc\\\'d" .',
                '<http://ex.org/e2> <http://ex.org/p> '
                '"tab\\there\\nnl\\rcr\\"q\\\\bs" .',
            ]
        )
        p = tmp_path / "echar.nt"
        p.write_text(nt)
        jvm = {
            r["subject"]: r["object"]
            for r in read_ntriples(spark, str(p), decode_uchar=False).collect()
        }
        py = {
            r["subject"]: r["object"]
            for r in read_ntriples(spark, str(p), decode_uchar=True).collect()
        }
        assert jvm == py
        assert jvm["http://ex.org/e1"] == "a\bb\fc\'d"
        assert jvm["http://ex.org/e2"] == 'tab\there\nnl\rcr"q\\bs'

    def test_property_path_to_bucketize(self, spark, tmp_path):
        """knows→name two-hop path over parsed N-Quads, one named graph
        per member (the SDS record shape: a member's quads — including
        nested nodes — share its graph). member_from='graph' stamps the
        member id; the multi-hop extraction stays within each member's
        own quads exactly like the reference's per-member store walk
        (BucketizerCore.ts:336-348)."""
        from bucketizers_spark.functions.quads import (
            extract_property_path,
            parse_property_path,
        )
        from bucketizers_spark.sources.ntriples import (
            member_quads,
            read_ntriples,
        )

        lines = []
        for i in range(30):
            m = f"http://ex.org/m{i}"
            lines.append(
                f"<{m}> <http://ex.org/knows> "
                f"<http://ex.org/p{i % 5}> <{m}> ."
            )
            lines.append(
                f"<http://ex.org/p{i % 5}> <http://ex.org/name> "
                f'"person{i % 5}" <{m}> .'
            )
        p = tmp_path / "members.nq"
        p.write_text("\n".join(lines))

        quads = member_quads(
            read_ntriples(spark, str(p)), member_from="graph"
        )
        path = parse_property_path(
            "(<http://ex.org/knows> <http://ex.org/name>)"
        )
        vals = extract_property_path(quads, path)
        got = {(r["member_id"], r["value"]) for r in vals.collect()}
        assert got == {
            (f"http://ex.org/m{i}", f"person{i % 5}") for i in range(30)
        }
