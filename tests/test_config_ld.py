"""LD/Turtle config front door (EP2) — mirrors the reference's own factory
tests (/root/reference/packages/bucketizers/__tests__/factory.test.ts):
each strategy's Turtle config validates against the shape and builds the
right operator; an unknown bucketType yields no valid shape and the build
raises."""

from __future__ import annotations

import pytest

from bucketizers_spark.config import ConfigError
from bucketizers_spark.config_ld import (
    create_bucketizer_ld,
    get_valid_shape,
    parse_turtle,
    spec_from_ld,
)

_PREFIXES = """
@prefix ex: <https://example.org/ns#> .
@prefix ldes: <https://w3id.org/ldes#> .
@prefix tree: <https://w3id.org/tree#> .
"""

BASIC = _PREFIXES + """
ex:BucketizeStrategy a ldes:BucketizeStrategy;
    ldes:bucketType ldes:basic;
    ldes:bucketProperty ldes:bucket;
    ldes:pageSize 50.
"""

SUBJECT = _PREFIXES + """
ex:BucketizeStrategy a ldes:BucketizeStrategy;
    ldes:bucketType ldes:subject;
    ldes:bucketProperty ldes:bucket;
    tree:path ldes:Bucket2;
    ldes:pageSize 50.
"""

SUBJECT_PATH_LIST = _PREFIXES + """
ex:BucketizeStrategy a ldes:BucketizeStrategy;
    ldes:bucketType ldes:subject;
    ldes:bucketProperty ldes:bucket;
    tree:path (ex:point ex:x);
    ldes:pageSize 50.
"""

SUBSTRING = _PREFIXES + """
ex:BucketizeStrategy a ldes:BucketizeStrategy;
    ldes:bucketType ldes:substring;
    ldes:bucketProperty ldes:bucket;
    tree:path ldes:Bucket2;
    ldes:pageSize 50.
"""

GEO = _PREFIXES + """
ex:BucketizeStrategy a ldes:BucketizeStrategy;
    ldes:bucketType ldes:geospatial;
    ldes:bucketProperty ldes:bucket;
    tree:path ldes:Bucket2;
    ldes:zoomLevel 2;
    ldes:pageSize 50.
"""

INVALID = _PREFIXES + """
ex:BucketizeStrategy a ldes:BucketizeStrategy;
    ldes:bucketType ldes:something;
    ldes:pageSize 50.
"""


class TestTurtleParser:
    def test_parses_triples_and_collections(self):
        triples = parse_turtle(SUBJECT_PATH_LIST)
        paths = [
            o
            for (s, p, o) in triples
            if p == "https://w3id.org/tree#path"
        ]
        assert paths == [
            ["https://example.org/ns#point", "https://example.org/ns#x"]
        ]
        # integer literal with statement-terminating dot ('50.')
        sizes = [o for (_, p, o) in triples if p.endswith("#pageSize")]
        assert sizes == [50]

    def test_datatyped_literals_coerce(self):
        # "50"^^xsd:integer is the same RDF value as bare 50 (shape.ttl
        # declares sh:datatype xsd:integer; the reference's N3+SHACL stack
        # accepts the typed form) — including with a statement dot and in
        # a predicate-object list
        src = _PREFIXES + """
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
ex:s ldes:pageSize "50"^^xsd:integer.
ex:t ldes:pageSize "7"^^<http://www.w3.org/2001/XMLSchema#integer>;
     ldes:ratio "0.5"^^xsd:decimal;
     ldes:flag "true"^^xsd:boolean.
"""
        triples = parse_turtle(src)
        vals = {(s.rsplit("#")[-1], p.rsplit("#")[-1]): o for s, p, o in triples}
        assert vals[("s", "pageSize")] == 50
        assert vals[("t", "pageSize")] == 7
        assert vals[("t", "ratio")] == 0.5
        assert vals[("t", "flag")] is True

    def test_typed_pagesize_passes_shape_gate(self):
        src = BASIC.replace("ldes:pageSize 50.", 'ldes:pageSize "50"^^<http://www.w3.org/2001/XMLSchema#integer>.')
        spec = spec_from_ld(parse_turtle(src))
        assert spec.page_size == 50

    def test_string_escapes_decode(self):
        src = _PREFIXES + 'ex:s ldes:label "he said \\"hi\\"\\n\\\\done" .'
        triples = parse_turtle(src)
        assert triples[-1][2] == 'he said "hi"\n\\done'

    def test_comments_and_unknown_prefix(self):
        triples = parse_turtle(_PREFIXES + "# a comment\nex:a ldes:pageSize 3 .")
        assert triples[-1][2] == 3
        with pytest.raises(ConfigError):
            parse_turtle("nope:a nope:b nope:c .")


class TestShapeGate:
    @pytest.mark.parametrize("rdf", [BASIC, SUBJECT, SUBJECT_PATH_LIST, SUBSTRING, GEO])
    def test_config_is_valid(self, rdf):
        assert get_valid_shape(parse_turtle(rdf)) is not None

    def test_invalid_type_gets_flagged(self):
        # factory.test.ts:231-256
        assert get_valid_shape(parse_turtle(INVALID)) is None
        with pytest.raises(ConfigError):
            spec_from_ld(parse_turtle(INVALID))

    def test_geo_requires_zoom(self):
        rdf = GEO.replace("    ldes:zoomLevel 2;\n", "")
        assert get_valid_shape(parse_turtle(rdf)) is None

    def test_ext_requires_path(self):
        rdf = SUBSTRING.replace("    tree:path ldes:Bucket2;\n", "")
        assert get_valid_shape(parse_turtle(rdf)) is None


class TestSpecMapping:
    def test_spec_fields(self):
        spec = spec_from_ld(parse_turtle(GEO))
        assert spec.strategy == "geospatial"
        assert spec.zoom == 2
        assert spec.page_size == 50
        assert spec.column == "Bucket2"
        assert spec.property_path == "<https://w3id.org/ldes#Bucket2>"

    def test_path_list_takes_last_segment(self):
        spec = spec_from_ld(parse_turtle(SUBJECT_PATH_LIST))
        assert spec.column == "x"
        assert spec.property_path == (
            "(<https://example.org/ns#point> <https://example.org/ns#x>)"
        )


class TestBuildLD:
    def test_parses_from_linked_data(self, spark):
        df = spark.range(0, 120).withColumnRenamed("id", "seq")
        res = create_bucketizer_ld(df, BASIC)
        pages = {r.bucket_id for r in res.assignments.collect()}
        assert pages == {"0", "1", "2"}

    def test_subject_from_linked_data(self, spark):
        from pyspark.sql import functions as F

        df = (
            spark.range(0, 40)
            .withColumnRenamed("id", "seq")
            .withColumn(
                "Bucket2",
                F.concat(F.lit("http://x.org/u/"), (F.col("seq") % 4).cast("string")),
            )
        )
        res = create_bucketizer_ld(df, SUBJECT)
        got = {r.bucket_id for r in res.assignments.collect()}
        assert got == {"0-s0", "1-s0", "2-s0", "3-s0"}
        # EqualThan relation per bucket carries the property path
        rels = res.relations.where("relation_type = 'EqualThan'").collect()
        assert {r.path for r in rels} == {"<https://w3id.org/ldes#Bucket2>"}

    def test_invalid_raises(self, spark):
        df = spark.range(0, 10).withColumnRenamed("id", "seq")
        with pytest.raises(ConfigError):
            create_bucketizer_ld(df, INVALID)


MULTI = _PREFIXES + """
ex:MultiBucketizeStrategy a ldes:BucketizeStrategy;
  ldes:bucketType ldes:multi;
  ldes:configs (
    ex:BasicStrategy
    ex:SubjectStrategy
  ) .

ex:BasicStrategy a ldes:BucketizeStrategy;
    ldes:bucketType ldes:basic;
    ldes:pageSize 30.

ex:SubjectStrategy a ldes:BucketizeStrategy;
    ldes:bucketType ldes:subject;
    tree:path ex:subj;
    ldes:pageSize 50.
"""


class TestMultiLD:
    def test_parse_multi_ld(self):
        # MultiBucketizer.test.ts "Parse ld correctly": multi skips the
        # shape enum and resolves each child subject recursively
        spec = spec_from_ld(
            parse_turtle(MULTI), "https://example.org/ns#MultiBucketizeStrategy"
        )
        assert spec.strategy == "multi"
        assert [c.strategy for c in spec.configs] == ["basic", "subject"]
        assert spec.configs[0].page_size == 30
        assert spec.configs[1].column == "subj"

    def test_untyped_children_accepted(self):
        # the reference's MultiBucketizerFactory.ldConfig reads child
        # properties with NO rdf:type check — its own test fixture's child
        # subjects are untyped (MultiBucketizer.test.ts); mirror that
        src = MULTI.replace(
            "ex:BasicStrategy a ldes:BucketizeStrategy;",
            "ex:BasicStrategy",
        ).replace(
            "ex:SubjectStrategy a ldes:BucketizeStrategy;",
            "ex:SubjectStrategy",
        )
        spec = spec_from_ld(
            parse_turtle(src), "https://example.org/ns#MultiBucketizeStrategy"
        )
        assert [c.strategy for c in spec.configs] == ["basic", "subject"]

    def test_child_without_buckettype_rejected(self):
        src = MULTI.replace("    ldes:bucketType ldes:basic;\n", "")
        with pytest.raises(ConfigError, match="bucketType"):
            spec_from_ld(
                parse_turtle(src),
                "https://example.org/ns#MultiBucketizeStrategy",
            )

    def test_multi_ld_builds(self, spark):
        from pyspark.sql import functions as F

        df = (
            spark.range(0, 90)
            .withColumnRenamed("id", "seq")
            .withColumn(
                "subj",
                F.concat(F.lit("http://x.org/u/"), (F.col("seq") % 3).cast("string")),
            )
        )
        res = create_bucketizer_ld(
            df, MULTI, "https://example.org/ns#MultiBucketizeStrategy"
        )
        rows = res.assignments.collect()
        assert len(rows) == 90
        for r in rows:
            page, child = r.bucket_id.split("/", 1)
            assert page in {"0", "1", "2"} and child.endswith("-s0")
