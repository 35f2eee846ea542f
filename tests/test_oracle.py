"""Pin the pure-Python oracle to the reference Jest assertions (SURVEY.md §5.1).

Every test here mirrors a named assertion in /root/reference/packages/*/__tests__.
The oracle is the ground truth the Spark engine is later diffed against, so
these are the anchor of the whole correctness chain.
"""

from __future__ import annotations

import pytest

from bucketizers_spark.config import ConfigError, JobSpec, spec_from_dict
from bucketizers_spark.oracle import (
    BasicOracle,
    SubjectPageOracle,
    SubstringOracle,
    normalize_subject,
    normalize_substring,
)


# ---------------------------------------------------------------- basic (S1)
class TestBasic:
    def test_same_page_until_full(self):
        # BasicBucketizer.test.ts:26-52 — members stay on page 0 until full
        b = BasicOracle(page_size=3)
        outs = [b.bucketize(None, f"m{i}") for i in range(3)]
        assert [o.buckets for o in outs] == [["0"], ["0"], ["0"]]
        assert all(not o.relations for o in outs)

    def test_rollover_and_relation(self):
        # BasicBucketizer.test.ts:54-85 — page 0 → 1 with a Relation edge
        b = BasicOracle(page_size=2)
        outs = [b.bucketize(None, f"m{i}") for i in range(5)]
        assert [o.buckets[0] for o in outs] == ["0", "0", "1", "1", "2"]
        rels = [r for o in outs for r in o.relations]
        assert [(r.from_bucket, r.to_bucket, r.relation_type) for r in rels] == [
            ("0", "1", "Relation"),
            ("1", "2", "Relation"),
        ]

    def test_state_roundtrip(self):
        # BasicBucketizer.test.ts:87-109 — export/import resumes counters
        b = BasicOracle(page_size=2)
        for i in range(3):
            b.bucketize(None, f"m{i}")
        state = b.export_state()
        b2 = BasicOracle(page_size=2)
        b2.import_state(state)
        assert b2.bucketize(None, "m3").buckets == ["1"]
        assert b2.bucketize(None, "m4").buckets == ["2"]


# ------------------------------------------------------------ substring (S2)
def drive(oracle, labeled_members):
    """Run (member_id, values) pairs through the oracle; return outputs."""
    return [oracle.bucketize(vals, mid) for mid, vals in labeled_members]


class TestSubstring:
    def test_fallback_when_no_property(self):
        # SubstringBucketizer.test.ts:59-73
        b = SubstringOracle(page_size=20)
        out = b.bucketize(None, "m0")
        assert out.buckets == ["bucketless-0"]
        assert [(r.from_bucket, r.to_bucket) for r in out.relations] == [
            ("root", "bucketless-0")
        ]

    def test_respects_page_size_histogram(self):
        # SubstringBucketizer.test.ts:88-112 — 5×"John Doe" @ pageSize 2
        # ⇒ bucket counts sorted = [1, 2, 2]
        b = SubstringOracle(page_size=2)
        outs = drive(b, [(f"m{i}", ["John Doe"]) for i in range(5)])
        counts: dict[str, int] = {}
        for o in outs:
            for bk in o.buckets:
                counts[bk] = counts.get(bk, 0) + 1
        assert sorted(counts.values()) == [1, 2, 2]
        assert counts == {"root": 2, "j": 2, "jo": 1}

    def test_same_page_while_room(self):
        # SubstringBucketizer.test.ts:126-152 (pageSize 20 → both at root)
        b = SubstringOracle(page_size=20)
        outs = drive(b, [("m0", ["John Doe"]), ("m1", ["John Doe"])])
        assert [o.buckets for o in outs] == [["root"], ["root"]]

    def test_descend_root_j_ja(self):
        # SubstringBucketizer.test.ts:173-212 — pageSize 1:
        # John Doe→root, John Doe→j (+relation root→j value ['j']), Jane Doe→ja
        b = SubstringOracle(page_size=1)
        outs = drive(
            b,
            [("m0", ["John Doe"]), ("m1", ["John Doe"]), ("m2", ["Jane Doe"])],
        )
        assert [o.buckets for o in outs] == [["root"], ["j"], ["ja"]]
        r1 = outs[1].relations[0]
        assert (r1.from_bucket, r1.relation_type, r1.to_bucket, r1.values) == (
            "root",
            "Substring",
            "j",
            ("j",),
        )

    def test_space_becomes_plus(self):
        # SubstringBucketizer.test.ts:214-242 — "J D" → bucket 'j+d'
        b = SubstringOracle(page_size=1)
        outs = drive(
            b, [("m0", ["John Doe"]), ("m1", ["John Doe"]), ("m2", ["J D"])]
        )
        assert outs[2].buckets == ["j+d"]
        rel = outs[2].relations[0]
        assert (rel.from_bucket, rel.to_bucket, rel.values) == ("j", "j+d", ("j", "d"))

    def test_full_string_overrides_capacity(self):
        # SubstringBucketizer.test.ts:244-278 — single-char "J" lands in the
        # (full) 'j' bucket without consuming capacity
        b = SubstringOracle(page_size=1)
        outs = drive(
            b, [("m0", ["John Doe"]), ("m1", ["John Doe"]), ("m2", ["J"])]
        )
        assert outs[1].buckets == ["j"]
        assert outs[2].buckets == ["j"]
        assert b.counters["j"] == 1  # no counter update on the terminal place

    def test_normalize_combining_tilde(self):
        # SubstringBucketizer.test.ts:280-298 — "̃ȷ" → bucket "ȷ"
        b = SubstringOracle(page_size=1)
        outs = drive(b, [("m0", ["John Doe"]), ("m1", ["̃ȷ"])])
        assert outs[1].buckets == ["ȷ"]

    def test_normalize_nfkd_n_tilde(self):
        # SubstringBucketizer.test.ts:300-318 — ñ (U+00F1) → bucket 'n'
        b = SubstringOracle(page_size=1)
        outs = drive(b, [("m0", ["John Doe"]), ("m1", ["ñ"])])
        assert outs[1].buckets == ["n"]

    def test_multi_word_exhausted_chain_gets_no_bucket(self):
        # Consequence of SubstringBucketizer.ts:80-86: multi-word value whose
        # full chain exists and is full yields an empty bucket list.
        b = SubstringOracle(page_size=1)
        drive(b, [("m0", ["a b"])])  # root
        drive(b, [("m1", ["a b"])])  # creates 'a'
        drive(b, [("m2", ["a b"])])  # creates 'a+b' (full string)
        out = b.bucketize(["a b"], "m3")  # chain exhausted everywhere
        assert out.buckets == []

    def test_multi_valued_property_dedup(self):
        # SubstringBucketizer.ts:97 — Set-dedup of buckets per member
        b = SubstringOracle(page_size=10)
        out = b.bucketize(["John", "John"], "m0")
        assert out.buckets == ["root"]
        assert b.counters["root"] == 2  # counter bumps per value, dedup after


# --------------------------------------------------------- subject-page (S3)
class TestSubjectPage:
    def test_fallback(self):
        # SubjectPageBucketizer.test.ts:55-69
        b = SubjectPageOracle(page_size=20, salt="abc")
        out = b.bucketize(None, "m0")
        assert out.buckets == ["bucketless-0"]

    def test_one_bucket_per_member_and_normalized_id(self):
        # SubjectPageBucketizer.test.ts:71-99 — id = normalize(last segment
        # + '-' + hash); '#' → '-'; pinned hash "abc"
        b = SubjectPageOracle(salt="abc", property_path="dct:isVersionOf")
        out = b.bucketize(
            ["http://data.europa.eu/949/wgs84_pos#Point"], "m0"
        )
        assert out.buckets == ["wgs84_pos-point-abc"]
        rel = out.relations[0]
        assert rel.relation_type == "EqualThan"
        assert rel.from_bucket == "root"
        assert rel.to_bucket == "wgs84_pos-point-abc"
        assert rel.values == ("http://data.europa.eu/949/wgs84_pos#Point",)
        assert rel.path == "dct:isVersionOf"

    def test_first_seen_dedup(self):
        b = SubjectPageOracle(salt="s")
        o1 = b.bucketize(["http://x/a"], "m0")
        o2 = b.bucketize(["http://x/a"], "m1")
        assert o1.buckets == o2.buckets == ["a-s"]
        assert len(o1.relations) == 1 and len(o2.relations) == 0

    def test_root_rotation_and_seal(self):
        # SubjectPageBucketizer.ts:55-72 — after maxRelations new buckets the
        # root is sealed, rotated, and linked
        b = SubjectPageOracle(salt="s", max_relations=2)
        outs = [b.bucketize([f"http://x/v{i}"], f"m{i}") for i in range(5)]
        # members 0,1 relate from root; 2,3 from root-1; 4 from root-2
        starts = [o.relations[-1].from_bucket for o in outs]
        assert starts == ["root", "root", "root-1", "root-1", "root-2"]
        # rotation emits seal of old root + Relation old→new
        assert outs[2].seals == ["root"]
        assert outs[4].seals == ["root-1"]
        rot = outs[2].relations[0]
        assert (rot.from_bucket, rot.relation_type, rot.to_bucket) == (
            "root",
            "Relation",
            "root-1",
        )

    def test_state_roundtrip(self):
        # SubjectPageBucketizer.test.ts:114-139
        b = SubjectPageOracle(salt="s", max_relations=2)
        for i in range(3):
            b.bucketize([f"http://x/v{i}"], f"m{i}")
        b2 = SubjectPageOracle(salt="ignored", max_relations=99)
        b2.import_state(b.export_state())
        out = b2.bucketize(["http://x/v1"], "m3")  # already seen
        assert out.buckets == ["v1-s"] and not out.relations
        out4 = b2.bucketize(["http://x/v9"], "m4")
        assert out4.relations[-1].from_bucket == "root-1"


# ------------------------------------------------------- fallback pager (O4)
class TestFallback:
    def test_bucketless_paging(self):
        b = SubstringOracle(page_size=2)
        outs = [b.bucketize(None, f"m{i}") for i in range(5)]
        assert [o.buckets[0] for o in outs] == [
            "bucketless-0",
            "bucketless-0",
            "bucketless-1",
            "bucketless-1",
            "bucketless-2",
        ]
        # one root→page relation per new page, deduped via controls map
        rels = [r for o in outs for r in o.relations]
        assert [r.to_bucket for r in rels] == [
            "bucketless-0",
            "bucketless-1",
            "bucketless-2",
        ]


# ----------------------------------------------------------- normalize (S7)
class TestNormalize:
    def test_substring_chain(self):
        assert normalize_substring("  Foo-Bar, 'x'  ") == "foo bar x"
        assert normalize_substring("ñ") == "n"
        assert normalize_substring("̃ȷ") == "ȷ"

    def test_subject_chain(self):
        assert normalize_subject("wgs84_pos#Point-abc") == "wgs84_pos-point-abc"
        assert normalize_subject("A,'b") == "ab"


# -------------------------------------------------------- config gate (O11)
class TestConfig:
    def test_rejects_unknown_type(self):
        # factory.test.ts:231-256 — SHACL rejects bucketType "something"
        with pytest.raises(ConfigError):
            JobSpec(strategy="something")

    def test_requires_column_for_ext(self):
        # shape.ttl — tree:path required for substring/subject/geospatial
        with pytest.raises(ConfigError):
            JobSpec(strategy="substring")

    def test_defaults(self):
        # pageSize default 50 (BucketizerCore.ts:28-30), root "root",
        # maxRelations default 100 (SubjectPageBucketizer.ts:36)
        s = JobSpec(strategy="subject", column="doc_id")
        assert s.page_size == 50 and s.root == "root" and s.max_relations == 100

    def test_from_dict_with_window(self):
        s = spec_from_dict(
            {"strategy": "time", "window": {"kind": "session", "gap": "30 minutes"}}
        )
        assert s.window.gap == "30 minutes"

    def test_session_requires_gap(self):
        with pytest.raises(ConfigError):
            spec_from_dict({"strategy": "time", "window": {"kind": "session"}})

    def test_streaming_rejects_session_children_at_spec_time(self):
        """compose.py's session-child refusal must surface at
        validation time (ConfigError), not when the stream starts."""
        session_child = {
            "strategy": "time",
            "window": {"kind": "session", "gap": "30 minutes"},
        }
        spec = {
            "strategy": "multi",
            "configs": [{"strategy": "basic"}, session_child],
        }
        # batch multi still accepts it
        spec_from_dict(spec)
        # streaming front doors reject it with the rationale
        with pytest.raises(ConfigError, match="session window aggregates"):
            spec_from_dict(spec, streaming=True)
        from bucketizers_spark.streaming.compose import stages_from_spec

        with pytest.raises(ConfigError, match="session window aggregates"):
            stages_from_spec(spec)
        # session stage-0 is equally refused
        with pytest.raises(ConfigError, match="session window aggregates"):
            spec_from_dict(
                {"strategy": "multi",
                 "configs": [session_child, {"strategy": "basic"}]},
                streaming=True,
            )
        # tumbling/sliding children still validate for streaming
        spec_from_dict(
            {"strategy": "multi",
             "configs": [
                 {"strategy": "basic"},
                 {"strategy": "time",
                  "window": {"kind": "tumbling", "duration": "1 hour"}},
             ]},
            streaming=True,
        )

    def test_salt_and_dense_knobs(self, spark):
        from pyspark.sql import functions as F

        from bucketizers_spark.pipeline import build

        df = spark.range(0, 200).withColumnRenamed("id", "seq").withColumn(
            "name", F.concat(F.lit("w"), (F.col("seq") % 7).cast("string"))
        )
        salted = build(
            df, {"strategy": "substring", "column": "name", "page_size": 3,
                 "salt_buckets": 4, "max_depth": 8}
        )
        plain = build(
            df, {"strategy": "substring", "column": "name", "page_size": 3,
                 "max_depth": 8}
        )
        a = {r.seq: r.bucket_id for r in salted.assignments.collect()}
        b = {r.seq: r.bucket_id for r in plain.assignments.collect()}
        assert a == b
        dense = build(df, {"strategy": "basic", "page_size": 50,
                           "dense_seq": True})
        rank = build(df, {"strategy": "basic", "page_size": 50})
        assert (
            {r.seq: r.bucket_id for r in dense.assignments.collect()}
            == {r.seq: r.bucket_id for r in rank.assignments.collect()}
        )
        import pytest as _pytest

        from bucketizers_spark.config import ConfigError, spec_from_dict

        with _pytest.raises(ConfigError):
            spec_from_dict({"strategy": "basic", "salt_buckets": -1})
