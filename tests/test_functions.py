"""Unit tests for normalize tiers, multimodal plumbing, time windows and
the composition operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bucketizers_spark.functions.normalize import (
    normalize_subject_col,
    normalize_substring_col,
)
from bucketizers_spark.functions.multimodal import (
    audio_features,
    image_features,
    sample_frames,
)
from bucketizers_spark.operators.multi import paged_within_parent
from bucketizers_spark.operators.time_window import (
    session_bucketizer,
    tumbling_bucketizer,
)
from bucketizers_spark.oracle import normalize_subject, normalize_substring


class TestNormalizeTiers:
    def test_pandas_udf_matches_oracle_on_unicode(self, spark):
        vals = ["  Foo-Bar, 'x' ", "ñ", "̃ȷ", "wgs84_pos#Point", "ABC"]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        got = df.select(
            normalize_substring_col(F.col("v"), ascii_fast=False).alias("a"),
            normalize_subject_col(F.col("v"), ascii_fast=False).alias("b"),
        ).collect()
        for row, v in zip(got, vals):
            assert row.a == normalize_substring(v)
            assert row.b == normalize_subject(v)

    def test_native_matches_oracle_on_ascii(self, spark):
        vals = ["  Foo-Bar, 'x' ", "wgs84_pos#Point", "a/b/c", "USER_42"]
        df = spark.createDataFrame([(v,) for v in vals], "v string")
        got = df.select(
            normalize_substring_col(F.col("v"), ascii_fast=True).alias("a"),
            normalize_subject_col(F.col("v"), ascii_fast=True).alias("b"),
        ).collect()
        for row, v in zip(got, vals):
            assert row.a == normalize_substring(v)
            assert row.b == normalize_subject(v)


class TestMultimodal:
    @pytest.fixture()
    def media(self, spark):
        rows = [
            (f"m{i}", "image", bytes([i]) * 64, "image/fake", None, None, None)
            for i in range(10)
        ]
        from bucketizers_spark.functions.multimodal import MEDIA_SCHEMA

        return spark.createDataFrame(rows, MEDIA_SCHEMA)

    def test_image_features_deterministic(self, spark, media):
        a = {r.media_id: (r.width, r.phash) for r in image_features(media, fake=True).collect()}
        b = {r.media_id: (r.width, r.phash) for r in image_features(media, fake=True).collect()}
        assert a == b and len(a) == 10

    def test_audio_and_frames(self, spark, media):
        assert audio_features(media, fake=True).count() == 10
        frames = sample_frames(media, every_ms=1000, fake=True)
        assert frames.count() >= 10  # every video expands to >=1 frame
        assert frames.columns == ["media_id", "frame_idx", "frame_phash"]

    def test_real_codec_stub_raises(self, spark, media):
        with pytest.raises(Exception, match="NotImplementedError|codec"):
            image_features(media, fake=False).collect()


class TestTimeWindows:
    def test_tumbling_partitions_members_exactly_once(self, spark):
        df = spark.createDataFrame(
            [(i, f"2026-01-01 00:{i:02d}:00") for i in range(60)],
            "seq long, t string",
        ).withColumn("t", F.to_timestamp("t"))
        res = tumbling_bucketizer(df, "t", "10 minutes")
        assert res.assignments.count() == 60
        counts = {
            r.bucket_id: r.n
            for r in res.assignments.groupBy("bucket_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert all(v == 10 for v in counts.values()) and len(counts) == 6
        # consecutive windows linked
        rels = res.relations.collect()
        assert len(rels) == 5
        assert res.seals.count() == 6

    def test_session_gap_merge(self, spark):
        rows = [
            (1, "2026-01-01 00:00:00"),
            (1, "2026-01-01 00:10:00"),  # same session (gap 30m)
            (1, "2026-01-01 01:00:00"),  # new session
            (2, "2026-01-01 00:00:00"),
        ]
        df = spark.createDataFrame(rows, "user_id long, t string").withColumn(
            "t", F.to_timestamp("t")
        )
        out = session_bucketizer(df, "t", "30 minutes", key_cols=["user_id"])
        got = {
            (r.user_id, r.session_start): r.n_members for r in out.collect()
        }
        assert got == {
            (1, "2026-01-01 00:00:00"): 2,
            (1, "2026-01-01 01:00:00"): 1,
            (2, "2026-01-01 00:00:00"): 1,
        }


class TestComposition:
    def test_paged_within_parent(self, spark):
        rows = [(i, "A" if i % 2 == 0 else "B") for i in range(10)]
        df = spark.createDataFrame(rows, "seq long, parent string")
        res = paged_within_parent(df, "parent", page_size=2)
        got = {r.seq: r.bucket_id for r in res.assignments.collect()}
        assert got[0] == "A/0" and got[2] == "A/0" and got[4] == "A/1"
        assert got[1] == "B/0" and got[5] == "B/1"
        rels = {(r.from_bucket, r.to_bucket) for r in res.relations.collect()}
        assert ("A/0", "A/1") in rels and ("B/1", "B/2") in rels


class TestPipelineFactory:
    def test_build_dispatch_and_fallback_routing(self, spark):
        from bucketizers_spark.pipeline import build, route_with_fallback

        rows = [(i, f"m{i}", f"http://x/v{i % 5}" if i % 4 else None) for i in range(40)]
        df = spark.createDataFrame(rows, "seq long, member_id string, value string")
        res = route_with_fallback(
            df, {"strategy": "subject", "column": "value", "salt": "s"}
        )
        got = {r.member_id: r.bucket_id for r in res.assignments.collect()}
        assert got["m1"] == "v1-s"
        assert got["m0"].startswith("bucketless-")  # i % 4 == 0 → NULL value
        # multi: subject then per-parent pages
        res2 = build(
            df.where("value is not null"),
            {
                "strategy": "multi",
                "configs": [
                    {"strategy": "subject", "column": "value", "salt": "s"},
                    {"strategy": "basic", "page_size": 2},
                ],
            },
        )
        got2 = {r.member_id: r.bucket_id for r in res2.assignments.collect()}
        assert got2["m1"] == "v1-s/0"
        pages = {b.rsplit("/", 1)[1] for b in got2.values()}
        assert "1" in pages  # at least one parent rolled to page 1


class TestQuadPath:
    def test_parse_and_multihop_extract(self, spark):
        # mirrors core.test.ts:22-64 (path parsing + multi-hop traversal)
        from bucketizers_spark.functions.quads import (
            extract_property_path,
            parse_property_path,
        )

        assert parse_property_path("(<p1> <p2>)") == ["p1", "p2"]
        assert parse_property_path("<p1>") == ["p1"]
        quads = spark.createDataFrame(
            [
                ("m1", "m1", "p1", "mid"),
                ("m1", "mid", "p2", "leaf-a"),
                ("m1", "mid", "p2", "leaf-b"),  # multi-valued terminal
                ("m2", "m2", "p1", "other"),  # no p2 hop → no match
                ("m3", "m3", "px", "nope"),
            ],
            "member_id string, subject string, predicate string, object string",
        )
        got = extract_property_path(quads, ["p1", "p2"])
        rows = {(r.member_id, r.value) for r in got.collect()}
        assert rows == {("m1", "leaf-a"), ("m1", "leaf-b")}
        # empty path → the member term itself (BucketizerCore.ts:339-341)
        ids = {
            r.value
            for r in extract_property_path(quads, []).collect()
        }
        assert ids == {"m1", "m2", "m3"}


class TestGeospatialFallbackRouting:
    def test_non_wkt_routes_to_bucketless(self, spark):
        from bucketizers_spark.pipeline import build

        rows = [
            (0, "POINT (3.15 51.08)"),
            (1, "not-wkt-at-all"),
            (2, "POINT (4.77 50.78)"),
        ]
        df = spark.createDataFrame(rows, "seq long, value string")
        res = build(
            df, {"strategy": "geospatial", "column": "value", "zoom": 4}
        )
        got = {r.seq: r.bucket_id for r in res.assignments.collect()}
        assert got[0].startswith("4/") and got[2].startswith("4/")
        assert got[1] == "bucketless-0"
