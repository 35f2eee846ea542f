"""WARC source: synthetic crawl files (plain + per-record-gzip-member
.warc.gz, CRLF and LF header endings, adversarial bodies) parsed
distributed, record filters, truncation tolerance."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest

from bucketizers_spark.sources.warc import (
    http_payload_text,
    parse_warc_bytes,
    read_warc,
)


def _record(
    *,
    rtype: str = "response",
    uri: str = "http://ex.org/a",
    rid: str = "<urn:uuid:1>",
    body: bytes = b"hello",
    eol: bytes = b"\r\n",
) -> bytes:
    hdrs = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Target-URI: " + uri.encode(),
        b"WARC-Date: 2026-08-17T00:00:00Z",
        b"WARC-Record-ID: " + rid.encode(),
        b"Content-Type: application/http; msgtype=response",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return eol.join(hdrs) + eol + eol + body + eol + eol


# a body that CONTAINS a fake record header — only Content-Length
# framing parses this correctly; any line-oriented splitter would break
_TRAP_BODY = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
    b"line one\nWARC/1.0\nWARC-Type: response\nnot a real record\n"
)


@pytest.fixture()
def warc_dir(tmp_path):
    plain = (
        _record(uri="http://ex.org/a", rid="<urn:uuid:1>", body=_TRAP_BODY)
        + _record(
            rtype="request",
            uri="http://ex.org/a",
            rid="<urn:uuid:2>",
            body=b"GET /a",
        )
        + _record(
            uri="http://ex.org/b",
            rid="<urn:uuid:3>",
            body=b"HTTP/1.1 200 OK\r\n\r\nsecond doc",
            eol=b"\n",  # LF-terminated headers (tolerated)
        )
    )
    (tmp_path / "crawl-00000.warc").write_bytes(plain)
    # .warc.gz: one gzip MEMBER per record, concatenated (the Common
    # Crawl layout — a plain gunzip of the first member must NOT swallow
    # the rest)
    gz = b"".join(
        gzip.compress(r)
        for r in (
            _record(uri="http://ex.org/c", rid="<urn:uuid:4>",
                    body=b"HTTP/1.1 200 OK\r\n\r\nthird doc"),
            _record(rtype="metadata", uri="http://ex.org/c",
                    rid="<urn:uuid:5>", body=b"meta"),
            _record(uri="http://ex.org/d", rid="<urn:uuid:6>",
                    body=b"HTTP/1.1 200 OK\r\n\r\nfourth doc"),
        )
    )
    (tmp_path / "crawl-00001.warc.gz").write_bytes(gz)
    return str(tmp_path)


class TestParseWarcBytes:
    def test_content_length_framing_beats_fake_headers(self):
        recs = list(parse_warc_bytes(_record(body=_TRAP_BODY)))
        assert len(recs) == 1
        assert recs[0]["payload"] == _TRAP_BODY
        assert recs[0]["content_length"] == len(_TRAP_BODY)

    def test_truncated_tail_yields_good_prefix(self):
        data = _record(rid="<urn:uuid:1>") + _record(rid="<urn:uuid:2>")
        # cut into the second record's body (past its trailing CRLFs)
        recs = list(parse_warc_bytes(data[:-8]))
        assert [r["record_id"] for r in recs] == ["<urn:uuid:1>"]

    def test_gzip_members_all_decompress(self):
        gz = gzip.compress(_record(rid="<urn:uuid:1>")) + gzip.compress(
            _record(rid="<urn:uuid:2>")
        )
        recs = list(parse_warc_bytes(gz))
        assert [r["record_id"] for r in recs] == [
            "<urn:uuid:1>",
            "<urn:uuid:2>",
        ]

    def test_mid_file_corruption_resyncs(self):
        """ADVICE r5: a malformed record mid-file must not silently drop
        every subsequent record — the scanner resyncs to the next
        \nWARC/ boundary and counts the skipped bytes."""
        garbage = b"\x00\xffnot a warc record at all\nstill garbage\n"
        data = (
            _record(rid="<urn:uuid:1>")
            + garbage
            + _record(rid="<urn:uuid:2>")
            + _record(rid="<urn:uuid:3>", eol=b"\n")
        )
        stats = {}
        recs = list(parse_warc_bytes(data, stats=stats))
        assert [r["record_id"] for r in recs] == [
            "<urn:uuid:1>", "<urn:uuid:2>", "<urn:uuid:3>",
        ]
        assert stats["skipped_bytes"] >= len(garbage) - 2
        assert stats["resyncs"] >= 1

    def test_missing_content_length_skips_one_record(self):
        """A record without Content-Length is unknowable — skip IT,
        resync, and keep parsing the rest of the file."""
        bad = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:uuid:bad>\r\n\r\nbody?\r\n\r\n"
        )
        data = _record(rid="<urn:uuid:1>") + bad + _record(
            rid="<urn:uuid:2>"
        )
        stats = {}
        recs = list(parse_warc_bytes(data, stats=stats))
        assert [r["record_id"] for r in recs] == [
            "<urn:uuid:1>", "<urn:uuid:2>",
        ]
        assert stats["skipped_bytes"] > 0


class TestReadWarc:
    def test_reads_responses_across_files(self, spark, warc_dir):
        df = read_warc(spark, warc_dir)
        rows = {r.record_id: r for r in df.collect()}
        # 4 responses across both files; request/metadata filtered
        assert set(rows) == {
            "<urn:uuid:1>", "<urn:uuid:3>", "<urn:uuid:4>", "<urn:uuid:6>",
        }
        assert all(r.warc_type == "response" for r in rows.values())
        assert rows["<urn:uuid:3>"].target_uri == "http://ex.org/b"
        assert http_payload_text(
            bytes(rows["<urn:uuid:3>"].payload)
        ) == "second doc"
        assert http_payload_text(
            bytes(rows["<urn:uuid:1>"].payload)
        ).startswith("line one\nWARC/1.0")

    def test_all_types_and_slim_scan(self, spark, warc_dir):
        df = read_warc(
            spark, warc_dir, record_types=None, keep_payload=False
        )
        rows = df.collect()
        assert len(rows) == 6
        assert all(r.payload is None for r in rows)
        kinds = {r.warc_type for r in rows}
        assert kinds == {"response", "request", "metadata"}

    def test_feeds_document_pipeline(self, spark, warc_dir):
        """Crawl → text → the engine's own corpus operators: the
        end-to-end shape a pre-training pipeline runs (WARC source →
        HTTP body text → quality/token columns)."""
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def body_text(p: pd.Series) -> pd.Series:
            return p.map(
                lambda b: http_payload_text(bytes(b)) if b is not None else None
            )

        docs = (
            read_warc(spark, warc_dir)
            .withColumn("text", body_text(F.col("payload")))
            .select("target_uri", "text")
            .where(F.col("text").isNotNull())
        )
        out = docs.withColumn(
            "n_words", F.size(F.split(F.trim("text"), r"\s+"))
        ).collect()
        assert len(out) == 4
        assert {r.target_uri for r in out} == {
            "http://ex.org/a", "http://ex.org/b",
            "http://ex.org/c", "http://ex.org/d",
        }
        assert all(r.n_words >= 2 for r in out)


class TestWarcObservability:
    def test_skipped_bytes_column_and_marker_row(self, spark, tmp_path):
        """Every row carries its file's total skipped_bytes; an
        all-corrupt file emits one NULL-typed marker row that bypasses
        the record_types filter."""
        clean = _record(rid="<urn:uuid:c1>", body=b"HTTP/1.1 200 OK\r\n\r\nok")
        corrupt_mid = (
            _record(rid="<urn:uuid:m1>", body=b"HTTP/1.1 200 OK\r\n\r\nx")
            + b"\x00garbage bytes here\n"
            + _record(rid="<urn:uuid:m2>", body=b"HTTP/1.1 200 OK\r\n\r\ny")
        )
        all_bad = b"\x00\x01this file is not a warc at all"
        (tmp_path / "clean.warc").write_bytes(clean)
        (tmp_path / "mid.warc").write_bytes(corrupt_mid)
        (tmp_path / "bad.warc").write_bytes(all_bad)
        rows = read_warc(spark, str(tmp_path)).collect()
        by_file = {}
        for r in rows:
            by_file.setdefault(r.warc_file.rsplit("/", 1)[-1], []).append(r)
        assert [r.skipped_bytes for r in by_file["clean.warc"]] == [0]
        mid = by_file["mid.warc"]
        assert {r.record_id for r in mid} == {"<urn:uuid:m1>", "<urn:uuid:m2>"}
        assert all(r.skipped_bytes > 0 for r in mid)
        marker = by_file["bad.warc"]
        assert len(marker) == 1
        assert marker[0].warc_type is None
        assert marker[0].skipped_bytes == len(all_bad)
