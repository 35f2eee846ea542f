"""Distributed WARC/1.x source — web-archive records as a documents table.

WARC (ISO 28500) is the container format of Common Crawl and of every
web-scale pre-training corpus derived from it, so an engine that feeds
LLM data pipelines needs to read it natively. The format is NOT
line-splittable: each record is a header block (named fields, one per
line) plus a body of exactly ``Content-Length`` bytes, and bodies
routinely contain bare newlines and even ``WARC/1.0`` lookalike bytes —
so a within-file byte-offset split cannot find record boundaries without
scanning from the file start.

Spark realization — parallel at FILE granularity, which is exactly how
production Common Crawl pipelines shard the work (the crawl ships as
~90k segment files of ~1 GB each; one task per file is the unit both
CCNet and cc_net-style pipelines use):

- ``spark.read.format("binaryFile")`` lists the files into one row per
  file (path, length, content) WITHOUT reading bodies at planning time;
  ``mapInPandas`` then parses each file's bytes into records inside the
  executor. A 100 TB crawl is ~100k files → ~100k tasks: ample
  parallelism for a 1000-executor cluster, no shuffle, and pushdown of
  ``pathGlobFilter``/``modifiedAfter`` options applies at listing time.
- gzip members: Common Crawl WARCs are per-record gzip members
  concatenated into one ``.warc.gz`` stream. ``zlib`` decompresses
  member-concatenated streams via repeated ``decompressobj`` calls with
  ``unused_data`` carry-over — stdlib-only, no external codec.
- The parser is per-file bounded: the kernel yields one pandas frame
  per input FILE (never accumulating a whole Arrow batch of files), so
  peak executor memory is one decompressed file plus its output frame.
- Mid-file corruption does not silently drop the tail: the scanner
  RESYNCS to the next ``\\nWARC/`` boundary after a malformed record
  (bad magic, unparseable header, missing Content-Length) and counts
  the bytes it skipped; every emitted row carries its file's total
  ``skipped_bytes``, and a file that skipped bytes but produced no
  records emits one NULL-typed marker row (which bypasses the
  ``record_types`` filter) so dropped tails are always observable.

Caveat carried honestly: a single pathological multi-GB file serializes
into one task (same as every per-file format — gzip text, avro without
sync markers). Production mitigations are upstream (the crawl writers
cap file sizes) not in the reader.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "warc_file string, record_offset long, warc_type string, "
    "target_uri string, warc_date string, record_id string, "
    "content_type string, content_length long, payload binary, "
    "skipped_bytes long"
)

_CRLF = b"\r\n"


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a stream of concatenated gzip members (the Common
    Crawl .warc.gz layout: one member per record) into one byte string.
    Plain (non-gzip) input is returned unchanged."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
        out.append(d.decompress(rest))
        rest = d.unused_data
    return b"".join(out)


def parse_warc_bytes(
    data: bytes, *, keep_payload: bool = True, stats: dict | None = None
):
    """Parse one WARC file's bytes into record dicts. Tolerant of both
    CRLF (spec) and LF header line endings. A malformed record (bad
    magic, unparseable header block, missing/invalid Content-Length)
    does NOT end the scan: the scanner resyncs to the next ``WARC/``
    boundary (newline-preceded or bare) and continues, so mid-file
    corruption costs only the corrupt region. A record whose declared body overruns the file
    (truncated fetch) ends the scan. Pass ``stats`` (a dict) to receive
    ``skipped_bytes`` / ``resyncs`` counters, updated as the scan
    progresses. The resync may land on ``WARC/`` bytes inside an
    undelimited record BODY; the next iteration's header validation
    rejects such a false boundary and resyncs again, so the worst case
    is extra skipped bytes, never a corrupt record emitted as good."""
    if stats is None:
        stats = {}
    stats.setdefault("skipped_bytes", 0)
    stats.setdefault("resyncs", 0)
    data = _gunzip_members(data)
    pos = 0
    n = len(data)

    def resync(from_pos: int, search_from: int) -> int:
        """Skip to the next plausible record boundary, counting the
        bytes from ``from_pos`` as lost. Returns the new pos (n = EOF).
        ADVICE r6: consider a BARE ``WARC/`` occurrence too, not only
        ``\\nWARC/`` — a valid boundary directly abutting garbage (no
        preceding newline) previously lost the rest of the file to
        skipped_bytes. Header validation rejects false positives, so
        the bare match only risks one extra resync, never a corrupt
        record emitted as good. Both callers pass a ``search_from``
        strictly past any already-rejected magic, so the bare search
        cannot re-match the current position."""
        nxt = data.find(b"WARC/", search_from)
        new_pos = nxt if nxt != -1 else n
        stats["skipped_bytes"] += new_pos - from_pos
        stats["resyncs"] += 1
        return new_pos

    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            pos = resync(pos, pos)
            continue
        record_offset = pos
        # header block ends at the first blank line
        hdr_end = data.find(b"\r\n\r\n", pos)
        sep_len = 4
        lf_end = data.find(b"\n\n", pos)
        if hdr_end == -1 or (lf_end != -1 and lf_end < hdr_end):
            hdr_end, sep_len = lf_end, 2
        if hdr_end == -1:
            # no header terminator before EOF: unrecoverable tail
            stats["skipped_bytes"] += n - pos
            stats["resyncs"] += 1
            break
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\n")[1:]:
            line = line.strip(b"\r")
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().decode("latin-1").lower()] = (
                    v.strip().decode("latin-1")
                )
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            # spec requires Content-Length; without it this record's
            # body boundary is unknowable — skip it and resync
            pos = resync(pos, pos + 5)
            continue
        body_start = hdr_end + sep_len
        if body_start + clen > n:
            stats["skipped_bytes"] += n - pos
            stats["resyncs"] += 1
            break  # truncated body
        yield {
            "record_offset": record_offset,
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "record_id": headers.get("warc-record-id"),
            "content_type": headers.get("content-type"),
            "content_length": clen,
            "payload": data[body_start : body_start + clen]
            if keep_payload
            else None,
        }
        pos = body_start + clen


def read_warc(
    spark: SparkSession,
    path: str,
    *,
    record_types: tuple[str, ...] | None = ("response",),
    keep_payload: bool = True,
) -> DataFrame:
    """Read WARC files (plain or .warc.gz) under ``path`` into a record
    table (WARC_SCHEMA). ``record_types`` filters on WARC-Type early —
    inside the parse task, before any bytes hit the output batch — since
    crawl files are ~50% request/metadata records a training pipeline
    never wants; pass None to keep everything. ``keep_payload=False``
    drops bodies at the source for metadata-only scans (URL dedup, crawl
    stats) so the Arrow transfer moves only slim rows.

    Observability: each row's ``skipped_bytes`` is the TOTAL bytes its
    file lost to corruption resyncs (0 on a clean file); a file that
    skipped bytes but emitted no records (all-corrupt, or every record
    filtered) yields ONE marker row with NULL warc_type that bypasses
    the ``record_types`` filter — ``where skipped_bytes > 0`` is the
    corruption report. The kernel yields one frame per FILE, so peak
    memory is one decompressed file, not a whole Arrow batch of them."""
    want = set(record_types) if record_types is not None else None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "warc_file", "record_offset", "warc_type", "target_uri",
            "warc_date", "record_id", "content_type", "content_length",
            "payload", "skipped_bytes",
        ]
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                rows = []
                stats: dict = {}
                for rec in parse_warc_bytes(
                    bytes(content), keep_payload=keep_payload, stats=stats
                ):
                    if want is not None and rec["warc_type"] not in want:
                        continue
                    rows.append({"warc_file": fpath, **rec})
                skipped = stats.get("skipped_bytes", 0)
                if skipped and not rows:
                    rows.append(
                        {
                            "warc_file": fpath,
                            "record_offset": None,
                            "warc_type": None,
                            "target_uri": None,
                            "warc_date": None,
                            "record_id": None,
                            "content_type": None,
                            "content_length": None,
                            "payload": None,
                        }
                    )
                if rows:
                    frame = pd.DataFrame(rows, columns=cols)
                    frame["skipped_bytes"] = skipped
                    yield frame

    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content").mapInPandas(kernel, WARC_SCHEMA)


def http_payload_text(payload: bytes) -> str | None:
    """Split an HTTP response payload (a WARC 'response' record body) at
    the header/body boundary and decode the body as UTF-8 with
    replacement — the first normalization step of every crawl-to-text
    pipeline. Returns None when no header boundary exists."""
    for sep in (b"\r\n\r\n", b"\n\n"):
        i = payload.find(sep)
        if i != -1:
            return payload[i + len(sep):].decode("utf-8", errors="replace")
    return None
