"""Shared word-n-gram / fixed-segment hash expressions.

One definition serves the batch driver queries (entry_queries
q_decontaminate / q_segment_dedup) and the streaming decontamination
job (streaming/decon_stream.py), so the gram derivation cannot drift
between the two paths. Everything here is a pure JVM column expression
(split / sequence / transform / slice / concat_ws / md5) — no Python in
the hot path; hashing happens at the map stage so any downstream wide
op moves 32-char hashes, never the gram text.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def word_ngrams(text_col: Column, n: int) -> Column:
    """Array of the space-joined word n-grams of ``text_col`` as TEXT.
    Rows with fewer than ``n`` words yield an EMPTY array (explode
    drops them), guarding Spark's descending-sequence surprise when
    size - (n-1) < 1. Prefer :func:`word_ngram_hashes` before any wide
    op — gram text belongs in shuffles only when the downstream op
    needs the words themselves (e.g. PMI collocations split the gram
    back into its member words)."""
    words = F.split(text_col, " ")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(words, i, n)),
    )
    return F.when(F.size(words) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def word_ngram_hashes(text_col: Column, n: int) -> Column:
    """Array of md5 hashes of the space-joined word n-grams of
    ``text_col`` (md5 applied gram-wise over :func:`word_ngrams`, so
    wide ops downstream move 32-char hashes, never gram text)."""
    return F.transform(word_ngrams(text_col, n), F.md5)


def segment_hashes(text_col: Column, seg_len: int) -> Column:
    """Array of md5 hashes of the NON-overlapping ``seg_len``-word
    chunks of ``text_col`` (last chunk may be shorter). Always at least
    one segment: split('') yields [''] so nseg >= 1."""
    words = F.split(text_col, " ")
    nseg = F.ceil(F.size(words) / F.lit(float(seg_len))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda c: F.md5(
            F.concat_ws(" ", F.slice(words, c * seg_len + 1, seg_len))
        ),
    )


def cdc_segment_hashes(text_col: Column, window: int = 4) -> Column:
    """Array of md5 hashes of CONTENT-DEFINED segments of ``text_col``
    (Rabin-style chunking at the word level): a segment boundary falls
    after word i wherever the fingerprint of the trailing ``window``
    words — here substr(md5(window text), 1, 1) == '0', firing at rate
    1/16 for ~16-word expected segments — or at end-of-document. Unlike
    fixed-length segments (:func:`segment_hashes`), a single inserted
    or deleted word only perturbs the boundaries within one window of
    the edit, so shared content re-aligns and still deduplicates —
    the property CDC exists for (LBFS/rsync lineage).

    Pure JVM column expressions (sequence / filter / slice / md5 /
    aggregate) — no Python, no shuffle; the downstream dedup moves only
    32-char hashes. Always at least one segment (end-of-doc boundary).

    Expression-shape constraint: the boundary array is an md5 PER WORD
    POSITION — the expensive part — and Catalyst does NOT eliminate
    common subexpressions referenced from different higher-order-
    function lambdas (measured 4.3x at sf0.1). The segment build is
    therefore ONE ``aggregate`` over the boundary array (bnd evaluated
    exactly once per row), carrying (prev_boundary, segments) as the
    fold state, instead of a transform indexing back into bnd."""
    words = F.split(text_col, " ")
    n = F.size(words)

    def _is_boundary(i):
        start = F.greatest(i - (window - 1), F.lit(1))
        win = F.slice(words, start, i - start + 1)
        return (i == n) | (
            F.substring(F.md5(F.concat_ws(" ", win)), 1, 1) == "0"
        )

    bnd = F.filter(F.sequence(F.lit(1), n), _is_boundary)
    init = F.struct(
        F.lit(0).alias("prev"),
        F.array().cast("array<string>").alias("segs"),
    )

    def _fold(acc, b):
        seg = F.md5(
            F.concat_ws(
                " ", F.slice(words, acc["prev"] + 1, b - acc["prev"])
            )
        )
        return F.struct(
            b.alias("prev"),
            F.concat(acc["segs"], F.array(seg)).alias("segs"),
        )

    return F.aggregate(bnd, init, _fold, lambda acc: acc["segs"])
