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
