"""Shared corpus-quality gate expressions.

One definition serves every consumer of the gate — the batch driver
queries (q_text_quality, q_lang_guess, q_corpus_filter), the batch
pipeline stage (llm_pipeline.filter_corpus), and the streaming ingest
gate (llm_ingest.ingest_gate) — so the quality semantics cannot drift
between batch and streaming (the same no-drift rule as
functions/ngrams.py). Everything here is a pure JVM column expression
(split / filter / size / round) — no Python in the hot path; the DuckDB
oracles interpolate the same STOPWORDS / LANG_MARKERS constants.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]

LANG_MARKERS = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "de"],
    "de": ["der", "die", "und"],
    "fr": ["le", "la", "et"],
}


def n_words_col(text_col: Column) -> Column:
    return F.size(F.split(text_col, " "))


def stop_ratio_col(text_col: Column) -> Column:
    """Stop-word share of the document, rounded to 4 places (the
    rounding is part of the contract — both engines compare the
    rounded value, and the gate thresholds the rounded value so
    boundary documents land identically everywhere)."""
    words = F.split(text_col, " ")
    stops = F.size(F.filter(words, lambda w: w.isin(*STOPWORDS)))
    return F.round(stops.cast("double") / F.size(words), 4)


def lang_guess_col(text_col: Column) -> Column:
    """Marker-count language guess with 'en' as the tie-keeping
    baseline: a later language wins only with a STRICTLY greater
    marker count (iteration order es, de, fr — fixed, part of the
    contract)."""
    words = F.split(text_col, " ")
    scores = {
        lang: F.size(F.filter(words, lambda w: w.isin(*m)))
        for lang, m in LANG_MARKERS.items()
    }
    best = F.lit("en")
    best_score = scores["en"]
    for lang in ["es", "de", "fr"]:
        cond = scores[lang] > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return best


def gate_predicate(
    text_col: Column, lang_col: Column, *, min_words: int = 5
) -> Column:
    """The STATELESS per-document gate: length ∧ stop-word ratio ∧
    declared-equals-guessed language. q_corpus_filter adds the one
    corpus-GLOBAL term (md5-canon exact dedup) on top; the streaming
    ingest replaces that term with cross-batch keyed dedup."""
    return (
        (n_words_col(text_col) >= min_words)
        & (stop_ratio_col(text_col) <= 0.5)
        & (lang_guess_col(text_col) == lang_col)
    )


def md5_prefix_key(id_col: Column) -> Column:
    """The deterministic 2-hex-char sampling key shared by every
    rate-based draw (sample_stratified, mix_sample, mix_temperature,
    llm_pipeline.mix_corpus) — stable under task retries/replays."""
    return F.substring(F.md5(id_col.cast("string")), 1, 2)


def temperature_thresholds(docs, *, alpha: float, budget: float, lang_col: str = "lang", th_col: str = "th"):
    """Per-language tempered keep-thresholds (mT5/UniMax family):
    rate_g = min(1, B*n_g^alpha / (S*n_g)), quantized to the 2-hex
    threshold md5_prefix_key compares against. Shared by the driver
    query (q_mix_temperature) and the pipeline stage
    (llm_pipeline.mix_corpus). Returns a TINY frame (lang, th) —
    bounded by the language inventory; the normalizing window-sum runs
    over that frame, never the corpus."""
    from pyspark.sql import Window

    cnt = docs.groupBy(lang_col).agg(F.count(F.lit(1)).alias("n"))
    pw = F.pow(F.col("n").cast("double"), F.lit(alpha))
    raw = (
        F.lit(float(budget))
        * pw
        / (F.sum(pw).over(Window.partitionBy()) * F.col("n"))
    )
    return cnt.select(
        lang_col,
        F.when(raw >= 1, F.lit("zz"))
        .otherwise(
            F.lower(F.lpad(F.hex(F.floor(raw * 256).cast("int")), 2, "0"))
        )
        .alias(th_col),
    )
