"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.  All pure Catalyst (oracle-checkable in any SQL
engine); formulas are deliberately simple n-gram/ratio heuristics, and
every counting primitive is split-based (no regex) so Spark and a SQL
oracle compute bit-identical results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nrt_spark.dataops.dedup import (normalized_text, spread_for_explode,
                                     spread_if_underpartitioned)

#: tiny per-language stopword marker lists for the language-ID heuristic
#: (public common-word lists); dict order = tie-break priority (first wins)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "und", "die", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "una", "por"],
}


def count_token(col, word: str):
    """Whole-token occurrence count via split on ' word ' over the
    space-padded text.  Non-overlapping left-to-right — the same result
    in any engine's split (no regex semantics involved)."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    return F.size(F.split(padded, f" {word} ", -1)) - F.lit(1)


def token_counts(docs: DataFrame,
                 cols: tuple = ("doc_id",)) -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate (ceil of
    chars/4 per word, the common ~4-chars-per-token heuristic).
    Output: (*cols, n_words, n_subwords) — ``cols`` are passed through
    (default the doc id; the duplicate-collapse path passes the
    grouping keys + multiplicity instead)."""
    # narrow per-row HOF chain: guard against under-split text scans
    # (skip for collapsed inputs — they come out of a group-by, already
    # shuffle-partitioned and tiny)
    if "doc_id" in cols:
        docs = spread_if_underpartitioned(docs)
    words = F.split(normalized_text(), " ")
    return docs.select(
        *cols,
        F.size(F.filter(words, lambda w: F.length(w) > 0)).alias("n_words"),
        F.aggregate(words, F.lit(0),
                    lambda acc, w: acc + F.ceil(F.length(w) / 4.0).cast("int")
                    ).alias("n_subwords"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Heuristic document quality in [0, 1]: length band + mean word
    length band + stopword presence.  Output: (doc_id, n_words,
    mean_word_len, stopword_ratio, quality)."""
    # narrow per-row HOF chain: guard against under-split text scans
    docs = spread_if_underpartitioned(docs)
    t = normalized_text()
    words = F.filter(F.split(t, " "), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    mean_wl = F.aggregate(words, F.lit(0),
                          lambda a, w: a + F.length(w)) / n_words
    stop_hits = None
    for w in LANG_MARKERS["en"]:
        c = count_token(t, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    stop_ratio = stop_hits / n_words
    quality = (
        F.when((n_words >= 10) & (n_words <= 5000), 0.4).otherwise(0.0)
        + F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 0.3).otherwise(0.0)
        + F.when(stop_ratio > 0.01, 0.3).otherwise(0.0)
    )
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 2).alias("quality"),
    )


def lang_scores(docs: DataFrame) -> DataFrame:
    """Marker-hit score per language: (doc_id, s_en, s_de, s_fr, s_es)."""
    # narrow per-row HOF chain: guard against under-split text scans
    docs = spread_if_underpartitioned(docs)
    t = normalized_text()
    cols = []
    for lang, markers in LANG_MARKERS.items():
        s = None
        for w in markers:
            c = count_token(t, w)
            s = c if s is None else s + c
        cols.append(s.cast("long").alias(f"s_{lang}"))
    return docs.select("doc_id", *cols)


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: highest marker score wins, ties resolved
    by LANG_MARKERS order (en > de > fr > es); zero everywhere -> 'und'.
    Output: (doc_id, pred_lang) — an ordered CASE chain, trivially
    mirrored in SQL."""
    scored = lang_scores(docs)
    langs = list(LANG_MARKERS)
    pred = F.lit("und")
    # build the CASE chain back-to-front so earlier languages win ties
    for i in range(len(langs) - 1, -1, -1):
        lang = langs[i]
        cond = (F.col(f"s_{lang}") > 0)
        for other in langs[i + 1:]:
            cond = cond & (F.col(f"s_{lang}") >= F.col(f"s_{other}"))
        for other in langs[:i]:
            cond = cond & (F.col(f"s_{lang}") > F.col(f"s_{other}"))
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return scored.select("doc_id", pred.alias("pred_lang"))


def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprint: first 16 hex chars of md5 of the normalized
    text (order-invariant contract with any engine's md5).
    Output: (doc_id, fp, n_chars)."""
    # narrow per-row normalize+md5: same under-split-scan guard as the
    # sibling operators (structural no-op on well-split scans)
    docs = spread_if_underpartitioned(docs)
    return docs.select(
        "doc_id",
        F.substring(F.md5(normalized_text()), 1, 16).alias("fp"),
        F.length("text").alias("n_chars"),
    )


def bigram_freq_stats(docs: DataFrame,
                      weights: DataFrame | None = None) -> DataFrame:
    """Per-doc corpus-bigram-frequency stats — the cheap LM-frequency
    quality signal real pipelines use before any model-based filter:
    documents whose word bigrams are rare across the corpus skew
    garbled/boilerplate-free-form.  Emits INTEGERS (occurrence-weighted
    frequency sum + bigram count, no division/log), so the cross-engine
    oracle digest is exact — a true LM log-prob would hinge on libm ulp
    agreement between engines.

    Scale shape: one groupBy on the bigram (corpus counts) + one join
    back on the same key + one per-doc agg — the count table is the
    (heavy-hitter-compressible) model artifact.
    Output: (doc_id, n_bigrams, freq_sum).

    ``weights`` (optional (doc_id, m)) is the duplicate-collapse hook:
    when ``docs`` is a representative-per-distinct-text relation,
    corpus counts weight each representative's occurrences by its
    multiplicity — counts over reps x m == counts over all docs, so
    the expanded per-doc stats are identical to the uncollapsed run's.
    """
    # spread BEFORE the explode — same rationale and measured numbers
    # as dedup.word_shingles(spread=True): a compressed text table's
    # byte-sized scan splits under-parallelize the explosion, and the
    # exchanged pre-explode bytes are a small fraction of the exploded
    # stream the bigram group-by shuffles anyway; pinned count so AQE
    # can't coalesce the read by those (compressed) pre-explode bytes
    words = spread_for_explode(docs).select(
        "doc_id",
        F.filter(F.split(normalized_text(), " "),
                 lambda w: F.length(w) > 0).alias("w"))
    bi = words.select(
        "doc_id",
        F.explode(F.expr(
            "CASE WHEN size(w) >= 2 THEN "
            "transform(sequence(0, size(w) - 2), "
            "i -> concat(w[i], ' ', w[i + 1])) "
            "ELSE array() END")).alias("bg"))
    if weights is None:
        counts = bi.groupBy("bg").agg(F.count("*").alias("c"))
    else:
        counts = (bi.join(weights, "doc_id")
                  .groupBy("bg").agg(F.sum("m").alias("c")))
    return (bi.join(counts, "bg")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.sum("c").alias("freq_sum")))
