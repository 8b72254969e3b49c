"""End-to-end training-corpus pipeline: raw documents -> deduped,
decontaminated, quality-filtered, tokenized, packed training shards.

Composes the dataops family into the shape a 100 TB pretraining-data
job takes, with every stage a separate materialized step so a
``ResumableJob`` (jobs/corpus_job.py) can checkpoint between them:

1. exact dedup        — one shuffle on the content digest;
2. near-dup dedup     — MinHash/LSH pair mining (df-capped) +
                        connected components, keep the min doc per
                        cluster;
3. decontamination    — eval-shingle LEFT SEMI join against the held-out
                        split (content-free id-hash split, reshard-stable);
4. quality filter     — heuristic [0,1] score threshold, pure Catalyst;
5. tokenize + pack    — deterministic hash-vocab tokens, concat-and-chunk
                        into fixed-length shards (one shuffle on shard).

Every stage is deterministic (hash-derived decisions only), so the
pipeline is idempotent and any shard can be regenerated independently —
the operational contract a multi-week 10^12-doc job needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nrt_spark.dataops import dedup as D
from nrt_spark.dataops.textstats import quality_scores

VOCAB_SIZE = 50_000


def split_col(frac_val: int = 10) -> F.Column:
    """Content-free deterministic split: 'val' for ``frac_val``% of doc
    ids by md5 hash (same expression as the split_sample_docs query)."""
    h = F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))),
        1, 8), 16, 10).cast("long") % 100
    return F.when(h < 100 - frac_val, "train").otherwise("val")


def exact_keep(docs: DataFrame) -> DataFrame:
    """Docs surviving exact dedup (min doc_id per normalized digest)."""
    keep = D.exact_dedup(docs).select(
        F.col("keep_doc_id").alias("doc_id"))
    return docs.join(keep, "doc_id", "left_semi")


def neardup_keep(docs: DataFrame, max_df: int = 50,
                 cc_telemetry: dict | None = None) -> DataFrame:
    """Docs surviving near-dup clustering: mine LSH candidate pairs,
    resolve connected components, keep only each cluster's canonical
    (minimum) member.  Non-clustered docs pass through untouched.
    ``cc_telemetry`` is passed through to
    :func:`~nrt_spark.dataops.dedup.connected_components` (scale runs
    record the per-round convergence there)."""
    pairs = D.minhash_lsh_pairs(docs, max_df=max_df)
    comp = D.connected_components(pairs, src="doc_a", dst="doc_b",
                                  telemetry=cc_telemetry)
    drop = comp.filter(F.col("node") != F.col("component")) \
        .select(F.col("node").alias("doc_id"))
    return docs.join(drop, "doc_id", "left_anti")


def decontaminate(train: DataFrame, eval_docs: DataFrame,
                  n: int = 4) -> DataFrame:
    """Training docs with no n-gram overlap against the eval split."""
    flagged = D.contamination_flags(train, eval_docs, n=n)
    return train.join(flagged, "doc_id", "left_anti")


def quality_filter(docs: DataFrame, min_quality: float = 0.7) -> DataFrame:
    ok = quality_scores(docs).filter(
        F.col("quality") >= min_quality).select("doc_id")
    return docs.join(ok, "doc_id", "left_semi")


def tokenize(docs: DataFrame, vocab: int = VOCAB_SIZE) -> DataFrame:
    """Deterministic hash-vocab tokenizer: word -> md5-derived id mod
    vocab, entirely in Catalyst (no Python in the row path).  Output:
    (doc_id, tokens array<int>, n_tok)."""
    words = F.filter(F.split(D.normalized_text(), " "),
                     lambda w: F.length(w) > 0)
    ids = F.transform(
        words,
        lambda w: (F.conv(F.substring(F.md5(w), 1, 8), 16, 10)
                   .cast("long") % vocab).cast("int"))
    return docs.select("doc_id", ids.alias("tokens")) \
        .withColumn("n_tok", F.size("tokens"))


def _decontaminate_against_split(docs: DataFrame,
                                 frac_val: int) -> DataFrame:
    split = docs.withColumn("split", split_col(frac_val))
    train = split.filter("split = 'train'").drop("split")
    eval_docs = split.filter("split = 'val'").drop("split")
    return decontaminate(train, eval_docs)


def stage_plan(min_quality: float = 0.7, max_df: int = 50,
               frac_val: int = 10, cc_telemetry: dict | None = None):
    """The funnel, defined ONCE: ordered (name, docs -> docs) stages.
    Both :func:`build_corpus` (lazy, for tests) and jobs/corpus_job.py
    (materializing each stage for resume) iterate this same plan, so
    the certified path and the shipped path cannot drift."""
    return [
        ("exact_dedup", exact_keep),
        ("neardup_dedup", lambda d: neardup_keep(
            d, max_df=max_df, cc_telemetry=cc_telemetry)),
        ("decontaminated",
         lambda d: _decontaminate_against_split(d, frac_val)),
        ("quality_filtered",
         lambda d: quality_filter(d, min_quality=min_quality)),
    ]


def build_corpus(docs: DataFrame, min_quality: float = 0.7,
                 max_df: int = 50, seq_len: int = 512,
                 num_shards: int = 16, frac_val: int = 10):
    """Run the full pipeline lazily; returns (packed, stage_dfs) where
    ``stage_dfs`` maps stage name -> surviving-docs DataFrame (for
    step-by-step materialization / counting by the job wrapper)."""
    from nrt_spark.tokens import pack_sequences

    stages: dict[str, DataFrame] = {}
    cur = docs
    for name, fn in stage_plan(min_quality=min_quality, max_df=max_df,
                               frac_val=frac_val):
        cur = fn(cur)
        stages[name] = cur
    toks = tokenize(cur)
    packed = pack_sequences(toks, seq_len=seq_len, num_shards=num_shards)
    return packed, stages
