"""Deduplication operators for large-scale training-data pipelines.

All variants are pure DataFrame compositions (no Python UDFs): hashing is
``md5`` (identical hex output in Spark and DuckDB, which makes every
operator oracle-checkable), shingling is ``split`` + ``transform`` +
``explode``.

Scale notes:
- exact dedup is a hash groupBy — one shuffle on the digest;
- near-dup (Jaccard / MinHash-LSH) avoids the O(n^2) cross join by
  joining on shared shingles / band buckets first, so the shuffle key is
  the shingle/bucket hash; hot shingles (stop-phrases) should be
  filtered by document frequency before the self-join at 100 TB scale
  (df cap available via ``max_df``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def normalized_text(col="text"):
    """Lowercase, collapse whitespace — the canonical form for hashing."""
    return F.regexp_replace(F.lower(F.col(col)), r"\s+", " ")


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Group identical (normalized) texts; keep the smallest doc_id as
    canonical.  Output: (digest, n_dupes, keep_doc_id).

    Adaptive spread before the normalize+md5 map side: compressed text
    packs ~100x, so a whole duplicated corpus can land in ONE scan
    split and the per-row regex chain runs serial (sf100 probe: 82.7 s
    on one task; structural no-op on a well-split cluster scan — see
    spread_if_underpartitioned)."""
    return (
        spread_if_underpartitioned(docs)
        .select("doc_id", F.md5(normalized_text()).alias("digest"))
        .groupBy("digest")
        .agg(F.count("*").alias("n_dupes"),
             F.min("doc_id").alias("keep_doc_id"))
    )


def spread_if_underpartitioned(docs: DataFrame,
                               key: str = "doc_id") -> DataFrame:
    """Adaptive parallelism guard for NARROW text operators (per-row
    expression work with no shuffle to piggyback on): repartition up to
    the session's default parallelism, but ONLY when the input plan
    under-splits (compressed text packs ~100x, so a small corpus can
    land in 1-2 byte-sized scan splits and a heavy per-row expression
    chain runs nearly serial).  On a cluster-scale table the scan has
    plenty of splits and this is a structural no-op — no shuffle is
    added — which is exactly why the narrow operators use this instead
    of the unconditional spread the explode+aggregate operators get
    (there the repartition replaces a shuffle; here it would add one).
    """
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        return docs.repartition(sc.defaultParallelism, key)
    return docs


def spread_for_explode(docs: DataFrame, key: str = "doc_id") -> DataFrame:
    """Pinned-count spread BEFORE an explode/shingle expansion.

    The count must be explicit (REPARTITION_BY_NUM): a bare
    ``repartition(key)`` is coalescable, and AQE sizes the read by the
    exchange's COMPRESSED pre-explode bytes — systematically wrong when
    the downstream explode inflates the rows ~100x (and duplicated
    crawl text compresses ~100x on top).  Measured at the sf100 probe:
    the moment initialPartitionNum made this exchange eligible for
    coalescing, AQE folded the 4-gram explode feeding decontaminate's
    semi-join onto a handful of tasks — 194 s -> 329 s on identical
    data.  Pinning max(shuffle.partitions, scan splits) keeps the
    cluster case intact (a well-split scan's parallelism is never
    reduced) while the under-split compressed corpus gets the full
    shuffle width.
    """
    spark = docs.sparkSession
    n = max(int(spark.conf.get("spark.sql.shuffle.partitions")),
            docs.rdd.getNumPartitions())
    return docs.repartition(n, key)


#: collapse-first threshold for the duplicate-adaptive per-doc text
#: operators: sampled distinct-text ratio below this -> compute once
#: per DISTINCT text and expand back, else keep the map-only plan
COLLAPSE_RATIO = 0.7

#: session-scoped duplicate_ratio_estimate results for bare-scan inputs
#: (see its docstring); bounded, cleared wholesale past 256 entries
_GATE_CACHE: dict = {}


def duplicate_ratio_estimate(docs: DataFrame, sample_rows: int = 50_000,
                             seed: int = 7) -> float:
    """Estimated DISTINCT-normalized-text fraction of ``docs`` in
    (0, 1]: one cheap sampled pass (md5 over ~``sample_rows`` Bernoulli-
    sampled rows).  The sample fraction is sized from parquet footer
    metadata when the plan is a bare scan (no Spark job —
    simsearch._source_row_estimate) and falls back to a fixed 2% for
    filtered/derived inputs.  A sample under 2000 rows returns 1.0
    ("assume unique"): too small to trust, and small corpora are where
    collapsing can't win anyway.  approx_count_distinct's ~2% HLL error
    is irrelevant at the 0.7 decision threshold.

    Detection regime (fundamental to ANY uniform sample, not the HLL):
    two copies of a text only lower the sampled ratio when BOTH land in
    the sample, so duplication with per-text multiplicity m is visible
    only when m * fraction >= ~1 (m >= ~N/sample_rows).  That is
    exactly the regime where collapse-first pays off by an order of
    magnitude; low-multiplicity duplication (m of 2-5 at crawl scale)
    samples as "unique" and keeps the map-only plan — correct output,
    modest missed savings, and no full-corpus pre-pass wasted on clean
    corpora.

    The probe decides PLAN SHAPE only — a collapsed and an uncollapsed
    run produce identical results (pinned by the multiplicity-
    invariance tests), so sampling variance across file layouts can
    never change a query answer, only its wall time.

    Session-scoped cache: several registry queries gate on the SAME
    documents table in one pass (tokenize, simhash, repetition,
    lang-quality, token counts...), and the probe is a full-sample scan
    job each time.  When the input is a bare file scan the result is
    cached on (sorted file list, footer row count, params) — a key that
    changes if the table is overwritten in place — so a full pass pays
    for ONE probe per table.  Derived/filtered inputs have no cheap
    stable identity and are never cached.  Plan-shape-only decision, so
    a stale hit could only ever cost wall time, not correctness.
    """
    from nrt_spark.dataops.simsearch import _source_row_estimate

    est = _source_row_estimate(docs)
    key = None
    if est is not None:
        try:
            key = (tuple(sorted(docs.inputFiles())), est[0],
                   sample_rows, seed)
        except Exception:
            key = None
        if key is not None and key in _GATE_CACHE:
            return _GATE_CACHE[key]
    frac = 0.02 if est is None else min(1.0, sample_rows / max(est[0], 1))
    # spread the SAMPLE (not the corpus) before the md5 probe: the
    # sample is a narrow op, so on a 1-2-split compressed scan the
    # probe's normalize+md5 ran serial in one task (0.50 s at sf1 where
    # the fraction is 1.0).  Only the ~sample_rows sampled rows cross
    # the exchange, and on a well-split cluster scan the guard is a
    # structural no-op.
    row = (spread_if_underpartitioned(docs.sample(False, frac, seed=seed))
           .agg(F.approx_count_distinct(
                    F.md5(normalized_text())).alias("d"),
                F.count("*").alias("n"))
           .collect()[0])
    ratio = 1.0 if row["n"] < 2000 else min(1.0, row["d"] / row["n"])
    if key is not None:
        if len(_GATE_CACHE) >= 256:
            _GATE_CACHE.clear()
        _GATE_CACHE[key] = ratio
    return ratio


def collapse_per_doc(docs: DataFrame, compute,
                     collapse: "bool | str" = "auto") -> DataFrame:
    """Duplicate-adaptive wrapper for a PER-DOC operator that is a pure
    function of the normalized text.  ``compute`` maps a
    (doc_id, text, ...) frame to one row per doc_id with metric
    columns; when the sampled gate (duplicate_ratio_estimate) says the
    corpus is duplicate-heavy, it runs once per DISTINCT text — on the
    representative relation from _dup_groups (string equality, never a
    hash merge) — and the metrics expand back to every doc_id through
    a text-equality join.  On a clean corpus ``compute(docs)`` runs
    unchanged (the collapse would ADD a full-corpus text shuffle plus
    the join-back that the map-only plan never needs).

    Output: (doc_id, <compute's metric columns in order>) — identical
    rows on either branch (pinned by the multiplicity tests).
    """
    if collapse == "auto":
        collapse = duplicate_ratio_estimate(docs) < COLLAPSE_RATIO
    if not collapse:
        return compute(docs)
    groups = _dup_groups(docs, members=False)
    reps = groups.select(F.col("rep").alias("doc_id"),
                         F.col("_t").alias("text"))
    return expand_per_doc(docs, groups, compute(reps))


def expand_per_doc(docs: DataFrame, groups: DataFrame,
                   vals: DataFrame) -> DataFrame:
    """Expand per-REPRESENTATIVE metric rows (``vals``: one row per rep
    doc_id) back to every doc_id of ``docs`` through NULL-SAFE text
    equality — the join-back half of the duplicate-adaptive collapse,
    shared by :func:`collapse_per_doc` and the composite queries that
    reuse one ``_dup_groups`` relation across several metrics.

    The text key MUST join null-safely (``<=>``): ``_dup_groups``
    groups NULL-text docs into one group (SQL GROUP BY treats NULLs as
    equal), but a plain equi-join on ``_t`` never matches NULL keys, so
    those docs would silently vanish from the collapsed branch while
    the uncollapsed map emits a row for every doc.  ``<=>`` is still an
    equi-join key for Spark (hash/sort-merge joinable, no nested
    loop)."""
    metric_cols = [c for c in vals.columns if c != "doc_id"]
    per_text = (groups.select("rep", "_t")
                .join(vals.withColumnRenamed("doc_id", "rep"), "rep")
                .select("_t", *metric_cols))
    # spread before the expansion-side normalize (round-8): the join
    # key _t is computed MAP-SIDE (before the join's exchange), so on a
    # 1-2-split compressed scan the full-corpus regex ran serial
    # (measured 0.91 s of simhash's wall in one task at sf1);
    # structural no-op on a well-split cluster scan.
    docs_t = spread_if_underpartitioned(docs) \
        .select("doc_id", normalized_text().alias("_t"))
    return (docs_t
            .join(per_text, docs_t["_t"].eqNullSafe(per_text["_t"]))
            .select("doc_id", *metric_cols))


def _df_cap(sh: DataFrame, max_df: int | None,
            broadcast_hot: bool) -> DataFrame:
    """The shared hot-shingle df cap: drop shingles appearing in more
    than ``max_df`` rows of ``sh`` via a heavy-hitter-bounded hot list
    (broadcast when ``broadcast_hot``, shuffled anti-join otherwise).
    One implementation so word_shingles and capped_shingles can never
    diverge on cap semantics."""
    if max_df is None:
        return sh
    hot = (sh.groupBy("shingle").count()
           .filter(F.col("count") > max_df).select("shingle"))
    if broadcast_hot:
        hot = F.broadcast(hot)
    return sh.join(hot, "shingle", "left_anti")


def word_shingles(docs: DataFrame, n: int = 3, max_df: int | None = None,
                  materialize: bool = False,
                  broadcast_hot: bool = True,
                  spread: bool = True,
                  pre_normalized: bool = False) -> DataFrame:
    """Distinct n-word shingles per doc: (doc_id, shingle).

    Input contract: one row per ``doc_id`` (every in-repo producer — a
    corpus table, or the representative relation of ``_dup_groups`` —
    satisfies it).  Since round 8 the per-doc dedup is a map-side
    ``array_distinct`` INSIDE each row's shingle array; a corpus that
    repeats a doc_id across rows would emit the repeated rows' shingles
    repeatedly where the old post-explode ``.distinct()`` collapsed
    them.

    ``pre_normalized`` skips the normalize regex when ``text`` is
    already the canonical form (the collapsed miners' representative
    relations come out of ``_dup_groups``, whose group key IS the
    normalized text — re-normalizing is an idempotent full regex pass
    over the corpus).

    ``spread`` (default) repartitions the docs BY doc_id BEFORE the
    shingle explode: compressed text packs ~100x, so a bytes-sized
    scan split can hold the whole corpus in a couple of tasks and the
    explode — the expensive part — runs nearly serial (the simhash16
    docstring has the measured sf10 numbers).  The exchanged bytes are
    the raw pre-explode docs, a small fraction of the exploded stream.
    Pass ``False`` only when the input is already WIDE-partitioned;
    note a group-by output is NOT enough — AQE coalesces a small text
    exchange down to a handful of read tasks, which then bottlenecks
    the ~30x explode fused onto them (round-8 finding: the collapsed
    miners' representative relations need the spread).

    ``max_df`` drops shingles appearing in more than that many docs
    (stop-phrase control — essential before any self-join at scale).
    With ``broadcast_hot`` (default) the hot-shingle list is
    heavy-hitter-bounded (at most |shingle rows| / max_df entries) and
    BROADCAST, making the cap a map-side filter instead of a second
    shuffle of the full shingle relation; set it False when the corpus
    is large enough that |rows|/max_df could exceed broadcast limits
    (~10^8 entries) — the cap then falls back to a shuffled anti-join.

    ``materialize`` eagerly ``localCheckpoint``s the pre-cap exploded
    relation for callers that scan it several times.  Since round 8
    the pair miners no longer use it — the explode is map-only (no
    distinct shuffle), so they materialize the far smaller POST-cap
    relation instead (:func:`capped_shingles`) and recompute the
    explode once for the hot-list count.  The storage is call-scoped:
    the blocks belong to the checkpointed plan and Spark's
    ContextCleaner reclaims them once the caller's result goes out of
    scope, and an eager checkpoint runs its Spark job at plan
    CONSTRUCTION time (lazily composing callers should pass False).
    """
    if spread:
        docs = spread_for_explode(docs)
    txt = F.col("text") if pre_normalized else normalized_text()
    words = docs.select("doc_id", F.split(txt, " ").alias("w"))
    # guard: sequence(0, -1) DESCENDS in Spark, so docs shorter than n
    # words must produce an empty shingle array (exploded away), matching
    # SQL engines whose range(negative) is empty.
    # array_distinct BEFORE the explode (round-8): per-doc shingle
    # duplicates all live inside one row's array, so deduping there is
    # map-side and FREE, where the old post-explode ``.distinct()``
    # shuffled the full exploded relation (sf1: a 54 MB exchange + a
    # second full-width stage) to remove the same rows.  The output
    # row set — distinct (doc_id, shingle) — is identical.
    # Direct subscripts + concat instead of concat_ws(slice(...)):
    # slice() allocates a fresh n-element array per shingle, which
    # dominated the explode stage (measured 7x: 1.5 s -> 0.2 s over
    # 2.6M shingles at sf1); split() never yields NULL elements, so
    # concat == concat_ws here and the strings are identical.
    shingle_expr = ", ' ', ".join(f"w[i + {j}]" for j in range(n))
    sh = words.select(
        "doc_id",
        F.explode(F.expr(
            f"CASE WHEN size(w) >= {n} THEN "
            f"array_distinct(transform(sequence(0, size(w) - {n}), "
            f"i -> concat({shingle_expr}))) "
            f"ELSE array() END")).alias("shingle")
    )
    if materialize:
        sh = sh.localCheckpoint()
    return _df_cap(sh, max_df, broadcast_hot)


def capped_shingles(docs: DataFrame, n: int = 3, max_df: int | None = None,
                    broadcast_hot: bool = True, spread: bool = True,
                    pre_normalized: bool = False,
                    checkpoint: bool = True) -> DataFrame:
    """df-capped distinct shingles for the pair miners: the SURVIVING
    (doc_id, shingle) relation, optionally ``localCheckpoint``ed
    (non-eager) so multi-pass consumers (sizes, both self-join sides,
    the active-doc gate) scan one materialized copy.

    Round-8 restructure of the miners' shingle prologue: the old path
    materialized the PRE-cap relation (an eager checkpoint of the full
    exploded stream — 320 MB in memory at sf1) and every downstream
    consumer re-scanned it through the anti-join filter (5 full scans
    measured).  Since the explode is now map-only (per-doc
    array_distinct, no distinct shuffle — see :func:`word_shingles`),
    recomputing it once for the hot-list count and once for the capped
    materialization is cheaper than storing and re-reading the pre-cap
    stream, and the stored relation shrinks to the post-cap survivors —
    strictly smaller, by construction, at every scale."""
    sh = word_shingles(docs, n=n, max_df=None, materialize=False,
                       spread=spread, pre_normalized=pre_normalized)
    sh = _df_cap(sh, max_df, broadcast_hot)
    if not checkpoint:
        return sh
    # right-size the stored relation before checkpointing: the map-side
    # cap filter keeps the explode's (wide, pinned-count) partitioning,
    # so an aggressive cap leaves N mostly-empty partitions that every
    # downstream consumer pays task-launch overhead for (sf1: 4
    # consumers x 64 near-empty tasks ~ 2.6 s).  A bare repartition(key)
    # is AQE-coalescable — the exchange is sized by the ACTUAL post-cap
    # bytes, so a survivor-heavy corpus keeps its width and a
    # cap-decimated one collapses to a handful of partitions.
    # EAGER: the miners consume this (and the _dup_groups relation
    # buried inside it) from several broadcast-exchange subtrees that
    # execute on separate threads; with a lazy checkpoint those threads
    # RACE to materialize the same lineage and each recomputes the full
    # normalize+explode chain (observed as multi-x wall outliers).  The
    # eager job materializes groups+capped once, serially, and every
    # consumer — broadcast threads included — reads stored blocks.
    return sh.repartition("doc_id").localCheckpoint()


def _dup_groups(docs: DataFrame,
                max_group: int | None = None,
                members: bool = True) -> DataFrame:
    """Exact-duplicate groups BY NORMALIZED TEXT VALUE (string equality
    — no hashing, so distinct texts can never merge): one row per
    distinct normalized text with the canonical (min) doc id, the full
    member id list, and the multiplicity.

    ``localCheckpoint(eager=False)``: the group-by feeds several
    subtrees of the collapsed miners (reps, both expansion sides,
    intra) — the same call-scoped materialization pattern as the
    embedding miner (simsearch.lsh_neardup_pairs).

    A group with m duplicate copies holds all m ids in ONE array row
    and its intra expansion emits C(m,2) pairs from one task, so a
    pathological mega-group (millions of exact copies in a crawl-grade
    corpus) would silently OOM one executor.  ``max_group`` (default
    env ``NRT_DEDUP_MAX_GROUP``, 1,000,000) guards that: a larger
    group FAILS the job loudly in-task (``assert_true``, no driver
    action needed) with the rep id and size in the message — truncating
    would silently change the pair output, and a corpus that trips the
    guard should be exact-deduped before pair mining anyway.  Pass
    ``max_group=0`` (or set the env to 0) to disable.

    ``members=False`` skips the member array (and therefore the guard —
    nothing concentrates): per-group state O(1) instead of O(m).
    Both shapes carry ``(_t, rep, m, msum)`` — ``msum`` is the int64
    sum of member ids, what clustering aggregates — so consumers of
    :func:`minhash_lsh_rep_graph` see one schema either way; only
    ``members`` is shape-dependent.

    Adaptive spread (round-8): the normalize regex + the partial text
    aggregate run in the SCAN stage, and a compressed text table packs
    ~100x, so a whole corpus can land in 1-2 byte-sized splits and the
    per-row regex chain runs nearly serial (sf1: 2 tasks, 2.7 s of the
    miners' wall).  Structural no-op on a well-split cluster scan —
    see spread_if_underpartitioned.
    """
    docs = spread_if_underpartitioned(docs)
    if not members:
        return (docs.groupBy(normalized_text().alias("_t"))
                .agg(F.min("doc_id").alias("rep"),
                     F.count("*").alias("m"),
                     F.sum("doc_id").alias("msum"))
                .localCheckpoint(eager=False))
    if max_group is None:
        raw = os.environ.get("NRT_DEDUP_MAX_GROUP")
        try:
            max_group = 1_000_000 if raw is None else int(raw)
        except ValueError:
            # warn-and-fallback, same contract as NRT_TIER_LOCK_TIMEOUT
            # in rollup._tier_lock: a silently ignored override would
            # later fail the job claiming a limit the operator thought
            # they had raised
            import logging

            logging.getLogger(__name__).warning(
                "NRT_DEDUP_MAX_GROUP=%r is not an integer; falling "
                "back to the default 1000000", raw)
            max_group = 1_000_000
    # msum in BOTH shapes so minhash_lsh_rep_graph's `groups` return is
    # schema-stable for clustering consumers regardless of which path
    # built it (members is the only optional column)
    g = (docs.groupBy(normalized_text().alias("_t"))
         .agg(F.min("doc_id").alias("rep"),
              F.collect_list("doc_id").alias("members"),
              F.count("*").alias("m"),
              F.sum("doc_id").alias("msum")))
    if max_group:
        # fold the guard into the consumed `m` column so Catalyst can't
        # prune it away; assert_true returns NULL when the predicate
        # holds and raises (failing the task, then the job) otherwise
        guard = F.assert_true(
            F.col("m") <= max_group,
            F.concat_ws(
                "", F.lit("duplicate group of "), F.col("m").cast("string"),
                F.lit(" copies (rep="), F.col("rep"),
                F.lit(f") exceeds max_group={max_group}: its member "
                      "array concentrates in ONE row and its intra "
                      "expansion is C(m,2) pairs in one task. "
                      "Exact-dedup the corpus first, or raise/disable "
                      "NRT_DEDUP_MAX_GROUP.")))
        g = g.withColumn("m", F.when(guard.isNull(), F.col("m")))
    return g.localCheckpoint(eager=False)


def _expand_rep_pairs(rep_pairs: DataFrame, groups: DataFrame,
                      val_col: str) -> DataFrame:
    """Expand representative-level pairs back through the duplicate
    groups: every member of doc_a's group pairs with every member of
    doc_b's group, carrying the rep-level value column."""
    ga = groups.select(F.col("rep").alias("doc_a"),
                       F.col("members").alias("ma"))
    gb = groups.select(F.col("rep").alias("doc_b"),
                       F.col("members").alias("mb"))
    return (rep_pairs.join(ga, "doc_a").join(gb, "doc_b")
            .select(val_col, F.explode("ma").alias("x"), "mb")
            .select(val_col, "x", F.explode("mb").alias("y"))
            .select(F.least("x", "y").alias("doc_a"),
                    F.greatest("x", "y").alias("doc_b"), val_col))


def _intra_group_pairs(groups: DataFrame, active_reps: DataFrame,
                       val: "F.Column", val_col: str) -> DataFrame:
    """All (a < b) pairs within duplicate groups whose representative
    is ACTIVE (has >= 1 surviving shingle after the df cap) — mirroring
    the uncollapsed semantics where a doc with no shingles (too short,
    or fully df-capped) never reaches the pair join."""
    return (groups.join(active_reps, "rep")
            .filter(F.col("m") >= 2)
            .select(F.explode("members").alias("x"), "members")
            .select("x", F.explode("members").alias("y"))
            .filter(F.col("x") < F.col("y"))
            .select(F.col("x").alias("doc_a"), F.col("y").alias("doc_b"),
                    val.alias(val_col)))


def jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.5,
                  max_df: int | None = None,
                  collapse_duplicates: bool = True) -> DataFrame:
    """Near-duplicate pairs by n-gram Jaccard similarity.

    Candidate pairs come from the shingle self-join (only docs sharing at
    least one shingle are compared); exact Jaccard is then
    |common| / (|a| + |b| - |common|).  Output: (doc_a, doc_b, jaccard)
    with doc_a < doc_b.

    ``collapse_duplicates`` (default on) mines over ONE representative
    per exact (normalized) text and defines the ``max_df`` shingle cap
    over DISTINCT texts, then expands pairs back through the duplicate
    groups; identical texts pair at jaccard 1.0 when their shingle set
    survives the cap.  This fixes BOTH failure modes that exact-
    duplicated corpora inflict on the uncollapsed miner (measured at
    the 100x-duplicate sf10 probe, BENCH.md round 6): the quadratic
    candidate blow-up, and — worse — the df cap silently counting
    duplicate COPIES so every shingle of a 100x-duplicated corpus
    exceeds any absolute cap and the miner returns ZERO pairs, missing
    exactly the exact-duplicate pairs a dedup miner exists to find.
    On a duplicate-free corpus the output is identical to the
    uncollapsed miner's (df over distinct == df over raw).
    """
    # materialize the CAPPED shingles once (round-8, see
    # capped_shingles): the size agg, both sides of the pair join and
    # the active-doc gate all scan one checkpointed post-cap relation;
    # the map-only explode runs once more for the hot-list count.
    # ``spread=True`` on the representative relation: AQE coalesces the
    # small text-group exchange it comes out of (~10 MB at sf1 -> 9
    # read tasks), which would bottleneck the ~30x shingle explode —
    # the pinned-count repartition (spread_for_explode) keeps the
    # explode at full width.
    if collapse_duplicates:
        groups = _dup_groups(docs)
        reps = groups.select(F.col("rep").alias("doc_id"),
                             F.col("_t").alias("text"))
        sh = capped_shingles(reps, n=n, max_df=max_df,
                             pre_normalized=True)
        rep_pairs = _jaccard_from_shingles(sh, threshold)
        active = sh.select(F.col("doc_id").alias("rep")).distinct()
        intra = _intra_group_pairs(
            groups, active,
            F.round(F.lit(1.0), 6), "jaccard").filter(
                F.lit(1.0) >= F.lit(threshold))
        return _expand_rep_pairs(rep_pairs, groups, "jaccard") \
            .unionAll(intra)
    sh = capped_shingles(docs, n=n, max_df=max_df)
    return _jaccard_from_shingles(sh, threshold)


def _jaccard_from_shingles(sh: DataFrame, threshold: float) -> DataFrame:
    """Pair mining over a prepared (doc_id, shingle) relation."""
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_sh").alias("n_b"))
    # sizes is one row per doc with a surviving shingle (corpus-
    # proportional): no broadcast hint — a forced F.broadcast() crashes
    # at the broadcast limit on a crawl-scale corpus, while hint-free
    # AQE broadcasts it whenever it actually fits.
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn("jaccard", F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(docs: DataFrame, n: int = 3, num_hashes: int = 8,
                       max_df: int | None = None,
                       spread: bool = True,
                       pre_normalized: bool = False) -> DataFrame:
    """MinHash signature per doc: minhash_i = min(md5(i || shingle)).

    Salted md5 gives ``num_hashes`` independent hash families that any
    engine reproduces exactly.  Output: (doc_id, sig array<string>).
    """
    # single downstream consumer (the per-doc signature aggregate), so
    # the capped relation is not checkpointed — the map-only explode
    # runs once for the hot-list count and once into the aggregate
    sh = capped_shingles(docs, n=n, max_df=max_df, spread=spread,
                         pre_normalized=pre_normalized, checkpoint=False)
    aggs = [F.min(F.md5(F.concat(F.lit(f"salt{i}:"), F.col("shingle"))))
            .alias(f"h{i}") for i in range(num_hashes)]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[f"h{i}" for i in range(num_hashes)])
                      .alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, num_hashes: int = 8,
                      band_size: int = 2, max_df: int | None = None,
                      collapse_duplicates: bool = True) -> DataFrame:
    """LSH candidate pairs: docs sharing any band of the MinHash signature.

    Bands of ``band_size`` consecutive minhashes are concatenated and
    hashed into buckets; the pair join runs per (band_idx, bucket).
    Output: (doc_a, doc_b, n_bands) — how many bands collided.

    ``collapse_duplicates`` (default on) mines over ONE representative
    per exact (normalized) text — so the ``max_df`` cap counts DISTINCT
    texts, not copies — and expands pairs back through the duplicate
    groups; identical texts collide in ALL bands (identical shingle
    sets => identical signatures), so intra-group pairs carry
    ``n_bands = num_hashes // band_size``, gated on the representative
    having >= 1 surviving shingle (a doc with no shingles never gets a
    signature on the uncollapsed path either).  Rationale and scale
    evidence: see :func:`jaccard_pairs` — uncollapsed, a 100x-exact-
    duplicate corpus pushes every shingle's df past any absolute cap
    and the miner emits ZERO pairs (sf10 probe, BENCH.md round 6).
    Duplicate-free corpora produce identical output either way.
    """
    if collapse_duplicates:
        groups = _dup_groups(docs)
        _, rep_pairs, active = minhash_lsh_rep_graph(
            docs, n=n, num_hashes=num_hashes, band_size=band_size,
            max_df=max_df, groups=groups)
        intra = _intra_group_pairs(
            groups, active,
            F.lit(num_hashes // band_size).cast("long"), "n_bands")
        return _expand_rep_pairs(rep_pairs, groups, "n_bands") \
            .unionAll(intra)
    sig = minhash_signatures(docs, n=n, num_hashes=num_hashes, max_df=max_df)
    return _band_pairs(sig, num_hashes, band_size)


def minhash_lsh_rep_graph(docs: DataFrame, n: int = 3,
                          num_hashes: int = 8, band_size: int = 2,
                          max_df: int | None = None,
                          groups: DataFrame | None = None):
    """The collapsed MinHash-LSH graph WITHOUT pair expansion:
    ``(groups, rep_pairs, active_reps)``.

    This is the scale path for CLUSTERING (round-7 sf100 probe
    finding): the pair MINER's output contract requires expanding every
    rep-level pair through the duplicate groups — quadratic in
    duplication (C(1000,2) per group at 1000x duplication gave a 3.3G-
    edge list at sf100, and connected components over it ran the
    symmetrized+distinct edges through every min-label round).  The
    component structure is already fully determined by the rep-level
    graph plus group membership, so clustering consumes THIS and never
    materializes an expanded pair.

    ``groups`` lets the pair miner pass its member-carrying groups; by
    default the lighter memberless aggregation is used (O(1) per-group
    state — no member array, no mega-group hazard).
    """
    if groups is None:
        groups = _dup_groups(docs, members=False)
    reps = groups.select(F.col("rep").alias("doc_id"),
                         F.col("_t").alias("text"))
    # EAGER checkpoint: sig feeds the band self-join AND the active-rep
    # gate, and the pair miners additionally read ``groups`` (buried in
    # sig's lineage) from broadcast-exchange threads — a lazy checkpoint
    # lets those threads race to materialize the same lineage and
    # recompute the full normalize+explode chain each (see
    # capped_shingles).  spread=True: the reps relation exits a small
    # AQE-coalesced text exchange; the pinned-count repartition keeps
    # the shingle explode at full width (see jaccard_pairs).
    sig = minhash_signatures(reps, n=n, num_hashes=num_hashes,
                             spread=True, max_df=max_df,
                             pre_normalized=True) \
        .localCheckpoint()
    rep_pairs = _band_pairs(sig, num_hashes, band_size)
    active = sig.select(F.col("doc_id").alias("rep"))
    return groups, rep_pairs, active


def _band_pairs(sig: DataFrame, num_hashes: int, band_size: int
                ) -> DataFrame:
    """The banded self-join over a prepared (doc_id, sig) relation."""
    n_bands = num_hashes // band_size
    bands = sig.select(
        "doc_id",
        F.posexplode(F.array(*[
            F.md5(F.concat_ws("|", *[F.col("sig")[i] for i in
                                     range(b * band_size,
                                           (b + 1) * band_size)]))
            for b in range(n_bands)
        ])).alias("band_idx", "bucket"))
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band_idx", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_bands"))
    )


def contamination_flags(train: DataFrame, eval_docs: DataFrame,
                        n: int = 4,
                        collapse: "bool | str" = "auto") -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any n-gram
    with an evaluation set.

    Plan shape: the eval set's distinct shingles form the (small) build
    side of a LEFT SEMI join against the training shingles — the
    shuffle key is the shingle and the eval side broadcasts when it
    fits.  Unlike the near-dup PAIR miners, a semi-join's output is
    linear in the training rows, so no hot-shingle df cap is needed —
    and none is offered, because dropping a high-df shingle here would
    silently unflag exactly the docs the operator exists to catch.
    Output: (doc_id,) of contaminated training docs.

    Duplicate-adaptive (``collapse``): contamination is a pure function
    of the normalized text, so on a duplicate-heavy corpus the shingle
    explode runs once per DISTINCT text (_dup_groups — string equality,
    never a hash merge) and flags expand back through a text-equality
    semi-join.  Measured at the sf100 probe (1000x duplication): ~195 s
    uncollapsed vs ~12 s collapsed, identical output.  On a CLEAN
    corpus the collapse would ADD a full-corpus text shuffle that the
    map-side explode + broadcast semi-join never needs, so the default
    ``"auto"`` collapses only when the sampled distinct-text ratio
    (duplicate_ratio_estimate) drops below COLLAPSE_RATIO; pass
    True/False to force a branch (the multiplicity-invariance test pins
    both branches equal).
    """
    ev_sh = word_shingles(eval_docs, n=n).select("shingle").distinct()
    if collapse == "auto":
        collapse = duplicate_ratio_estimate(train) < COLLAPSE_RATIO
    if collapse:
        groups = _dup_groups(train, members=False)
        reps = groups.select(F.col("rep").alias("doc_id"),
                             F.col("_t").alias("text"))
        # spread=True (round-8): reps exit a small AQE-coalesced text
        # exchange, so without the pinned-count repartition the shingle
        # explode runs at the coalesced width (see jaccard_pairs)
        flagged = (word_shingles(reps, n=n, spread=True,
                                 pre_normalized=True)
                   .join(ev_sh, "shingle", "left_semi")
                   .select(F.col("doc_id").alias("rep")).distinct())
        bad_t = groups.join(flagged, "rep", "left_semi").select("_t")
        # plain (NOT null-safe) semi-join is correct here, unlike
        # expand_per_doc: a NULL-text doc yields no shingles on the
        # uncollapsed branch either, so "never flagged" is the matching
        # semantic on both paths.  Spread guard: the semi-join key is
        # computed map-side, so the full-corpus normalize would run
        # serial on a 1-2-split compressed scan (see expand_per_doc).
        return (spread_if_underpartitioned(train)
                .select("doc_id", normalized_text().alias("_t"))
                .join(bad_t, "_t", "left_semi")
                .select("doc_id"))
    tr_sh = word_shingles(train, n=n)
    return (tr_sh.join(ev_sh, "shingle", "left_semi")
            .select("doc_id").distinct())


#: symmetrized-edge count at or below which connected_components runs
#: exact union-find on the collected edge list instead of the
#: iterative distributed propagation (<= ~3 MB of long pairs on the
#: driver vs O(log d) multi-stage Spark jobs whose per-round latency
#: dominates small graphs; the round-8 profile measured ~2 s of pure
#: job overhead for a 3.4k-edge rep graph).  The distributed path
#: remains the scale path and is forced whenever telemetry is
#: requested.
CC_DRIVER_MAX_EDGES = 200_000


def _cc_union_find(sym: DataFrame, rows: list) -> DataFrame:
    """Exact min-label components of a SMALL symmetrized edge relation
    via driver-side union-find — identical output to the propagation
    loop (component = min node id reachable) by construction.  ``rows``
    is the already-collected edge list (the caller's bounded
    ``limit(...)`` probe), at most CC_DRIVER_MAX_EDGES rows of two ids;
    ``sym`` supplies only schema and session.
    """
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:          # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # min root wins so the final label IS the min member
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    out = [(n, find(n)) for n in parent]
    node_t = sym.schema[0].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType([StructField("node", node_t, False),
                         StructField("component", node_t, False)])
    # pandas input takes the Arrow fast path: the list path builds a
    # pickled ParallelCollectionRDD whose conversion runs PYTHON
    # WORKERS executor-side (measured 1.1 s cold — it was the first
    # Python stage of the whole bench session), while Arrow batches
    # convert driver-side and ship straight to the JVM
    import pandas as pd

    pdf = pd.DataFrame(out, columns=["node", "component"])
    return sym.sparkSession.createDataFrame(pdf, schema)


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 20,
                         telemetry: dict | None = None) -> DataFrame:
    """Connected components by iterative min-label propagation —
    the dedup-clustering step that turns near-dup PAIRS into canonical
    groups (keep min doc per component, drop the rest).

    Each round every node adopts the minimum component id among itself
    and its neighbours, then jumps through its label's own label
    (pointer doubling), so convergence takes O(log diameter) rounds —
    ``max_iter`` = 20 covers diameters up to ~2^20.  Each round is a
    bounded number of shuffles on the node id; lineage is truncated per
    round with ``localCheckpoint`` so the plan does not grow with
    iterations.  Raises if the budget is exhausted before convergence
    (silent partial components would corrupt a dedup decision).

    Small graphs (round-8): a single bounded
    ``limit(CC_DRIVER_MAX_EDGES + 1).collect()`` probe both gates and
    feeds a driver-side union-find over the collected edges
    (bit-identical labels, pinned by
    tests/test_dataops.py::test_cc_driver_matches_distributed) — the
    distributed loop's per-round job latency is pure overhead there.
    Edge lists with NULL endpoints skip the fast path (the distributed
    loop has always tolerated them).  With ``telemetry`` the
    distributed path is forced (its per-round changed counts ARE the
    requested evidence).

    ``telemetry``, if given, is filled in place with
    ``{"nodes", "edges", "rounds", "changed_per_round"}`` — the
    per-round changed-label counts are the O(log diameter) convergence
    evidence a scale run records.  Both paths run one full
    changed-count action per round (a partial scan could leave
    checkpoint partitions unmaterialized); telemetry only records the
    counts, it does not change their cost.

    Returns:
        (node, component) — component = min node id reachable.
    """
    sym = (edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
           .union(edges.select(F.col(dst).alias("a"),
                               F.col(src).alias("b")))
           .distinct().localCheckpoint(eager=False))
    if telemetry is None:
        # ONE bounded probe job instead of count-then-collect (round-8):
        # limit(N+1) returns the ENTIRE edge list when it has at most N
        # rows — exactly the small-graph case — so the gate decision and
        # the union-find input come from the same partial-scan job, and
        # the collected list stays bounded at N+1 rows of two ids either
        # way.  An over-threshold graph costs one cheap partial scan
        # before the distributed loop (whose first action materializes
        # the remaining checkpoint partitions as before).
        probe = sym.limit(CC_DRIVER_MAX_EDGES + 1).collect()
        if len(probe) <= CC_DRIVER_MAX_EDGES and \
                all(a is not None and b is not None for a, b in probe):
            return _cc_union_find(sym, probe)
        # NULL endpoints (e.g. pairs built through an outer join) fall
        # through to the distributed loop, which has always tolerated
        # them — Python's `<` would raise on None in the union-find
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=False))
    if telemetry is not None:
        telemetry.update(nodes=labels.count(), edges=sym.count() // 2,
                         rounds=0, changed_per_round=[])
    for _ in range(max_iter):
        nb_min = (sym.join(labels.select(F.col("node").alias("b"),
                                         F.col("component").alias("nc")),
                           "b")
                  .groupBy(F.col("a").alias("node"))
                  .agg(F.min("nc").alias("nb_min")))
        # carry the pre-round label through so convergence detection is
        # a plain filter on the checkpointed result, not an extra
        # self-join + shuffle per round
        stepped = (labels.join(nb_min, "node", "left")
                   .select("node",
                           F.col("component").alias("old_component"),
                           F.least("component",
                                   F.coalesce("nb_min", "component"))
                           .alias("component")))
        # pointer doubling: follow the label's own label so chains halve
        # every round instead of shrinking by one hop
        parent = stepped.select(F.col("node").alias("pnode"),
                                F.col("component").alias("parent"))
        # ONE job per round (round-8): the non-eager checkpoint
        # materializes under the changed-count action — the old shape
        # paid an eager-checkpoint job PLUS a count job every round.
        # The count is deliberately full (no limit(1)): a partial scan
        # could leave checkpoint partitions unmaterialized and the next
        # round would recompute them.
        new = (stepped.join(parent, stepped.component == parent.pnode,
                            "left")
               .select("node", "old_component",
                       F.least("component",
                               F.coalesce("parent", "component"))
                       .alias("component"))
               .localCheckpoint(eager=False))
        changed = new.filter(
            F.col("component") < F.col("old_component")).count()
        if telemetry is not None:
            telemetry["rounds"] += 1
            telemetry["changed_per_round"].append(changed)
        labels = new.select("node", "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        f"(component diameter > ~2^{max_iter}); raise max_iter")


def simhash16(docs: DataFrame,
              collapse: "bool | str" = "auto") -> DataFrame:
    """16-bit SimHash per doc from word unigrams.

    Bit j of the fingerprint is the sign of sum over words of
    (2*b_j(word) - 1) where b_j(word) is bit (j mod 4) of hex digit j of
    md5(word) — engine-portable bit extraction via substring + conv.
    Output: (doc_id, simhash int).

    Duplicate-adaptive via :func:`collapse_per_doc`: the fingerprint is
    a pure function of the normalized text, so a duplicate-heavy corpus
    computes one fingerprint per DISTINCT text and expands.
    """
    return collapse_per_doc(docs, _simhash16_impl, collapse=collapse)


def _simhash16_impl(docs: DataFrame) -> DataFrame:
    # Spread BEFORE the explode: compressed text packs ~100x, so a
    # bytes-sized scan split (maxPartitionBytes) of a text table can
    # hold the whole corpus in 1-2 tasks and the 10^2x word explosion
    # runs on 2 cores (measured at sf10: the 500k-doc table is one
    # 6 MB parquet file -> 2 tasks -> 30 s; repartitioned -> 14.5 s).
    # Hashing on doc_id lets the final per-doc aggregate REUSE this
    # partitioning, so the plan still has exactly one Exchange — of
    # the small pre-explode rows instead of the post-agg sums.
    # Pinned count (spread_for_explode): AQE must not size this read
    # by the pre-explode compressed bytes.
    words = spread_for_explode(docs).select(
        "doc_id", F.explode(F.split(normalized_text(), " ")).alias("word"))
    # Two 8-hex-char conv()s instead of sixteen 1-char ones: the first
    # 16 hex digits land in two bigints and every bit extraction
    # becomes an integer shift — same digits, same bits, ~2x less
    # per-word expression work on what is a 10^8-word-row scan at sf10
    # (digit j is the nibble at (7 - j%8)*4 of its word).
    words = (words.filter(F.length("word") > 0)
             .withColumn("h", F.md5("word"))
             .withColumn("w1", F.conv(F.substring("h", 1, 8), 16, 10)
                         .cast("bigint"))
             .withColumn("w2", F.conv(F.substring("h", 9, 8), 16, 10)
                         .cast("bigint")))
    bit_cols = []
    for j in range(16):
        word = F.col("w1") if j < 8 else F.col("w2")
        shift = (7 - j % 8) * 4 + j % 4
        bit = F.shiftright(word, shift).bitwiseAND(F.lit(1))
        bit_cols.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    sums = words.groupBy("doc_id").agg(*bit_cols)
    fp = None
    for j in range(16):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.alias("simhash"))
