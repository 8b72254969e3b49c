"""Document/dedup/embedding queries: the LLM-training-data surface.

Part of the driver-contract query registry — split out of the single
registry module in round 6 (same conventions; see
nrt_spark/queries.py for the registry contract and
nrt_spark/queries_base.py for the shared helpers)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401
from pyspark.sql import Window as W  # noqa: F401

from nrt_spark.dataops import dedup as D  # noqa: F401
from nrt_spark.dataops import simsearch as SS  # noqa: F401
from nrt_spark.dataops import textstats as TS  # noqa: F401
from nrt_spark.dataops.textstats import LANG_MARKERS  # noqa: F401
from nrt_spark.queries_base import (_CENTS_SQL, _NB, _ND, _NS,  # noqa: F401
                                    _cents_col, _null, _probe_vector, _t,
                                    q, sub, REGISTRY, SUB_SQL)

# =========================================================================
# Training-data ops: dedup, text stats, similarity search
# =========================================================================

@q("dedup_exact_docs", """
SELECT digest, count(*) AS n_dupes, min(doc_id) AS keep_doc_id
FROM (SELECT doc_id,
             md5(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS digest
      FROM documents)
GROUP BY digest
""")
def dedup_exact_docs(spark, sf_dir):
    return D.exact_dedup(_t(spark, sf_dir, "documents"))


#: hot-shingle document-frequency cap for the near-dup queries.  A
#: stop-phrase shingle shared by a constant fraction of 10^9 docs makes
#: the shingle self-join quadratic; dropping shingles with df > cap
#: bounds the per-shingle fan-out.  50 is a no-op at the test sfs
#: (max observed df is 25 at sf0.1) but load-bearing at scale.
MAX_SHINGLE_DF = 50

#: duplicate-collapse prologue shared by the near-dup oracles
#: (mirrors dedup._dup_groups + mining over representatives with the
#: df cap counted over DISTINCT normalized texts — see
#: dedup.jaccard_pairs for the scale rationale): grp = one rep per
#: normalized text, mem = doc -> rep, sh = the reps' df-capped
#: shingles.
#: split so consumers can embed exactly what they read: the doc->rep
#: membership chain alone (group info), or with the shingle chain
#: (everything that signs/mines)
_MEM_CTES = """
dd AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
  FROM documents
), grp AS (
  SELECT t, min(doc_id) AS rep FROM dd GROUP BY t
), mem AS (
  SELECT dd.doc_id, grp.rep FROM dd JOIN grp USING (t)
)"""

_COLLAPSE_SQL = f"""{_MEM_CTES}, sh0 AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT rep AS doc_id,
           unnest(list_transform(
             range(len(w) - 2),
             i -> w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3])) AS shingle
    FROM (SELECT rep, string_split(t, ' ') AS w FROM grp)
  )
), ok AS (
  SELECT shingle FROM sh0 GROUP BY shingle
  HAVING count(*) <= {MAX_SHINGLE_DF}
), sh AS (
  SELECT sh0.doc_id, sh0.shingle FROM sh0 JOIN ok USING (shingle)
)"""

_JACCARD_SQL = f"""
WITH {_COLLAPSE_SQL},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), rp AS (
  SELECT doc_a, doc_b,
         round(n_common / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
  FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= 0.08
)
SELECT least(x.doc_id, y.doc_id) AS doc_a,
       greatest(x.doc_id, y.doc_id) AS doc_b, p.jaccard
FROM rp p JOIN mem x ON x.rep = p.doc_a JOIN mem y ON y.rep = p.doc_b
UNION ALL
SELECT a.doc_id, b.doc_id, round(CAST(1.0 AS DOUBLE), 6)
FROM mem a JOIN mem b ON a.rep = b.rep AND a.doc_id < b.doc_id
WHERE a.rep IN (SELECT DISTINCT doc_id FROM sh)
"""


@q("dedup_jaccard_pairs", _JACCARD_SQL)
def dedup_jaccard_pairs(spark, sf_dir):
    """3-gram Jaccard near-dup pairs (shingle join, no cross product);
    hot shingles df-capped so the self-join fan-out is bounded at scale
    (cap mirrored in the oracle's HAVING clause)."""
    return D.jaccard_pairs(_t(spark, sf_dir, "documents"), n=3,
                           threshold=0.08, max_df=MAX_SHINGLE_DF)


def _sig_ctes() -> str:
    """CTE chain up to the per-representative MinHash signature
    ``sig`` (collapse + shingles + signing)."""
    mins = ",\n    ".join(
        f"min(md5('salt{i}:' || shingle)) AS h{i}" for i in range(8))
    return f"""{_COLLAPSE_SQL},
sig AS (
  SELECT doc_id, {mins}
  FROM sh GROUP BY doc_id
)"""


def _bands_rp_ctes(sig_rel: str = "sig") -> str:
    """Banding + rep-pair self-join CTEs over an existing signature
    relation — ``sig_rel`` lets the clustering twin point these at a
    materialized temp table so the signing chain runs once."""
    bands = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"md5(h{2 * b} || '|' || h{2 * b + 1}) AS bucket FROM {sig_rel}"
        for b in range(4))
    return f"""bands AS (
  {bands}
), rp AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.bucket = b.bucket
              AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)"""


def _minhash_rep_ctes() -> str:
    """Shared CTE chain up to the REPRESENTATIVE-level LSH pair graph
    ``rp`` — composed by the full (expanded) miner SQL below and by the
    rep-level clustering twin (oracle.dedup_clusters_oracle)."""
    return f"{_sig_ctes()}, {_bands_rp_ctes()}"


def _minhash_sql() -> str:
    return f"""
WITH {_minhash_rep_ctes()}
SELECT least(x.doc_id, y.doc_id) AS doc_a,
       greatest(x.doc_id, y.doc_id) AS doc_b, p.n_bands
FROM rp p JOIN mem x ON x.rep = p.doc_a JOIN mem y ON y.rep = p.doc_b
UNION ALL
SELECT a.doc_id, b.doc_id, CAST(4 AS BIGINT)
FROM mem a JOIN mem b ON a.rep = b.rep AND a.doc_id < b.doc_id
WHERE a.rep IN (SELECT doc_id FROM sig)
"""


def _dup_group_info_sql(sig_rel: str = "sig") -> str:
    """Per-duplicate-group info for the clustering twin: rep, copy
    count, int64 member-id sum, and whether the rep is ACTIVE (has a
    signature, i.e. >= 1 surviving shingle after the df cap).  Embeds
    only the CTEs it reads; pass a materialized signature relation via
    ``sig_rel`` to skip re-signing."""
    ctes = _sig_ctes() if sig_rel == "sig" else _MEM_CTES
    return f"""
WITH {ctes}
SELECT rep, count(*) AS m, CAST(sum(doc_id) AS BIGINT) AS msum,
       rep IN (SELECT doc_id FROM {sig_rel}) AS active
FROM mem GROUP BY rep
"""


@q("minhash_lsh_pairs", _minhash_sql())
def minhash_lsh_pairs_q(spark, sf_dir):
    """MinHash(8) + LSH(4 bands of 2) candidate pairs; salted-md5 hash
    families reproduce identically in any engine.  Hot shingles are
    df-capped before signing (mirrored in the oracle)."""
    return D.minhash_lsh_pairs(_t(spark, sf_dir, "documents"), n=3,
                               num_hashes=8, band_size=2,
                               max_df=MAX_SHINGLE_DF)


def _simhash_sql() -> str:
    sums = []
    for j in range(16):
        digit = f"CAST(('0x' || substr(h, {j + 1}, 1))::BIGINT AS INT)"
        bit = f"((({digit}) >> {j % 4}) & 1)"
        sums.append(f"sum({bit} * 2 - 1) AS s{j}")
    terms = " + ".join(
        f"CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(16))
    return f"""
WITH words AS (
  SELECT doc_id, md5(w) AS h FROM (
    SELECT doc_id,
           unnest(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
                               ' ')) AS w
    FROM documents) WHERE len(w) > 0
), sums AS (
  SELECT doc_id, {', '.join(sums)} FROM words GROUP BY doc_id
)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM sums
"""


@q("simhash_fingerprints", _simhash_sql())
def simhash_fingerprints(spark, sf_dir):
    return D.simhash16(_t(spark, sf_dir, "documents")) \
        .select("doc_id", F.col("simhash").cast("long").alias("simhash"))


def _langid_sql() -> str:
    score_cols, case_lines = [], []
    langs = list(LANG_MARKERS)
    for lang, markers in LANG_MARKERS.items():
        parts = [f"(len(string_split(' ' || t || ' ', ' {w} ')) - 1)"
                 for w in markers]
        score_cols.append(f"CAST({' + '.join(parts)} AS BIGINT) AS s_{lang}")
    for i, lang in enumerate(langs):
        conds = [f"s_{lang} > 0"]
        conds += [f"s_{lang} >= s_{o}" for o in langs[i + 1:]]
        conds += [f"s_{lang} > s_{o}" for o in langs[:i]]
        case_lines.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return f"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
  FROM documents
), scores AS (
  SELECT doc_id, {', '.join(score_cols)} FROM norm
)
SELECT doc_id, CASE {' '.join(case_lines)} ELSE 'und' END AS pred_lang
FROM scores
"""


@sub("langid_docs", _langid_sql())
def langid_docs(spark, sf_dir):
    return TS.language_id(_t(spark, sf_dir, "documents"))


@sub("quality_histogram", """
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
  FROM documents
), stats AS (
  SELECT doc_id,
         len(list_filter(string_split(t, ' '), w -> len(w) > 0)) AS n_words,
         list_sum(list_transform(string_split(t, ' '), w -> len(w)))
           / len(list_filter(string_split(t, ' '), w -> len(w) > 0))
           AS mean_wl,
         CAST((len(string_split(' ' || t || ' ', ' the ')) - 1)
            + (len(string_split(' ' || t || ' ', ' and ')) - 1)
            + (len(string_split(' ' || t || ' ', ' of ')) - 1)
            + (len(string_split(' ' || t || ' ', ' to ')) - 1)
            + (len(string_split(' ' || t || ' ', ' a ')) - 1) AS DOUBLE)
           / n_words AS stop_ratio
  FROM norm
)
SELECT round(CASE WHEN n_words BETWEEN 10 AND 5000 THEN 0.4 ELSE 0.0 END
           + CASE WHEN mean_wl BETWEEN 3.0 AND 10.0 THEN 0.3 ELSE 0.0 END
           + CASE WHEN stop_ratio > 0.01 THEN 0.3 ELSE 0.0 END, 2) AS quality,
       count(*) AS n_docs
FROM stats GROUP BY 1
""")
def quality_histogram(spark, sf_dir):
    return (TS.quality_scores(_t(spark, sf_dir, "documents"))
            .groupBy("quality").agg(F.count("*").alias("n_docs")))


@sub("token_counts_by_source", """
WITH norm AS (
  SELECT source, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
  FROM documents
)
SELECT source,
       CAST(sum(len(list_filter(string_split(t, ' '), w -> len(w) > 0)))
            AS BIGINT) AS total_words,
       CAST(sum(list_sum(list_transform(string_split(t, ' '),
            w -> CAST(ceil(len(w) / 4.0) AS INT)))) AS BIGINT)
         AS total_subwords,
       count(*) AS n_docs
FROM norm GROUP BY source
""")
def token_counts_by_source(spark, sf_dir, collapse="auto"):
    """Per-source whitespace/subword totals.  Duplicate-adaptive: the
    counts are pure functions of the normalized text and the output is
    a per-source AGGREGATE, so the collapsed branch computes once per
    DISTINCT (text, source) and weights by multiplicity — no join-back
    (the weight IS the expansion)."""
    docs = _t(spark, sf_dir, "documents")
    if collapse == "auto":
        collapse = D.duplicate_ratio_estimate(docs) < D.COLLAPSE_RATIO
    if collapse:
        # spread guard: the group key (normalized text) is computed
        # map-side on the scan (see dedup._dup_groups)
        g = (D.spread_if_underpartitioned(docs)
             .groupBy(D.normalized_text().alias("text"), "source")
             .agg(F.count("*").alias("m")))
        tc = TS.token_counts(g, cols=("source", "m"))
        return (tc.groupBy("source")
                .agg(F.sum(F.col("m") * F.col("n_words"))
                     .alias("total_words"),
                     F.sum(F.col("m") * F.col("n_subwords"))
                     .alias("total_subwords"),
                     F.sum("m").alias("n_docs")))
    tc = TS.token_counts(docs).join(docs.select("doc_id", "source"), "doc_id")
    return (tc.groupBy("source")
            .agg(F.sum("n_words").alias("total_words"),
                 F.sum("n_subwords").alias("total_subwords"),
                 F.count("*").alias("n_docs")))


@q("doc_fingerprints", """
SELECT doc_id,
       substr(md5(regexp_replace(lower(text), '\\s+', ' ', 'g')), 1, 16) AS fp,
       length(text) AS n_chars
FROM documents
""")
def doc_fingerprints(spark, sf_dir):
    return TS.fingerprints(_t(spark, sf_dir, "documents")) \
        .select("doc_id", "fp", F.col("n_chars").cast("long").alias("n_chars"))


@q("cosine_topk_embeddings", """
WITH probe AS (
  SELECT embedding AS p FROM embeddings WHERE vec_id = 0
)
SELECT vec_id,
       round(list_dot_product(e.embedding::DOUBLE[], probe.p::DOUBLE[])
             / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                      e.embedding::DOUBLE[]))
                * sqrt(list_dot_product(probe.p::DOUBLE[],
                                        probe.p::DOUBLE[]))), 6) AS cosine
FROM embeddings e, probe
ORDER BY cosine DESC, vec_id LIMIT 10
""")
def cosine_topk_embeddings(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return SS.cosine_topk(emb, _probe_vector(emb), k=10)


@q("embedding_neardup_pairs", """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
             / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
             6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
         * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
      >= 0.4
""")
def embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs — brute-force all-pairs,
    O(n^2) by design: retained ONLY as the capped recall oracle for
    ``embedding_neardup_lsh`` (the bucketed scale path below).  The
    physical strategy is a broadcast-matrix blocked matmul with an
    exact sequential-fold re-verify (simsearch.cosine_all_pairs) — the
    previous HOF self-join computed 2*n^2 per-pair lambda dots and
    blew the sf1 dry-pass budget."""
    emb = _t(spark, sf_dir, "embeddings")
    return SS.cosine_all_pairs(emb, threshold=0.4)


def _dedup_clusters_sql() -> str:
    """Transitive closure over the MinHash-LSH candidate pairs via a
    recursive CTE — DuckDB's stand-in for the Spark min-label
    propagation (tiny at oracle scale; the Spark side is the one that
    has to survive 10^9 nodes)."""
    # the derived-table wrap matters: WITH RECURSIVE splits a CTE body
    # on its top-level UNION ALL (base vs recursive member), which
    # would tear the embedded miner's cross/intra union apart
    return f"""
WITH RECURSIVE pairs AS (
  SELECT * FROM ({_minhash_sql()}) mh
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
), comp AS (
  SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
)
SELECT cluster_id, count(*) AS n_members,
       CAST(sum(node) AS BIGINT) AS member_checksum
FROM comp GROUP BY cluster_id
"""


@q("dedup_clusters", _dedup_clusters_sql())
def dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING: MinHash-LSH candidate graph -> connected
    components (iterative min-label propagation, one shuffle per round,
    O(cluster diameter) rounds) -> one row per duplicate cluster with
    the canonical (min) doc id.  This is the step that turns pair
    mining into an actual dedup decision at 10^12 scale.

    Round-7 restructure (sf100 probe finding): components run over the
    REPRESENTATIVE-level graph and cluster membership comes from the
    exact-duplicate groups — never from expanded pairs.  Expanding
    first is quadratic in duplication (C(m,2) intra pairs per m-copy
    group: 3.3G edges at sf100's 1000x duplication, where this form
    needs only the ~5k-node rep graph).  Semantics are unchanged and
    pinned vs the recursive-CTE oracle: a group joins a cluster iff its
    rep has an LSH edge, or it has >= 2 copies and an active (>= 1
    surviving shingle) rep — exactly the docs the expanded pair graph
    would connect; cluster_id = min member id because each rep IS its
    group's min."""
    groups, rep_pairs, active = D.minhash_lsh_rep_graph(
        _t(spark, sf_dir, "documents"), n=3, num_hashes=8, band_size=2,
        max_df=MAX_SHINGLE_DF)
    comp = D.connected_components(rep_pairs, src="doc_a", dst="doc_b")
    lab = (groups.select("rep", "m", "msum")
           .join(comp.withColumnRenamed("node", "rep"), "rep", "left")
           .join(active.withColumn("_act", F.lit(True)), "rep", "left")
           .filter(F.col("component").isNotNull()
                   | ((F.col("m") >= 2) & F.col("_act").isNotNull()))
           .withColumn("component", F.coalesce("component", "rep")))
    return (lab.groupBy(F.col("component").alias("cluster_id"))
            .agg(F.sum("m").alias("n_members"),
                 F.sum("msum").alias("member_checksum")))


@q("sessionize_events", """
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts - lag(ts) OVER w) > 21600 THEN 1 ELSE 0 END
           AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, count(DISTINCT session_id) AS n_sessions,
       CAST(max(sess_n) AS BIGINT) AS max_session_events,
       count(*) AS n_events
FROM (SELECT user_id, session_id,
             count(*) OVER (PARTITION BY user_id, session_id) AS sess_n
      FROM s)
GROUP BY user_id
""")
def sessionize_events(spark, sf_dir):
    """Sessionization (gaps-and-islands over event time, 6h idle gap):
    the standard pre-processing step for behavioral training data.
    Pure window functions — one shuffle on user_id."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_s = (us - F.lag(us).over(w)) / 1e6
    o = ev.withColumn(
        "new_s", F.when(F.lag("ts").over(w).isNull()
                        | (gap_s > 21600), 1).otherwise(0))
    s = o.withColumn(
        "session_id",
        F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)))
    sess_n = F.count("*").over(W.partitionBy("user_id", "session_id"))
    # n_sessions = max(session_id), NOT countDistinct (round-8): the
    # running sum starts at 1 on every user's first row and increments
    # by 0/1, so session ids are exactly 1..K and max == distinct
    # count.  countDistinct alongside the other aggregates planned the
    # two-phase distinct rewrite — four HashAggregate passes (keyed on
    # (user_id, session_id) then user_id) over the window output; max
    # folds into one partial+final pair on the window's user_id
    # partitioning (plans/r08/sessionize_events_{before,after}.txt:
    # 4 HashAggregate -> 2, same single Exchange).
    return (s.withColumn("sess_n", sess_n)
            .groupBy("user_id")
            .agg(F.max("session_id").alias("n_sessions"),
                 F.max("sess_n").alias("max_session_events"),
                 F.count("*").alias("n_events")))


@sub("split_sample_docs", """
SELECT source, split, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM (SELECT source, doc_id,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                           || ':split'), 1, 8))::BIGINT
                       % 100 < 90
                  THEN 'train' ELSE 'val' END AS split
      FROM documents)
GROUP BY source, split
""")
def split_sample_docs(spark, sf_dir):
    """Deterministic stratified train/val split (90/10) by content-free
    id hash — the split survives any repartitioning, resharding or
    re-run, which is what makes it usable as a 10^12-doc dataset
    contract.  md5-derived so any engine reproduces the assignment."""
    docs = _t(spark, sf_dir, "documents")
    h = F.conv(F.substring(
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":split"))),
        1, 8), 16, 10).cast("long") % 100
    return (docs.withColumn(
                "split", F.when(h < 90, "train").otherwise("val"))
            .groupBy("source", "split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").alias("id_checksum")))


@sub("top_terms_by_source", r"""
WITH words AS (
  SELECT source,
         unnest(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'),
                             ' ')) AS w
  FROM documents
), cnt AS (
  SELECT source, w, count(*) AS n FROM words WHERE len(w) >= 5
  GROUP BY source, w
), r AS (
  SELECT source, w, n,
         row_number() OVER (PARTITION BY source ORDER BY n DESC, w) AS rk
  FROM cnt
)
SELECT source, rk, w AS term, n FROM r WHERE rk <= 5
""")
def top_terms_by_source(spark, sf_dir):
    """Per-source vocabulary profile: top-5 terms (len >= 5) with a
    total tiebreak — the corpus-analysis primitive behind domain mixing
    decisions.  Partial-aggregated count + per-source top-k window."""
    docs = _t(spark, sf_dir, "documents")
    # spread-before-explode (see dedup.spread_for_explode): a 1-2-split
    # compressed scan would otherwise run the normalize+word-explode —
    # the expensive part — nearly serial
    words = D.spread_for_explode(docs).select(
        "source", F.explode(F.split(D.normalized_text(), " ")).alias("w")
    ).filter(F.length("w") >= 5)
    cnt = words.groupBy("source", "w").agg(F.count("*").alias("n"))
    w = W.partitionBy("source").orderBy(F.desc("n"), F.asc("w"))
    return (cnt.withColumn("rk", F.row_number().over(w)).filter("rk <= 5")
            .select("source", "rk", F.col("w").alias("term"), "n"))


@q("decontaminate_docs", """
WITH sh AS (
  SELECT DISTINCT doc_id, source, shingle FROM (
    SELECT doc_id, source,
           unnest(list_transform(
             range(len(w) - 3),
             i -> w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3]
                  || ' ' || w[i + 4])) AS shingle
    FROM (SELECT doc_id, source,
                 string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
                              ' ') AS w
          FROM documents)
  )
), ev AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src19'),
hits AS (
  SELECT DISTINCT sh.doc_id FROM sh JOIN ev USING (shingle)
  WHERE sh.source <> 'src19'
)
SELECT d.source, count(*) AS n_docs,
       CAST(sum(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_contaminated,
       CAST(sum(CASE WHEN h.doc_id IS NULL THEN d.doc_id ELSE 0 END)
            AS BIGINT) AS clean_checksum
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.source <> 'src19'
GROUP BY d.source
""")
def decontaminate_docs(spark, sf_dir):
    """Benchmark decontamination: training docs (all sources but the
    held-out 'src19' eval slice) sharing any 4-gram with the eval set
    are flagged; per-source counts plus a checksum of the surviving
    clean ids.  Shingle semi-join — the eval side is small and
    broadcastable, never an all-pairs comparison."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter("source <> 'src19'")
    ev = docs.filter("source = 'src19'")
    hits = D.contamination_flags(train, ev, n=4) \
        .withColumn("contaminated", F.lit(1))
    return (train.join(hits, "doc_id", "left")
            .groupBy("source")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.coalesce("contaminated", F.lit(0)))
                 .alias("n_contaminated"),
                 F.sum(F.when(F.col("contaminated").isNull(),
                              F.col("doc_id")).otherwise(0))
                 .alias("clean_checksum")))


@q("repetition_stats", """
WITH grams AS (
  SELECT doc_id, source,
         len(w) - 2 AS total,
         len(list_distinct(list_transform(
             range(len(w) - 2),
             i -> w[i + 1] || ' ' || w[i + 2] || ' ' || w[i + 3])))
           AS n_distinct
  FROM (SELECT doc_id, source,
               string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'),
                            ' ') AS w
        FROM documents)
  WHERE len(w) >= 3
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN 1.0 - CAST(n_distinct AS DOUBLE) / total > 0.02
                THEN 1 ELSE 0 END) AS BIGINT) AS n_repetitive,
       CAST(sum(floor((1.0 - CAST(n_distinct AS DOUBLE) / total) * 1e6))
            AS BIGINT) AS dup_frac_e6_sum
FROM grams GROUP BY source
""")
def repetition_stats(spark, sf_dir):
    """Intra-document repetition filter (the Gopher-style quality rule):
    duplicate-3-gram fraction per doc, flagged above 2% (the synthetic
    corpus is low-repetition — 2% keeps the flag non-degenerate at
    every test sf while the checksum column verifies every fraction).  The fraction
    is a ratio of small ints — identical doubles in any engine — summed
    via floor-scaling (no rounding tie rule).  One scan, one shuffle.

    Duplicate-adaptive: the dup fraction is a pure function of the
    normalized text and the output is a per-source AGGREGATE, so on a
    duplicate-heavy corpus (sampled distinct ratio below
    dedup.COLLAPSE_RATIO) the gram chain runs once per DISTINCT
    (text, source) with a multiplicity weight — no join-back needed,
    the weight IS the expansion.  Identical output either way (ratios
    are computed per distinct text in both branches; the weighted sums
    are exact integers)."""
    docs = _t(spark, sf_dir, "documents")
    if D.duplicate_ratio_estimate(docs) < D.COLLAPSE_RATIO:
        # spread guard: the group key (normalized text) is computed
        # map-side on the scan (see dedup._dup_groups)
        base_in = (D.spread_if_underpartitioned(docs)
                   .groupBy(D.normalized_text().alias("_nt"), "source")
                   .agg(F.count("*").alias("m"))
                   .select("source", "m", F.split("_nt", " ").alias("w")))
    else:
        # narrow per-row gram chain: adaptive spread (no-op on
        # well-split cluster scans; see dedup.spread_if_underpartitioned)
        base_in = (D.spread_if_underpartitioned(docs)
                   .select("source", F.lit(1).cast("long").alias("m"),
                           F.split(D.normalized_text(), " ").alias("w")))
    # direct subscripts, not concat_ws(slice(...)): slice() allocates a
    # fresh array per gram — measured 7x slower over the corpus-scale
    # gram stream (see dedup.word_shingles); identical strings
    grams = F.expr(
        "transform(sequence(0, size(w) - 3), "
        "i -> concat(w[i], ' ', w[i + 1], ' ', w[i + 2]))")
    base = (base_in.filter(F.size("w") >= 3)
            .select("source", "m",
                    (F.size("w") - 2).alias("total"),
                    F.size(F.array_distinct(grams)).alias("n_distinct")))
    dup_frac = 1.0 - F.col("n_distinct").cast("double") / F.col("total")
    return (base.groupBy("source")
            .agg(F.sum("m").alias("n_docs"),
                 F.sum(F.when(dup_frac > 0.02, F.col("m")).otherwise(0))
                 .alias("n_repetitive"),
                 F.sum(F.col("m") * F.floor(dup_frac * 1e6))
                 .alias("dup_frac_e6_sum")))


def _embedding_lsh_sql(dim: int = 64, n_planes: int = 4, n_tables: int = 16,
                       threshold: float = 0.4, seed: str = "nrt") -> str:
    """Oracle for the LSH-bucketed near-dup pair miner: the hyperplanes
    are deterministic (sha256-derived), so the SQL inlines the identical
    plane literals and reproduces bucket assignment — exactly, unless a
    plane dot product lies within ~1 ulp of zero, where the Spark side's
    matmul accumulation order could round to a different sign than
    DuckDB's sequential fold (probability ~1e-8 at oracle scale;
    validated empirically at all three sfs).  dim=64 matches the
    driver's embeddings table at every sf."""
    tables = []
    for t in range(n_tables):
        planes = SS.hyperplanes(dim, n_planes, f"{seed}-{t}")
        bits = []
        for p in range(n_planes):
            lit = "[" + ", ".join(repr(float(x)) for x in planes[p]) + "]"
            bits.append(f"(CASE WHEN list_dot_product(v, {lit}::DOUBLE[]) "
                        f">= 0 THEN {1 << p} ELSE 0 END)")
        tables.append(f"SELECT vec_id, {t} AS table_idx,\n    "
                      + "\n    + ".join(bits) + " AS bucket FROM e")
    assigned = "\n  UNION ALL\n  ".join(tables)
    cos = ("list_dot_product(ea.v, eb.v) / "
           "(sqrt(list_dot_product(ea.v, ea.v)) * "
           "sqrt(list_dot_product(eb.v, eb.v)))")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assigned AS (
  {assigned}
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assigned a JOIN assigned b
    ON a.table_idx = b.table_idx AND a.bucket = b.bucket
   AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round({cos}, 6) AS cosine
FROM cand
JOIN e ea ON ea.vec_id = cand.id_a
JOIN e eb ON eb.vec_id = cand.id_b
WHERE {cos} >= {threshold}
"""


@q("embedding_neardup_lsh", _embedding_lsh_sql())
def embedding_neardup_lsh(spark, sf_dir):
    """Scale-safe embedding near-dup pair mining: multi-table
    random-hyperplane LSH (16 tables x 4 planes), candidate pairs from a
    bucket self-join (shuffle key = (table, bucket) hash — NO cross join
    or inequality join in the plan), exact cosine verification on the
    deduped candidates.  ~94% expected recall vs the brute-force twin at
    cosine 0.4 (measured in tests/test_dataops.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    return SS.lsh_neardup_pairs(emb, threshold=0.4, n_planes=4,
                                n_tables=16, seed="nrt")


