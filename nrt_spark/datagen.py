"""Deterministic synthetic token-table generator.

Spark-native and fully deterministic: every row is a pure function of
(doc_id, seed) — per-doc RNG streams are seeded from ``xxhash64(doc_id)``
computed JVM-side, so the table is reproducible at any scale and under
any partitioning / resume boundary (no ``rand()``, no wall clock).

Series shape mirrors the reference's simulation knobs
(docs/gallery/plot_simulation_data.py:56-63): harmonic signal + gaussian
noise + NaN gaps + planted break in ~50% of series, quantized to int32
tokens with ``-1`` as the gap token.  ``source`` is deliberately skewed
(~zipf over src0..src9) to exercise salted-shuffle handling.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from nrt_spark.tokens import GAP_TOKEN, SCALE, grid_days
from nrt_spark.kernels.regressors import regressors_for_days

TOKENS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType(), False),
    T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("n_tok", T.IntegerType(), False),
    T.StructField("source", T.StringType(), False),
])

BANDS_SCHEMA = T.StructType(TOKENS_SCHEMA.fields + [
    T.StructField("green_tokens", T.ArrayType(T.IntegerType(), False), False),
    T.StructField("swir_tokens", T.ArrayType(T.IntegerType(), False), False),
])


def _quantize(v: np.ndarray, gaps: np.ndarray) -> np.ndarray:
    tok = np.rint(np.clip(v, -3.0, 3.0) * SCALE).astype(np.int32)
    tok[gaps] = GAP_TOKEN
    return tok


def _gen_batch(pdf: pd.DataFrame, n_obs: int, break_frac: float,
               gap_frac: float, noise: float, bands: bool,
               outlier_frac: float) -> pd.DataFrame:
    """Generate token rows for a batch of (doc_id, seed64, src_u) rows.

    Band values and cloud outliers use *separate* RNG streams derived
    from the doc seed, so enabling them never changes the main token
    stream for a given doc_id.
    """
    days = grid_days(n_obs)
    X = regressors_for_days(days, trend=False, harmonic_order=2)
    out = {"tokens": [], "source": [], "green": [], "swir": []}
    for doc_id, seed, src_u in zip(pdf["doc_id"], pdf["seed64"], pdf["src_u"]):
        # xxhash64 seeds are signed int64; mask before the uint64 cast —
        # np.uint64(negative) is deprecated and will raise on NumPy 2.x,
        # and every oracle / checksum sits on these seeds.  The mask wraps
        # mod 2**64 exactly like the old C-style cast (byte-identical).
        seed_u = int(seed) & 0xFFFFFFFFFFFFFFFF
        rng = np.random.Generator(np.random.PCG64(np.uint64(seed_u)))
        beta = np.array([
            0.3 + 0.4 * rng.random(),       # level
            0.05 + 0.15 * rng.random(),     # cos1
            -0.05 + 0.1 * rng.random(),     # sin1
            0.02 * rng.standard_normal(),   # cos2
            0.02 * rng.standard_normal(),   # sin2
        ])
        v = X @ beta + noise * rng.standard_normal(n_obs)
        if rng.random() < break_frac:
            b_idx = int(n_obs * (0.5 + 0.4 * rng.random()))
            v[b_idx:] -= 0.1 + 0.2 * rng.random()
        gaps = rng.random(n_obs) < gap_frac
        if bands or outlier_frac:
            rng2 = np.random.Generator(
                np.random.PCG64(np.uint64(seed_u ^ 0xB0BA)))
            green = 0.05 + 0.01 * rng2.standard_normal(n_obs)
            swir = 0.20 + 0.02 * rng2.standard_normal(n_obs)
            if outlier_frac:
                # undetected clouds: bright green spike + value spike
                clouds = rng2.random(n_obs) < outlier_frac
                v = np.where(clouds, v + 0.3, v)
                green = np.where(clouds, green + 0.1, green)
            out["green"].append(_quantize(green, gaps))
            out["swir"].append(_quantize(swir, gaps))
        out["tokens"].append(_quantize(v, gaps))
        # zipf-ish skew: u^3 concentrates mass on src0
        out["source"].append(f"src{int(10 * src_u ** 3)}")
    res = pd.DataFrame({
        "doc_id": pdf["doc_id"],
        "tokens": out["tokens"],
        "n_tok": [len(t) for t in out["tokens"]],
        "source": out["source"],
    })
    if bands:
        res["green_tokens"] = out["green"]
        res["swir_tokens"] = out["swir"]
    return res


def generate_tokens(spark: SparkSession, n_docs: int, n_obs: int = 130,
                    break_frac: float = 0.5, gap_frac: float = 0.08,
                    noise: float = 0.02, partitions: int | None = None,
                    bands: bool = False, outlier_frac: float = 0.0
                    ) -> DataFrame:
    """Deterministic token table with ``n_docs`` series of ``n_obs`` steps.

    ``bands=True`` adds green/swir reflectance token columns (for the
    CCDC_RIRLS multispectral screen); ``outlier_frac`` plants cloud
    outliers (value + green spikes).  Both default off and never perturb
    the main token stream.

    Scale note: ``spark.range`` distributes id generation; all per-doc
    randomness derives from ``xxhash64(doc_id)`` so regenerating any
    partition yields identical rows (checkpoint/resume safe).
    """
    base = spark.range(n_docs)
    if partitions:
        base = base.repartition(partitions)
    seeded = (
        base
        .withColumn("doc_id", F.format_string("doc%010d", F.col("id")))
        .withColumn("seed64", F.xxhash64("doc_id").cast("long"))
        .withColumn("src_u", (F.pmod(F.xxhash64("doc_id", F.lit("src")),
                                     F.lit(10000)) / 10000.0))
        .select("doc_id", "seed64", "src_u")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_batch(pdf, n_obs, break_frac, gap_frac, noise,
                                 bands, outlier_frac)

    return seeded.mapInPandas(gen, BANDS_SCHEMA if bands else TOKENS_SCHEMA)
