"""Similarity search over embedding columns (array<float>).

- :func:`cosine_topk` — brute-force exact top-k against a probe vector,
  entirely in Catalyst higher-order functions (``aggregate``/``zip_with``)
  so it whole-stage-codegens; the baseline every ANN variant is checked
  against.
- :func:`lsh_assign` / :func:`lsh_topk` — random-hyperplane LSH: each
  vector gets a b-bit bucket from the signs of dot products with
  deterministic (seed-derived) hyperplanes; search touches only the probe
  bucket (scale path: bucket becomes the partition key, turning ANN into
  a partition-pruned scan).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, Column, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, probe: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id"
                ) -> DataFrame:
    """Exact top-k by cosine similarity to ``probe`` (ties broken by id).

    The probe is inlined as a literal array — no join, no shuffle except
    the final top-k (``orderBy ... limit`` = TakeOrdered, which holds
    only k rows per partition).
    """
    probe_col = F.array(*[F.lit(float(x)) for x in probe])
    cast_vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return (
        embeddings
        .select(id_col,
                F.round(cosine_similarity(cast_vec, probe_col), 6)
                .alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col).asc())
        .limit(k)
    )


def hyperplanes(dim: int, n_planes: int, seed: str = "nrt") -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: component (p, d) derives
    from sha256(seed|p|d) -> uniform in [-1, 1).  No RNG state, so any
    process regenerates the identical planes."""
    out = np.empty((n_planes, dim))
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.sha256(f"{seed}|{p}|{d}".encode()).digest()
            out[p, d] = int.from_bytes(h[:8], "big") / 2 ** 63 - 1.0
    return out


def lsh_assign(embeddings: DataFrame, n_planes: int = 8, seed: str = "nrt",
               vec_col: str = "embedding", id_col: str = "vec_id"
               ) -> DataFrame:
    """Assign each vector its LSH bucket (int in [0, 2^n_planes))."""
    dim = len(embeddings.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    cast_vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    bucket = None
    for p in range(n_planes):
        plane_col = F.array(*[F.lit(float(x)) for x in planes[p]])
        bit = F.when(_dot(cast_vec, plane_col) >= 0, F.lit(1 << p)) \
            .otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return embeddings.select(id_col, vec_col, bucket.alias("bucket"))


def lsh_topk(embeddings: DataFrame, probe: list[float], k: int = 10,
             n_planes: int = 8, seed: str = "nrt",
             vec_col: str = "embedding", id_col: str = "vec_id"
             ) -> DataFrame:
    """Approximate top-k: exact cosine ranking *within* the probe's LSH
    bucket only.  Recall vs :func:`cosine_topk` depends on n_planes; at
    scale the bucket is a partition key and this is a pruned scan."""
    assigned = lsh_assign(embeddings, n_planes, seed, vec_col, id_col)
    planes = hyperplanes(len(probe), n_planes, seed)
    probe_bucket = 0
    pv = np.asarray(probe, dtype=np.float64)
    for p in range(n_planes):
        if float(planes[p] @ pv) >= 0:
            probe_bucket |= 1 << p
    return cosine_topk(
        assigned.filter(F.col("bucket") == probe_bucket), probe, k,
        vec_col, id_col)
