"""Shared plumbing for the driver-contract query registry: the
registration decorators, the REGISTRY/SUB_SQL dicts every domain module
populates on import, and the cross-module SQL/column helpers.  See
nrt_spark/queries.py for the registry contract."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


REGISTRY: dict[str, tuple] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        REGISTRY[name] = (fn, sql)
        return fn
    return deco


#: SQL for sub-queries that are folded into composite registry entries
#: (the driver records at most 50 entries; composites keep every
#: operator inside that window while the standalone functions stay
#: importable for tests, bench and __spark_entry__).
SUB_SQL: dict[str, object] = {}


def sub(name: str, sql):
    """Like :func:`q` but NOT driver-registered: stashes the oracle SQL
    for reuse inside a composite entry's UNION ALL."""
    def deco(fn):
        SUB_SQL[name] = sql
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")



#: events.value is exactly 2-decimal; float SUM/AVG fold order differs
#: between engines once either side splits a group across scan
#: partitions (first seen in the sf1 dry pass: 1-ulp avg drift landing
#: on round-6 boundaries).  Every summed aggregate therefore goes
#: through exact integer cents; min/max/max_by are fold-order-free and
#: stay on the raw doubles.
_CENTS_SQL = "CAST(round(value * 100) AS BIGINT)"


def _cents_col():
    return F.round(F.col("value") * 100).cast("long")


#: NULL literals for composite UNION ALL column alignment
_NS = "CAST(NULL AS VARCHAR)"
_ND = "CAST(NULL AS DOUBLE)"
_NB = "CAST(NULL AS BIGINT)"


def _null(kind: str):
    return F.lit(None).cast(kind)


def _probe_vector(emb: DataFrame, vec_id: int = 0) -> list:
    """The ANN demo queries' probe vector (row ``vec_id``), with clear
    errors for the two degenerate shapes a bare ``first()[0]`` turns
    into cryptic TypeErrors: no such row, or a NULL embedding.  Shared
    by all three ANN demo queries (cosine/lsh/ivf top-k)."""
    row = emb.filter(F.col("vec_id") == vec_id).select("embedding").first()
    if row is None or row[0] is None:
        what = "has a NULL embedding" if row is not None else "is absent"
        raise ValueError(
            f"probe row vec_id={vec_id} {what} — the ANN demo queries "
            f"need a non-NULL probe vector")
    return [float(x) for x in row[0]]


def json_int_field(col: str | "F.Column", field: str) -> "F.Column":
    """Extract a TOP-LEVEL integer scalar from a machine-generated flat
    JSON object column — the events.props hot path.

    Uses a compiled-once regex instead of a JSON parser: Spark's
    get_json_object / from_json / variant_get all re-run a full parse
    per evaluation (and expressions referenced by both a filter and an
    aggregate are evaluated once EACH), which dominated the sf100 probe
    at 100M rows — measured on identical data and plan shape:
    get_json_object 39.3s, from_json 37.8s, variant_get 43.9s,
    regexp_extract 5.4s (local[8], identical results).

    CONTRACT (narrower than JSON): the column holds flat objects whose
    ``field`` value is an unquoted integer and whose STRING values
    never embed a ``"<field>": <int>`` pattern (regexp_extract takes
    the FIRST match; the ``[{,]`` prefix guard rejects matches not at
    a member boundary, but a string value containing a comma followed
    by the pattern would still win).  events.props is machine-generated
    ``{"k": <int>}`` so the contract holds by construction — and every
    DuckDB oracle keeps REAL JSON extraction, so a certified run
    surfaces any divergence as a value mismatch.  For nested JSON,
    quoted numbers, or adversarial strings, use ``from_json``.
    """
    import re

    # try_cast: regexp_extract yields '' on no match, which an ANSI
    # cast rejects — NULL here mirrors get_json_object's missing-key
    # behavior
    return F.regexp_extract(
        col, f'[{{,]\\s*"{re.escape(field)}"\\s*:\\s*(-?\\d+)', 1) \
        .try_cast("int")
