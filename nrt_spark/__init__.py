"""nrt_spark — a PySpark-native time-series rollup + downsample + retention
engine with the monitoring capabilities of ec-jrc/nrt.

Architecture (Spark-first, not a port):

- Input is a table of pre-tokenized sequences
  ``(doc_id string, tokens array<int>, n_tok int, source string)``; a
  deterministic decode turns each row into one time series (see
  :mod:`nrt_spark.tokens`).
- All relational work (scan, filter, join, rollup aggregation, retention)
  is plain DataFrame/SQL so Catalyst owns pushdown, pruning and shuffle
  planning.
- The reference's per-pixel numeric kernels (harmonic fit, sequential
  EWMA/CUSUM/MOSUM/CCDC/IQR process updates) live in
  :mod:`nrt_spark.kernels` as pure-numpy functions with the reference's
  exact op order, invoked from vectorized grouped pandas UDFs
  (``applyInPandas`` / ``cogroup``): zero per-row Python.
- Monitor state is a table (one row per doc_id), not an object; snapshots
  of that table are the checkpoint/restore mechanism.
"""

__version__ = "0.1.0"
