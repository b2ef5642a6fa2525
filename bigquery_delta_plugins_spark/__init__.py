"""bigquery_delta_plugins_spark — a from-scratch PySpark-native CDC apply engine.

Reproduces the query & data-processing capabilities of the CDAP Delta
BigQuery target plugin (``data-integrations/bigquery-delta-plugins``,
reference at /root/reference) re-expressed Spark-first:

- change-event staging model with audit columns (``constants``)
- per-key event-run flattening / "diff query" (``operators.flatten``)
- keyed MERGE apply with soft-delete tombstones (``operators.merge``)
- sort-key as-of ordering for unordered sources (``operators.ordering``)
- max-sequence resume points (``operators.maxseq``)
- BigQuery-compatible name normalization (``normalize``)
- CDAP->BQ->Spark type lattice (``schemas``)
- Iceberg-style atomic snapshot lake tables (``lake.table``)
- streaming consumer with exactly-once batch apply (``streaming.consumer``)
- web-scale training-data ops: dedup, similarity, text analysis
  (``operators.dedup``, ``operators.similarity``, ``operators.text``)

Nothing here is a port: the reference generates BigQuery SQL and Java
stream bookkeeping; this engine declares the same semantics as Spark
DataFrame plans and lets Catalyst/AQE pick physical strategies.
"""

__version__ = "0.1.0"
