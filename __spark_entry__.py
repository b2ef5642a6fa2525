"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship CDC apply end-to-end (generator -> staged
batches -> flatten -> merge -> lake snapshots) on sf0.001 and returns
the final pages-table state.  ``queries``/``oracle_sql`` expose each
implemented operator from SURVEY.md §2 with a DuckDB-checkable ANSI-SQL
oracle; the CDC oracles are direct transliterations of the reference's
generated diff/MERGE SQL (BigQueryEventConsumer.java:1154-1391), so the
gate validates this engine against the reference's semantics.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """CDC replay of a deterministic synthetic binlog over Common-Crawl
    style pages into a lake table; returns the final table state."""
    from pyspark.sql import types as T

    from bigquery_delta_plugins_spark import constants as C
    from bigquery_delta_plugins_spark.sources.gen import synth_events
    from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
    from bigquery_delta_plugins_spark.streaming.driver import run_microbatch_loop
    from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp

    pages = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    root = tempfile.mkdtemp(prefix="bdps-entry-")
    consumer = EventConsumer(spark, os.path.join(root, "wh"), num_buckets=8)
    consumer.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "web", "pages", schema=pages, primary_keys=["url"])
    )
    n_events, batch_size = 4000, 1000
    ev = synth_events(spark, n_events, 200, batch_size=batch_size, pk_move_frac=0.02)
    batches = [
        (b, ev.filter(ev[C.BATCH_ID] == b)) for b in range(n_events // batch_size)
    ]
    run_microbatch_loop(consumer, batches, "web", "pages", os.path.join(root, "cp"))
    return consumer.table("web", "pages").read()


# ---------------------------------------------------------------------------
# operator queries + DuckDB oracles
# ---------------------------------------------------------------------------

# unordered-source staging + ordering condition (reference
# getOrderingCondition, BigQueryEventConsumer.java:1486-1558)
_STAGED_U = """
staged_u AS (
  SELECT CASE WHEN event_type = 'signup' THEN 'INSERT'
              WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPDATE' END AS _op,
         event_id + 1 AS _sequence_num,
         user_id,
         value,
         CASE WHEN event_type = 'signup' THEN NULL ELSE user_id END AS _before_user_id,
         CAST(FLOOR((event_id + 1) / 3) AS BIGINT) AS _source_timestamp,
         CASE WHEN user_id % 13 <> 0 THEN value END AS k0,
         (event_id + 1) % 5 AS k1
  FROM events
)
"""


def _hb(left: str, right: str) -> str:
    """left-happened-strictly-before-right, sort keys + ts/seq fallback."""
    return (
        f"(({left}.k0 IS NOT NULL AND {right}.k0 IS NOT NULL AND "
        f"({left}.k0 < {right}.k0 OR ({left}.k0 = {right}.k0 AND {left}.k1 < {right}.k1)))"
        f" OR (({left}.k0 IS NULL OR {right}.k0 IS NULL) AND "
        f"({left}._source_timestamp < {right}._source_timestamp OR "
        f"({left}._source_timestamp = {right}._source_timestamp AND "
        f"{left}._sequence_num < {right}._sequence_num))))"
    )


_DIFF_U_TEMPLATE = """
{name} AS (
  SELECT A.*
  FROM {src} A LEFT JOIN {src} B
    ON A.user_id = B._before_user_id AND {hb}
  WHERE B._before_user_id IS NULL
)
"""


def _final_state_unordered_sql() -> str:
    return (
        "WITH "
        + _STAGED_U.strip()
        + """,
half AS (SELECT CAST((MAX(event_id) + 1) // 2 AS BIGINT) AS h FROM events),
su0 AS (SELECT s.* FROM staged_u s, half WHERE s._sequence_num <= half.h),
su1 AS (SELECT s.* FROM staged_u s, half WHERE s._sequence_num > half.h),
"""
        + _DIFF_U_TEMPLATE.format(name="du0", src="su0", hb=_hb("A", "B")).strip()
        + ",\n"
        + _DIFF_U_TEMPLATE.format(name="du1", src="su1", hb=_hb("A", "B")).strip()
        + """,
tu0 AS (
  SELECT user_id, value, _sequence_num,
         CASE WHEN _op = 'DELETE' THEN TRUE ELSE CAST(NULL AS BOOLEAN) END AS _is_deleted,
         _source_timestamp, k0, k1
  FROM du0
),
m AS (
  SELECT t.user_id AS t_user_id, t.value AS t_value,
         t._sequence_num AS t_seq, t._is_deleted AS t_del,
         t._source_timestamp AS t_st, t.k0 AS t_k0, t.k1 AS t_k1,
         d._op AS d_op, d.user_id AS d_user_id, d.value AS d_value,
         d._sequence_num AS d_seq, d._source_timestamp AS d_st,
         d.k0 AS d_k0, d.k1 AS d_k1,
         COALESCE({_hb_td}, FALSE) AS guard
  FROM tu0 t JOIN du1 d ON t.user_id = d._before_user_id
),
applied AS (
  SELECT CASE WHEN guard THEN d_user_id ELSE t_user_id END AS user_id,
         CASE WHEN guard THEN d_value ELSE t_value END AS value,
         CASE WHEN guard THEN d_seq ELSE t_seq END AS _sequence_num,
         CASE WHEN NOT guard THEN t_del
              WHEN d_op = 'DELETE' THEN TRUE
              ELSE CAST(NULL AS BOOLEAN) END AS _is_deleted,
         CASE WHEN guard THEN d_st ELSE t_st END AS _source_timestamp,
         CASE WHEN guard THEN d_k0 ELSE t_k0 END AS k0,
         CASE WHEN guard THEN d_k1 ELSE t_k1 END AS k1
  FROM m
),
kept AS (
  SELECT t.user_id, t.value, t._sequence_num, t._is_deleted,
         t._source_timestamp, t.k0, t.k1 FROM tu0 t
  WHERE NOT EXISTS (SELECT 1 FROM du1 d WHERE d._before_user_id = t.user_id)
),
inserted AS (
  SELECT d.user_id, d.value, d._sequence_num,
         CASE WHEN d._op = 'DELETE' THEN TRUE ELSE CAST(NULL AS BOOLEAN) END AS _is_deleted,
         d._source_timestamp, d.k0, d.k1
  FROM du1 d
  WHERE NOT EXISTS (SELECT 1 FROM tu0 t WHERE t.user_id = d._before_user_id)
)
SELECT user_id, value, _sequence_num, _is_deleted, _source_timestamp,
       k0 AS sort_key_0, k1 AS sort_key_1
FROM (SELECT * FROM kept UNION ALL SELECT * FROM applied UNION ALL SELECT * FROM inserted)"""
    ).replace("{_hb_td}", _hb("t", "d"))


def _schema_evolution_sql() -> str:
    """Mid-stream ALTER add-column: t0 from the first half surfaces NULL
    props; the second half's staged events carry events.props."""
    return (
        "WITH "
        + _STAGED.strip()
        + """,
half AS (SELECT CAST((MAX(event_id) + 1) // 2 AS BIGINT) AS h FROM events),
s0 AS (SELECT s.* FROM staged s, half WHERE s._sequence_num <= half.h),
s1 AS (SELECT s.*, e.props FROM staged s JOIN events e ON s._sequence_num = e.event_id + 1, half
       WHERE s._sequence_num > half.h),
"""
        + _DIFF_TEMPLATE.format(name="d0", src="s0").strip()
        + """,
t0 AS (
  SELECT user_id, value, CAST(NULL AS VARCHAR) AS props, _sequence_num,
         CAST(NULL AS BOOLEAN) AS _is_deleted
  FROM d0 WHERE _op IN ('INSERT', 'UPDATE')
),
d1 AS (
  SELECT A._op, A._sequence_num, A.user_id, A.value, A.props, A._before_user_id
  FROM s1 A LEFT JOIN s1 B
    ON A.user_id = B._before_user_id AND A._sequence_num < B._sequence_num
  WHERE B._before_user_id IS NULL
),
applied AS (
  SELECT d.user_id, d.value, d.props, d._sequence_num,
         CAST(NULL AS BOOLEAN) AS _is_deleted
  FROM t0 t JOIN d1 d ON t.user_id = d._before_user_id
  WHERE d._op <> 'DELETE'
),
kept AS (
  SELECT t.* FROM t0 t
  WHERE NOT EXISTS (SELECT 1 FROM d1 d WHERE d._before_user_id = t.user_id)
),
inserted AS (
  SELECT d.user_id, d.value, d.props, d._sequence_num,
         CAST(NULL AS BOOLEAN) AS _is_deleted
  FROM d1 d
  WHERE d._op <> 'DELETE'
    AND NOT EXISTS (SELECT 1 FROM t0 t WHERE t.user_id = d._before_user_id)
)
SELECT user_id, value, props, _sequence_num, _is_deleted
FROM (SELECT * FROM kept UNION ALL SELECT * FROM applied UNION ALL SELECT * FROM inserted)"""
    )


# shared CTE: the staged CDC derivation over `events` (dialect-neutral)
_STAGED = """
staged AS (
  SELECT CASE WHEN event_type = 'signup' THEN 'INSERT'
              WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPDATE' END AS _op,
         event_id + 1 AS _sequence_num,
         user_id,
         value,
         CASE WHEN event_type = 'signup' THEN NULL ELSE user_id END AS _before_user_id
  FROM events
)
"""

_DIFF_TEMPLATE = """
{name} AS (
  SELECT A._op, A._sequence_num, A.user_id, A.value, A._before_user_id
  FROM {src} A LEFT JOIN {src} B
    ON A.user_id = B._before_user_id AND A._sequence_num < B._sequence_num
  WHERE B._before_user_id IS NULL
)
"""

_SPLIT = """
half AS (SELECT CAST((MAX(event_id) + 1) // 2 AS BIGINT) AS h FROM events),
s0 AS (SELECT s.* FROM staged s, half WHERE s._sequence_num <= half.h),
s1 AS (SELECT s.* FROM staged s, half WHERE s._sequence_num > half.h)
"""

_T0 = """
t0 AS (
  SELECT user_id, value, _sequence_num, CAST(NULL AS BOOLEAN) AS _is_deleted
  FROM d0 WHERE _op IN ('INSERT', 'UPDATE')
)
"""


def _final_state_sql(soft: bool) -> str:
    if soft:
        arms = """
m AS (
  SELECT t.user_id AS t_user_id, t.value AS t_value, t._sequence_num AS t_seq,
         d._op AS op, d.user_id AS d_user_id, d.value AS d_value,
         d._sequence_num AS d_seq
  FROM t0 t JOIN d1 d ON t.user_id = d._before_user_id
),
applied AS (
  SELECT CASE WHEN op = 'DELETE' THEN t_user_id ELSE d_user_id END AS user_id,
         CASE WHEN op = 'DELETE' THEN t_value ELSE d_value END AS value,
         CASE WHEN op = 'DELETE' THEN t_seq ELSE d_seq END AS _sequence_num,
         CASE WHEN op = 'DELETE' THEN TRUE ELSE CAST(NULL AS BOOLEAN) END AS _is_deleted
  FROM m
)"""
    else:
        arms = """
applied AS (
  SELECT d.user_id, d.value, d._sequence_num, CAST(NULL AS BOOLEAN) AS _is_deleted
  FROM t0 t JOIN d1 d ON t.user_id = d._before_user_id
  WHERE d._op <> 'DELETE'
)"""
    return (
        "WITH "
        + _STAGED.strip().rstrip()
        + ",\n"
        + _SPLIT.strip()
        + ",\n"
        + _DIFF_TEMPLATE.format(name="d0", src="s0").strip()
        + ",\n"
        + _T0.strip()
        + ",\n"
        + _DIFF_TEMPLATE.format(name="d1", src="s1").strip()
        + ",\n"
        + arms.strip()
        + """,
kept AS (
  SELECT t.* FROM t0 t
  WHERE NOT EXISTS (SELECT 1 FROM d1 d WHERE d._before_user_id = t.user_id)
),
inserted AS (
  SELECT d.user_id, d.value, d._sequence_num, CAST(NULL AS BOOLEAN) AS _is_deleted
  FROM d1 d
  WHERE d._op <> 'DELETE'
    AND NOT EXISTS (SELECT 1 FROM t0 t WHERE t.user_id = d._before_user_id)
)
SELECT * FROM kept UNION ALL SELECT * FROM applied UNION ALL SELECT * FROM inserted"""
    )


def _table_changes_sql() -> str:
    """Changelog oracle: final-state replay at half vs full, keyed
    full-outer diff classified insert/update/delete (hard-delete mode,
    mirroring operators/changes.py::changelog_diff)."""
    return (
        "WITH "
        + _STAGED.strip()
        + ",\n"
        + _SPLIT.strip()
        + ",\n"
        + _DIFF_TEMPLATE.format(name="d0", src="s0").strip()
        + ",\n"
        + _T0.strip()
        + ",\n"
        + _DIFF_TEMPLATE.format(name="d1", src="s1").strip()
        + """,
applied AS (
  SELECT d.user_id, d.value, d._sequence_num
  FROM t0 t JOIN d1 d ON t.user_id = d._before_user_id
  WHERE d._op <> 'DELETE'
),
kept AS (
  SELECT t.user_id, t.value, t._sequence_num FROM t0 t
  WHERE NOT EXISTS (SELECT 1 FROM d1 d WHERE d._before_user_id = t.user_id)
),
inserted AS (
  SELECT d.user_id, d.value, d._sequence_num
  FROM d1 d
  WHERE d._op <> 'DELETE'
    AND NOT EXISTS (SELECT 1 FROM t0 t WHERE t.user_id = d._before_user_id)
),
t1 AS (
  SELECT * FROM kept UNION ALL SELECT * FROM applied UNION ALL SELECT * FROM inserted
)
SELECT COALESCE(n.user_id, o.user_id) AS user_id,
       CASE WHEN n._sequence_num IS NOT NULL THEN n.value ELSE o.value END AS value,
       COALESCE(n._sequence_num, o._sequence_num) AS _sequence_num,
       CASE WHEN o._sequence_num IS NULL THEN 'insert'
            WHEN n._sequence_num IS NULL THEN 'delete'
            WHEN n._sequence_num <> o._sequence_num THEN 'update' END AS _change_type
FROM t1 n FULL OUTER JOIN t0 o ON n.user_id = o.user_id
WHERE o._sequence_num IS NULL OR n._sequence_num IS NULL
   OR n._sequence_num <> o._sequence_num"""
    )


_STAGING_ROUNDTRIP_ORACLE = (
    "SELECT event_type, COUNT(*) AS n_events, "
    "MIN(event_id) AS min_event_id, MAX(event_id) AS max_event_id, "
    "CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) "
    "AS sum_value_cents, "
    "CAST(SUM(length(props)) AS BIGINT) AS props_len_sum, "
    "MIN(ts) AS min_ts, MAX(ts) AS max_ts, "
    "COUNT(DISTINCT ts) AS n_ts "
    "FROM events GROUP BY event_type"
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bigquery_delta_plugins_spark.plans import cdc_queries as q
    from bigquery_delta_plugins_spark.plans import pipeline_queries as p

    return {
        "cdc_flatten": q.cdc_flatten,
        "cdc_final_state": lambda s, d: q.cdc_final_state(s, d, soft=False),
        "cdc_final_state_soft": lambda s, d: q.cdc_final_state(s, d, soft=True),
        "cdc_final_state_unordered": q.cdc_final_state_unordered,
        "cdc_multi_table_final_state": q.cdc_multi_table_final_state,
        "cdc_schema_evolution": q.cdc_schema_evolution,
        "cdc_max_seq": q.cdc_max_seq,
        "cdc_replay_barrier": q.cdc_replay_barrier,
        "cdc_normalized_projection": q.cdc_normalized_projection,
        "cdc_table_changes": q.cdc_table_changes,
        "cdc_json_staging_roundtrip": q.cdc_json_staging_roundtrip,
        "cdc_avro_staging_roundtrip": q.cdc_avro_staging_roundtrip,
        **p.QUERIES,
    }


def oracle_sql() -> dict[str, str]:
    from bigquery_delta_plugins_spark.plans import pipeline_queries as p

    return {
        **p.oracles(),
        "cdc_flatten": (
            "WITH "
            + _STAGED.strip()
            + ",\n"
            + _DIFF_TEMPLATE.format(name="diff", src="staged").strip()
            + "\nSELECT _op, _sequence_num, user_id, value, _before_user_id FROM diff"
        ),
        "cdc_final_state": _final_state_sql(False),
        "cdc_final_state_soft": _final_state_sql(True),
        # the key space partitions across tables by user_id % 3, so the
        # multi-table consumer replay equals the single-table final
        # state tagged with its table name (see cdc_queries docstring)
        "cdc_multi_table_final_state": (
            "SELECT 't' || CAST(user_id % 3 AS VARCHAR) AS table_name, "
            "user_id, value, _sequence_num, _is_deleted "
            f"FROM ({_final_state_sql(False)})"
        ),
        "cdc_final_state_unordered": _final_state_unordered_sql(),
        "cdc_schema_evolution": _schema_evolution_sql(),
        "cdc_max_seq": (
            "SELECT MAX(m) AS max_seq FROM ("
            "SELECT MAX(event_id + 1) AS m FROM events GROUP BY event_type)"
        ),
        "cdc_replay_barrier": (
            "WITH "
            + _STAGED.strip()
            + """
SELECT COUNT(*) AS n_events, MAX(_sequence_num) AS max_seq, MIN(_sequence_num) AS min_seq
FROM staged
WHERE CAST(FLOOR((_sequence_num - 1) / 2500) AS BIGINT) = 3 AND _sequence_num > 8000"""
        ),
        "cdc_normalized_projection": (
            'SELECT user_id AS "user_id_", event_type AS "_2type", '
            'COUNT(*) AS "n_events" FROM events GROUP BY user_id, event_type'
        ),
        "cdc_table_changes": _table_changes_sql(),
        # the oracle aggregates the ORIGINAL parquet — equality proves
        # the engine's encode->decode round trip is lossless; the JSON
        # and Avro codecs share it (identical fidelity contract)
        "cdc_json_staging_roundtrip": _STAGING_ROUNDTRIP_ORACLE,
        "cdc_avro_staging_roundtrip": _STAGING_ROUNDTRIP_ORACLE,
    }
