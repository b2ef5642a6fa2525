"""Driver-checkable CDC queries over the shared ``events`` test table.

Each function here has a matching ANSI-SQL oracle in
``__spark_entry__.oracle_sql`` that DuckDB runs on the same parquet —
the oracle SQL is a direct transliteration of the reference's generated
queries (diff: BigQueryEventConsumer.java:1154-1223, merge arms
:1225-1391), so the gate checks this engine against the reference's
semantics, not against itself.

The staged-event derivation maps the synthetic app-event stream onto
the CDC staging shape deterministically: ``signup``->INSERT,
``error``->DELETE, everything else->UPDATE; ``_sequence_num`` is
``event_id + 1``; the key is ``user_id`` (150 hot users over 10k+
events — a natural skew workload for the flatten collapse).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import constants as C
from ..operators.flatten import flatten_batch, replay_filter
from ..operators.merge import merge_apply

TARGET_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), True),
        T.StructField(C.IS_DELETED, T.BooleanType(), True),
    ]
)

# the CASE mapping shared verbatim (modulo dialect) with the SQL oracles
OP_CASE = (
    "CASE WHEN event_type = 'signup' THEN 'INSERT' "
    "WHEN event_type = 'error' THEN 'DELETE' ELSE 'UPDATE' END"
)


def staged_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .pipeline_queries import _spread

    # single-row-group input (see _spread): without this the staged
    # projection AND the map side of flatten's pre-collapse aggregation
    # run inside the one scan task
    ev = _spread(spark.read.parquet(f"{sf_dir}/events.parquet"), "event_id")
    op = F.expr(OP_CASE)
    return ev.select(
        op.alias(C.OPERATION),
        (F.col("event_id") + 1).alias(C.SEQUENCE_NUM),
        F.col("user_id"),
        F.col("value"),
        F.when(op != C.OP_INSERT, F.col("user_id")).alias("_before_user_id"),
    )


def _half_point(spark: SparkSession, sf_dir: str) -> int:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (ev.agg(F.max("event_id")).first()[0] + 1) // 2


def _apply(target: DataFrame, staged: DataFrame, soft: bool) -> DataFrame:
    diff = flatten_batch(staged, ["user_id"])
    return merge_apply(target, diff, ["user_id"], soft_deletes=soft)


def cdc_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6+O7: the diff query over the full staged stream."""
    return flatten_batch(staged_events(spark, sf_dir), ["user_id"]).select(
        C.OPERATION, C.SEQUENCE_NUM, "user_id", "value", "_before_user_id"
    )


def cdc_final_state(spark: SparkSession, sf_dir: str, soft: bool = False) -> DataFrame:
    """O7+O9(+O30): two-batch flatten+merge replay to final table state."""
    staged = staged_events(spark, sf_dir)
    half = _half_point(spark, sf_dir)
    s0 = staged.filter(F.col(C.SEQUENCE_NUM) <= half)
    s1 = staged.filter(F.col(C.SEQUENCE_NUM) > half)
    empty = spark.createDataFrame([], TARGET_SCHEMA)
    t0 = _apply(empty, s0, soft)
    return _apply(t0, s1, soft).select(
        "user_id", "value", C.SEQUENCE_NUM, C.IS_DELETED
    )


def cdc_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog read: the net insert/update/delete delta between the
    half-stream state and the full-stream state (one keyed full-outer
    join; see operators/changes.py).  The lake-integrated form
    (LakeTable.changes) adds manifest-level bucket pruning on top of the
    identical classification — covered by tests/test_changes.py."""
    from ..operators.changes import changelog_diff

    staged = staged_events(spark, sf_dir)
    half = _half_point(spark, sf_dir)
    s0 = staged.filter(F.col(C.SEQUENCE_NUM) <= half)
    s1 = staged.filter(F.col(C.SEQUENCE_NUM) > half)
    empty = spark.createDataFrame([], TARGET_SCHEMA)
    t0 = _apply(empty, s0, soft=False)
    t1 = _apply(t0, s1, soft=False)
    return changelog_diff(t0, t1, ["user_id"]).select(
        "user_id", "value", C.SEQUENCE_NUM, "_change_type"
    )


UNORDERED_TARGET_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), True),
        T.StructField(C.IS_DELETED, T.BooleanType(), True),
        T.StructField(C.SOURCE_TIMESTAMP, T.LongType(), True),
        T.StructField(
            C.SORT_KEYS,
            T.StructType(
                [
                    T.StructField("_key_0", T.DoubleType(), True),
                    T.StructField("_key_1", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def staged_events_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered-source staging shape: adds ``_source_timestamp`` and a
    two-key ``_sort`` struct (MultiGCSWriter.java:352-390 unordered
    columns).  ``_key_0`` is NULL for ~1/13 of events to exercise the
    reference's backward-compat (timestamp, seq) fallback comparator
    (getOrderingCondition, BigQueryEventConsumer.java:1486-1558)."""
    from .pipeline_queries import _spread

    ev = _spread(spark.read.parquet(f"{sf_dir}/events.parquet"), "event_id")
    op = F.expr(OP_CASE)
    return ev.select(
        op.alias(C.OPERATION),
        (F.col("event_id") + 1).alias(C.SEQUENCE_NUM),
        F.col("user_id"),
        F.col("value"),
        F.when(op != C.OP_INSERT, F.col("user_id")).alias("_before_user_id"),
        # coarse event time: deliberate ties so the (_source_timestamp,
        # _sequence_num) fallback tiebreak is actually exercised
        F.floor((F.col("event_id") + 1) / 3).cast("long").alias(C.SOURCE_TIMESTAMP),
        F.struct(
            F.when(F.col("user_id") % 13 != 0, F.col("value")).alias("_key_0"),
            ((F.col("event_id") + 1) % 5).alias("_key_1"),
        ).alias(C.SORT_KEYS),
    )


def cdc_final_state_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7/O8/O9 Cases 2+4: two-batch replay with the unordered-source
    sort-key ordering condition in both the flatten anti-join and the
    merge guards (tombstone-carrying deletes, late events no-op)."""
    staged = staged_events_unordered(spark, sf_dir)
    half = _half_point(spark, sf_dir)
    s0 = staged.filter(F.col(C.SEQUENCE_NUM) <= half)
    s1 = staged.filter(F.col(C.SEQUENCE_NUM) > half)
    empty = spark.createDataFrame([], UNORDERED_TARGET_SCHEMA)

    def _apply_u(target: DataFrame, s: DataFrame) -> DataFrame:
        diff = flatten_batch(
            s, ["user_id"], ordering=C.UN_ORDERED, sort_key_count=2, pre_collapse=False
        )
        return merge_apply(
            target, diff, ["user_id"], ordering=C.UN_ORDERED, sort_key_count=2
        )

    out = _apply_u(_apply_u(empty, s0), s1)
    return out.select(
        "user_id",
        "value",
        C.SEQUENCE_NUM,
        C.IS_DELETED,
        C.SOURCE_TIMESTAMP,
        F.col(C.SORT_KEYS).getField("_key_0").alias("sort_key_0"),
        F.col(C.SORT_KEYS).getField("_key_1").alias("sort_key_1"),
    )


def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O14+O20: ALTER TABLE add-nullable-column mid-stream.  The first
    half of the stream is applied with schema (user_id, value); a DDL
    adds ``props`` (add nullable column, BigQueryEventConsumer.java:
    454-490); the second half carries it.  Rows last written before the
    ALTER surface NULL for the new column — reader-side evolution,
    exactly like the lake layer's explicit-schema reads."""
    staged = staged_events(spark, sf_dir)
    props = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("event_id") + 1).alias(C.SEQUENCE_NUM), "props"
    )
    half = _half_point(spark, sf_dir)
    s0 = staged.filter(F.col(C.SEQUENCE_NUM) <= half)
    s1 = staged.filter(F.col(C.SEQUENCE_NUM) > half).join(props, C.SEQUENCE_NUM)
    empty = spark.createDataFrame([], TARGET_SCHEMA)
    t0 = _apply(empty, s0, soft=False)
    # ALTER TABLE ADD COLUMN props STRING: old rows surface NULL
    t0_evolved = t0.withColumn("props", F.lit(None).cast("string"))
    t1 = merge_apply(
        t0_evolved, flatten_batch(s1, ["user_id"]), ["user_id"], soft_deletes=False
    )
    return t1.select("user_id", "value", "props", C.SEQUENCE_NUM, C.IS_DELETED)


def cdc_multi_table_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O23: multi-table parallel apply through the REAL streaming
    consumer — the staged stream carries ``(_database, _table)``
    columns (three tables partitioned by ``user_id % 3``), each flush
    fans one apply task per table onto a thread pool, and the final
    state is the union of the three lake tables
    (processBlobsInParallel, BigQueryEventConsumer.java:691-729).

    Because the key space partitions cleanly across tables, the union
    of per-table final states equals the single-table final state
    tagged by ``user_id % 3`` — which is exactly what the DuckDB oracle
    computes, so this checks the full consumer path (lake writes,
    replay barriers, per-table fan-out) against reference MERGE
    semantics."""
    import os
    import tempfile
    from functools import reduce

    from ..streaming.consumer import EventConsumer
    from ..streaming.driver import run_microbatch_loop_multi
    from ..types import DDLEvent, DDLOp

    staged = staged_events(spark, sf_dir).withColumns(
        {
            "_database": F.lit("web"),
            "_table": F.concat(F.lit("t"), (F.col("user_id") % 3).cast("string")),
        }
    # materialize the staged subtree ONCE: the per-table fan-out filters
    # it 3x per batch, and without this each filter re-runs the whole
    # staged groupBy pipeline (measured: the query's dominant cost)
    ).localCheckpoint(eager=True)
    half = _half_point(spark, sf_dir)
    batches = [
        (0, staged.filter(F.col(C.SEQUENCE_NUM) <= half)),
        (1, staged.filter(F.col(C.SEQUENCE_NUM) > half)),
    ]
    src_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("value", T.DoubleType(), True),
        ]
    )
    root = tempfile.mkdtemp(prefix="bdps-multi-")
    # single-job apply: byte-identical to the standard path (see
    # tests/test_snapshot_split.py) at half the per-batch driver jobs
    consumer = EventConsumer(
        spark, os.path.join(root, "wh"), num_buckets=4,
        single_job_per_batch=True, single_job_merge_strategy="broadcast",
    )
    names = ["t0", "t1", "t2"]
    for t in names:
        consumer.apply_ddl(
            DDLEvent(DDLOp.CREATE_TABLE, "web", t, schema=src_schema,
                     primary_keys=["user_id"])
        )
    # declared topology: zero per-batch discovery scans (tables=None
    # would re-run the staged groupBy subtree once per batch just to
    # list tables — the steady-state contract is to declare them)
    run_microbatch_loop_multi(
        consumer, batches, os.path.join(root, "cp"),
        tables=[("web", t) for t in names],
    )
    frames = [
        consumer.table("web", t)
        .read()
        .select(
            F.lit(t).alias("table_name"), "user_id", "value",
            C.SEQUENCE_NUM, C.IS_DELETED,
        )
        for t in names
    ]
    return reduce(lambda a, b: a.unionByName(b), frames)


def cdc_max_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10-O12: batched multi-table UNION-ALL max-sequence resume point
    (per-event-type frames standing in for per-table frames)."""
    from ..operators.maxseq import max_sequence_num_all

    staged = staged_events(spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("event_id") + 1).alias(C.SEQUENCE_NUM), "event_type"
    )
    types = [r[0] for r in ev.select("event_type").distinct().collect()]
    frames = [ev.filter(F.col("event_type") == t) for t in sorted(types)]
    v = max_sequence_num_all(frames)
    return spark.createDataFrame([(v,)], T.StructType([T.StructField("max_seq", T.LongType(), False)]))


def cdc_replay_barrier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6: idempotent replay barrier — batch + sequence predicate."""
    staged = staged_events(spark, sf_dir).withColumn(
        C.BATCH_ID, F.floor((F.col(C.SEQUENCE_NUM) - 1) / F.lit(2500)).cast("long")
    )
    surv = replay_filter(staged, batch_id=3, latest_merged_seq=8000)
    return surv.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(C.SEQUENCE_NUM).alias("max_seq"),
        F.min(C.SEQUENCE_NUM).alias("min_seq"),
    )


def cdc_json_staging_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3: JSON staging codec fidelity, checked against an external
    engine.  Encode the events table to newline-delimited JSON lines
    (the reference's JSON staging wire format,
    MultiGCSWriter.java:99-148), decode with the explicit schema, and
    aggregate — the result equals DuckDB aggregating the ORIGINAL
    parquet iff every type (int64, double, string, micros timestamp)
    survives the codec byte-exactly.  Both directions are codegen'd
    JVM projections; value flows through deterministic integer cents."""
    from ..sources.json_events import parse_staged_json, staged_json_lines
    from .pipeline_queries import _spread

    # the events file is a single row group -> a one-task scan; spread
    # the per-row JVM codec work across the cluster (guide §2.5)
    ev = _spread(spark.read.parquet(f"{sf_dir}/events.parquet"), "event_id")
    rt = parse_staged_json(staged_json_lines(ev), ev.schema)
    return rt.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_value_cents"
        ),
        F.sum(F.length("props")).alias("props_len_sum"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.count_distinct(F.col("ts")).alias("n_ts"),
    )


def cdc_avro_staging_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: Avro staging codec fidelity, checked against an external
    engine — the Avro twin of :func:`cdc_json_staging_roundtrip`.
    Round-trip the events table through the full Avro Object Container
    wire format (the reference's DEFAULT staging encoding,
    MultiGCSWriter.java:109-129 / AvroEventWriter.java:30-50) inside
    each task, then aggregate — equality with DuckDB aggregating the
    ORIGINAL parquet proves every staged type (int64, double, string,
    micros timestamp) survives the encode->decode byte path exactly."""
    from ..sources.avro_staging import roundtrip_through_container
    from .pipeline_queries import _spread

    # single-row-group input: without the spread the whole pure-Python
    # container encode/decode runs in ONE task (measured 19 s at sf1.0)
    ev = _spread(spark.read.parquet(f"{sf_dir}/events.parquet"), "event_id")
    rt = roundtrip_through_container(ev)
    return rt.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "sum_value_cents"
        ),
        F.sum(F.length("props")).alias("props_len_sum"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
        F.count_distinct(F.col("ts")).alias("n_ts"),
    )


def cdc_normalized_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O18: BigQuery-compatible column-name normalization as a zero-cost
    Catalyst projection over a dirty-named intermediate."""
    from ..normalize import normalize_columns

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dirty = ev.groupBy(
        F.col("user_id").alias("user id?"), F.col("event_type").alias("2type")
    ).agg(F.count(F.lit(1)).alias("n!events"))
    return normalize_columns(dirty)
