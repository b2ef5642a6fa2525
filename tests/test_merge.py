"""MERGE-apply semantics ported from the reference behavioral tests:
insert -> PK-moving update -> delete end state
(BigQueryEventConsumerTest.java:494-509,633-786), soft deletes
(:528-543,750-785), and the unordered-source sort-key trio
(BigQueryConsumerUnorderedSourceTest.java:154-530)."""

import pytest
from pyspark.sql import types as T

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark import schemas
from bigquery_delta_plugins_spark.operators.flatten import flatten_batch
from bigquery_delta_plugins_spark.operators.merge import merge_apply

SOURCE = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)
STAGING = schemas.staging_schema(SOURCE)
TARGET = schemas.target_schema(SOURCE)


def staged(spark, rows, batch=1):
    data = [
        {
            C.OPERATION: op, C.BATCH_ID: batch, C.SEQUENCE_NUM: seq,
            "id": i, "name": n, "_before_id": bi, "_before_name": bn,
        }
        for (seq, op, bi, bn, i, n) in rows
    ]
    return spark.createDataFrame(data, STAGING)


def empty_target(spark):
    return spark.createDataFrame([], TARGET)


@pytest.fixture(params=["shuffle", "broadcast"])
def strategy(request):
    """Every merge semantics test runs under BOTH physical strategies —
    the broadcast (zero-target-shuffle) plan must be row-identical."""
    return request.param


def apply_batch(spark, target, rows, batch=1, soft=False, last_seq=0, strategy="shuffle"):
    diff = flatten_batch(
        staged(spark, rows, batch), ["id"], batch_id=batch, latest_merged_seq=last_seq
    )
    return merge_apply(target, diff, ["id"], soft_deletes=soft, strategy=strategy)


def state(df):
    return {
        (r["id"], r["name"], r[C.SEQUENCE_NUM], r[C.IS_DELETED]) for r in df.collect()
    }


def test_insert_update_pk_delete_end_state(spark, strategy):
    # Mirrors insertUpdateDelete: insert alice(0)+bob(1); update moves
    # alice 0 -> 2; delete removes bob.
    t0 = empty_target(spark)
    t1 = apply_batch(spark, t0, [
        (1, "INSERT", None, None, 0, "alice"),
        (2, "INSERT", None, None, 1, "bob"),
    ], strategy=strategy)
    assert state(t1) == {(0, "alice", 1, None), (1, "bob", 2, None)}

    t2 = apply_batch(spark, t1, [
        (3, "UPDATE", 0, "alice", 2, "alice"),
        (4, "DELETE", 1, "bob", 1, "bob"),
    ], batch=2, last_seq=2, strategy=strategy)
    assert state(t2) == {(2, "alice", 3, None)}


def test_soft_delete_keeps_tombstone(spark, strategy):
    t1 = apply_batch(spark, empty_target(spark), [
        (1, "INSERT", None, None, 0, "alice"),
        (2, "INSERT", None, None, 1, "bob"),
    ], soft=True, strategy=strategy)
    t2 = apply_batch(spark, t1, [
        (3, "DELETE", 1, "bob", 1, "bob"),
    ], batch=2, soft=True, last_seq=2, strategy=strategy)
    # soft delete: only _is_deleted flips; other columns (incl. seq) keep
    # their old values — reference deleteOperation sets just the flag.
    assert state(t2) == {(0, "alice", 1, None), (1, "bob", 2, True)}

    # tombstoned rows are shielded from further matched arms
    t3 = apply_batch(spark, t2, [
        (4, "UPDATE", 1, "bob", 1, "bob2"),
    ], batch=3, soft=True, last_seq=3, strategy=strategy)
    assert state(t3) == {(0, "alice", 1, None), (1, "bob", 2, True)}


def test_update_of_missing_row_inserts(spark, strategy):
    # NOT MATCHED + UPDATE -> INSERT arm (snapshot-resume semantics).
    t1 = apply_batch(spark, empty_target(spark), [
        (1, "UPDATE", 5, "old", 5, "new"),
    ], strategy=strategy)
    assert state(t1) == {(5, "new", 1, None)}


def test_delete_of_missing_row_is_noop_when_ordered(spark, strategy):
    t1 = apply_batch(spark, empty_target(spark), [
        (1, "DELETE", 9, "gone", 9, "gone"),
    ], strategy=strategy)
    assert state(t1) == set()


def test_replayed_batch_is_idempotent(spark, strategy):
    rows = [
        (1, "INSERT", None, None, 0, "alice"),
        (2, "INSERT", None, None, 1, "bob"),
    ]
    t1 = apply_batch(spark, empty_target(spark), rows, strategy=strategy)
    # replay the same batch with the seq barrier advanced: no-op
    t2 = apply_batch(spark, t1, rows, last_seq=2, strategy=strategy)
    assert state(t2) == state(t1)


# ---------------------------------------------------------------------------
# Unordered sources (sort keys)
# ---------------------------------------------------------------------------

SORT_TYPES = [T.LongType(), T.LongType(), T.StringType()]
U_STAGING = schemas.staging_schema(
    SOURCE, ordering=C.UN_ORDERED, sort_key_types=SORT_TYPES
)
U_TARGET = schemas.target_schema(
    SOURCE, ordering=C.UN_ORDERED, sort_key_types=SORT_TYPES
)


def u_staged(spark, rows, batch=1):
    data = [
        {
            C.OPERATION: op, C.BATCH_ID: batch, C.SEQUENCE_NUM: seq,
            C.SOURCE_TIMESTAMP: ts, C.SORT_KEYS: {"_key_0": k0, "_key_1": k1, "_key_2": k2},
            "id": i, "name": n, "_before_id": bi, "_before_name": bn,
        }
        for (seq, ts, (k0, k1, k2), op, bi, bn, i, n) in rows
    ]
    return spark.createDataFrame(data, U_STAGING)


def u_apply(spark, target, rows, batch=1, last_seq=0, strategy="shuffle"):
    diff = flatten_batch(
        u_staged(spark, rows, batch), ["id"],
        ordering=C.UN_ORDERED, sort_key_count=3,
        batch_id=batch, latest_merged_seq=last_seq,
    )
    return merge_apply(
        target, diff, ["id"], ordering=C.UN_ORDERED, sort_key_count=3,
        strategy=strategy,
    )


def u_state(df):
    return {
        (r["id"], r["name"], r[C.SEQUENCE_NUM], r[C.IS_DELETED],
         tuple(r[C.SORT_KEYS]) if r[C.SORT_KEYS] is not None else None)
        for r in df.collect()
    }


def test_unordered_trio(spark, strategy):
    t0 = spark.createDataFrame([], U_TARGET)
    # insert lands; newer delete wins as tombstone over older update
    t1 = u_apply(spark, t0, [
        (1, 100, (10, 0, "a"), "INSERT", None, None, 1, "v1"),
        (2, 100, (30, 0, "a"), "DELETE", 1, "v1", 1, "v1"),
        (3, 100, (20, 0, "a"), "UPDATE", 1, "v1", 1, "v2"),
    ], strategy=strategy)
    # within-batch flatten: update(20) killed by delete(30); insert(10)
    # killed by delete via before-key; delete not matched -> tombstone insert
    assert u_state(t1) == {(1, "v1", 2, True, (30, 0, "a"))}

    # late update (sort key 25 < 30) against the tombstone is ignored
    t2 = u_apply(spark, t1, [
        (4, 100, (25, 0, "a"), "UPDATE", 1, "v1", 1, "v3"),
    ], batch=2, last_seq=3, strategy=strategy)
    assert u_state(t2) == {(1, "v1", 2, True, (30, 0, "a"))}

    # genuinely newer update (35) revives the row and resets _is_deleted
    t3 = u_apply(spark, t2, [
        (5, 100, (35, 0, "a"), "UPDATE", 1, "v1", 1, "v4"),
    ], batch=3, last_seq=4, strategy=strategy)
    assert u_state(t3) == {(1, "v4", 5, None, (35, 0, "a"))}


RID_STAGING = schemas.staging_schema(SOURCE, row_id_supported=True)


def staged_rid(spark, rows, batch=1):
    data = [
        {
            C.OPERATION: op, C.BATCH_ID: batch, C.SEQUENCE_NUM: seq,
            C.ROW_ID: rid, "id": i, "name": n,
        }
        for (seq, op, rid, i, n) in rows
    ]
    return spark.createDataFrame(data, RID_STAGING)


def apply_batch_rid(spark, target, rows, batch=1, last_seq=0, strategy="shuffle"):
    diff = flatten_batch(
        staged_rid(spark, rows, batch), ["id"], batch_id=batch,
        latest_merged_seq=last_seq, row_id_supported=True,
    )
    return merge_apply(target, diff, ["id"], row_id_supported=True,
                       strategy=strategy)


def state_rid(df):
    return {
        (r[C.ROW_ID], r["id"], r["name"], r[C.SEQUENCE_NUM]) for r in df.collect()
    }


def test_row_id_source_merge_end_state(spark, strategy):
    """Row-id sources: the MERGE joins on _row_id instead of _before_*
    key columns (createMergeQuery's rowIdSupported branch,
    BigQueryEventConsumer.java:1236-1247,1258-1262).  Insert two rows,
    then per row-id: update one (PK value may even change — identity is
    the row id), delete the other, insert a third; a second update of
    the same row id inside the batch collapses in the flatten."""
    t0 = empty_target(spark)
    t1 = apply_batch_rid(spark, t0, [
        (1, "INSERT", "r1", 0, "alice"),
        (2, "INSERT", "r2", 1, "bob"),
    ], strategy=strategy)
    assert state_rid(t1) == {("r1", 0, "alice", 1), ("r2", 1, "bob", 2)}

    t2 = apply_batch_rid(spark, t1, [
        (3, "UPDATE", "r1", 7, "alice2"),   # PK value moves, row id stays
        (4, "UPDATE", "r1", 8, "alice3"),   # same row id, later seq wins
        (5, "DELETE", "r2", 1, "bob"),
        (6, "INSERT", "r3", 2, "carol"),
    ], batch=2, last_seq=2, strategy=strategy)
    assert state_rid(t2) == {("r1", 8, "alice3", 4), ("r3", 2, "carol", 6)}

    # replaying the same batch against the barrier is a no-op
    t3 = apply_batch_rid(spark, t2, [
        (3, "UPDATE", "r1", 7, "alice2"),
        (5, "DELETE", "r2", 1, "bob"),
    ], batch=2, last_seq=6, strategy=strategy)
    assert state_rid(t3) == state_rid(t2)
