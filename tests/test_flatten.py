"""Diff-query / flatten semantics, incl. the reference's Case-1 worked
example (BigQueryEventConsumer.java:944-983) and chained-PK updates
(BigQueryEventConsumerTest.java:633-786 update id 0 -> 2)."""

import pytest
from pyspark.sql import types as T

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark import schemas
from bigquery_delta_plugins_spark.operators.flatten import flatten_batch

SOURCE = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)
STAGING = schemas.staging_schema(SOURCE)  # ordered, no row id


def staged(spark, rows):
    """rows: (seq, op, before_id, before_name, id, name) with batch 1."""
    data = [
        {
            C.OPERATION: op,
            C.BATCH_ID: 1,
            C.SEQUENCE_NUM: seq,
            "id": i,
            "name": n,
            "_before_id": bi,
            "_before_name": bn,
        }
        for (seq, op, bi, bn, i, n) in rows
    ]
    return spark.createDataFrame(data, STAGING)


CASE1 = [
    (2, "INSERT", None, None, 0, "alice"),
    (3, "UPDATE", 0, "alice", 1, "alice"),
    (4, "UPDATE", 1, "alice", 2, "alice"),
    (5, "DELETE", 2, "alice", 2, "alice"),
    (6, "INSERT", None, None, 0, "Alice"),
    (7, "INSERT", None, None, 1, "blob"),
    (8, "UPDATE", 1, "blob", 1, "Bob"),
]


@pytest.mark.parametrize("pre_collapse", [True, False])
def test_case1_worked_example(spark, pre_collapse):
    df = staged(spark, CASE1)
    out = flatten_batch(
        df, ["id"], batch_id=1, latest_merged_seq=0, pre_collapse=pre_collapse
    )
    got = {(r[C.SEQUENCE_NUM], r[C.OPERATION], r["id"], r["name"]) for r in out.collect()}
    assert got == {(5, "DELETE", 2, "alice"), (6, "INSERT", 0, "Alice"), (8, "UPDATE", 1, "Bob")}


@pytest.mark.parametrize("pre_collapse", [True, False])
def test_hot_key_self_update_run_collapses(spark, pre_collapse):
    rows = [(1, "INSERT", None, None, 7, "v0")] + [
        (s, "UPDATE", 7, f"v{s-2}", 7, f"v{s-1}") for s in range(2, 30)
    ]
    out = flatten_batch(staged(spark, rows), ["id"], pre_collapse=pre_collapse)
    got = [(r[C.SEQUENCE_NUM], r[C.OPERATION], r["name"]) for r in out.collect()]
    assert got == [(29, "UPDATE", "v28")]


def test_replay_barrier_filters_old_sequences(spark):
    df = staged(spark, CASE1)
    out = flatten_batch(df, ["id"], batch_id=1, latest_merged_seq=5)
    seqs = {r[C.SEQUENCE_NUM] for r in out.collect()}
    assert seqs == {6, 8}  # 7 killed by 8; <=5 excluded by the barrier


def test_delete_then_insert_same_key_both_survive(spark):
    # An INSERT has NULL before-keys so it cannot kill the DELETE:
    # both survive the diff, exactly like the reference self-join.
    rows = [
        (1, "DELETE", 5, "x", 5, "x"),
        (2, "INSERT", None, None, 5, "y"),
    ]
    out = flatten_batch(staged(spark, rows), ["id"])
    got = {(r[C.SEQUENCE_NUM], r[C.OPERATION]) for r in out.collect()}
    assert got == {(1, "DELETE"), (2, "INSERT")}


def test_pre_collapse_equivalence_on_adversarial_chains(spark):
    # Rename chains through reused keys: q->p, p->r, x->p in one batch.
    rows = [
        (1, "INSERT", None, None, 10, "q"),
        (2, "UPDATE", 10, "q", 20, "q"),       # q(10) -> p(20)
        (3, "UPDATE", 20, "q", 30, "q"),       # p(20) -> r(30)
        (4, "UPDATE", 40, "x", 20, "x2"),      # x(40) -> p(20)
        (5, "UPDATE", 20, "x2", 20, "x3"),     # self-update on p(20)
    ]
    df = staged(spark, rows)
    fast = flatten_batch(df, ["id"], pre_collapse=True)
    slow = flatten_batch(df, ["id"], pre_collapse=False)
    key = lambda r: (r[C.SEQUENCE_NUM], r[C.OPERATION], r["id"], r["name"])  # noqa: E731
    assert {key(r) for r in fast.collect()} == {key(r) for r in slow.collect()}


def test_row_id_flatten_is_argmax(spark):
    schema = schemas.staging_schema(SOURCE, row_id_supported=True)
    data = [
        {C.OPERATION: op, C.BATCH_ID: 1, C.SEQUENCE_NUM: s, "id": i, "name": n, C.ROW_ID: rid}
        for (s, op, rid, i, n) in [
            (20, "INSERT", "ABCD", 0, "alice"),
            (40, "UPDATE", "ABCD", 2, "alice"),
            (50, "DELETE", "ABCD", 2, "alice"),
            (60, "INSERT", "ABCD", 0, "alice"),
            (70, "INSERT", "ABCE", 1, "bob"),
            (30, "UPDATE", "ABCD", 1, "alice"),
            (80, "UPDATE", "ABCE", 1, "Bob"),
        ]
    ]
    df = spark.createDataFrame(data, schema)
    out = flatten_batch(df, ["id"], row_id_supported=True)
    got = {(r[C.SEQUENCE_NUM], r[C.ROW_ID], r["id"], r["name"]) for r in out.collect()}
    assert got == {(60, "ABCD", 0, "alice"), (80, "ABCE", 1, "Bob")}
