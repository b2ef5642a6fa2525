"""O5 full semantics (snapshot/streaming split per flush) and O29
(snapshot-abandon cleanup).

Reference parity: blob split MultiGCSWriter.java:73-76,164-166;
directLoadToTarget BigQueryEventConsumer.java:697-753; abandon flag
:167,392-399.
"""

import os

import pytest
from pyspark.sql import types as T

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark.lake.table import LakeTable
from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer
from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp

SRC = T.StructType(
    [
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)

STAGING = T.StructType(
    [
        T.StructField(C.OPERATION, T.StringType(), False),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("_before_user_id", T.LongType(), True),
        T.StructField(C.SNAPSHOT, T.BooleanType(), True),
    ]
)


def _mk(spark, tmp_path, name):
    c = EventConsumer(spark, os.path.join(str(tmp_path), name), num_buckets=2)
    c.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=SRC, primary_keys=["user_id"])
    )
    return c


def _seed(spark, consumer):
    b0 = spark.createDataFrame(
        [("INSERT", 1, 1, 1.0, None, None), ("INSERT", 2, 2, 2.0, None, None)],
        STAGING,
    ).drop(C.SNAPSHOT)
    consumer.apply_batch("db", "t", b0, 0)


MIXED_ROWS = [
    ("INSERT", 3, 10, 10.0, None, True),   # snapshot portion
    ("INSERT", 4, 11, 11.0, None, True),
    ("UPDATE", 5, 1, 100.0, 1, False),     # streaming portion
    ("INSERT", 6, 12, 12.0, None, False),
]


def test_mixed_batch_snapshot_split_matches_all_merge(spark, tmp_path):
    """A mixed snapshot+streaming batch on a NON-empty table direct-loads
    the snapshot portion (fast path observable in metrics) and produces
    state identical to applying the same events all-merge."""
    split = _mk(spark, tmp_path, "split")
    _seed(spark, split)
    m = split.apply_batch(
        "db", "t", spark.createDataFrame(MIXED_ROWS, STAGING), 1
    )
    assert m["fast_path"] == "snapshot_append"
    assert m["n_snapshot"] == 2
    assert m["merge_strategy"] is not None  # streaming portion merged

    allmerge = _mk(spark, tmp_path, "allmerge")
    _seed(spark, allmerge)
    allmerge.apply_batch(
        "db", "t",
        spark.createDataFrame(MIXED_ROWS, STAGING).drop(C.SNAPSHOT),
        1,
    )

    cols = ["user_id", "value", C.SEQUENCE_NUM, C.IS_DELETED]
    s = {tuple(r[c] for c in cols) for r in split.table("db", "t").read().collect()}
    a = {tuple(r[c] for c in cols) for r in allmerge.table("db", "t").read().collect()}
    assert s == a
    assert {r[0] for r in s} == {1, 2, 10, 11, 12}


def test_update_referencing_same_batch_snapshot_row(spark, tmp_path):
    """O5 split ordering: a streaming UPDATE whose before-key is a row
    the SAME batch's snapshot portion inserts must take the MATCHED arm
    — the snapshot direct-load lands before the merge, exactly like the
    reference loads snapshot blobs before merging streaming blobs
    (BigQueryEventConsumer.java:697-753)."""
    c = _mk(spark, tmp_path, "samebatch")
    _seed(spark, c)
    batch = [
        ("INSERT", 3, 50, 50.0, None, True),    # snapshot insert
        ("UPDATE", 4, 50, 500.0, 50, False),    # streaming update of it
    ]
    m = c.apply_batch("db", "t", spark.createDataFrame(batch, STAGING), 1)
    assert m["fast_path"] == "snapshot_append" and m["n_snapshot"] == 1
    state = {r["user_id"]: (r["value"], r[C.SEQUENCE_NUM])
             for r in c.table("db", "t").read().collect()}
    assert state[50] == (500.0, 4)  # matched-arm update, not a duplicate
    assert len([u for u in state if u == 50]) == 1


def test_pure_snapshot_batch_on_nonempty_table(spark, tmp_path):
    """Snapshot-only batch against an existing table: direct append, no
    merge, batch committed (advance) in one final commit."""
    c = _mk(spark, tmp_path, "pure")
    _seed(spark, c)
    b = spark.createDataFrame(
        [("INSERT", 3, 10, 10.0, None, True), ("INSERT", 4, 11, 11.0, None, True)],
        STAGING,
    )
    m = c.apply_batch("db", "t", b, 1)
    assert m["fast_path"] == "snapshot_append" and not m["skipped"]
    t = c.table("db", "t")
    assert t.latest_batch_id() == 1
    assert t.direct_load_in_progress() is None
    assert t.read().count() == 4
    # replay is a no-op
    m2 = c.apply_batch("db", "t", b, 1)
    assert m2["skipped"]


def test_crash_between_snapshot_load_and_merge_commit(spark, tmp_path, monkeypatch):
    """Worst-case window: the snapshot portion landed (two-phase append,
    batch NOT committed) and the merge crashed.  Replaying the batch
    must not duplicate snapshot rows (replay barrier ate them) and must
    apply the streaming portion — byte-identical convergence."""
    c = _mk(spark, tmp_path, "crash")
    _seed(spark, c)
    df = spark.createDataFrame(MIXED_ROWS, STAGING)

    real = LakeTable.overwrite_buckets
    calls = {"n": 0}

    def boom(self, *a, **kw):
        calls["n"] += 1
        raise RuntimeError("simulated crash before merge commit")

    monkeypatch.setattr(LakeTable, "overwrite_buckets", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        c.apply_batch("db", "t", df, 1)
    monkeypatch.setattr(LakeTable, "overwrite_buckets", real)

    t = c.table("db", "t")
    # the DML retry envelope re-attempts the merge commit in-process
    # (round 3) before giving up — a PERSISTENT fault exhausts all
    # attempts and still leaves the clean two-phase crash window
    assert calls["n"] == 3
    assert t.direct_load_in_progress() == 1  # half-finished direct load
    assert t.latest_batch_id() == 0  # batch NOT committed

    m = c.apply_batch("db", "t", df, 1)  # replay
    assert not m["skipped"]
    assert m["n_snapshot"] in (0, None)  # snapshot rows NOT re-appended
    t = c.table("db", "t")
    assert t.latest_batch_id() == 1
    assert t.direct_load_in_progress() is None
    state = {r["user_id"]: r["value"] for r in t.read().collect()}
    assert state == {1: 100.0, 2: 2.0, 10: 10.0, 11: 11.0, 12: 12.0}


@pytest.mark.parametrize("strategy", ["shuffle", "broadcast"])
def test_single_job_mode_matches_standard_path(spark, tmp_path, strategy):
    """The single-job apply mode (no stats job, footer-resolved seq
    bookkeeping, fixed merge strategy) produces byte-identical state and
    the same replay-barrier behavior as the standard two-job path."""
    from bigquery_delta_plugins_spark.sources.gen import synth_events
    from bigquery_delta_plugins_spark.streaming.driver import run_microbatch_loop
    from pyspark.sql import functions as F

    pages = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    ev = synth_events(spark, 3000, 150, batch_size=1000, pk_move_frac=0.03).persist()
    batches = [(b, ev.filter(F.col(C.BATCH_ID) == b)) for b in range(3)]

    outs = {}
    for mode, kw in {
        "std": {},
        "single": {"single_job_per_batch": True, "single_job_merge_strategy": strategy},
    }.items():
        c = EventConsumer(
            spark, os.path.join(str(tmp_path), mode + strategy), num_buckets=4, **kw
        )
        c.apply_ddl(
            DDLEvent(DDLOp.CREATE_TABLE, "web", "pages", schema=pages,
                     primary_keys=["url"])
        )
        ms = run_microbatch_loop(
            c, batches, "web", "pages", os.path.join(str(tmp_path), "cp" + mode + strategy)
        )
        t = c.table("web", "pages")
        rows = {
            (r["url"], r[C.SEQUENCE_NUM], bytes(r["html"] or b"").hex())
            for r in t.read().collect()
        }
        outs[mode] = (rows, t.latest_merged_seq(), ms)
    ev.unpersist()

    assert outs["std"][0] == outs["single"][0]
    assert outs["std"][1] == outs["single"][1] == 3000
    # replaying a committed batch is still a no-op in single-job mode
    c_single = EventConsumer(
        spark, os.path.join(str(tmp_path), "single" + strategy), num_buckets=4,
        single_job_per_batch=True, single_job_merge_strategy=strategy,
    )
    m = c_single.apply_batch("web", "pages", batches[2][1], 2)
    assert m["skipped"]


def test_replayed_snapshot_events_are_dropped_by_seq_barrier(spark, tmp_path):
    """Port of the reference's snapshot-replay dedup test
    (BigQueryConsumerTest.java:684-723): after a restart the source
    re-sends the initial snapshot with OLD sequence numbers; events with
    seq <= the target's max are never applied — only genuinely new
    events land."""
    c = _mk(spark, tmp_path, "dedup")
    _seed(spark, c)  # seqs 1-2 committed, latest_merged_seq=2
    replay_plus_new = spark.createDataFrame(
        [
            ("INSERT", 1, 1, 1.0, None, True),    # replayed snapshot
            ("INSERT", 2, 2, 2.0, None, True),    # replayed snapshot
            ("UPDATE", 3, 2, 22.0, 2, False),     # genuinely new
        ],
        STAGING,
    )
    m = c.apply_batch("db", "t", replay_plus_new, 1)
    assert not m["skipped"]
    assert m["n_snapshot"] in (0, None)  # replayed snapshot never written
    assert m["n_diff"] == 1
    state = {r["user_id"]: (r["value"], r[C.SEQUENCE_NUM])
             for r in c.table("db", "t").read().collect()}
    assert state == {1: (1.0, 1), 2: (22.0, 3)}


def test_crashed_write_leaves_orphans_reads_unaffected_vacuum_reclaims(
    spark, tmp_path
):
    """A write job that dies AFTER producing data files but BEFORE the
    manifest commit leaves orphan parquet on disk; reads are manifest-
    driven so state is unaffected, and vacuum() reclaims the orphans
    while preserving retained snapshots."""
    import glob

    c = _mk(spark, tmp_path, "orphan")
    _seed(spark, c)
    t = c.table("db", "t")
    # simulate the crash window: data files written, no commit
    orphan_rows = c._staged_to_target_rows(
        spark.createDataFrame([(77, 77.0)], SRC), t
    )
    t._write_data_files(orphan_rows, t.schema)
    before = {tuple(r) for r in t.read().select("user_id").collect()}
    assert (77,) not in before  # manifest isolation

    n_files_before = len(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"),
                                   recursive=True))
    stats = t.vacuum(keep_snapshots=1)
    assert stats["removed_files"] >= 1
    n_files_after = len(glob.glob(os.path.join(t.path, "data", "**", "*.parquet"),
                                  recursive=True))
    assert n_files_after < n_files_before
    after = {tuple(r) for r in t.read().select("user_id").collect()}
    assert after == before  # current snapshot fully intact


def test_create_table_replay_drops_half_loaded_table(spark, tmp_path):
    """O29: CREATE_TABLE replayed over a direct-load-in-progress flag
    drops the half-loaded table and starts clean."""
    c = _mk(spark, tmp_path, "abandon")
    # simulate: direct load landed but the batch never finished
    t = c.table("db", "t")
    t.append(
        c._staged_to_target_rows(
            spark.createDataFrame([(1, 1.0)], SRC), t
        ),
        batch_id=0,
        max_seq=1,
        advance_batch=False,
    )
    assert c.table("db", "t").direct_load_in_progress() == 0
    assert c.table("db", "t").read().count() == 1

    # the source restarts the snapshot: CREATE_TABLE replay
    c.apply_ddl(
        DDLEvent(DDLOp.CREATE_TABLE, "db", "t", schema=SRC, primary_keys=["user_id"])
    )
    t = c.table("db", "t")
    assert t.read().count() == 0  # half-loaded data gone
    assert t.direct_load_in_progress() is None
    assert t.latest_batch_id() == -1
