"""Per-batch changelog + eager CDC-out feed regressions: the feed must
survive maintenance commits (compact/rebucket/truncate shadowing),
vacuumed history surfaces as KeyError for the backfill, and the
multi-table eager feed is exactly-once under the crash window."""

import os

import pytest

from bigquery_delta_plugins_spark.operators.changes import CHANGE_TYPE
from bigquery_delta_plugins_spark.streaming.driver import run_microbatch_loop_multi
from bigquery_delta_plugins_spark.types import DDLEvent, DDLOp

from cdc_helpers import consumer, create_tables, ins, multi_rows  # noqa: F401


def test_changes_for_batch_survives_maintenance_commits(spark, tmp_path):
    """compact/rebucket copy the batch summary unchanged; the per-batch
    changelog must keep diffing the batch's REAL final commit, not the
    maintenance snapshot (which would yield an empty/garbage feed)."""
    c = consumer(spark, tmp_path)
    create_tables(c)
    c.apply_batch("db", "t", ins(spark, [("INSERT", 1, 1, 1.0, None),
                                          ("INSERT", 2, 2, 2.0, None)]), 0)
    c.apply_batch("db", "t", ins(spark, [("UPDATE", 3, 1, 10.0, 1),
                                          ("INSERT", 4, 5, 5.0, None)]), 1)
    t = c.table("db", "t")
    want = sorted(map(str, t.changes_for_batch(1).collect()))
    assert want

    t.compact(max_files_per_bucket=1)
    got = sorted(map(str, c.table("db", "t").changes_for_batch(1).collect()))
    assert got == want

    t.rebucket(4)
    got = sorted(map(str, c.table("db", "t").changes_for_batch(1).collect()))
    assert got == want

    c.apply_ddl(DDLEvent(DDLOp.TRUNCATE_TABLE, "db", "t"))
    got = sorted(map(str, c.table("db", "t").changes_for_batch(1).collect()))
    assert got == want

def test_changes_for_batch_vacuumed_raises_keyerror(spark, tmp_path):
    """Vacuumed manifests surface as KeyError (the docstring contract the
    eager-feed backfill relies on), never FileNotFoundError."""
    c = consumer(spark, tmp_path)
    create_tables(c)
    for b in range(3):
        c.apply_batch(
            "db", "t",
            ins(spark, [("INSERT", b * 10 + 1, b, float(b), None)]), b,
        )
    t = c.table("db", "t")
    t.vacuum(keep_snapshots=1)
    with pytest.raises(KeyError):
        t.changes_for_batch(0)

def test_multi_table_changes_dir_feed(spark, tmp_path):
    """The eager CDC-out feed through the MULTI-table loop: per-table
    partitions, exactly-once under the crash window, feed == on-demand
    changelog for every (table, batch)."""
    c = consumer(spark, tmp_path)
    create_tables(c, tables=("a", "b"))
    b0 = multi_rows(spark, [
        ("INSERT", 1, 1, 1.0, None, "db", "a"),
        ("INSERT", 2, 2, 2.0, None, "db", "b"),
    ])
    b1 = multi_rows(spark, [
        ("UPDATE", 3, 1, 10.0, 1, "db", "a"),
        ("DELETE", 4, 2, 2.0, 2, "db", "b"),
        ("INSERT", 5, 7, 7.0, None, "db", "b"),
    ])
    cp, feed = str(tmp_path / "cp"), str(tmp_path / "feed")
    tables = [("db", "a"), ("db", "b")]
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_microbatch_loop_multi(
            c, [(0, b0), (1, b1)], cp, tables=tables,
            crash_after_apply_batch=1, changes_dir=feed,
        )
    # drop one feed partition to force the backfill path on resume
    import shutil

    shutil.rmtree(os.path.join(feed, "db", "a", "batch=1"))
    run_microbatch_loop_multi(
        c, [(0, b0), (1, b1)], cp, tables=tables, changes_dir=feed
    )
    for db, tb in tables:
        t = c.table(db, tb)
        for b in range(2):
            part = os.path.join(feed, db, tb, f"batch={b}")
            got = sorted(map(str, spark.read.parquet(part).collect()))
            want = sorted(map(str, t.changes_for_batch(b).collect()))
            assert got == want and got, (db, tb, b)
    # spot-check semantics: table b batch 1 = one delete + one insert
    fb = {
        r["user_id"]: r[CHANGE_TYPE]
        for r in spark.read.parquet(
            os.path.join(feed, "db", "b", "batch=1")
        ).collect()
    }
    assert fb == {2: "delete", 7: "insert"}
