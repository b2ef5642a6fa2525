"""Transient driver-side commit faults recover in-process under the
retry envelope (standard and single-job paths); PermanentFailure still
aborts on the first attempt."""

import pytest

from cdc_helpers import consumer, create_tables, ins  # noqa: F401


def test_transient_manifest_fault_retried_in_process(spark, tmp_path, monkeypatch):
    """VERDICT #5: a transient driver-side fault during the DML commit
    (manifest I/O hiccup) recovers IN-PROCESS under the retry envelope —
    the stream survives, state is exactly-once, no duplicate rows."""
    from bigquery_delta_plugins_spark.lake.table import LakeTable
    from bigquery_delta_plugins_spark.retry import PermanentFailure

    c = consumer(spark, tmp_path, dml_retry_base_delay=0.01)
    create_tables(c)
    c.apply_batch("db", "t", ins(spark, [("INSERT", 1, 1, 1.0, None)]), 0)

    orig = LakeTable._write_snapshot
    fails = {"n": 2}  # fail twice, succeed on the 3rd attempt

    def flaky(self, *a, **kw):
        if fails["n"] > 0:
            fails["n"] -= 1
            raise OSError("simulated transient manifest I/O fault")
        return orig(self, *a, **kw)

    monkeypatch.setattr(LakeTable, "_write_snapshot", flaky)
    m = c.apply_batch("db", "t", ins(spark, [
        ("UPDATE", 2, 1, 10.0, 1), ("INSERT", 3, 5, 5.0, None),
    ]), 1)
    assert not m["skipped"] and fails["n"] == 0
    monkeypatch.setattr(LakeTable, "_write_snapshot", orig)
    got = {r["user_id"]: r["value"] for r in c.table("db", "t").read().collect()}
    assert got == {1: 10.0, 5: 5.0}
    assert c.table("db", "t").latest_batch_id() == 1

    # single-job mode: fault inside the fused write/footer/commit unit
    c2 = consumer(spark, tmp_path / "sj", single_job_per_batch=True,
                   dml_retry_base_delay=0.01)
    create_tables(c2)
    c2.apply_batch("db", "t", ins(spark, [("INSERT", 1, 1, 1.0, None)]), 0)
    fails["n"] = 1
    monkeypatch.setattr(LakeTable, "_write_snapshot", flaky)
    c2.apply_batch("db", "t", ins(spark, [("UPDATE", 2, 1, 20.0, 1)]), 1)
    monkeypatch.setattr(LakeTable, "_write_snapshot", orig)
    got2 = {r["user_id"]: r["value"] for r in c2.table("db", "t").read().collect()}
    assert got2 == {1: 20.0}

    # PermanentFailure still aborts on the FIRST attempt
    def permanent(self, *a, **kw):
        raise PermanentFailure("schema conflict")

    monkeypatch.setattr(LakeTable, "_write_snapshot", permanent)
    with pytest.raises(PermanentFailure):
        c.apply_batch("db", "t", ins(spark, [("INSERT", 4, 9, 9.0, None)]), 2)
