"""Driver-loop auto-compaction: bounded files per bucket, state-neutral
changelog, lineage observability."""

from cdc_helpers import consumer, create_tables, ins  # noqa: F401


def test_auto_compact_keeps_file_counts_bounded(spark, tmp_path, monkeypatch):
    """Driver-loop auto-compaction: many small batches leave at most
    ``threshold`` files per bucket, state bookkeeping untouched, and the
    changelog across compaction commits is empty (state-neutral).

    WRITE_REPARTITION is disabled so each commit lands multiple files
    per bucket (the compounding-file-count regime the hook exists for —
    with the pre-write exchange on, merge commits keep ~1 file/bucket
    and the hook would never fire)."""
    from bigquery_delta_plugins_spark.lake.table import LakeTable
    from bigquery_delta_plugins_spark.streaming.driver import run_microbatch_loop

    monkeypatch.setattr(LakeTable, "WRITE_REPARTITION", False)
    c = consumer(spark, tmp_path, single_job_per_batch=False)
    create_tables(c)
    batches = [
        (b, ins(spark, [("INSERT", b * 2 + 1, b, float(b), None),
                         ("UPDATE", b * 2 + 2, max(b - 1, 0), float(b), max(b - 1, 0))]))
        for b in range(12)
    ]
    run_microbatch_loop(
        c, batches, "db", "t", str(tmp_path / "cp"),
        auto_compact_files_per_bucket=2,
    )
    t = c.table("db", "t")
    snap = t.current_snapshot()
    per_bucket: dict[int, int] = {}
    for f in snap["files"]:
        per_bucket[f["bucket"]] = per_bucket.get(f["bucket"], 0) + 1
    assert per_bucket and max(per_bucket.values()) <= 2
    # compaction actually ran: more snapshots than DML commits alone
    n_snaps = t.history().count()
    assert n_snaps > 13, n_snaps  # 1 create + 12 batches + >=1 compaction
    # bookkeeping survived compaction commits
    assert t.latest_batch_id() == 11
    assert {r["user_id"] for r in t.read().collect()} == set(range(12))
    # and every batch's changelog is still reachable and correct
    assert t.changes_for_batch(11).count() > 0
    # observability: each compaction that ran left an auto_compact
    # lineage line with the before/after file counts and snapshot span
    import json as _json
    with open(tmp_path / "cp" / "lineage.jsonl") as f:
        lines = [_json.loads(l) for l in f]
    compactions = [l for l in lines if l.get("event") == "auto_compact"]
    assert compactions, "auto-compaction ran but emitted no lineage line"
    for entry in compactions:
        assert entry["files_before"] > entry["files_after"]
        assert entry["buckets_compacted"] >= 1
        assert entry["snapshot_id"] > entry["from_snapshot_id"]
        assert entry["database"] == "db" and entry["table_name"] == "t"
        # state-neutral: the changelog across the compaction commit is empty
        assert t.changes(entry["from_snapshot_id"], entry["snapshot_id"]).count() == 0
