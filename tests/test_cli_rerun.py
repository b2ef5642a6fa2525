"""CLI rerun over a crashed two-phase window must not replay its
bootstrap CREATE_TABLE (the O29 cleanup would drop committed batches
while the checkpoint log blocks re-apply)."""

from bigquery_delta_plugins_spark import constants as C
from bigquery_delta_plugins_spark.streaming.consumer import EventConsumer


def test_cli_rerun_does_not_drop_crashed_two_phase_table(spark, tmp_path):
    """ADVICE: a CLI rerun over a table whose previous run crashed inside
    the two-phase direct-load window (direct_load_in_progress set) must
    not replay its bootstrap CREATE_TABLE — the O29 cleanup would drop
    every committed batch while the checkpoint log blocks re-apply."""
    from bigquery_delta_plugins_spark import cli
    from bigquery_delta_plugins_spark.sources.gen import synth_events

    events_dir = str(tmp_path / "events")
    synth_events(spark, 600, 40, batch_size=300).write.partitionBy(
        C.BATCH_ID
    ).parquet(events_dir)
    wh = str(tmp_path / "wh")
    argv = ["apply", "--events", events_dir, "--warehouse", wh,
            "--table", "web.pages", "--no-extract"]
    assert cli.main(argv) == 0
    c = EventConsumer(spark, wh)
    t = c.table("web", "pages")
    rows_before = t.read().count()
    assert rows_before > 0

    # simulate a crash inside the two-phase window: dli flag committed
    t.append(spark.createDataFrame([], t.schema), 99, advance_batch=False)
    assert t.direct_load_in_progress() == 99

    # rerun: batches skip via the checkpoint; the table must survive
    assert cli.main(argv) == 0
    t2 = EventConsumer(spark, wh).table("web", "pages")
    assert t2.read().count() == rows_before
    # and the half-load flag is still there for a REAL source-initiated
    # CREATE_TABLE event to act on
    assert t2.direct_load_in_progress() == 99
