"""CLI / spark-submit entrypoint: gen -> apply -> show round-trip, and
idempotent re-apply (the north star's ``spark-submit --py-files``
delivery path)."""

import json
import os

from bigquery_delta_plugins_spark.cli import main


def test_cli_gen_apply_show_roundtrip(spark, tmp_path, capsys):
    events = str(tmp_path / "events")
    wh = str(tmp_path / "wh")
    base = ["--master", "local[4]", "--shuffle-partitions", "4"]

    assert main(base + [
        "gen", "--events", events, "--n-events", "2000", "--n-urls", "100",
        "--batch-size", "500",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_events"] == 2000

    feed = str(tmp_path / "feed")
    assert main(base + [
        "apply", "--events", events, "--warehouse", wh, "--table", "web.pages",
        "--num-buckets", "4", "--changes-dir", feed,
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied_batches"] == 4 and out["skipped_batches"] == 0
    assert all(os.path.exists(os.path.join(feed, f"batch={b}")) for b in range(4))
    rows = out["final_rows"]
    assert rows > 0

    # re-apply from the same checkpoint: everything skips, state stable
    assert main(base + [
        "apply", "--events", events, "--warehouse", wh, "--table", "web.pages",
        "--num-buckets", "4",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["applied_batches"] == 0 and out["final_rows"] == rows

    assert main(base + ["show", "--warehouse", wh, "--table", "web.pages"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == rows and out["summary"]["latest_merged_seq"] == 2000
    # lineage emitted per batch next to the warehouse checkpoint
    assert os.path.exists(os.path.join(wh, "_cp", "lineage.jsonl"))

    # CDC-out: one batch's changelog as JSONL, full span as parquet
    assert main(base + [
        "changes", "--warehouse", wh, "--table", "web.pages", "--batch", "1",
    ]) == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert lines and all(
        l["_change_type"] in ("insert", "update", "delete") for l in lines
    )

    # maintenance: compact + vacuum through the CLI, state preserved
    assert main(base + [
        "compact", "--warehouse", wh, "--table", "web.pages", "--vacuum",
        "--keep-snapshots", "50",  # retain history: changelog reads below
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["files_after"] <= out["files_before"] and "vacuum" in out
    assert main(base + ["show", "--warehouse", wh, "--table", "web.pages"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == rows

    # partition evolution through the CLI, state preserved
    assert main(base + [
        "rebucket", "--warehouse", wh, "--table", "web.pages",
        "--num-buckets", "8",
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rebucketed"] and out["num_buckets"] == 8
    assert main(base + ["show", "--warehouse", wh, "--table", "web.pages"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == rows and out["properties"]["num_buckets"] == 8

    chg_out = str(tmp_path / "chg")
    assert main(base + [
        "changes", "--warehouse", wh, "--table", "web.pages",
        "--from-snapshot", "0", "--out", chg_out,
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # full-span changelog of an insert-heavy stream ~= final live rows
    assert out["rows"] >= rows


def test_cli_wire_formats_identical_state(spark, tmp_path, capsys):
    """The same binlog staged in all three wire formats (parquet
    columnar fast path, Avro — the reference default, JSONL — the
    reference fallback) applies to an IDENTICAL final table."""
    from bigquery_delta_plugins_spark.lake.table import LakeTable
    from bigquery_delta_plugins_spark.normalize import (
        get_normalized_dataset_name,
        normalize_table_name,
    )

    base = ["--master", "local[4]", "--shuffle-partitions", "4"]
    fingerprints = {}
    for fmt in ("parquet", "avro", "jsonl"):
        events = str(tmp_path / f"ev_{fmt}")
        wh = str(tmp_path / f"wh_{fmt}")
        assert main(base + [
            "gen", "--events", events, "--n-events", "1200",
            "--n-urls", "80", "--batch-size", "400", "--format", fmt,
        ]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["format"] == fmt and out["batches"] == 3
        assert main(base + [
            "apply", "--events", events, "--warehouse", wh,
            "--table", "web.pages", "--num-buckets", "4",
            "--events-format", fmt,
        ]) == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["applied_batches"] == 3 and out["skipped_batches"] == 0
        path = os.path.join(
            wh, get_normalized_dataset_name(None, "web"),
            normalize_table_name("pages"),
        )
        df = LakeTable.load(spark, path).read()
        fingerprints[fmt] = sorted(
            (r["url"], r["_sequence_num"], r["_is_deleted"],
             bytes(r["html"] or b""), r["text"], str(r["warc_ts"]))
            for r in df.collect()
        )
    assert fingerprints["avro"] == fingerprints["parquet"]
    assert fingerprints["jsonl"] == fingerprints["parquet"]
    assert len(fingerprints["parquet"]) > 0
