"""spark-submit entrypoint: run the CDC apply engine from the command
line, the way the reference plugin is driven by the Delta app
(BigQueryTarget.java:108-213 initialize/createConsumer).

Ship the package with ``--py-files`` (``spark-submit`` runs an
application FILE — the repo-root ``bdps_submit.py`` shim — not a
module) and point it at a staged-events directory::

    zip -r bdps.zip bigquery_delta_plugins_spark
    spark-submit --py-files bdps.zip bdps_submit.py \\
        gen    --events /data/staged --n-events 10000000 --n-urls 200000
    spark-submit --py-files bdps.zip bdps_submit.py \\
        apply  --events /data/staged --warehouse /lake --table web.pages
    spark-submit --py-files bdps.zip bdps_submit.py \\
        stream --events /data/staged --warehouse /lake --table web.pages
    spark-submit --py-files bdps.zip bdps_submit.py \\
        show   --warehouse /lake --table web.pages

``python -m bigquery_delta_plugins_spark`` remains equivalent for
local runs (tests/test_spark_submit.py proves the zip-only delivery
path end-to-end in a subprocess).

``apply`` replays the staged parquet batch-by-batch (``_batch_id``
partition order) through the exactly-once micro-batch loop; ``stream``
runs the Structured Streaming front-end with checkpoint resume; both
emit per-batch lineage JSONL under the checkpoint dir.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _session(args):
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.appName("bdps-cdc-apply")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    if args.master:
        b = b.master(args.master)
    return b.getOrCreate()


def _pages_schema():
    from pyspark.sql import types as T

    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), True),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("text", T.StringType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )


def _consumer(spark, args, schema, db, tb, pks):
    from .streaming.consumer import EventConsumer
    from .types import DDLEvent, DDLOp

    c = EventConsumer(
        spark,
        args.warehouse,
        num_buckets=args.num_buckets,
        soft_deletes=args.soft_deletes,
        row_transform=None if args.no_extract else _extract_transform(),
        single_job_per_batch=args.single_job,
        assume_unique_keys=args.assume_unique_keys,
    )
    # Bootstrap CREATE only when the table does not exist yet: a CLI rerun
    # over a table whose last run crashed inside the two-phase direct-load
    # window must NOT replay CREATE_TABLE — the O29 snapshot-abandon
    # cleanup would drop the whole half-loaded table while the checkpoint
    # commit log keeps earlier batches from re-applying (silent loss).
    # The O29 drop stays reserved for source-initiated snapshot restarts
    # arriving as CREATE_TABLE *events* in the stream.
    if not c.table_exists(db, tb):
        c.apply_ddl(
            DDLEvent(DDLOp.CREATE_TABLE, db, tb, schema=schema, primary_keys=pks)
        )
    return c


def _extract_transform():
    from .functions.extract import extract_text_transform

    return extract_text_transform


def _split_table(qualified: str) -> tuple[str, str]:
    if "." not in qualified:
        raise SystemExit(f"--table must be database.table, got {qualified!r}")
    db, tb = qualified.split(".", 1)
    return db, tb


def cmd_gen(args) -> int:
    from .sources.gen import synth_events
    from .sources.staging_io import write_staged_events

    spark = _session(args)
    ev = synth_events(
        spark, args.n_events, args.n_urls,
        batch_size=args.batch_size, pk_move_frac=args.pk_move_frac,
    )
    info = write_staged_events(ev, args.events, args.format)
    print(json.dumps({
        "events": args.events, "n_events": args.n_events, **info,
    }))
    return 0


def cmd_apply(args) -> int:
    from . import schemas
    from .sources.staging_io import read_staged_batches
    from .streaming.driver import run_microbatch_loop

    spark = _session(args)
    db, tb = _split_table(args.table)
    consumer = _consumer(spark, args, _pages_schema(), db, tb, ["url"])
    batches = read_staged_batches(
        spark, args.events, schemas.staging_schema(_pages_schema()),
        args.events_format,
    )
    metrics = run_microbatch_loop(
        consumer, batches, db, tb,
        args.checkpoint or os.path.join(args.warehouse, "_cp"),
        changes_dir=args.changes_dir,
    )
    applied = [m for m in metrics if not m["skipped"]]
    print(json.dumps({
        "applied_batches": len(applied),
        "skipped_batches": len(metrics) - len(applied),
        "final_rows": consumer.table(db, tb).read().count(),
    }))
    return 0


def cmd_stream(args) -> int:
    from . import schemas
    from .streaming.driver import run_structured_stream

    spark = _session(args)
    db, tb = _split_table(args.table)
    consumer = _consumer(spark, args, _pages_schema(), db, tb, ["url"])
    staging = schemas.staging_schema(_pages_schema())
    run_structured_stream(
        spark, args.events, staging, consumer, db, tb,
        args.checkpoint or os.path.join(args.warehouse, "_cp"),
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.continuous,
        changes_dir=args.changes_dir,
    )
    print(json.dumps({"final_rows": consumer.table(db, tb).read().count()}))
    return 0


def cmd_show(args) -> int:
    from .lake.table import LakeTable
    from .normalize import get_normalized_dataset_name, normalize_table_name

    spark = _session(args)
    db, tb = _split_table(args.table)
    path = os.path.join(
        args.warehouse, get_normalized_dataset_name(None, db), normalize_table_name(tb)
    )
    t = LakeTable.load(spark, path)
    snap = t.current_snapshot()
    print(json.dumps({
        "path": path,
        "snapshot_id": snap["snapshot_id"],
        "rows": t.read().count(),
        "files": len(snap["files"]),
        "summary": snap["summary"],
        "properties": snap["properties"],
    }))
    return 0


def cmd_changes(args) -> int:
    """CDC-out: print (or export) the changelog between two snapshots or
    of one applied batch — the lake-native change feed for downstream
    consumers (see lake/table.py:changes)."""
    from .lake.table import LakeTable
    from .normalize import get_normalized_dataset_name, normalize_table_name

    spark = _session(args)
    db, tb = _split_table(args.table)
    path = os.path.join(
        args.warehouse, get_normalized_dataset_name(None, db), normalize_table_name(tb)
    )
    t = LakeTable.load(spark, path)
    if args.batch is not None:
        df = t.changes_for_batch(args.batch)
    else:
        to = args.to_snapshot
        if to is None:
            to = t.current_snapshot()["snapshot_id"]
        df = t.changes(args.from_snapshot, to)
    if args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"out": args.out, "rows": df.count()}))
    else:
        for row in df.toLocalIterator():
            print(json.dumps(row.asDict(), default=str))
    return 0


def cmd_compact(args) -> int:
    """Maintenance: bin-pack crowded buckets (state-neutral), optionally
    vacuum superseded files afterwards."""
    from .lake.table import LakeTable
    from .normalize import get_normalized_dataset_name, normalize_table_name

    spark = _session(args)
    db, tb = _split_table(args.table)
    path = os.path.join(
        args.warehouse, get_normalized_dataset_name(None, db), normalize_table_name(tb)
    )
    t = LakeTable.load(spark, path)
    stats = t.compact(
        max_files_per_bucket=args.max_files_per_bucket,
        sort_columns=args.sort_by.split(",") if args.sort_by else None,
    )
    if args.vacuum:
        stats["vacuum"] = t.vacuum(keep_snapshots=args.keep_snapshots)
    print(json.dumps(stats))
    return 0


def cmd_rebucket(args) -> int:
    """Maintenance: partition evolution to a new bucket count
    (state-neutral; see lake/table.py:rebucket)."""
    from .lake.table import LakeTable
    from .normalize import get_normalized_dataset_name, normalize_table_name

    spark = _session(args)
    db, tb = _split_table(args.table)
    path = os.path.join(
        args.warehouse, get_normalized_dataset_name(None, db), normalize_table_name(tb)
    )
    print(json.dumps(LakeTable.load(spark, path).rebucket(args.num_buckets)))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="bigquery_delta_plugins_spark")
    p.add_argument("--master", default=None, help="Spark master (default: cluster-provided)")
    p.add_argument("--shuffle-partitions", type=int, default=200)
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="synthesize a staged CDC event stream")
    g.add_argument("--events", required=True)
    g.add_argument("--n-events", type=int, default=1_000_000)
    g.add_argument("--n-urls", type=int, default=50_000)
    g.add_argument("--batch-size", type=int, default=100_000)
    g.add_argument("--pk-move-frac", type=float, default=0.02)
    g.add_argument("--format", choices=("parquet", "avro", "jsonl"),
                   default="parquet",
                   help="staging wire format (reference default is avro; "
                   "parquet is this engine's columnar fast path)")
    g.set_defaults(fn=cmd_gen)

    for name, fn in (("apply", cmd_apply), ("stream", cmd_stream)):
        a = sub.add_parser(name, help=f"{name} staged events into the lake")
        a.add_argument("--events", required=True)
        a.add_argument("--warehouse", required=True)
        a.add_argument("--table", required=True, help="database.table")
        a.add_argument("--checkpoint", default=None)
        a.add_argument("--num-buckets", type=int, default=32)
        a.add_argument("--soft-deletes", action="store_true")
        a.add_argument("--no-extract", action="store_true",
                       help="skip the vectorized html->text transform")
        a.add_argument("--single-job", action="store_true",
                       help="single-Spark-job-per-batch apply mode")
        a.add_argument("--assume-unique-keys", action="store_true",
                       help="declare the source PK contract (at most one "
                       "live row per key) -> single-target-scan broadcast "
                       "merge; leave off for sources that may replay bare "
                       "INSERTs of existing keys")
        a.add_argument("--changes-dir", default=None,
                       help="eager per-batch CDC-out feed (parquet partitions)")
        if name == "apply":
            a.add_argument("--events-format",
                           choices=("parquet", "avro", "jsonl"),
                           default="parquet",
                           help="wire format of the staged events dir")
        if name == "stream":
            a.add_argument("--max-files-per-trigger", type=int, default=1)
            a.add_argument("--continuous", action="store_true",
                           help="processingTime trigger instead of availableNow")
        a.set_defaults(fn=fn)

    s = sub.add_parser("show", help="print table state summary")
    s.add_argument("--warehouse", required=True)
    s.add_argument("--table", required=True)
    s.set_defaults(fn=cmd_show)

    c = sub.add_parser("changes", help="changelog between snapshots / of a batch")
    c.add_argument("--warehouse", required=True)
    c.add_argument("--table", required=True)
    c.add_argument("--batch", type=int, default=None,
                   help="emit exactly one applied batch's changes")
    c.add_argument("--from-snapshot", type=int, default=0)
    c.add_argument("--to-snapshot", type=int, default=None,
                   help="default: current snapshot")
    c.add_argument("--out", default=None, help="write parquet instead of JSONL stdout")
    c.set_defaults(fn=cmd_changes)

    k = sub.add_parser("compact", help="bin-pack crowded buckets (state-neutral)")
    k.add_argument("--warehouse", required=True)
    k.add_argument("--table", required=True)
    k.add_argument("--max-files-per-bucket", type=int, default=1)
    k.add_argument("--sort-by", default=None,
                   help="comma-separated columns: cluster rows within files (ZORDER-style)")
    k.add_argument("--vacuum", action="store_true",
                   help="expire superseded snapshots/files afterwards")
    k.add_argument("--keep-snapshots", type=int, default=1)
    k.set_defaults(fn=cmd_compact)

    rb = sub.add_parser("rebucket", help="partition evolution: new bucket count")
    rb.add_argument("--warehouse", required=True)
    rb.add_argument("--table", required=True)
    rb.add_argument("--num-buckets", type=int, required=True)
    rb.set_defaults(fn=cmd_rebucket)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
