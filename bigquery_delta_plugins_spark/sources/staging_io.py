"""Staging-directory IO in the reference's three wire formats.

The reference replicator writes each staged batch to one GCS directory
in a configurable wire format — Avro by default, JSON as the fallback
(MultiGCSWriter.java:99-148) — and the load job consumes whatever was
staged.  This module is the engine's equivalent surface: one directory
per batch (hive-style ``_batch_id=<b>``, the same layout Spark's
``partitionBy`` produces for parquet), each holding that batch's rows
in the chosen format:

- ``parquet`` — the engine-preferred columnar staging (fast path);
- ``avro``    — Avro Object Container files via the pure-Python
  spec-direct codec (:mod:`.avro_staging`), one file per partition;
- ``jsonl``   — newline-delimited JSON via the codegen'd expression
  codec (:mod:`.json_events`), read back FAILFAST (an apply job must
  never silently null a corrupt staged line).

Reads return the ordered ``[(batch_id, DataFrame), ...]`` list the
micro-batch loop consumes; each frame carries the full staged schema
including ``_batch_id``.  Batch enumeration is a directory listing —
no data job runs until a batch is applied.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import constants as C
from .avro_staging import read_staged_avro, write_staged_avro
from .json_events import parse_staged_json, staged_json_lines

FORMATS = ("parquet", "avro", "jsonl")


def _batch_dir(path: str, batch_id: int) -> str:
    return os.path.join(path, f"{C.BATCH_ID}={batch_id}")


def write_staged_events(ev: DataFrame, path: str, fmt: str = "parquet") -> dict:
    """Write a staged event frame as one directory per ``_batch_id`` in
    ``fmt``.  Parquet delegates to ``partitionBy`` (one job); the row
    formats persist the frame once and encode per batch (batch count is
    bounded by construction: events/batch_size directories)."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown staging format {fmt!r}; pick from {FORMATS}")
    if fmt == "parquet":
        ev.write.mode("overwrite").partitionBy(C.BATCH_ID).parquet(path)
        n_batches = len(
            [d for d in os.listdir(path) if d.startswith(f"{C.BATCH_ID}=")]
        )
        return {"format": fmt, "batches": n_batches}
    ev = ev.persist()
    try:
        batch_ids = sorted(
            r[0] for r in ev.select(C.BATCH_ID).distinct().collect()
        )
        os.makedirs(path, exist_ok=True)
        for b in batch_ids:
            bdf = ev.filter(F.col(C.BATCH_ID) == b)
            out = _batch_dir(path, b)
            if fmt == "avro":
                write_staged_avro(bdf, out)
            else:
                staged_json_lines(bdf).write.mode("overwrite").text(out)
        return {"format": fmt, "batches": len(batch_ids)}
    finally:
        ev.unpersist()


def read_staged_batches(
    spark: SparkSession, path: str, schema: T.StructType, fmt: str = "parquet"
) -> list[tuple[int, DataFrame]]:
    """Enumerate a staging directory into the ordered batch list the
    micro-batch loop replays.  Parquet reads the whole partitioned
    layout once and filters per batch (partition pruning makes each
    apply scan only its directory); the row formats build one lazy
    reader per batch directory."""
    if fmt not in FORMATS:
        raise ValueError(f"unknown staging format {fmt!r}; pick from {FORMATS}")
    if fmt == "parquet":
        ev = spark.read.parquet(path)
        batch_ids = sorted(
            r[0] for r in ev.select(C.BATCH_ID).distinct().collect()
        )
        return [(b, ev.filter(F.col(C.BATCH_ID) == b)) for b in batch_ids]
    prefix = f"{C.BATCH_ID}="
    batch_ids = sorted(
        int(d[len(prefix):])
        for d in os.listdir(path)
        if d.startswith(prefix)
    )
    out: list[tuple[int, DataFrame]] = []
    for b in batch_ids:
        bdir = _batch_dir(path, b)
        if fmt == "avro":
            df = read_staged_avro(spark, bdir, schema)
        else:
            df = parse_staged_json(
                spark.read.text(bdir), schema, mode="FAILFAST"
            )
        out.append((b, df))
    return out
