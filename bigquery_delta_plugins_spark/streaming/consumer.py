"""The event consumer: applies DML batches and DDL events to lake tables.

Spark-native re-expression of the reference's ``BigQueryEventConsumer``
lifecycle (applyDML :603-664, applyDDL :297-524, flush :670-729):

reference pipeline                     this engine
------------------------------------   -----------------------------------
buffer events to GCS Avro/JSON blobs   micro-batch DataFrame (lineage
                                       replaces the spill)
LOAD blob -> staging table             the batch IS the staging relation
diff query (self-join flatten)         operators.flatten (salted collapse
                                       + anti-join)
MERGE staging -> target (BQ job)       operators.merge + bucket-pruned
                                       copy-on-write snapshot commit
job-id probing for exactly-once        batch_id recorded in snapshot
                                       summary; replay is a no-op
commit offset after all tables merge   driver checkpoint after apply

Per-batch metrics and per-bucket lineage are returned (and appended to a
JSONL audit log by the driver) for resumability audits — the north
rule's lineage requirement.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import constants as C
from .. import schemas
from ..lake.table import LakeTable, bucket_expr
from ..normalize import (
    get_normalized_dataset_name,
    normalize_columns,
    normalize_table_name,
)
from ..operators.flatten import flatten_batch
from ..operators.merge import merge_apply
from ..types import DDLEvent, DDLOp, SourceProperties


class EventConsumer:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        *,
        source: SourceProperties | None = None,
        soft_deletes: bool = False,
        num_buckets: int = 32,
        salt_buckets: int = 16,
        normalize_names: bool = True,
        require_manual_drops: bool = False,
        count_diff_rows: bool = True,
        row_transform=None,
        broadcast_merge_max_rows: int = 2_000_000,
    ):
        self.spark = spark
        self.warehouse = warehouse
        self.source = source or SourceProperties()
        self.soft_deletes = soft_deletes
        self.num_buckets = num_buckets
        self.salt_buckets = salt_buckets
        self.normalize_names = normalize_names
        self.require_manual_drops = require_manual_drops
        self.count_diff_rows = count_diff_rows
        # Optional per-row column derivation (DataFrame -> DataFrame),
        # e.g. vectorized html->text extraction.  Contract: pure function
        # of the row that must not alter key/_op/_sequence_num columns.
        # It runs on the flatten SURVIVORS, not the raw batch — a hot
        # url's million updates collapse to one row before the (most
        # expensive) transform executes.
        self.row_transform = row_transform
        # Flattened diffs at or under this row count merge via the
        # zero-target-shuffle broadcast strategy (operators/merge.py);
        # larger diffs fall back to the full-outer shuffle merge.
        self.broadcast_merge_max_rows = broadcast_merge_max_rows
        os.makedirs(warehouse, exist_ok=True)

    # ------------------------------------------------------------------ paths

    def _table_path(self, database: str, table: str) -> str:
        db = get_normalized_dataset_name(None, database) if self.normalize_names else database
        tb = normalize_table_name(table) if self.normalize_names else table
        return os.path.join(self.warehouse, db, tb)

    def table(self, database: str, table: str) -> LakeTable:
        return LakeTable.load(self.spark, self._table_path(database, table))

    # ------------------------------------------------------------------- DDL

    def apply_ddl(self, event: DDLEvent) -> None:
        """DDL dispatch (BigQueryEventConsumer.java:297-524).  The driver
        must flush pending DML for the table first, as the reference does."""
        op = event.op
        if op == DDLOp.CREATE_DATABASE:
            os.makedirs(
                os.path.join(self.warehouse, get_normalized_dataset_name(None, event.database)),
                exist_ok=True,
            )
        elif op == DDLOp.DROP_DATABASE:
            if self.require_manual_drops:
                raise RuntimeError(
                    f"database {event.database} must be dropped manually "
                    "(requireManualDrops, BigQueryEventConsumer.java:374-388)"
                )
            import shutil

            shutil.rmtree(
                os.path.join(self.warehouse, get_normalized_dataset_name(None, event.database)),
                ignore_errors=True,
            )
        elif op == DDLOp.CREATE_TABLE:
            tschema = schemas.target_schema(
                event.schema,
                ordering=self.source.ordering,
                sort_key_types=self.source.sort_key_types or None,
            )
            if self.normalize_names:
                tschema = self._normalize_schema(tschema)
            LakeTable.create(
                self.spark,
                self._table_path(event.database, event.table),
                tschema,
                [self._norm_field(k) for k in event.primary_keys],
                num_buckets=self.num_buckets,
                ordering=self.source.ordering,
                if_not_exists=True,
            )
        elif op == DDLOp.DROP_TABLE:
            if self.require_manual_drops:
                raise RuntimeError(
                    f"table {event.table} must be dropped manually (requireManualDrops)"
                )
            path = self._table_path(event.database, event.table)
            if os.path.exists(path):
                LakeTable(self.spark, path).drop()
        elif op == DDLOp.TRUNCATE_TABLE:
            self.table(event.database, event.table).truncate()
        elif op == DDLOp.ALTER_TABLE:
            path = self._table_path(event.database, event.table)
            new_target = schemas.target_schema(
                event.schema,
                ordering=self.source.ordering,
                sort_key_types=self.source.sort_key_types or None,
            )
            if self.normalize_names:
                new_target = self._normalize_schema(new_target)
            if not os.path.exists(os.path.join(path, "_manifests", "_current")):
                # create-if-missing (BigQueryEventConsumer.java:462-470)
                LakeTable.create(
                    self.spark, path, new_target,
                    [self._norm_field(k) for k in event.primary_keys],
                    num_buckets=self.num_buckets, ordering=self.source.ordering,
                )
            else:
                LakeTable(self.spark, path).alter_add_columns(new_target)
        elif op == DDLOp.RENAME_TABLE:
            # explicitly unsupported, logged & skipped
            # (BigQueryEventConsumer.java:491-497)
            import logging

            logging.getLogger(__name__).warning(
                "RENAME_TABLE is not supported; ignoring rename of %s.%s",
                event.database, event.table,
            )

    def _norm_field(self, name: str) -> str:
        from ..normalize import normalize_field_name

        return normalize_field_name(name) if self.normalize_names else name

    def _normalize_schema(self, schema):
        from pyspark.sql import types as T

        from ..normalize import normalize_field_name

        fields = [
            T.StructField(
                normalize_field_name(f.name)
                if not f.name.startswith("_")
                else f.name,
                f.dataType,
                f.nullable,
            )
            for f in schema.fields
        ]
        return T.StructType(fields)

    # ------------------------------------------------------------------- DML

    def apply_batch(
        self, database: str, table_name: str, staged: DataFrame, batch_id: int
    ) -> dict:
        """Apply one table's staged micro-batch: replay-filter, flatten,
        merge, atomically commit.  Returns metrics/lineage for the batch."""
        t0 = time.monotonic()
        phases: dict[str, float] = {}

        def _mark(name: str, since: float) -> float:
            now = time.monotonic()
            phases[name] = round(now - since, 3)
            return now

        table = self.table(database, table_name)

        # exactly-once: a batch already in the snapshot summary is replay
        if batch_id <= table.latest_batch_id():
            return {
                "table": table.path, "batch_id": batch_id, "skipped": True,
                "reason": "batch_id already committed",
            }

        if self.normalize_names:
            staged = normalize_columns(staged)

        last_merged = table.latest_merged_seq()
        pks = table.primary_keys
        src = self.source

        # one pass over the batch: count, max seq, any-non-insert
        tp = time.monotonic()
        agg = staged.agg(
            F.count(F.lit(1)).alias("n"),
            F.min(C.SEQUENCE_NUM).alias("min_seq"),
            F.max(C.SEQUENCE_NUM).alias("max_seq"),
            F.sum((F.col(C.OPERATION) != C.OP_INSERT).cast("long")).alias("non_insert"),
            F.sum((F.col(C.SEQUENCE_NUM) <= F.lit(last_merged)).cast("long")).alias("replayed"),
        ).first()
        tp = _mark("preagg", tp)
        n_events = agg["n"] or 0
        max_seq = agg["max_seq"] or last_merged
        seq_range = [agg["min_seq"], agg["max_seq"]]
        if n_events == 0:
            return {"table": table.path, "batch_id": batch_id, "skipped": True,
                    "reason": "empty batch"}

        snapshot_only = (agg["non_insert"] or 0) == 0 and (agg["replayed"] or 0) == 0

        if snapshot_only and table.current_snapshot()["files"] == []:
            # direct snapshot load fast path (O5): first load of a table
            # from a pure-INSERT batch skips flatten+merge entirely
            if self.row_transform is not None:
                staged = self.row_transform(staged)
            rows = self._staged_to_target_rows(staged, table)
            snap = table.append(rows, batch_id, max_seq=max_seq)
            return self._metrics(
                table, batch_id, n_events, None, None, snap, t0,
                fast_path="snapshot_append", seq_range=seq_range,
            )

        diff = flatten_batch(
            staged,
            pks,
            row_id_supported=src.row_id_supported,
            ordering=src.ordering,
            sort_key_count=len(src.sort_key_types),
            batch_id=batch_id,
            latest_merged_seq=last_merged,
            salt_buckets=self.salt_buckets,
        )
        if self.row_transform is not None:
            diff = self.row_transform(diff)
        diff = diff.persist()
        try:
            n_diff = diff.count()  # materializes the cache; also picks
            # the merge strategy (broadcast when the diff is small)
            nb = table.num_buckets
            if src.row_id_supported:
                key_new = bucket_expr([C.ROW_ID], nb)
                old_side = diff.select(key_new.alias("b"))
            else:
                key_new = bucket_expr(pks, nb)
                before_cols = [C.BEFORE_PREFIX + k for k in pks]
                all_before_set = None
                for bc in before_cols:
                    p = F.col(bc).isNotNull()
                    all_before_set = p if all_before_set is None else all_before_set & p
                # xxhash64 skips NULL inputs, so hashing a null before-key
                # would fabricate a bucket — restrict to matchable rows.
                old_side = diff.filter(all_before_set).select(
                    bucket_expr(before_cols, nb).alias("b")
                )
            touched_rows = (
                diff.select(key_new.alias("b"))
                .unionAll(old_side)
                .distinct()
                .collect()
            )
            touched = {r["b"] for r in touched_rows}
            tp = _mark("flatten_touched", tp)

            per_bucket = None
            if self.count_diff_rows:
                per_bucket = {
                    r["b"]: r["n"]
                    for r in diff.groupBy(key_new.alias("b"))
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }

            target_part = table.read(buckets=touched)
            strategy = (
                "broadcast" if n_diff <= self.broadcast_merge_max_rows else "shuffle"
            )
            new_rows = merge_apply(
                target_part,
                diff,
                pks,
                row_id_supported=src.row_id_supported,
                ordering=src.ordering,
                soft_deletes=self.soft_deletes,
                sort_key_count=len(src.sort_key_types),
                strategy=strategy,
            )
            snap = table.overwrite_buckets(new_rows, touched, batch_id, max_seq)
            tp = _mark("merge_write", tp)
            return self._metrics(
                table, batch_id, n_events, per_bucket, touched, snap, t0,
                phases=phases, seq_range=seq_range,
                extra={"n_diff": n_diff, "merge_strategy": strategy},
            )
        finally:
            diff.unpersist()

    def _staged_to_target_rows(self, staged: DataFrame, table: LakeTable) -> DataFrame:
        tschema = table.schema
        cols = []
        staged_cols = set(staged.columns)
        for f in tschema.fields:
            if f.name in staged_cols:
                cols.append(F.col(f.name).alias(f.name))
            else:
                cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        return staged.select(*cols)

    def _metrics(self, table, batch_id, n_events, per_bucket, touched, snap, t0,
                 fast_path=None, phases=None, seq_range=None, extra=None) -> dict:
        wall = time.monotonic() - t0
        return {
            **(extra or {}),
            "phases": phases,
            "seq_range": seq_range,
            "table": table.path,
            "batch_id": batch_id,
            "skipped": snap is None,
            "n_events": n_events,
            "touched_buckets": sorted(touched) if touched else None,
            "diff_rows_per_bucket": per_bucket,
            "snapshot_id": snap["snapshot_id"] if snap else None,
            "latest_merged_seq": snap["summary"]["latest_merged_seq"] if snap else None,
            "wall_sec": round(wall, 4),
            "events_per_sec": round(n_events / wall, 1) if wall > 0 else None,
            "fast_path": fast_path,
        }
