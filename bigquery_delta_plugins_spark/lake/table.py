"""Iceberg-style lake tables: parquet data + JSON snapshot manifests.

The sandbox has no Iceberg runtime jar, so this module implements the
subset of Iceberg semantics the engine needs, with an Iceberg-shaped
interface so a real catalog can be swapped in:

- **Atomic commit**: each snapshot is a JSON manifest listing immutable
  parquet data files; a ``_current`` pointer file is swapped with
  ``os.replace`` (atomic on POSIX).  A crash mid-write leaves at most
  orphan data files, never a torn table.  This replaces the reference's
  deterministic-job-id + previous-attempt probing exactly-once machinery
  (BigQueryEventConsumer.java:1393-1422,1639-1642): replaying a batch
  whose ``batch_id`` is already recorded in the snapshot summary is a
  no-op.
- **Hash-bucket layout**: rows live in ``num_buckets`` buckets by
  ``xxhash64(primary key)`` — the Spark analogue of the reference's
  BigQuery clustering on primary keys (BigQueryEventConsumer.java:
  409-420).  MERGE only rewrites buckets the diff touches, so apply cost
  scales with change volume, not table size; at 10^10-row scale one sets
  ``num_buckets`` so a bucket is a few GB.
- **Schema evolution**: the manifest carries the table schema; readers
  apply it explicitly so old data files simply surface NULL for added
  columns (add-nullable-column and type-widen DDL, reference
  BigQueryEventConsumer.java:454-490).
- **Time travel**: every snapshot manifest is retained and readable.

Concurrency model: one writer (the streaming consumer) per table, many
readers — the same model as the reference's per-table serialized apply.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import constants as C

_MANIFEST_DIR = "_manifests"
_CURRENT = "_current"
_DATA_DIR = "data"


class CommitConflictError(RuntimeError):
    """Another writer committed the same snapshot id first (optimistic
    concurrency, like Iceberg's CommitFailedException).  The loser must
    re-read the table state and re-apply — for this engine's
    one-writer-per-table model it indicates a misconfigured deployment,
    not a retryable race."""


def parquet_files_max_long(paths: list[str], column: str) -> int | None:
    """Max of a long column across parquet files, from FOOTER statistics
    only — a driver-side metadata read, no Spark job.  Used by the
    single-job apply mode to resolve ``latest_merged_seq`` from the
    files the merge just wrote."""
    import pyarrow.parquet as pq

    mx = None
    for p in paths:
        md = pq.read_metadata(p)
        names = [md.schema.column(i).name for i in range(md.num_columns)]
        try:
            idx = names.index(column)
        except ValueError:
            continue
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            if st is None or not st.has_min_max:
                return None  # stats disabled — caller must fall back
            v = st.max
            mx = v if mx is None else max(mx, v)
    return mx


def bucket_expr(cols: list[str], num_buckets: int, prefix: str = ""):
    """Deterministic bucket id for a key; same function routes target
    rows and diff rows so co-location is stable across snapshots."""
    return F.pmod(F.xxhash64(*[F.col(prefix + c) for c in cols]), F.lit(num_buckets))


class LakeTable:
    # Pre-write exchange for merge commits (see _write_data_files).  ON
    # keeps exactly ~one file per bucket per commit; turning it OFF
    # (BDPS_WRITE_REPARTITION=0) drops a full payload shuffle per batch
    # and relies on the scan being bucket-aligned — only safe when
    # spark.sql.files.maxPartitionBytes >= the bucket file size, else
    # file counts compound across commits.
    WRITE_REPARTITION = os.environ.get("BDPS_WRITE_REPARTITION", "1") != "0"

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- catalog-ish lifecycle ------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        primary_keys: list[str],
        *,
        num_buckets: int = 32,
        ordering: str = C.ORDERED,
        properties: dict | None = None,
        if_not_exists: bool = False,
    ) -> "LakeTable":
        """CREATE TABLE (conflict-tolerant like the reference,
        BigQueryEventConsumer.java:389-429)."""
        t = cls(spark, path)
        if t.exists():
            if if_not_exists:
                return t
            raise FileExistsError(path)
        os.makedirs(os.path.join(path, _MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(path, _DATA_DIR), exist_ok=True)
        t._write_snapshot(
            parent=None,
            schema=schema,
            files=[],
            summary={"latest_batch_id": -1, "latest_merged_seq": 0},
            properties={
                "primary_keys": primary_keys,
                "num_buckets": num_buckets,
                "ordering": ordering,
                **(properties or {}),
            },
        )
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        if not t.exists():
            raise FileNotFoundError(path)
        return t

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, _MANIFEST_DIR, _CURRENT))

    def drop(self) -> None:
        """DROP TABLE (BigQueryEventConsumer.java:430-453)."""
        import shutil

        shutil.rmtree(self.path, ignore_errors=True)

    # -- snapshot bookkeeping -------------------------------------------------

    def current_snapshot(self) -> dict:
        cur = os.path.join(self.path, _MANIFEST_DIR, _CURRENT)
        with open(cur) as f:
            name = f.read().strip()
        with open(os.path.join(self.path, _MANIFEST_DIR, name)) as f:
            return json.load(f)

    def snapshot(self, snapshot_id: int) -> dict:
        with open(
            os.path.join(self.path, _MANIFEST_DIR, f"snap-{snapshot_id:08d}.json")
        ) as f:
            return json.load(f)

    def _write_snapshot(self, parent, schema, files, summary, properties) -> dict:
        sid = 0 if parent is None else parent["snapshot_id"] + 1
        snap = {
            "snapshot_id": sid,
            "parent_id": None if parent is None else parent["snapshot_id"],
            "schema": json.loads(schema.json()) if isinstance(schema, T.StructType) else schema,
            "files": files,
            "summary": summary,
            "properties": properties,
        }
        mdir = os.path.join(self.path, _MANIFEST_DIR)
        name = f"snap-{sid:08d}.json"
        tmp = os.path.join(mdir, f".{name}.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(snap, f)
            f.flush()
            os.fsync(f.fileno())
        # Optimistic concurrency (Iceberg-style CAS): the snapshot id is
        # claimed by an ATOMIC link of the fully-written temp manifest —
        # a concurrent committer racing from the same parent loses with
        # CommitConflictError instead of silently clobbering history.
        # (A crash mid-write only ever leaves the .tmp; the final name
        # appears complete or not at all.)
        #
        # Conflict detection is BEST-EFFORT, not Iceberg-equivalent CAS:
        # there is a TOCTOU window where the loser's link fails while the
        # winner has linked its manifest but not yet swapped the pointer
        # — ``cur_sid`` then still reads the parent and the loser adopts
        # (os.replace) the slot.  The engine's deployment contract is ONE
        # writer per table (module docstring); the CAS exists to turn a
        # *misconfigured* second writer into a loud error in the common
        # interleavings, not to serialize concurrent writers.  A real
        # catalog (Iceberg/Hive/REST) supplies true CAS when swapped in.
        try:
            os.link(tmp, os.path.join(mdir, name))
        except FileExistsError:
            # Either a concurrent committer won (its snapshot became
            # current — true conflict), or a previous attempt of THIS
            # commit crashed after the link but before the pointer swap
            # (file exists, pointer still on the parent) — adopt it.
            try:
                cur_sid = self.current_snapshot()["snapshot_id"]
            except FileNotFoundError:
                # racing CREATEs before any pointer exists: adopt —
                # CREATE is conflict-tolerant like the reference's
                # (BigQueryEventConsumer.java:389-429)
                cur_sid = -1
            if cur_sid >= sid:
                os.remove(tmp)
                raise CommitConflictError(
                    f"snapshot {sid} of {self.path} was committed "
                    f"concurrently (parent {snap['parent_id']}); re-read "
                    "and retry"
                ) from None
            os.replace(tmp, os.path.join(mdir, name))
        else:
            os.remove(tmp)
        # atomic pointer swap — THE commit point
        ptmp = os.path.join(mdir, f".{_CURRENT}.{uuid.uuid4().hex}.tmp")
        with open(ptmp, "w") as f:
            f.write(name)
            f.flush()
            os.fsync(f.fileno())
        os.replace(ptmp, os.path.join(mdir, _CURRENT))
        return snap

    # -- properties -----------------------------------------------------------

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.current_snapshot()["schema"])

    @property
    def primary_keys(self) -> list[str]:
        return self.current_snapshot()["properties"]["primary_keys"]

    @property
    def num_buckets(self) -> int:
        return self.current_snapshot()["properties"]["num_buckets"]

    def latest_batch_id(self) -> int:
        return self.current_snapshot()["summary"].get("latest_batch_id", -1)

    def latest_merged_seq(self) -> int:
        return self.current_snapshot()["summary"].get("latest_merged_seq", 0)

    # -- read -----------------------------------------------------------------

    def read(self, snapshot_id: int | None = None, buckets: set[int] | None = None) -> DataFrame:
        """Current (or time-travel) state; optionally pruned to buckets.

        The explicit schema makes files written before an ALTER surface
        NULL for added columns — reader-side schema evolution.
        """
        snap = self.current_snapshot() if snapshot_id is None else self.snapshot(snapshot_id)
        schema = T.StructType.fromJson(snap["schema"])
        files = [
            os.path.join(self.path, f["path"])
            for f in snap["files"]
            if buckets is None or f["bucket"] in buckets
        ]
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*files)

    # -- write ----------------------------------------------------------------

    def _write_data_files(
        self, df: DataFrame, schema: T.StructType, repartition: bool = True,
        sort_columns: list[str] | None = None,
    ) -> list[dict]:
        """Write rows into bucket-partitioned parquet files; returns
        manifest entries.  Rows are routed by xxhash64(pk) % num_buckets
        and each bucket lands in its own directory partition.

        ``repartition=False`` skips the pre-write exchange: each input
        task writes its own rows per bucket directly.  The merge path
        uses this — its input partitioning is already bucket-aligned
        (the target scan reads per-bucket files and the broadcast join
        is narrow), so the repartition would re-shuffle every payload
        byte of every touched bucket per batch for nothing.  Bulk
        appends keep the exchange so a snapshot load lands as one file
        per bucket."""
        snap = self.current_snapshot()
        pks = snap["properties"]["primary_keys"]
        nb = snap["properties"]["num_buckets"]
        out_rel = os.path.join(_DATA_DIR, f"w-{uuid.uuid4().hex}")
        out_abs = os.path.join(self.path, out_rel)
        cols = [f.name for f in schema.fields]
        bucketed = df.select(*cols).withColumn("__bucket", bucket_expr(pks, nb))
        if repartition:
            bucketed = bucketed.repartition(F.col("__bucket"))
        if sort_columns:
            # cluster rows within each bucket file so parquet row-group
            # min/max stats prune point lookups (OPTIMIZE ... ZORDER
            # analogue for a single sort axis)
            bucketed = bucketed.sortWithinPartitions("__bucket", *sort_columns)
        bucketed.write.partitionBy("__bucket").parquet(out_abs)
        entries = []
        for root, _dirs, names in os.walk(out_abs):
            for n in names:
                if n.endswith(".parquet"):
                    b = int(os.path.basename(root).split("=", 1)[1])
                    entries.append(
                        {
                            "path": os.path.relpath(os.path.join(root, n), self.path),
                            "bucket": b,
                        }
                    )
        return entries

    def direct_load_in_progress(self) -> int | None:
        """Batch id of a half-finished direct load, if any — the analogue
        of the reference's ``bigquery-direct-load-in-progress`` state flag
        (BigQueryEventConsumer.java:167,392-399)."""
        return self.current_snapshot()["summary"].get("direct_load_in_progress")

    def append(
        self,
        df: DataFrame,
        batch_id: int,
        max_seq: int | None = None,
        advance_batch: bool = True,
    ) -> dict | None:
        """Direct snapshot load — the reference's snapshot-only fast path
        that skips staging+merge (directLoadToTarget,
        BigQueryEventConsumer.java:697-753).  Idempotent per batch_id.

        ``advance_batch=False`` is the mixed-batch two-phase form: the
        snapshot portion lands and ``latest_merged_seq`` advances (so a
        crash-replay's barrier drops the already-loaded events, the
        reference's O26 semantics) but ``latest_batch_id`` is only
        advanced by the batch's FINAL commit (merge or noop); a
        ``direct_load_in_progress`` flag marks the window in between —
        CREATE_TABLE replay over that flag drops the half-loaded table
        (O29, BigQueryEventConsumer.java:392-399)."""
        snap = self.current_snapshot()
        if batch_id <= snap["summary"].get("latest_batch_id", -1):
            return None
        schema = T.StructType.fromJson(snap["schema"])
        new_files = self._write_data_files(df, schema)
        summary = dict(snap["summary"])
        if advance_batch:
            summary["latest_batch_id"] = batch_id
            summary.pop("direct_load_in_progress", None)
        else:
            summary["direct_load_in_progress"] = batch_id
        if max_seq is not None:
            summary["latest_merged_seq"] = max(summary.get("latest_merged_seq", 0), max_seq)
        return self._write_snapshot(
            snap, snap["schema"], snap["files"] + new_files, summary, snap["properties"]
        )

    def commit_noop(self, batch_id: int, max_seq: int | None = None) -> dict | None:
        """Advance batch/sequence bookkeeping without touching data —
        the final commit for a batch whose merge had nothing to do
        (fully replayed, or snapshot-only after a two-phase append)."""
        snap = self.current_snapshot()
        if batch_id <= snap["summary"].get("latest_batch_id", -1):
            return None
        summary = dict(snap["summary"])
        summary["latest_batch_id"] = batch_id
        summary.pop("direct_load_in_progress", None)
        if max_seq is not None:
            summary["latest_merged_seq"] = max(summary.get("latest_merged_seq", 0), max_seq)
        return self._write_snapshot(
            snap, snap["schema"], snap["files"], summary, snap["properties"]
        )

    def overwrite_buckets(
        self,
        new_rows: DataFrame,
        touched: set[int],
        batch_id: int,
        max_seq: int,
    ) -> dict | None:
        """Copy-on-write commit: replace the files of ``touched`` buckets
        with ``new_rows`` (which must contain exactly the new content of
        those buckets); all other buckets' files carry over untouched."""
        snap = self.current_snapshot()
        if batch_id <= snap["summary"].get("latest_batch_id", -1):
            return None
        schema = T.StructType.fromJson(snap["schema"])
        # Default: one bounded exchange per commit so the file count
        # stays ~one per bucket.  (Measured: skipping it naively lets
        # the union's insert side fan 300 input partitions x 32 buckets
        # into thousands of files at table birth, and the per-batch wall
        # COMPOUNDS as every later scan re-groups them: 43s -> 100s ->
        # 315s per 4M-event batch at local[2].  The exchange is parallel
        # work that scales with cores; runaway file counts are serial
        # poison.  WRITE_REPARTITION=0 is the measured-safe escape hatch
        # for bucket-aligned scans — see the class attribute.)
        new_files = self._write_data_files(
            new_rows, schema, repartition=self.WRITE_REPARTITION
        )
        return self.commit_overwrite(new_files, touched, batch_id, max_seq)

    def commit_overwrite(
        self, new_files: list[dict], touched: set[int], batch_id: int, max_seq: int
    ) -> dict | None:
        """Manifest-only half of a copy-on-write commit — lets a caller
        run the data-file write job first and resolve ``max_seq`` from
        metrics observed DURING that job (the single-job apply mode)."""
        snap = self.current_snapshot()
        if batch_id <= snap["summary"].get("latest_batch_id", -1):
            return None
        kept = [f for f in snap["files"] if f["bucket"] not in touched]
        summary = dict(snap["summary"])
        summary["latest_batch_id"] = batch_id
        summary.pop("direct_load_in_progress", None)
        summary["latest_merged_seq"] = max(summary.get("latest_merged_seq", 0), max_seq)
        return self._write_snapshot(
            snap, snap["schema"], kept + new_files, summary, snap["properties"]
        )

    def changes(self, from_snapshot_id: int, to_snapshot_id: int) -> DataFrame:
        """Changelog scan: net row-level delta between two snapshots
        (``insert`` / ``update`` / ``delete`` per primary key), the
        lake-native analogue of Delta CDF / Iceberg changelog reads.

        Scale shape — **manifest-level pruning before any I/O**: commits
        are copy-on-write per bucket, so a bucket whose file list is
        byte-identical across the two manifests cannot contain a change
        and is excluded from both scans.  A batch touching 3 of 1024
        buckets reads 2x3 bucket file sets, not the table.  Within the
        changed buckets the diff is one PK full-outer join
        (:func:`~..operators.changes.changelog_diff`); unchanged keys in
        rewritten buckets are dropped by the codegen'd filter.
        """
        from ..operators.changes import changelog_diff

        old_snap = self.snapshot(from_snapshot_id)
        new_snap = self.snapshot(to_snapshot_id)

        def by_bucket(snap: dict) -> dict[int, frozenset]:
            out: dict[int, set] = {}
            for f in snap["files"]:
                out.setdefault(f["bucket"], set()).add(f["path"])
            return {b: frozenset(s) for b, s in out.items()}

        ob, nb = by_bucket(old_snap), by_bucket(new_snap)
        changed = {b for b in set(ob) | set(nb) if ob.get(b) != nb.get(b)}
        pks = self.primary_keys
        old_df = self.read(snapshot_id=from_snapshot_id, buckets=changed)
        new_df = self.read(snapshot_id=to_snapshot_id, buckets=changed)
        return changelog_diff(old_df, new_df, pks).withColumns(
            {
                "_from_snapshot_id": F.lit(from_snapshot_id),
                "_to_snapshot_id": F.lit(to_snapshot_id),
            }
        )

    def snapshot_for_batch(self, batch_id: int) -> dict | None:
        """The FINAL commit of ``batch_id`` (two-phase batches also have
        an intermediate direct-load snapshot; that one never advances
        ``latest_batch_id``, so it is skipped here).

        Maintenance commits (compact / rebucket / truncate / ALTER) copy
        the summary unchanged, so after e.g. ``compact()`` the MOST
        RECENT snapshot carrying this ``latest_batch_id`` is the
        compaction, not the batch's real final commit — diffing against
        it would attribute the maintenance rewrite (or nothing at all)
        to the batch.  We therefore walk to the DEEPEST snapshot with
        this batch id: the batch's own commit is the first snapshot that
        ever carried it."""
        snap = self.current_snapshot()
        while snap is not None:
            lb = snap["summary"].get("latest_batch_id", -1)
            if lb == batch_id and (
                snap["summary"].get("direct_load_in_progress") is None
            ):
                while snap["parent_id"] is not None:
                    parent = self.snapshot(snap["parent_id"])
                    if parent["summary"].get("latest_batch_id", -1) == batch_id and (
                        parent["summary"].get("direct_load_in_progress") is None
                    ):
                        snap = parent  # shadowing maintenance commit above
                    else:
                        break
                return snap
            if lb < batch_id:
                return None
            snap = (
                self.snapshot(snap["parent_id"])
                if snap["parent_id"] is not None
                else None
            )
        return None

    def changes_for_batch(self, batch_id: int) -> DataFrame:
        """Per-batch CDC-out feed: the changelog of exactly one applied
        micro-batch — ``changes(<state before the batch>, <the batch's
        final commit>)``.  A two-phase snapshot-split batch (O5) counts
        its intermediate direct-load snapshot as part of the batch, so
        the feed spans both phases.  Raises KeyError if the batch's
        manifests were vacuumed or the batch was never applied (a
        vacuumed parent manifest surfaces as FileNotFoundError from the
        snapshot walk; it is normalized to KeyError here so callers have
        ONE not-available signal, as the eager-feed backfill relies on)."""
        try:
            to_snap = self.snapshot_for_batch(batch_id)
            if to_snap is None or to_snap["parent_id"] is None:
                raise KeyError(f"batch {batch_id} has no committed snapshot")
            # walk past intermediate snapshots belonging to this same batch
            # (the direct-load phase) to the last pre-batch state
            frm = self.snapshot(to_snap["parent_id"])
            while frm["summary"].get("direct_load_in_progress") == batch_id:
                frm = self.snapshot(frm["parent_id"])
            return self.changes(frm["snapshot_id"], to_snap["snapshot_id"])
        except FileNotFoundError as e:
            raise KeyError(
                f"batch {batch_id}: snapshot manifests expired (vacuumed): {e}"
            ) from e

    # -- DDL ------------------------------------------------------------------

    def alter_add_columns(
        self, new_schema: T.StructType, properties: dict | None = None
    ) -> dict:
        """ALTER TABLE: adopt a new schema (add nullable column / widen);
        existing data files stay as-is and surface NULL for new columns
        (BigQueryEventConsumer.java:454-490).  ``properties`` overlays
        table properties in the same snapshot (used by the late sort-key
        upgrade to persist the sort-key types atomically with the column
        add, the reference's putState at BigQueryEventConsumer.java:
        1605-1613)."""
        snap = self.current_snapshot()
        if properties:
            snap = dict(snap)
            snap["properties"] = {**snap["properties"], **properties}
        old_names = {f["name"] for f in snap["schema"]["fields"]}
        merged_fields = list(snap["schema"]["fields"])
        for f in json.loads(new_schema.json())["fields"]:
            if f["name"] not in old_names:
                f = dict(f)
                f["nullable"] = True  # evolution only adds nullable columns
                merged_fields.append(f)
            else:
                # type widen: adopt the new type in place
                for i, existing in enumerate(merged_fields):
                    if existing["name"] == f["name"] and existing["type"] != f["type"]:
                        merged_fields[i] = {**existing, "type": f["type"]}
        new = {"type": "struct", "fields": merged_fields}
        return self._write_snapshot(
            snap, new, snap["files"], snap["summary"], snap["properties"]
        )

    def history(self) -> DataFrame:
        """Metadata table (Iceberg ``<table>.history``/``snapshots``
        analogue): one row per retained snapshot — id, parent, batch and
        sequence bookkeeping, file count.  Driver-side manifest reads
        only; no data files touched."""
        rows = []
        mdir = os.path.join(self.path, _MANIFEST_DIR)
        for n in sorted(os.listdir(mdir)):
            if not n.startswith("snap-"):
                continue
            s = self.snapshot(int(n[len("snap-"):-len(".json")]))
            rows.append(
                (
                    s["snapshot_id"],
                    s["parent_id"],
                    s["summary"].get("latest_batch_id", -1),
                    s["summary"].get("latest_merged_seq", 0),
                    s["summary"].get("direct_load_in_progress"),
                    len(s["files"]),
                )
            )
        return self.spark.createDataFrame(
            rows,
            "snapshot_id long, parent_id long, latest_batch_id long, "
            "latest_merged_seq long, direct_load_in_progress long, n_files long",
        )

    def files(self, snapshot_id: int | None = None) -> DataFrame:
        """Metadata table (Iceberg ``<table>.files`` analogue): the data
        files of a snapshot with bucket and on-disk size."""
        snap = (
            self.current_snapshot() if snapshot_id is None
            else self.snapshot(snapshot_id)
        )
        rows = []
        for f in snap["files"]:
            p = os.path.join(self.path, f["path"])
            rows.append(
                (snap["snapshot_id"], f["path"], f["bucket"],
                 os.path.getsize(p) if os.path.exists(p) else None)
            )
        return self.spark.createDataFrame(
            rows, "snapshot_id long, path string, bucket int, size_bytes long"
        )

    def compact(self, max_files_per_bucket: int = 1,
                sort_columns: list[str] | None = None) -> dict:
        """Bin-pack small files: rewrite every bucket holding more than
        ``max_files_per_bucket`` files into one file per bucket, in a
        state-neutral snapshot commit (same rows, same summary — batch
        bookkeeping untouched, so exactly-once replay is unaffected).

        A CDC lake accretes files: each merge commit rewrites touched
        buckets but appends/direct-loads can land extra files, and scan
        cost compounds with file count (measured in BENCH/BASELINE.md:
        43s -> 315s per batch when file counts run away).  Compaction is
        the steady-state antidote — the analogue of Iceberg's
        rewrite_data_files.  Old files stay referenced by older
        snapshots (time travel intact) until vacuum() expires them.
        """
        snap = self.current_snapshot()
        by_bucket: dict[int, list] = {}
        for f in snap["files"]:
            by_bucket.setdefault(f["bucket"], []).append(f)
        crowded = {
            b for b, fs in by_bucket.items() if len(fs) > max_files_per_bucket
        }
        if sort_columns:
            crowded = set(by_bucket)  # clustering rewrites every bucket
        if not crowded:
            return {"buckets_compacted": 0, "files_before": len(snap["files"]),
                    "files_after": len(snap["files"]), "snapshot_id": snap["snapshot_id"]}
        schema = T.StructType.fromJson(snap["schema"])
        rows = self.read(snapshot_id=snap["snapshot_id"], buckets=crowded)
        new_files = self._write_data_files(
            rows, schema, repartition=True, sort_columns=sort_columns
        )
        kept = [f for f in snap["files"] if f["bucket"] not in crowded]
        new_snap = self._write_snapshot(
            snap, snap["schema"], kept + new_files, dict(snap["summary"]),
            snap["properties"],
        )
        return {
            "buckets_compacted": len(crowded),
            "files_before": len(snap["files"]),
            "files_after": len(new_snap["files"]),
            "snapshot_id": new_snap["snapshot_id"],
        }

    def rebucket(self, new_num_buckets: int) -> dict:
        """Partition evolution (Iceberg ``REPLACE PARTITION FIELD``
        analogue): rewrite the table under a new bucket count in one
        state-neutral snapshot commit — the lever for a table that
        outgrew its layout (a 32-bucket table at 100x the data has
        multi-GB buckets; co-located merges and bucket pruning both
        degrade).  Batch/seq bookkeeping is untouched, so exactly-once
        replay and the seq barrier survive the change; subsequent
        merges read ``num_buckets`` from table properties and route by
        the new layout automatically.  Changelog reads across the
        rebucket commit remain correct (every bucket's file set
        changes, so the manifest diff prunes nothing — and the keyed
        diff then finds zero changed rows)."""
        if new_num_buckets < 1:
            raise ValueError(new_num_buckets)
        snap = self.current_snapshot()
        if new_num_buckets == snap["properties"]["num_buckets"]:
            return {"rebucketed": False,
                    "num_buckets": new_num_buckets,
                    "snapshot_id": snap["snapshot_id"]}
        schema = T.StructType.fromJson(snap["schema"])
        rows = self.read(snapshot_id=snap["snapshot_id"])
        props = {**snap["properties"], "num_buckets": new_num_buckets}
        # _write_data_files routes by the CURRENT snapshot's bucket
        # count, so commit the property change through a staged snapshot
        # object: write files under the new count explicitly here.
        pks = snap["properties"]["primary_keys"]
        out_rel = os.path.join(_DATA_DIR, f"w-{uuid.uuid4().hex}")
        out_abs = os.path.join(self.path, out_rel)
        cols = [f.name for f in schema.fields]
        bucketed = rows.select(*cols).withColumn(
            "__bucket", bucket_expr(pks, new_num_buckets)
        ).repartition(F.col("__bucket"))
        bucketed.write.partitionBy("__bucket").parquet(out_abs)
        entries = []
        for root, _dirs, names in os.walk(out_abs):
            for n in names:
                if n.endswith(".parquet"):
                    b = int(os.path.basename(root).split("=", 1)[1])
                    entries.append({
                        "path": os.path.relpath(os.path.join(root, n), self.path),
                        "bucket": b,
                    })
        new_snap = self._write_snapshot(
            snap, snap["schema"], entries, dict(snap["summary"]), props
        )
        return {"rebucketed": True, "num_buckets": new_num_buckets,
                "n_files": len(entries),
                "snapshot_id": new_snap["snapshot_id"]}

    def vacuum(self, keep_snapshots: int = 1) -> dict:
        """Garbage-collect data files not referenced by the most recent
        ``keep_snapshots`` manifests, and drop older manifests.  Crashed
        write jobs leave orphan files (never a torn table — the manifest
        is the source of truth); vacuum reclaims them.  Returns counts.

        Safe with concurrent READERS of retained snapshots only — like
        Iceberg's ``expire_snapshots``, time travel beyond the retained
        window is gone afterwards."""
        keep_snapshots = max(1, keep_snapshots)
        cur = self.current_snapshot()
        keep, snap = [cur], cur
        while len(keep) < keep_snapshots and snap["parent_id"] is not None:
            snap = self.snapshot(snap["parent_id"])
            keep.append(snap)
        referenced = {f["path"] for s in keep for f in s["files"]}
        keep_ids = {s["snapshot_id"] for s in keep}

        removed_files = 0
        data_root = os.path.join(self.path, _DATA_DIR)
        for root, _dirs, names in os.walk(data_root):
            for n in names:
                p = os.path.join(root, n)
                rel = os.path.relpath(p, self.path)
                if n.endswith(".parquet") and rel not in referenced:
                    os.remove(p)
                    removed_files += 1
        removed_manifests = 0
        mdir = os.path.join(self.path, _MANIFEST_DIR)
        for n in os.listdir(mdir):
            if not n.startswith("snap-"):
                continue
            sid = int(n[len("snap-"):-len(".json")])
            if sid not in keep_ids:
                os.remove(os.path.join(mdir, n))
                removed_manifests += 1
        return {"removed_files": removed_files, "removed_manifests": removed_manifests}

    def truncate(self) -> dict:
        """TRUNCATE = drop data, keep definition
        (BigQueryEventConsumer.java:498-524)."""
        snap = self.current_snapshot()
        return self._write_snapshot(
            snap, snap["schema"], [], dict(snap["summary"]), snap["properties"]
        )
