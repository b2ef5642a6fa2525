"""Changelog reads: the net row-level delta between two table states.

The reference plugin is write-only — it lands a binlog into BigQuery and
downstream consumers re-scan the table.  A lake-native engine can do
better: because every commit is an immutable snapshot (lake/table.py),
the delta between any two snapshots is itself a queryable relation — the
same incremental-consumption model as Delta Lake's Change Data Feed or
an Iceberg changelog scan.  This module computes it from first
principles, with no per-row state kept at write time:

- :func:`changelog_diff` — pure DataFrame diff of two states keyed on
  the primary key, classifying each changed key as ``insert`` /
  ``update`` / ``delete``.  One shuffle (the PK full-outer join);
  unchanged keys are dropped by a codegen'd filter, never materialized.
- :meth:`LakeTable.changes <..lake.table.LakeTable.changes>` wraps it
  with **manifest-level pruning**: copy-on-write commits rewrite only
  touched buckets, so any bucket whose file list is identical between
  the two snapshots provably contains no change and is never scanned.

Change semantics (net, from-state -> to-state):

============================  =============  =========================
condition                      _change_type   image emitted
============================  =============  =========================
key only in new, live          insert         postimage
key only in new, tombstone     delete         postimage (tombstone)
key only in old                delete         preimage (hard-delete)
both, tombstone gained         delete         postimage (tombstone)
both, tombstone cleared        insert         postimage (re-insert)
both, _sequence_num advanced   update         postimage
both, identical                (filtered)     —
============================  =============  =========================

"Tombstone" means ``_is_deleted IS TRUE`` (soft-delete mode, O30); in
hard-delete mode rows physically disappear and only the third arm
fires.  NOTE for consumers: even in soft-delete mode a ``delete`` row
can be a PHYSICAL removal — the merge's PK-move arm drops the old key
outright (the reference's UPDATE arm replaces the row under the new
key, BigQueryEventConsumer.java:1331-1359) — so replay logic must
branch on the row image, not the mode: ``_is_deleted IS TRUE`` means
upsert-the-tombstone, anything else means remove-the-key (found by the
hypothesis property in tests/test_changes.py).  The classification is deliberately expressible in ANSI SQL so
the driver oracle (``__spark_entry__.oracle_sql()['cdc_table_changes']``)
can replay it verbatim in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import constants as C

CHANGE_TYPE = "_change_type"


def changelog_diff(
    old: DataFrame, new: DataFrame, primary_keys: list[str]
) -> DataFrame:
    """Net row-level changes turning state ``old`` into state ``new``.

    Both inputs are table states (one live row per key — the invariant
    every valid binlog maintains; pathological streams of repeated bare
    INSERTs can create duplicate-key states via the reference's
    NOT-MATCHED arm, and the changelog is undefined over those) carrying
    ``_sequence_num`` and optionally ``_is_deleted``.  Output has the
    union of data columns plus ``_change_type``; unchanged keys are
    filtered out before any downstream exchange.

    Scale shape: a single PK-keyed full-outer ``SortMergeJoin`` (or
    broadcast, if one side is small and Catalyst/AQE so decides) — the
    minimum possible for a keyed diff — followed by a whole-stage-
    codegen'd CASE projection.  Payload columns ride through exactly
    one shuffle each.
    """
    def tomb(side: DataFrame, prefix: str):
        if C.IS_DELETED in side.columns:
            return F.col(f"{prefix}.{C.IS_DELETED}").eqNullSafe(F.lit(True))
        return F.lit(False)

    o = old.alias("o")
    n = new.alias("n")
    cond = None
    for k in primary_keys:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}"))
        cond = c if cond is None else cond & c
    j = o.join(n, cond, "full_outer")

    in_old = F.col(f"o.{C.SEQUENCE_NUM}").isNotNull()
    in_new = F.col(f"n.{C.SEQUENCE_NUM}").isNotNull()
    old_tomb = tomb(old, "o")
    new_tomb = tomb(new, "n")

    ctype = (
        F.when(~in_old & in_new & ~new_tomb, F.lit("insert"))
        .when(~in_old & in_new & new_tomb, F.lit("delete"))
        .when(in_old & ~in_new, F.lit("delete"))
        .when(in_old & in_new & new_tomb & ~old_tomb, F.lit("delete"))
        .when(in_old & in_new & ~new_tomb & old_tomb, F.lit("insert"))
        .when(
            in_old
            & in_new
            & (F.col(f"n.{C.SEQUENCE_NUM}") != F.col(f"o.{C.SEQUENCE_NUM}")),
            F.lit("update"),
        )
    )

    # image: postimage when the key survives in `new`, preimage for
    # hard deletes (the only case with no new-side row)
    cols = []
    new_cols = set(new.columns)
    old_cols = set(old.columns)
    for name in list(dict.fromkeys([*new.columns, *old.columns])):
        if name in new_cols and name in old_cols:
            cols.append(
                F.when(in_new, F.col(f"n.{name}"))
                .otherwise(F.col(f"o.{name}"))
                .alias(name)
            )
        elif name in new_cols:
            cols.append(F.col(f"n.{name}").alias(name))
        else:
            cols.append(F.col(f"o.{name}").alias(name))

    out = j.select(*cols, ctype.alias(CHANGE_TYPE))
    return out.filter(F.col(CHANGE_TYPE).isNotNull())
