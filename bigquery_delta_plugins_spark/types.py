"""Event model: DDL events and source configuration.

DML change events travel as DataFrame rows in the staging shape
(schemas.staging_schema) — the engine never materializes per-event
Python objects on the hot path (north-rule: no per-row Python).  DDL
events are rare control-plane objects, so plain dataclasses mirror the
reference's DDLEvent (applyDDL, BigQueryEventConsumer.java:297-524).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import types as T


class DDLOp(Enum):
    CREATE_DATABASE = "CREATE_DATABASE"
    DROP_DATABASE = "DROP_DATABASE"
    CREATE_TABLE = "CREATE_TABLE"
    DROP_TABLE = "DROP_TABLE"
    TRUNCATE_TABLE = "TRUNCATE_TABLE"
    ALTER_TABLE = "ALTER_TABLE"
    RENAME_TABLE = "RENAME_TABLE"


@dataclass
class DDLEvent:
    op: DDLOp
    database: str
    table: str | None = None
    schema: T.StructType | None = None  # full new schema, event-carried
    primary_keys: list[str] = field(default_factory=list)
    sequence_num: int = 0


def ddl_event_to_json(ev: DDLEvent) -> str:
    """Serialize a DDLEvent for the inline-DDL wire format (the
    ``constants.DDL_PAYLOAD`` column of a streamed event row).  Schemas
    ride as Spark's own StructType JSON so the payload is
    engine-portable; key order is sorted for byte-stable fixtures."""
    import json

    return json.dumps(
        {
            "op": ev.op.value,
            "database": ev.database,
            "table": ev.table,
            "schema": ev.schema.json() if ev.schema is not None else None,
            "primary_keys": list(ev.primary_keys),
            "sequence_num": ev.sequence_num,
        },
        sort_keys=True,
    )


def ddl_event_from_json(payload: str) -> DDLEvent:
    """Inverse of :func:`ddl_event_to_json`."""
    import json

    d = json.loads(payload)
    schema = (
        T.StructType.fromJson(json.loads(d["schema"]))
        if d.get("schema")
        else None
    )
    return DDLEvent(
        op=DDLOp(d["op"]),
        database=d["database"],
        table=d.get("table"),
        schema=schema,
        primary_keys=list(d.get("primary_keys") or []),
        sequence_num=int(d.get("sequence_num") or 0),
    )


@dataclass
class SourceProperties:
    """Mirrors the reference's SourceProperties: event ordering contract
    and row-id support decide staging shape and merge strategy."""

    ordering: str = "ORDERED"  # ORDERED | UN_ORDERED
    row_id_supported: bool = False
    sort_key_types: list[T.DataType] = field(default_factory=list)
