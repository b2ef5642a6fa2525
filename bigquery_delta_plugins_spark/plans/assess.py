"""Table assessment — the pre-flight dry-run planner (O28).

Re-expresses the reference's ``BigQueryAssessor`` (BigQueryAssessor.java:
58-141): per-column type-mapping verdicts plus table-level problems —
missing primary key, duplicate normalized table names across source
schemas, and name-normalization warnings — WITHOUT touching any target.
Run it over every table of a replication job before starting the stream.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

from ..normalize import normalize_field_name, normalize_table_name
from ..schemas import UnsupportedTypeError, clustering_supported_keys

_SPARK_TO_CDAP = {
    T.IntegerType: "INT",
    T.LongType: "LONG",
    T.FloatType: "FLOAT",
    T.DoubleType: "DOUBLE",
    T.StringType: "STRING",
    T.BooleanType: "BOOLEAN",
    T.BinaryType: "BYTES",
    T.TimestampType: "TIMESTAMP_MICROS",
    T.TimestampNTZType: "DATETIME",
    T.DateType: "DATE",
}


@dataclass
class ColumnAssessment:
    name: str
    normalized_name: str
    source_type: str
    target_type: str | None
    support: str  # YES | NO
    suggestion: str | None = None


@dataclass
class Problem:
    table: str
    kind: str  # MISSING_PRIMARY_KEY | DUPLICATE_TABLE | UNSUPPORTED_TYPE | RENAMED
    detail: str


@dataclass
class TableAssessment:
    table: str
    normalized_table: str
    columns: list[ColumnAssessment] = field(default_factory=list)
    clustering_keys: list[str] = field(default_factory=list)
    problems: list[Problem] = field(default_factory=list)


def _target_type_of(dt: T.DataType) -> str:
    from ..schemas import bq_type_for

    if isinstance(dt, T.DecimalType):
        return bq_type_for("DECIMAL", dt.precision, dt.scale)
    if isinstance(dt, T.ArrayType):
        return _target_type_of(dt.elementType) + " REPEATED"
    if isinstance(dt, T.StructType):
        return "STRUCT"
    if isinstance(dt, T.MapType):
        raise UnsupportedTypeError("MAP types are unsupported (Schemas.java:151-158)")
    cdap = _SPARK_TO_CDAP.get(type(dt))
    if cdap is None:
        raise UnsupportedTypeError(f"unsupported type: {dt.simpleString()}")
    return bq_type_for(cdap)


def assess_table(
    table: str, schema: T.StructType, primary_keys: list[str]
) -> TableAssessment:
    """Assess one table: column verdicts + problems (BigQueryAssessor.java
    :58-99 assessColumn, :101-141 assess)."""
    out = TableAssessment(table=table, normalized_table=normalize_table_name(table))
    if not primary_keys:
        out.problems.append(
            Problem(
                table,
                "MISSING_PRIMARY_KEY",
                "tables without a primary key cannot be replicated "
                "(BigQueryAssessor.java:119-127)",
            )
        )
    for f in schema.fields:
        norm = normalize_field_name(f.name)
        try:
            tgt = _target_type_of(f.dataType)
            out.columns.append(
                ColumnAssessment(
                    f.name, norm, f.dataType.simpleString(), tgt, "YES",
                    suggestion=(
                        f"column will be written as '{norm}'" if norm != f.name else None
                    ),
                )
            )
        except UnsupportedTypeError as e:
            out.columns.append(
                ColumnAssessment(
                    f.name, norm, f.dataType.simpleString(), None, "NO", str(e)
                )
            )
            out.problems.append(Problem(table, "UNSUPPORTED_TYPE", f"{f.name}: {e}"))
    out.clustering_keys = clustering_supported_keys(schema, primary_keys)
    if out.normalized_table != table:
        out.problems.append(
            Problem(
                table,
                "RENAMED",
                f"table will be written as '{out.normalized_table}'",
            )
        )
    return out


def assess_job(
    tables: dict[str, tuple[T.StructType, list[str]]],
) -> list[TableAssessment]:
    """Assess a whole replication job; flags normalized-name collisions
    across source tables (duplicate-table problem,
    BigQueryAssessorTest.java:32-65)."""
    outs = [assess_table(t, sch, pks) for t, (sch, pks) in tables.items()]
    seen: dict[str, str] = {}
    for a in outs:
        if a.normalized_table in seen:
            a.problems.append(
                Problem(
                    a.table,
                    "DUPLICATE_TABLE",
                    f"normalizes to '{a.normalized_table}', already used by "
                    f"'{seen[a.normalized_table]}' (BigQueryAssessor.java:129-139)",
                )
            )
        else:
            seen[a.normalized_table] = a.table
    return outs
