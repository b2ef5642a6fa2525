"""JSON-lines staging codec for staged CDC event batches (O2/O3).

The reference replicator stages each batch to GCS in a configurable
wire format before loading — Avro by default with a JSON fallback
(MultiGCSWriter.java:99-148 selects the format; the JSON branch writes
one newline-delimited JSON object per staged row, binary as base64).
On Spark the staging encode/decode is a built-in expression pair: this
module round-trips a staged-event DataFrame through newline-delimited
JSON with full fidelity — binary columns ride as base64 (Spark's JSON
contract for ``BinaryType``), timestamps as ISO-8601 — so a JSON
staging bucket written by an external producer feeds the identical
flatten → merge pipeline.  Avro needs the external ``spark-avro``
module jar (absent from this container, import-gated below); columnar
parquet remains the default staging format and the fast path — this
codec exists for wire compatibility, and its cost is one codegen'd
projection per direction.

Everything is JVM-side (``to_json`` / ``from_json``): no Python in the
row path, whole-stage codegen applies, and the reader takes the schema
explicitly so nothing is ever inferred from data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Timestamp wire format: micros-precision ISO-8601 so the round trip is
# exact for parquet's TIMESTAMP(MICROS) physical type.  Spark's default
# to_json format keeps millis only — enough for wall clocks, silently
# lossy for event timestamps used as sort keys.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
# ignoreNullFields=false: every staged line carries every schema field
# explicitly (NULL columns serialize as ``"col":null`` rather than
# being omitted).  to_json's default omission round-trips fine through
# our own from_json (missing -> NULL) but this module is a wire format
# for EXTERNAL producers/consumers — field-presence validation on the
# consumer side must see a consistent object shape per row.
_OPTS = {
    "timestampFormat": _TS_FMT,
    "timestampNTZFormat": _TS_FMT[:-3],
    "ignoreNullFields": "false",
}


def staged_json_lines(df: DataFrame) -> DataFrame:
    """Encode every row as one JSON line (column ``value: string``)."""
    return df.select(F.to_json(F.struct(*df.columns), _OPTS).alias("value"))


def parse_staged_json(
    lines: DataFrame,
    schema: T.StructType,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Decode a ``value: string`` JSON-lines frame with an explicit
    schema.

    Malformed-line contract (the reference's JsonEventWriter throws on
    any record it cannot serialize — StructuredRecordToJson.java:75-304
    — so a corrupted staging file must never silently degrade to NULL
    rows):

    - ``mode="FAILFAST"``: the batch job fails on the first malformed
      line — the reference's posture, and the right default for a
      production staging read wired into flatten -> merge.
    - ``corrupt_col="..."`` (PERMISSIVE): the returned frame carries an
      extra string column holding the raw line for malformed rows and
      NULL for clean ones, so callers can quarantine/count corrupt
      lines (``df.filter(col(corrupt_col).isNotNull())``) instead of
      failing the batch.
    - default (PERMISSIVE, no corrupt column): a malformed line yields
      an all-NULL row — kept for schema-stable compatibility, but
      callers feeding a real CDC apply should pass one of the above.
    """
    if mode not in ("PERMISSIVE", "FAILFAST"):
        raise ValueError(f"unsupported from_json mode: {mode!r}")
    opts = dict(_OPTS, mode=mode)
    parse_schema = schema
    if corrupt_col is not None:
        if mode == "FAILFAST":
            raise ValueError("corrupt_col only applies to PERMISSIVE mode")
        if corrupt_col in schema.fieldNames():
            raise ValueError(f"corrupt_col {corrupt_col!r} collides with schema")
        # from_json routes the raw text of unparseable records into the
        # schema field named by columnNameOfCorruptRecord
        opts["columnNameOfCorruptRecord"] = corrupt_col
        parse_schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
        )
    parsed = lines.select(
        F.from_json(F.col("value"), parse_schema, opts).alias("r"), F.col("value")
    )
    out_fields = [F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    if corrupt_col is not None:
        out_fields.append(F.col(f"r.{corrupt_col}").alias(corrupt_col))
    return parsed.select(*out_fields)


def write_staged_json(df: DataFrame, path: str) -> None:
    """Stage a batch as newline-delimited JSON text files."""
    staged_json_lines(df).write.mode("overwrite").text(path)


def read_staged_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read a JSON staging directory back into typed staged events.
    ``mode``/``corrupt_col`` follow :func:`parse_staged_json`."""
    return parse_staged_json(
        spark.read.text(path), schema, mode=mode, corrupt_col=corrupt_col
    )


def avro_available(spark: SparkSession) -> bool:
    """True when the external spark-avro module jar is on the
    classpath.  The container ships only the core avro jars, so the
    Avro staging codec is gated rather than stubbed: the reference's
    default wire format maps to parquet here (columnar beats row-Avro
    for a staging scan anyway), and JSON covers the interchange case."""
    try:
        from pyspark.sql.avro.functions import to_avro  # noqa: F401

        spark.range(1).select(to_avro(F.struct("id"))).collect()
        return True
    except Exception:
        return False
