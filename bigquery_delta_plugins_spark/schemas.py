"""Schema builders and the CDAP→BigQuery→Spark type lattice.

Re-expresses the reference's schema machinery:

- type conversion ``Schemas.convertType``/``convertLogicalType``
  (reference Schemas.java:48-160, BigQueryAssessor.java:143-193)
- staging-record augmentation — ``_op``/``_batch_id``/``_sequence_num``/
  ``_before_*``/``_row_id``/``_source_timestamp``/``_sort``
  (MultiGCSWriter.java:307-390)
- target-table augmentation — ``_sequence_num``/``_is_deleted``/
  ``_row_id``/``_source_timestamp``/``_sort``
  (BigQueryEventConsumer.java:572-586, MultiGCSWriter.java:307-320)
- sort-key struct ``_sort``: fields ``_key_0.._key_n`` (Schemas.java:162-170)
- clustering-key selection: primary keys filtered to clustering-legal
  types, capped at 4 (BigQueryEventConsumer.java:528-538, Schemas.java:38-41)
"""

from __future__ import annotations

from pyspark.sql import types as T

from . import constants as C

# ---------------------------------------------------------------------------
# Type lattice
# ---------------------------------------------------------------------------

# CDAP simple type name -> (BigQuery type, Spark type).  Mirrors
# Schemas.java:61-106; Spark is the engine-native column.
_SIMPLE_TYPES: dict[str, tuple[str, T.DataType]] = {
    "int": ("INT64", T.IntegerType()),
    "long": ("INT64", T.LongType()),
    "float": ("FLOAT64", T.FloatType()),
    "double": ("FLOAT64", T.DoubleType()),
    "string": ("STRING", T.StringType()),
    "enum": ("STRING", T.StringType()),
    "boolean": ("BOOL", T.BooleanType()),
    "bytes": ("BYTES", T.BinaryType()),
}

_LOGICAL_TYPES: dict[str, tuple[str, T.DataType]] = {
    # Spark has no TIME type; microseconds-since-midnight as long.
    "time-millis": ("TIME", T.LongType()),
    "time-micros": ("TIME", T.LongType()),
    "timestamp-millis": ("TIMESTAMP", T.TimestampType()),
    "timestamp-micros": ("TIMESTAMP", T.TimestampType()),
    "date": ("DATE", T.DateType()),
    "datetime": ("DATETIME", T.TimestampNTZType()),
}


class UnsupportedTypeError(ValueError):
    """Raised for types the reference rejects (e.g. MAP, array-of-array)."""


def bq_type_for(cdap_type: str, precision: int | None = None, scale: int | None = None) -> str:
    """CDAP type name -> BigQuery Standard SQL type (Schemas.java:61-106).

    Decimals split into NUMERIC (p<=38, s<=9) vs BIGNUMERIC
    (Schemas.java:95-101).
    """
    t = cdap_type.lower()
    if t == "decimal":
        p = precision if precision is not None else 38
        s = scale if scale is not None else 9
        return "NUMERIC" if p <= 38 and s <= 9 else "BIGNUMERIC"
    if t in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[t][0]
    if t in _LOGICAL_TYPES:
        return _LOGICAL_TYPES[t][0]
    if t == "record":
        return "STRUCT"
    if t == "array":
        return "REPEATED"
    if t == "map":
        raise UnsupportedTypeError("MAP types are unsupported (Schemas.java:151-158)")
    raise UnsupportedTypeError(f"unsupported CDAP type: {cdap_type}")


def spark_type_for(cdap_type: str, precision: int | None = None, scale: int | None = None) -> T.DataType:
    """CDAP type name -> engine-native Spark type."""
    t = cdap_type.lower()
    if t == "decimal":
        return T.DecimalType(min(precision or 38, 38), min(scale or 9, 38))
    if t in _SIMPLE_TYPES:
        return _SIMPLE_TYPES[t][1]
    if t in _LOGICAL_TYPES:
        return _LOGICAL_TYPES[t][1]
    if t == "map":
        raise UnsupportedTypeError("MAP types are unsupported (Schemas.java:151-158)")
    raise UnsupportedTypeError(f"unsupported CDAP type: {cdap_type}")


# Types legal as BigQuery clustering columns (Schemas.java:38-41 lists the
# CDAP-side allowed set); translated to Spark types.
_CLUSTERING_OK = (
    T.IntegerType,
    T.LongType,
    T.StringType,
    T.BooleanType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DecimalType,
)


def clustering_supported_keys(schema: T.StructType, primary_keys: list[str]) -> list[str]:
    """Primary keys usable as clustering/bucketing columns, capped at 4
    (BigQueryEventConsumer.java:528-538, cap :251-254)."""
    by_name = {f.name: f for f in schema.fields}
    out = []
    for k in primary_keys:
        f = by_name.get(k)
        if f is not None and isinstance(f.dataType, _CLUSTERING_OK):
            out.append(k)
        if len(out) >= C.MAX_CLUSTERING_COLUMNS:
            break
    return out


# ---------------------------------------------------------------------------
# Staging / target schema builders
# ---------------------------------------------------------------------------


def sort_keys_struct_type(sort_key_types: list[T.DataType]) -> T.StructType:
    """``_sort`` struct: nullable ``_key_0.._key_n`` (Schemas.java:162-170)."""
    return T.StructType(
        [
            T.StructField(f"{C.SORT_KEY_FIELD}_{i}", dt, True)
            for i, dt in enumerate(sort_key_types)
        ]
    )


def staging_schema(
    source_schema: T.StructType,
    *,
    row_id_supported: bool = False,
    ordering: str = C.ORDERED,
    sort_key_types: list[T.DataType] | None = None,
) -> T.StructType:
    """Schema of one staged change-event batch (MultiGCSWriter.java:352-390).

    Column order matches the reference: ``_op``, ``_batch_id``,
    ``_sequence_num`` [, ``_source_timestamp``, ``_sort``], source columns,
    then ``_row_id`` or one nullable ``_before_<col>`` per source column.
    """
    fields: list[T.StructField] = [
        T.StructField(C.OPERATION, T.StringType(), False),
        T.StructField(C.BATCH_ID, T.LongType(), False),
        T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
    ]
    if ordering == C.UN_ORDERED:
        fields.append(T.StructField(C.SOURCE_TIMESTAMP, T.LongType(), False))
        if sort_key_types:
            fields.append(
                T.StructField(C.SORT_KEYS, sort_keys_struct_type(sort_key_types), True)
            )
    fields.extend(source_schema.fields)
    if row_id_supported:
        fields.append(T.StructField(C.ROW_ID, T.StringType(), False))
    else:
        for f in source_schema.fields:
            fields.append(T.StructField(C.BEFORE_PREFIX + f.name, f.dataType, True))
    return T.StructType(fields)


def target_schema(
    source_schema: T.StructType,
    *,
    ordering: str = C.ORDERED,
    sort_key_types: list[T.DataType] | None = None,
) -> T.StructType:
    """Schema of the replicated target table (MultiGCSWriter.java:307-320,
    BigQueryEventConsumer.java:572-586): source columns + audit columns."""
    fields = list(source_schema.fields) + [
        T.StructField(C.SEQUENCE_NUM, T.LongType(), False),
        T.StructField(C.IS_DELETED, T.BooleanType(), True),
        T.StructField(C.ROW_ID, T.StringType(), True),
        T.StructField(C.SOURCE_TIMESTAMP, T.LongType(), True),
    ]
    if ordering == C.UN_ORDERED and sort_key_types:
        fields.append(
            T.StructField(C.SORT_KEYS, sort_keys_struct_type(sort_key_types), True)
        )
    return T.StructType(fields)


def source_columns(staged_or_target: T.StructType) -> list[str]:
    """Names of the source (non-audit, non-before) columns of a schema."""
    audit = {
        C.OPERATION,
        C.BATCH_ID,
        C.SEQUENCE_NUM,
        C.SOURCE_TIMESTAMP,
        C.IS_DELETED,
        C.ROW_ID,
        C.SORT_KEYS,
    }
    return [
        f.name
        for f in staged_or_target.fields
        if f.name not in audit and not f.name.startswith(C.BEFORE_PREFIX)
    ]
