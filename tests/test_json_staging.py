"""JSON staging codec (O3): lossless round trip of staged CDC events —
binary html as base64, micros timestamps, nulls — plus the PERMISSIVE
malformed-line contract and the gated-Avro probe."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from bigquery_delta_plugins_spark.sources.gen import synth_events
from bigquery_delta_plugins_spark.sources.json_events import (
    avro_available,
    parse_staged_json,
    read_staged_json,
    staged_json_lines,
    write_staged_json,
)


def test_staged_events_roundtrip_exact(spark, tmp_path):
    """The full staged-event shape (strings, longs, binary payloads,
    null _before_* keys) survives encode -> text files -> decode with
    zero row diffs and the identical schema."""
    ev = synth_events(spark, 2000, 100, pk_move_frac=0.05)
    path = str(tmp_path / "staged-json")
    write_staged_json(ev, path)
    back = read_staged_json(spark, path, ev.schema)
    # from_json yields nullable fields regardless of the input schema's
    # nullability flags — names and types must round-trip exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in ev.schema.fields
    ]
    assert ev.exceptAll(back).count() == 0
    assert back.exceptAll(ev).count() == 0


def test_binary_rides_as_base64(spark):
    """Spark's JSON contract for BinaryType is base64 — assert the wire
    form explicitly so an external JSON producer knows the encoding."""
    import base64

    df = spark.createDataFrame(
        [("u1", b"\x00\xffhtml")],
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("html", T.BinaryType()),
            ]
        ),
    )
    line = staged_json_lines(df).first()["value"]
    assert base64.b64encode(b"\x00\xffhtml").decode() in line
    back = parse_staged_json(staged_json_lines(df), df.schema).first()
    assert bytes(back["html"]) == b"\x00\xffhtml"


def test_malformed_line_yields_nulls_not_failure(spark):
    schema = T.StructType([T.StructField("a", T.LongType())])
    lines = spark.createDataFrame([("{\"a\": 1}",), ("not json",)], ["value"])
    got = parse_staged_json(lines, schema).collect()
    assert sorted([r["a"] for r in got], key=lambda x: (x is None, x)) == [1, None]


def test_corrupt_col_isolates_malformed_lines(spark):
    """The corrupt-record escape hatch: a malformed line is
    DISTINGUISHABLE from a legitimately-all-NULL row — the raw text
    lands in the corrupt column, clean rows carry NULL there."""
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    lines = spark.createDataFrame(
        [("{\"a\": 1, \"b\": \"x\"}",), ("not json",),
         ("{\"a\": null, \"b\": null}",)],
        ["value"],
    )
    got = parse_staged_json(lines, schema, corrupt_col="_corrupt")
    assert got.columns == ["a", "b", "_corrupt"]
    bad = got.filter(F.col("_corrupt").isNotNull()).collect()
    assert [r["_corrupt"] for r in bad] == ["not json"]
    # the legit all-NULL row is NOT flagged
    assert got.filter(F.col("_corrupt").isNull()).count() == 2


def test_failfast_mode_fails_batch_on_corrupt_line(spark):
    """FAILFAST mirrors the reference's throw-on-bad-record posture
    (StructuredRecordToJson.java:75-304): one malformed staged line
    fails the batch instead of silently nulling the record."""
    import pytest

    schema = T.StructType([T.StructField("a", T.LongType())])
    lines = spark.createDataFrame([("{\"a\": 1}",), ("not json",)], ["value"])
    with pytest.raises(Exception, match="FAILFAST|Malformed"):
        parse_staged_json(lines, schema, mode="FAILFAST").collect()
    # a clean batch passes through untouched under FAILFAST
    ok = spark.createDataFrame([("{\"a\": 7}",)], ["value"])
    assert parse_staged_json(ok, schema, mode="FAILFAST").first()["a"] == 7


def test_corrupt_col_argument_validation(spark):
    import pytest

    schema = T.StructType([T.StructField("a", T.LongType())])
    lines = spark.createDataFrame([("{\"a\": 1}",)], ["value"])
    with pytest.raises(ValueError):
        parse_staged_json(lines, schema, mode="FAILFAST", corrupt_col="_c")
    with pytest.raises(ValueError):
        parse_staged_json(lines, schema, corrupt_col="a")
    with pytest.raises(ValueError):
        parse_staged_json(lines, schema, mode="DROPMALFORMED")


def test_null_fields_serialized_explicitly(spark):
    """ignoreNullFields=false: every schema field appears in every wire
    line (NULLs as ``"col":null``), so an external consumer doing
    field-presence validation sees a consistent object shape per row."""
    df = spark.createDataFrame(
        [("u1", None)],
        T.StructType(
            [
                T.StructField("url", T.StringType()),
                T.StructField("html", T.BinaryType()),
            ]
        ),
    )
    line = staged_json_lines(df).first()["value"]
    assert '"html":null' in line


def test_micros_timestamp_fidelity(spark):
    """Default to_json keeps millis only; the codec's explicit format
    must carry full microseconds both directions."""
    df = spark.sql(
        "SELECT TIMESTAMP_NTZ '2024-01-01 00:09:58.778549' AS ts"
    )
    back = parse_staged_json(staged_json_lines(df), df.schema).first()
    assert back["ts"].microsecond == 778549


def test_avro_gate_is_honest(spark):
    """avro_available() must agree with an actual to_avro attempt (the
    container ships no spark-avro module jar, so this documents the
    gated path rather than assuming)."""
    ok = avro_available(spark)
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct("id"))).collect()
        really = True
    except Exception:
        really = False
    assert ok == really
